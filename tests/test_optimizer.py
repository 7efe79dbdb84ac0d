"""Schedule parity with reference AdamInverseSqrtWithWarmup (utils.py:105-156)."""

import jax.numpy as jnp
import numpy as np
import optax

from imagetranslate_tpu.train.optimizer import (
    build_optimizer,
    inverse_sqrt_schedule,
    reset_schedule,
)


def ref_lr(num_updates, lr=1e-3, warmup=4000, init=1e-7):
    """utils.py:141-146 get_lr_for_step."""
    step = (lr - init) / warmup
    if num_updates < warmup:
        return init + num_updates * step
    return max(init, min(lr, lr * warmup ** 0.5 * num_updates ** -0.5))


def test_schedule_matches_reference():
    sched = inverse_sqrt_schedule(1e-3, 4000)
    for k in [0, 1, 10, 3999, 4000, 4001, 10000, 1000000]:
        np.testing.assert_allclose(float(sched(k)), ref_lr(k), rtol=1e-5,
                                   err_msg=f"step {k}")


def test_optimizer_steps_and_reset():
    opt = build_optimizer(lr=1e-3, warmup_updates=10)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    g = {"w": jnp.ones((3,)) * 0.5}
    for _ in range(5):
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    counts = [s.count for s in jax._src.tree_util.tree_leaves(state)
              if hasattr(s, "count")]
    state2 = reset_schedule(state)
    # The schedule count goes back to zero; adam moments survive.
    import optax as _optax

    def find(s, cls):
        found = []
        def rec(x):
            if isinstance(x, cls):
                found.append(x)
            elif isinstance(x, tuple):
                for y in x:
                    rec(y)
        rec(s)
        return found

    sched_states = find(state2, _optax.ScaleByScheduleState)
    assert all(int(s.count) == 0 for s in sched_states)
    adam_states = find(state2, _optax.ScaleByAdamState)
    assert all(float(jnp.abs(s.mu["w"]).sum()) > 0 for s in adam_states)


import jax  # noqa: E402  (used above in tree_leaves)
