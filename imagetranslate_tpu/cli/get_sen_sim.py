"""Dump SenSim cosine per parallel pair as TSV "src\\ttgt\\tsim"
(reference: get_sen_sim.py:17-52)."""

from __future__ import annotations

import argparse
import sys


def get_parser():
    p = argparse.ArgumentParser("get_sen_sim")
    p.add_argument("--tok", dest="tokenizer_path", required=True)
    p.add_argument("--model", dest="model_path", required=True)
    p.add_argument("--dev_mt", dest="mt_dev_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch", type=int, default=20000)
    p.add_argument("--capacity", dest="total_capacity", type=int, default=600)
    return p


def main(argv=None):
    options = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from imagetranslate_tpu.data.binarize import load_mt
    from imagetranslate_tpu.data.loader import MTBatcher
    from imagetranslate_tpu.models.sensim import SenSim
    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.checkpoint import load_checkpoint, load_config

    tp = TextProcessor(options.tokenizer_path)
    cfg = load_config(options.model_path)
    model = SenSim(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), bool)
    langs = jnp.zeros((2,), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), ids, mask, langs, ids, mask,
                          langs)
    params, _, _ = load_checkpoint(options.model_path,
                                   jax.device_get(template))

    batcher = MTBatcher(load_mt(options.mt_dev_path), pad_id=tp.pad_token_id(),
                        max_batch=options.batch // 8,
                        capacity_mb=options.total_capacity)
    sim_fn = jax.jit(lambda p, *a: model.apply(p, *a,
                                               method=SenSim.similarity))
    with open(options.output, "w") as w:
        for i, b in enumerate(batcher):
            sims = sim_fn(params, jnp.asarray(b.src), jnp.asarray(b.src_mask),
                          jnp.asarray(b.src_langs), jnp.asarray(b.dst),
                          jnp.asarray(b.dst_mask), jnp.asarray(b.dst_langs))
            n_real = int(b.row_mask.sum())
            for r in range(n_real):
                def detok(row):
                    ids = [t for t in row.tolist() if t != tp.pad_token_id()][1:]
                    if ids and ids[-1] == tp.sep_token_id():
                        ids = ids[:-1]
                    return tp.decode(ids)

                w.write(detok(b.src[r]) + "\t" + detok(b.dst[r]) + "\t"
                        + str(float(sims[r])) + "\n")
            print(f"{i + 1}/{len(batcher)}", end="\r", file=sys.stderr)
    print("\nDone!", file=sys.stderr)


if __name__ == "__main__":
    main()
