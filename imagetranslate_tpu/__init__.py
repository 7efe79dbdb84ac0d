"""imagetranslate_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
capabilities of rasoolims/ImageTranslate.

The reference implementation (studied at /root/reference) is a single-GPU
PyTorch codebase for multilingual MASS pretraining, (un)supervised MT via
back-translation, and image captioning. This package is a from-scratch
TPU-first framework with the same capabilities:

- ``text``      — first-party SentencePiece-BPE tokenizer (C++ hot path) and
                  the ``TextProcessor`` facade (reference: textprocessor.py).
- ``data``      — offline binarizers and a length-bucketed, fixed-shape host
                  input pipeline (reference: create_mt_batches.py, dataset.py).
- ``models``    — pure-functional flax transformer encoder/decoder stacks,
                  image encoders, LM/SenSim heads (reference: seq2seq.py,
                  mass_seq2seq.py, image_model.py, lm.py, sen_sim.py).
- ``ops``       — Pallas TPU kernels + XLA fallbacks for the hot ops
                  (flash attention, fused label-smoothed softmax-xent).
- ``decoding``  — jit-compiled fixed-shape KV-cached beam search
                  (reference: seq_gen.py).
- ``parallel``  — device-mesh / sharding story (dp/tp via pjit + shard_map)
                  replacing the reference's parallel.py.
- ``train``     — trainers, optimizer schedule, checkpointing
                  (reference: train_image_mt.py et al., utils.py).
- ``cli``       — user-facing command line tools (translate, caption, ...).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache (respects a user-set value). TPU compiles
# of the big jitted programs are expensive; caching them across processes
# makes CLI reruns start in seconds instead of minutes.
import os as _os
import sys as _sys

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "imagetranslate_tpu_xla"),
)

# On hosts whose sitecustomize imports jax at interpreter start (the axon
# TPU image), jax captured its config env BEFORE the env var above (or any
# user-set one in a script) existed, so the cache silently stays off — the
# round-3 "cache write path silently skipped" bug (utils/xla_cache.py).
# Mirror the env var into jax.config in exactly that case; when jax has not
# been imported yet the env var works on its own and jax stays unimported.
if "jax" in _sys.modules:
    from imagetranslate_tpu.utils.xla_cache import (  # noqa: E402
        maybe_enable_from_env as _mee,
    )

    _mee()
