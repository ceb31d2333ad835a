"""Compute-precision policy.

The reference's mixed precision is AMP autocast + GradScaler
(``spformer_trainer.py:38,78-92``, default off). The TPU-native equivalent
is bf16 compute with f32 parameters/accumulation — no loss scaling needed
(bf16 keeps the f32 exponent range). The policy is a process-global static:
it is read at trace time by the FLOP-heavy ops (sparse conv, window
attention, image convs); numerics-sensitive math (BN statistics, softmax,
losses) stays f32.

Usage: ``set_compute_dtype('bfloat16')`` before building/tracing the model
(or ``precision: bfloat16`` in the config).
"""

from __future__ import annotations

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if not isinstance(dtype, str) else {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16,
    }[dtype]


def compute_dtype():
    return _COMPUTE_DTYPE


def cast_compute(*arrays):
    dt = _COMPUTE_DTYPE
    out = tuple(a.astype(dt) if a.dtype != dt else a for a in arrays)
    return out if len(out) > 1 else out[0]
