"""Exact coordinate keys, sort-based unique, and vectorized binary-search lookup.

TPU-native replacement for torchsparse's FNV hashing stack
(``sphash`` / ``sphashquery`` / ``spcount``; see reference
``core/models/utils.py:19-57``). Instead of a 64-bit FNV hash + GPU hash
table probing, integer voxel coordinates are packed *exactly* into a
``(hi, lo)`` pair of uint32 keys (collision-free by construction), unique is
a bitonic sort + flag/cumsum compaction into a fixed-capacity table, and
lookup is a vectorized lexicographic binary search — all static shapes, all
fully vectorized for the VPU.

All functions here are per-sample (no batch column); callers `jax.vmap` over
the batch axis. Everything is differentiable-free index math (int ops only).

Conventions:
  * Coordinates are int32 and must lie in ``[-COORD_BIAS, COORD_BIAS-1]``.
  * Invalid/padded entries use key ``(INVALID_KEY, INVALID_KEY)`` which
    compares greater than every valid key, so padding sorts to the end.
  * ``unique_coords`` returns tables sorted by key; lookups binary-search
    these sorted tables directly.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

COORD_BIAS = 1 << 15  # coords valid in [-32768, 32767]
INVALID_KEY = jnp.uint32(0xFFFFFFFF)


def pack_coords(coords: jax.Array, valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Pack int32 coords [N, 3] into exact (hi, lo) uint32 key pairs.

    hi = x + BIAS (16 bits used); lo = (y + BIAS) << 16 | (z + BIAS).
    Invalid rows get (INVALID_KEY, INVALID_KEY).
    """
    ci = coords.astype(jnp.int32)
    in_range = jnp.all((ci >= -COORD_BIAS) & (ci < COORD_BIAS), axis=-1)
    valid = valid & in_range
    c = (ci + COORD_BIAS).astype(jnp.uint32)
    hi = c[:, 0]
    lo = (c[:, 1] << 16) | (c[:, 2] & jnp.uint32(0xFFFF))
    hi = jnp.where(valid, hi, INVALID_KEY)
    lo = jnp.where(valid, lo, INVALID_KEY)
    return hi, lo


def unpack_coords(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Inverse of pack_coords (valid keys only). Returns int32 [N, 3]."""
    x = hi.astype(jnp.int32) - COORD_BIAS
    y = (lo >> 16).astype(jnp.int32) - COORD_BIAS
    z = (lo & jnp.uint32(0xFFFF)).astype(jnp.int32) - COORD_BIAS
    return jnp.stack([x, y, z], axis=-1)


def sort_by_key(hi: jax.Array, lo: jax.Array, *payloads: jax.Array):
    """Stable lexicographic sort of (hi, lo) with payload arrays carried along."""
    out = jax.lax.sort((hi, lo) + tuple(payloads), num_keys=2, is_stable=True)
    return out


def key_less(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def unique_keys(hi: jax.Array, lo: jax.Array, capacity: int):
    """Compact the distinct valid keys of (hi, lo) into a sorted fixed table.

    Mirrors ``torch.unique(pc_hash)`` + ``sphashquery`` + ``spcount``
    (reference ``core/models/utils.py:20-22``) in one fused pass.

    Returns:
      uhi, ulo:  [capacity] sorted unique keys, padded with INVALID_KEY.
      inverse:   [N] int32 position of each input key in the unique table;
                 == capacity for invalid inputs or overflow (use as the
                 drop-bucket index in segment ops of size capacity+1).
      counts:    [capacity] int32 number of inputs per unique key.
      num:       [] int32 number of uniques (clipped at capacity).
    """
    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    shi, slo, sidx = sort_by_key(hi, lo, idx)
    valid_s = shi != INVALID_KEY
    prev_ne = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
        ]
    )
    first = valid_s & prev_ne
    uid_s = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N] unique id in sorted order
    in_table = valid_s & (uid_s < capacity) & (uid_s >= 0)
    uid_s_safe = jnp.where(in_table, uid_s, capacity)
    # scatter back to original order
    inverse = jnp.zeros((n,), jnp.int32).at[sidx].set(uid_s_safe)
    # build the unique tables
    uhi = jnp.full((capacity + 1,), INVALID_KEY, jnp.uint32).at[uid_s_safe].set(
        jnp.where(in_table, shi, INVALID_KEY), mode="drop"
    )[:capacity]
    ulo = jnp.full((capacity + 1,), INVALID_KEY, jnp.uint32).at[uid_s_safe].set(
        jnp.where(in_table, slo, INVALID_KEY), mode="drop"
    )[:capacity]
    counts = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[uid_s_safe]
        .add(valid_s.astype(jnp.int32), mode="drop")[:capacity]
    )
    num = jnp.sum(first & in_table).astype(jnp.int32)
    return uhi, ulo, inverse, counts, num


def lookup(qhi: jax.Array, qlo: jax.Array, thi: jax.Array, tlo: jax.Array) -> jax.Array:
    """For each query key find its index in a *sorted* target key table, or -1.

    Replaces ``sphashquery`` (reference ``core/models/utils.py:21,50,93``).
    Vectorized lexicographic binary search: ceil(log2(T)) rounds of
    gather+compare over the whole query vector.
    """
    t = thi.shape[0]
    nbits = max(1, t.bit_length())  # enough rounds to narrow a range of t+1 values

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.clip(mid, 0, t - 1)
        mhi = thi[mid_c]
        mlo = tlo[mid_c]
        less = key_less(mhi, mlo, qhi, qlo)
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    lo_b, _ = jax.lax.fori_loop(
        0, nbits,
        body,
        (jnp.zeros(qhi.shape, jnp.int32), jnp.full(qhi.shape, t, jnp.int32)),
    )
    pos = jnp.clip(lo_b, 0, t - 1)
    found = (thi[pos] == qhi) & (tlo[pos] == qlo) & (qhi != INVALID_KEY)
    return jnp.where(found, pos, -1)


def lookup_coords(query_coords: jax.Array, query_valid: jax.Array,
                  thi: jax.Array, tlo: jax.Array) -> jax.Array:
    """Convenience: pack + lookup. query_coords [..., 3] int32."""
    flat = query_coords.reshape(-1, 3)
    qhi, qlo = pack_coords(flat, query_valid.reshape(-1))
    return lookup(qhi, qlo, thi, tlo).reshape(query_coords.shape[:-1])
