"""Pallas flash window attention with per-tile dynamic key ranges.

The XLA banded formulation (:mod:`u2mkd_tpu.ops.wattn`) attends a *static*
band of key tiles around each query tile; highly skewed window occupancies
(the radial windows) force a wide band that is mostly wasted. This kernel
reads, per query tile, the actual [first, last] key range its windows span
(scalar-prefetched) and loops only over the needed key tiles with an online
(flash) softmax — the TPU analog of the reference's exact per-window CSR
attention (``sptr``), with O(N) memory and no sum(c^2) pair expansion.

v1 scope: no contextual RPE (the SphereFormer branches keep the XLA path
until RPE is folded in); used standalone and as groundwork. Correctness is
oracle-tested in interpreter mode (CPU) against the dense per-window oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(kmin_ref, kmax_ref,  # scalar-prefetch [n_tiles]
            q_ref, k_hbm, v_hbm, wid_hbm, qwid_ref,
            o_ref,
            k_s, v_s, w_s, sems,
            *, tile: int, n_heads: int, head_dim: int):
    t = pl.program_id(0)
    kmin = kmin_ref[t]
    kmax = kmax_ref[t]
    t0 = kmin // tile
    t1 = (kmax - 1) // tile + 1

    q = q_ref[...]          # [tile, hd_pad]
    qw = qwid_ref[:, :1]    # [tile, 1] int32 window ids of this query tile

    def head_slice(x, h):
        return x[:, h * head_dim:(h + 1) * head_dim]

    def body(kt, carry):
        m, l, acc = carry  # [tile, h], [tile, h], [tile, h*d]
        cps = (
            pltpu.make_async_copy(k_hbm.at[pl.ds(kt * tile, tile), :], k_s,
                                  sems.at[0]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(kt * tile, tile), :], v_s,
                                  sems.at[1]),
            pltpu.make_async_copy(wid_hbm.at[pl.ds(kt * tile, tile), :], w_s,
                                  sems.at[2]),
        )
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        k_blk = k_s[...]
        v_blk = v_s[...]
        kw = w_s[:, :1]                            # [tile, 1]
        same = qw == kw.T                          # [tile, tile]
        new_m_list, new_l_list, acc_list = [], [], []
        for h in range(n_heads):
            qh = head_slice(q, h)                  # [tile, d]
            kh = head_slice(k_blk, h)
            vh = head_slice(v_blk, h)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # [tile, tile]
            s = jnp.where(same, s, NEG_INF)
            m_h = m[:, h:h + 1]
            m_new = jnp.maximum(m_h, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)                 # [tile, tile]
            scale = jnp.exp(m_h - m_new)           # [tile, 1]
            l_new = l[:, h:h + 1] * scale + jnp.sum(p, axis=1, keepdims=True)
            acc_h = head_slice(acc, h) * scale + jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_m_list.append(m_new)
            new_l_list.append(l_new)
            acc_list.append(acc_h)
        return (jnp.concatenate(new_m_list, axis=1),
                jnp.concatenate(new_l_list, axis=1),
                jnp.concatenate(acc_list, axis=1))

    m0 = jnp.full((tile, n_heads), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tile, n_heads), jnp.float32)
    acc0 = jnp.zeros((tile, n_heads * head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(t0, t1, body, (m0, l0, acc0))

    # normalize per head
    outs = []
    for h in range(n_heads):
        a = acc[:, h * head_dim:(h + 1) * head_dim]
        outs.append(a / jnp.maximum(l[:, h:h + 1], 1e-20))
    res = jnp.concatenate(outs, axis=1)
    pad_cols = o_ref.shape[1] - res.shape[1]
    if pad_cols:
        res = jnp.concatenate(
            [res, jnp.zeros((res.shape[0], pad_cols), res.dtype)], axis=1
        )
    o_ref[...] = res.astype(o_ref.dtype)


def flash_window_attention_sorted(
    q: jax.Array, k: jax.Array, v: jax.Array,  # [Np, h, d] sorted by window
    wid: jax.Array,                            # [Np] int32 dense window rank
    seg_start: jax.Array, seg_end: jax.Array,  # [Np] window run bounds
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Attention over a window-sorted sequence; Np must be a tile multiple."""
    np_, h, d = q.shape
    n_tiles = np_ // tile
    hd = h * d
    hd_pad = -(-hd // 128) * 128  # lane-align for Mosaic memref slices

    def flat(x):
        x = x.reshape(np_, hd)
        if hd_pad != hd:
            x = jnp.pad(x, ((0, 0), (0, hd_pad - hd)))
        return x

    qf, kf, vf = flat(q), flat(k), flat(v)
    widc = jnp.pad(wid.reshape(np_, 1), ((0, 0), (0, 127)))  # lane-align
    # per query tile: key range = [seg_start(first row), seg_end(last row))
    firsts = seg_start[:: tile][:n_tiles]
    lasts = seg_end[tile - 1:: tile]
    if lasts.shape[0] < n_tiles:
        lasts = jnp.concatenate([lasts, seg_end[-1:]])
    kmin = firsts.astype(jnp.int32)
    kmax = jnp.maximum(lasts.astype(jnp.int32), kmin + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, hd_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # q tile
            pl.BlockSpec(memory_space=pl.ANY),     # k full
            pl.BlockSpec(memory_space=pl.ANY),     # v full
            pl.BlockSpec(memory_space=pl.ANY),     # wid full
            pl.BlockSpec((tile, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # query wid tile
        ],
        out_specs=pl.BlockSpec((tile, hd_pad), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, hd_pad), q.dtype),   # k tile
            pltpu.VMEM((tile, hd_pad), q.dtype),   # v tile
            pltpu.VMEM((tile, 128), jnp.int32),    # wid tile
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, n_heads=h, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((np_, hd_pad), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kmin, kmax, qf, kf, vf, widc, widc)
    return out[:, :hd].reshape(np_, h, d)


def window_bounds_from_sorted(whi_s, wlo_s):
    """seg_start/seg_end (first index / one-past-last of each row's window
    run) for a key-sorted sequence."""
    n = whi_s.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    new = jnp.concatenate(
        [jnp.ones((1,), bool),
         (whi_s[1:] != whi_s[:-1]) | (wlo_s[1:] != wlo_s[:-1])]
    )
    # seg_start: forward cummax of (new ? idx : 0)
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(new, idx, 0))
    # seg_end: backward: one past the last index of the run
    last = jnp.concatenate([new[1:], jnp.ones((1,), bool)])
    end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(last, idx + 1, n), reverse=True
    )
    return start, end


def sparse_window_attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array,  # [V, h, d]
    xyz: jax.Array, valid: jax.Array, window_size,
    tile: int = 128, interpret: bool = False,
) -> jax.Array:
    """Drop-in (no-RPE) counterpart of ``wattn.sparse_window_attention``:
    sort by window, run the flash kernel with exact per-tile ranges, unsort."""
    from u2mkd_tpu.ops import wattn

    vcap = q.shape[0]
    whi, wlo = wattn.window_keys(xyz, valid, window_size, shift=False)
    order = jax.lax.sort(
        (whi, wlo, jnp.arange(vcap, dtype=jnp.int32)), num_keys=2,
        is_stable=True,
    )[2]
    qs, ks, vs = q[order], k[order], v[order]
    whi_s, wlo_s = whi[order], wlo[order]
    pad_to = -(-vcap // tile) * tile
    padn = pad_to - vcap

    def pad(x, fill=0):
        return jnp.pad(x, [(0, padn)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    seg_start, seg_end = window_bounds_from_sorted(whi_s, wlo_s)
    # dense window rank for equality tests (padding gets a unique id)
    new = jnp.concatenate(
        [jnp.ones((1,), bool),
         (whi_s[1:] != whi_s[:-1]) | (wlo_s[1:] != wlo_s[:-1])]
    )
    rank = jnp.cumsum(new.astype(jnp.int32)) - 1
    rank_p = jnp.pad(rank, (0, padn), constant_values=-7)
    out_s = flash_window_attention_sorted(
        pad(qs), pad(ks), pad(vs), rank_p,
        pad(seg_start), pad(seg_end, fill=pad_to),
        tile=tile, interpret=interpret,
    )[:vcap]
    out = jnp.zeros_like(out_s).at[order].set(out_s)
    return jnp.where(valid[:, None, None], out, 0.0)
