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

    # double-buffered DMA: prefetch tile (kt+1) while computing kt
    def copies(kt, slot):
        return (
            pltpu.make_async_copy(k_hbm.at[pl.ds(kt * tile, tile), :],
                                  k_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(kt * tile, tile), :],
                                  v_s.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(wid_hbm.at[pl.ds(kt * tile, tile), :],
                                  w_s.at[slot], sems.at[slot, 2]),
        )

    for cp in copies(t0, 0):
        cp.start()

    def body(kt, carry):
        m, l, acc = carry  # [tile, h], [tile, h], [tile, h*d]
        slot = jax.lax.rem(kt - t0, 2)
        nxt = 1 - slot

        @pl.when(kt + 1 < t1)
        def _():
            for cp in copies(kt + 1, nxt):
                cp.start()

        for cp in copies(kt, slot):
            cp.wait()
        k_blk = k_s[slot]
        v_blk = v_s[slot]
        kw = w_s[slot, :, :1]                      # [tile, 1]
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
            pltpu.VMEM((2, tile, hd_pad), q.dtype),   # k tiles (2 slots)
            pltpu.VMEM((2, tile, hd_pad), q.dtype),   # v tiles
            pltpu.VMEM((2, tile, 128), jnp.int32),    # wid tiles
            pltpu.SemaphoreType.DMA((2, 3)),
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


# ---------------------------------------------------------------------------
# v2: contextual RPE (difference axes) folded into the kernel.
#
# STATUS (round 1): numerically exact vs the XLA path (1e-7 interpret,
# 9e-4 TPU f32-vs-bf16) and compiles in ~12s, but runs ~7x slower than the
# XLA banded path at V=16k (54ms vs 7.3ms). Ablation: removing the bin-mass
# output + its carries halves it (27ms); the RPE dots/one-hots/extra DMAs
# account for the rest over the 3.8ms no-RPE base. Round-2 leads: bf16
# carries, double-buffered DMAs, emit bin-mass via a second cheap pass, or
# wider tiles to amortize the per-iteration VMEM traffic.
#
# Score terms: per head h, s += q_shift_h @ oh_k^T + oh_q @ k_shift_h^T where
# q_shift/k_shift are the per-row shifted table projections (computed once
# per element in XLA, O(N)) and oh_* are in-kernel one-hots of the quantized
# coordinates. The value term needs only the per-element bin-mass matrix
# m[i, h, ag] = sum_j p_ij 1{coord_j = ag}, emitted as a second output and
# contracted against the V-table outside (pair-free epilogue).
# Covers the cubic branch exactly (all 3 axes are difference-structured);
# the sphere branch additionally needs the radial exponential split
# (round-2, same pattern with a per-pair bin).
# ---------------------------------------------------------------------------


def _kernel_rpe(kmin_ref, kmax_ref,
                q_ref, qsh_ref, meta_q_ref,
                k_hbm, v_hbm, ksh_hbm, meta_hbm,
                o_ref, m_ref,
                k_s, v_s, ksh_s, meta_s, sems,
                *, tile: int, n_heads: int, head_dim: int,
                n_axes: int, grid_len: int):
    t = pl.program_id(0)
    kmin = kmin_ref[t]
    kmax = kmax_ref[t]
    t0 = kmin // tile
    t1 = (kmax - 1) // tile + 1
    ag = n_axes * grid_len

    q = q_ref[...]             # [tile, hd_pad]
    qsh = qsh_ref[...]         # [tile, S_pad]
    qw = meta_q_ref[:, :1]     # [tile, 1] window rank
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, grid_len), 1)

    def onehot_all(meta):
        cols = []
        for ax in range(n_axes):
            qv = meta[:, 1 + ax:2 + ax]  # [tile, 1]
            cols.append((g_iota == qv).astype(jnp.float32))
        return jnp.concatenate(cols, axis=1)  # [tile, n_axes*G]

    oh_q = onehot_all(meta_q_ref[...])

    def head(x, h, width):
        return x[:, h * width:(h + 1) * width]

    # query-side terms are loop-invariant: hoist
    cat_q = [
        jnp.concatenate([head(q, h, head_dim), head(qsh, h, ag), oh_q], axis=1)
        for h in range(n_heads)
    ]

    def body(kt, carry):
        m, l, acc, mm = carry  # tuples over heads
        cps = (
            pltpu.make_async_copy(k_hbm.at[pl.ds(kt * tile, tile), :], k_s,
                                  sems.at[0]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(kt * tile, tile), :], v_s,
                                  sems.at[1]),
            pltpu.make_async_copy(ksh_hbm.at[pl.ds(kt * tile, tile), :], ksh_s,
                                  sems.at[2]),
            pltpu.make_async_copy(meta_hbm.at[pl.ds(kt * tile, tile), :],
                                  meta_s, sems.at[3]),
        )
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        k_blk = k_s[...]
        v_blk = v_s[...]
        ksh_blk = ksh_s[...]
        meta_k = meta_s[...]
        oh_k = onehot_all(meta_k)                  # [tile, AG]
        same = qw == meta_k[:, :1].T               # [tile, tile]
        new_m, new_l, new_acc, new_mm = [], [], [], []
        for h in range(n_heads):
            cat_k = jnp.concatenate(
                [head(k_blk, h, head_dim), oh_k, head(ksh_blk, h, ag)], axis=1
            )
            s = jax.lax.dot_general(
                cat_q[h], cat_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(same, s, NEG_INF)
            m_new = jnp.maximum(m[h], jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            scale = jnp.exp(m[h] - m_new)
            l_new = l[h] * scale + jnp.sum(p, axis=1, keepdims=True)
            cat_v = jnp.concatenate([head(v_blk, h, head_dim), oh_k], axis=1)
            av = jax.lax.dot_general(
                p, cat_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_m.append(m_new)
            new_l.append(l_new)
            new_acc.append(acc[h] * scale + av[:, :head_dim])
            new_mm.append(mm[h] * scale + av[:, head_dim:])
        return tuple(new_m), tuple(new_l), tuple(new_acc), tuple(new_mm)

    m0 = tuple(jnp.full((tile, 1), NEG_INF, jnp.float32)
               for _ in range(n_heads))
    l0 = tuple(jnp.zeros((tile, 1), jnp.float32) for _ in range(n_heads))
    acc0 = tuple(jnp.zeros((tile, head_dim), jnp.float32)
                 for _ in range(n_heads))
    mm0 = tuple(jnp.zeros((tile, ag), jnp.float32) for _ in range(n_heads))
    m, l, acc, mm = jax.lax.fori_loop(t0, t1, body, (m0, l0, acc0, mm0))

    outs, mouts = [], []
    for h in range(n_heads):
        inv_l = 1.0 / jnp.maximum(l[h], 1e-20)
        outs.append(acc[h] * inv_l)
        mouts.append(mm[h] * inv_l)
    res = jnp.concatenate(outs, axis=1)
    mres = jnp.concatenate(mouts, axis=1)

    def pad_cols(x, ref):
        pad = ref.shape[1] - x.shape[1]
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1
            )
        return x.astype(ref.dtype)

    o_ref[...] = pad_cols(res, o_ref)
    m_ref[...] = pad_cols(mres, m_ref)


def sparse_window_attention_pallas_rpe(
    q, k, v, xyz, valid, window_size, rpe,
    tile: int = 128, interpret: bool = False,
):
    """RPE-folded Pallas attention (difference axes — the cubic branch).

    Matches ``wattn.sparse_window_attention(..., rpe=rpe)`` for rpe.r=None.
    """
    from u2mkd_tpu.ops import wattn

    assert rpe.r is None, "radial axis not yet folded into the kernel"
    vcap, h, d = q.shape
    g = rpe.grid_len
    n_axes = 3
    ag = n_axes * g
    whi, wlo = wattn.window_keys(xyz, valid, window_size, shift=False)
    order = jax.lax.sort(
        (whi, wlo, jnp.arange(vcap, dtype=jnp.int32)), num_keys=2,
        is_stable=True,
    )[2]
    qs, ks, vs = q[order], k[order], v[order]
    quant_s = rpe.quant[order]
    whi_s, wlo_s = whi[order], wlo[order]

    # per-element shifted table projections (O(N), fwd-only gathers)
    shift_idx = (quant_s[:, :, None] - jnp.arange(g)[None, None, :] + g - 1)
    q_tab = jnp.einsum("ihd,lahd->iahl", qs, rpe.table_q)  # [N, 3, h, L2]
    q_shift = jnp.take_along_axis(q_tab, shift_idx[:, :, None, :], axis=-1)
    # -> [N, 3, h, G]; k side uses the reversed shift
    shift_idx_k = (jnp.arange(g)[None, None, :] - quant_s[:, :, None] + g - 1)
    k_tab = jnp.einsum("ihd,lahd->iahl", ks, rpe.table_k)
    k_shift = jnp.take_along_axis(k_tab, shift_idx_k[:, :, None, :], axis=-1)

    def flat_sh(x):  # [N, 3, h, G] -> [N, h*3G] (h-major, axis-inner)
        return jnp.moveaxis(x, 1, 2).reshape(vcap, h * ag)

    s_cols = h * ag
    s_pad = -(-s_cols // 128) * 128
    hd = h * d
    hd_pad = -(-hd // 128) * 128
    pad_to = -(-vcap // tile) * tile
    padn = pad_to - vcap

    def padrows(x, fill=0):
        return jnp.pad(x, [(0, padn)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    def padlane(x, width):
        return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))

    qf = padrows(padlane(qs.reshape(vcap, hd), hd_pad))
    kf = padrows(padlane(ks.reshape(vcap, hd), hd_pad))
    vf = padrows(padlane(vs.reshape(vcap, hd), hd_pad))
    qshf = padrows(padlane(flat_sh(q_shift), s_pad))
    kshf = padrows(padlane(flat_sh(k_shift), s_pad))

    new = jnp.concatenate(
        [jnp.ones((1,), bool),
         (whi_s[1:] != whi_s[:-1]) | (wlo_s[1:] != wlo_s[:-1])]
    )
    rank = jnp.cumsum(new.astype(jnp.int32)) - 1
    meta = jnp.zeros((pad_to, 128), jnp.int32)
    meta = meta.at[:vcap, 0].set(rank)
    meta = meta.at[:vcap, 1:4].set(quant_s)
    if padn:
        meta = meta.at[vcap:, 0].set(-7)  # padding rows: unique window rank

    seg_start, seg_end = window_bounds_from_sorted(whi_s, wlo_s)
    n_tiles = pad_to // tile
    firsts = padrows(seg_start)[::tile][:n_tiles]
    lasts = padrows(seg_end, fill=pad_to)[tile - 1::tile][:n_tiles]
    kmin = firsts.astype(jnp.int32)
    kmax = jnp.maximum(lasts.astype(jnp.int32), kmin + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, hd_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # q tile
            pl.BlockSpec((tile, s_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # q_shift tile
            pl.BlockSpec((tile, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # meta (query) tile
            pl.BlockSpec(memory_space=pl.ANY),        # k full
            pl.BlockSpec(memory_space=pl.ANY),        # v full
            pl.BlockSpec(memory_space=pl.ANY),        # k_shift full
            pl.BlockSpec(memory_space=pl.ANY),        # meta full
        ],
        out_specs=(
            pl.BlockSpec((tile, hd_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, hd_pad), q.dtype),
            pltpu.VMEM((tile, hd_pad), q.dtype),
            pltpu.VMEM((tile, s_pad), q.dtype),
            pltpu.VMEM((tile, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, m_mass = pl.pallas_call(
        functools.partial(_kernel_rpe, tile=tile, n_heads=h, head_dim=d,
                          n_axes=n_axes, grid_len=g),
        out_shape=(
            jax.ShapeDtypeStruct((pad_to, hd_pad), q.dtype),
            jax.ShapeDtypeStruct((pad_to, s_pad), q.dtype),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kmin, kmax, qf, qshf, meta, kf, vf, kshf, meta)
    out = out[:vcap, :hd].reshape(vcap, h, d)
    m_mass = m_mass[:vcap, :s_cols].reshape(vcap, h, n_axes, g)

    # pair-free V-RPE epilogue: out += sum_ax sum_g m[i,h,ax,g] *
    # Tv[q_i_ax - g + G - 1, ax, h, :]
    tv_shift = rpe.table_v.transpose(1, 0, 2, 3)[  # [3, L2, h, d]
        jnp.arange(n_axes)[None, :, None], shift_idx
    ]  # [N, 3, G, h, d]
    out = out + jnp.einsum("ihag,iaghd->ihd", m_mass, tv_shift)

    res = jnp.zeros_like(out).at[order].set(out)
    return jnp.where(valid[:, None, None], res, 0.0)
