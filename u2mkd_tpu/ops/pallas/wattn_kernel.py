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
# v3: contextual-RPE flash window attention with a custom-VJP backward.
#
# Replaces the remaining sptr CUDA surface end to end (reference
# ``sptr/functional.py``: dot_prod_with_idx_all fwd+bwd at
# ``relative_pos_encoding_cuda_kernel.cu:4-113``, CSR softmax,
# attention_step2_with_rel_pos_value fwd+bwd at ``:151-274`` and
# ``attention_cuda_kernel.cu:29-75``) for BOTH SphereFormer branches:
#
#   * difference axes (cubic xyz; sphere theta/beta): bin = q_i - q_j + G - 1.
#     The per-pair table lookups are restructured as per-element shifted table
#     projections (computed in XLA, O(N)) contracted against small one-hots —
#     every score term rides the MXU.
#   * radial axis (sphere r): bin = exponential_split(r_i - r_j) is computed
#     per pair in-kernel (VPU log/compare) and applied through a shared
#     [T, Lr, T] one-hot mask (lookup / mass helpers below).
#
# Layout: per head, Q/K rows are packed into one zero-padded SEGMENT so the
# whole score is ONE aligned full-segment matmul:
#     qseg = [ q | qsh | oh_q | qr | 0  | pad0 ]
#     kseg = [ k | oh_k | ksh | 0  | kr | pad0 ]
#     dot(qseg, kseg) = q.k + qsh.oh_k + oh_q.ksh   (radial cols orthogonal)
# and the value side
#     vseg = [ v | oh_k | 0 | pad0 ]    ->  p @ vseg = [ out | bin-mass | 0 ]
#     gseg = [do | edo  | edor | pad0 ] ->  g @ vseg = dp  (backward)
# The V-table epilogue and all table gradients are pair-free XLA einsums over
# the per-element bin masses (the "shifted-mass" trick mirrors the forward
# shifted projections).
#
# The kernel is two-pass (pass 1: online max/logsumexp with tiny [T, h]
# carries; pass 2: normalized accumulation straight into the output refs) —
# no wide loop-carried accumulators, which were the v2 kernel's 2x overhead.
# Backward = two more kernels with the same structure: grid over query tiles
# (dq + query-side masses) and grid over key tiles (dk, dv + key-side
# masses); window runs are contiguous in the sorted order, so the per-tile
# dynamic [kmin, kmax) ranges are symmetric between the two.
# ---------------------------------------------------------------------------

import math
from typing import NamedTuple, Optional

import numpy as onp

from u2mkd_tpu.ops import wattn as _wattn


class FlashRPEConfig(NamedTuple):
    """Static (hashable) kernel configuration."""

    tile: int
    h: int
    d: int
    g: int        # quant grid length G
    l2: int       # table rows (2G-1 cubic, 2G sphere)
    n_diff: int   # difference axes: 3 (cubic) or 2 (sphere)
    radial: bool
    lr: int       # radial bins (2G) or 0
    a: float
    interpret: bool = False

    @property
    def wd(self):
        return self.n_diff * self.g

    @property
    def sk(self):  # q/k segment width
        return _pad128(self.d + 2 * self.wd + 2 * self.lr)

    @property
    def sv(self):  # v / grad segment width
        return _pad128(self.d + self.wd + self.lr)


def _pad128(w: int) -> int:
    return max(128, -(-w // 128) * 128)


# Scoped-VMEM budget for one kernel instance. The bwd_k grid is the widest
# (3 f32 outputs + double-buffered streams + accumulator carries); its
# footprint scales with T * H * (sk + sv). Empirical anchor: the Mosaic
# compiler reports 17.64 MiB at (T=128, H=8, sk=256, sv=128) against a
# 16 MiB limit (v5e VMEM) — full-capacity 131k training fails to compile at
# level 4 without shrinking the per-call footprint there. Heads are fully
# independent in attention, so the backward calls split H into groups at the
# XLA call site (``_bwd_head_groups``) instead of narrowing the query tile:
# a narrower tile slows EVERY kernel in the branch (~25% end-to-end at tile
# 64, PERF.md round 3), while a head split only re-streams the 128-lane aux
# columns on the rare wide-head deep levels.
_VMEM_BUDGET = 15 << 20
_VMEM_BYTES_PER_UNIT = 45


def _bwd_head_groups(cfg: "FlashRPEConfig") -> int:
    """Largest head-group size whose widest backward grid (bwd_k) fits the
    scoped-VMEM budget at ``cfg.tile``."""
    g = cfg.h
    while g > 1 and (_VMEM_BYTES_PER_UNIT * cfg.tile * g
                     * (cfg.sk + cfg.sv) > _VMEM_BUDGET):
        g = -(-g // 2)
    return g


def branch_tile(h: int, d: int, g: int, radial: bool,
                max_tile: int = 128) -> int:
    """Largest query-tile size whose widest kernel (bwd_k, at the smallest
    head-group size of 1) fits in scoped VMEM for one attention branch.
    Host wgeom (``data/wgeom_host.py``) and the kernel wrappers both derive
    the tile from this so the per-tile [kmin, kmax) ranges always match.
    With the backward head-group split this stays at ``max_tile`` for every
    supported branch width; the clamp remains as the contract's backstop."""
    n_diff = 2 if radial else 3
    lr = 2 * g if radial else 0
    wd = n_diff * g
    sk = _pad128(d + 2 * wd + 2 * lr)
    sv = _pad128(d + wd + lr)
    t = max_tile
    while t > 32 and _VMEM_BYTES_PER_UNIT * t * (sk + sv) > _VMEM_BUDGET:
        t //= 2
    return t


def _exp_split_bins(rel, a, lr):
    """exponential_split bin, clipped — mirrors
    ``wattn.exponential_split_index`` (reference ``spherical_transformer.py:
    39-64``); inlined so the kernel body has no cross-module closure."""
    rel_abs = jnp.abs(rel)
    flag = (rel >= 0).astype(rel.dtype)
    idx = 2.0 * jnp.floor(jnp.log((rel_abs + 2 * a) / a) / math.log(2.0)) - 2.0
    idx = idx + (
        (3.0 * jnp.exp2(jnp.floor(idx / 2.0)) - 2.0) * a <= rel_abs
    ).astype(rel.dtype)
    idx = idx * (2.0 * flag - 1.0) + (flag - 1.0)
    return jnp.clip(idx.astype(jnp.int32) + 24, 0, lr - 1)


# -- in-kernel radial helpers (shared [Tq, Lr, Tk] one-hot) -----------------

def _radial_oh(bins, lr):
    li = jax.lax.broadcasted_iota(jnp.int32, (1, lr, 1), 1)
    return bins[:, None, :] == li                      # [Tq, Lr, Tk] bool


def _lkq(oh3, tab_q):
    """z[i, j] = tab_q[i, bins[i, j]];  tab_q [Tq, Lr] f32."""
    return jnp.sum(jnp.where(oh3, tab_q[:, :, None], 0.0), axis=1)


def _lkk(oh3, tab_k):
    """z[i, j] = tab_k[j, bins[i, j]];  tab_k [Tk, Lr] f32."""
    return jnp.sum(jnp.where(oh3, tab_k.T[None, :, :], 0.0), axis=1)


def _massq(oh3, w):
    """m[i, l] = sum_j w[i, j] 1{bins[i,j]=l}  -> [Tq, Lr]."""
    return jnp.sum(jnp.where(oh3, w[:, None, :], 0.0), axis=2)


def _massk(oh3, w):
    """m[j, l] = sum_i w[i, j] 1{bins[i,j]=l}  -> [Tk, Lr]."""
    return jnp.sum(jnp.where(oh3, w[:, None, :], 0.0), axis=0).T


def _dot_nt(a, b):
    """a [M, C] @ b[N, C]^T -> [M, N] f32 (no transpose materialized)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nn(a, b):
    """a [M, K] @ b [K, N] -> [M, N] f32."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tn(a, b):
    """a [K, M]^T @ b [K, N] -> [M, N] f32 (contract leading dims)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# -- forward kernel ----------------------------------------------------------

def _fwd_kernel(kmin_ref, kmax_ref,
                qcat_ref, auxq_ref,
                kcat_hbm, vcat_hbm, auxk_hbm,
                ov_ref, mr_ref, lse_ref,
                kcat_s, vcat_s, auxk_s, sems,
                *, cfg: FlashRPEConfig):
    T, H, d = cfg.tile, cfg.h, cfg.d
    wd, lr, sk, sv = cfg.wd, cfg.lr, cfg.sk, cfg.sv
    t = pl.program_id(0)
    t0 = kmin_ref[t] // T
    t1 = (kmax_ref[t] - 1) // T + 1

    qcat = qcat_ref[...]
    auxq = auxq_ref[...]
    rank_q = auxq[:, 0:1]
    r_q = auxq[:, 1]

    def cps(kt, slot, with_v):
        out = [
            pltpu.make_async_copy(kcat_hbm.at[pl.ds(kt * T, T), :],
                                  kcat_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(auxk_hbm.at[pl.ds(kt * T, T), :],
                                  auxk_s.at[slot], sems.at[slot, 1]),
        ]
        if with_v:
            out.append(pltpu.make_async_copy(vcat_hbm.at[pl.ds(kt * T, T), :],
                                             vcat_s.at[slot], sems.at[slot, 2]))
        return out

    def scores(hh, kcat_blk, oh3):
        s = _dot_nt(qcat[:, hh * sk:(hh + 1) * sk],
                    kcat_blk[:, hh * sk:(hh + 1) * sk])
        if cfg.radial:
            o_q = d + 2 * wd
            o_k = d + 2 * wd + lr
            qr = qcat[:, hh * sk + o_q:hh * sk + o_q + lr].astype(jnp.float32)
            kr = kcat_blk[:, hh * sk + o_k:hh * sk + o_k + lr].astype(jnp.float32)
            s = s + _lkq(oh3, qr) + _lkk(oh3, kr)
        return s

    def radial_oh(auxk_blk):
        if not cfg.radial:
            return None
        bins = _exp_split_bins(r_q[:, None] - auxk_blk[:, 1][None, :],
                               cfg.a, lr)
        return _radial_oh(bins, lr)

    # pass 1: online max / logsumexp
    for cp in cps(t0, 0, False):
        cp.start()

    def body1(kt, carry):
        m, l = carry
        slot = jax.lax.rem(kt - t0, 2)

        @pl.when(kt + 1 < t1)
        def _():
            for cp in cps(kt + 1, 1 - slot, False):
                cp.start()

        for cp in cps(kt, slot, False):
            cp.wait()
        kcat_blk = kcat_s[slot]
        auxk_blk = auxk_s[slot]
        same = rank_q == auxk_blk[:, 0:1].T
        oh3 = radial_oh(auxk_blk)
        ms, ls = [], []
        for hh in range(H):
            s = jnp.where(same, scores(hh, kcat_blk, oh3), NEG_INF)
            m_h = m[:, hh:hh + 1]
            m_new = jnp.maximum(m_h, jnp.max(s, axis=1, keepdims=True))
            l_new = l[:, hh:hh + 1] * jnp.exp(m_h - m_new) + jnp.sum(
                jnp.exp(s - m_new), axis=1, keepdims=True)
            ms.append(m_new)
            ls.append(l_new)
        return jnp.concatenate(ms, 1), jnp.concatenate(ls, 1)

    m0 = jnp.full((T, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((T, H), jnp.float32)
    m, l = jax.lax.fori_loop(t0, t1, body1, (m0, l0))
    lse = m + jnp.log(jnp.maximum(l, 1e-30))           # [T, H]

    # pass 2: normalized accumulation in wide-concat carries (one final
    # write; per-head ref read-modify-writes inside the loop do not pipeline)
    lse_ref[...] = jnp.concatenate(
        [lse, jnp.zeros((T, 128 - H), jnp.float32)], axis=1
    ).astype(lse_ref.dtype)

    for cp in cps(t0, 0, True):
        cp.start()

    def body2(kt, carry):
        acc_ov, acc_mr = carry
        slot = jax.lax.rem(kt - t0, 2)

        @pl.when(kt + 1 < t1)
        def _():
            for cp in cps(kt + 1, 1 - slot, True):
                cp.start()

        for cp in cps(kt, slot, True):
            cp.wait()
        kcat_blk = kcat_s[slot]
        vcat_blk = vcat_s[slot]
        auxk_blk = auxk_s[slot]
        same = rank_q == auxk_blk[:, 0:1].T
        oh3 = radial_oh(auxk_blk)
        ovs, mrs = [], []
        for hh in range(H):
            s = scores(hh, kcat_blk, oh3)
            p = jnp.where(same, jnp.exp(s - lse[:, hh:hh + 1]), 0.0)
            av = _dot_nn(p.astype(vcat_blk.dtype),
                         vcat_blk[:, hh * sv:(hh + 1) * sv])
            ovs.append(av)
            if cfg.radial:
                m_r = _massq(oh3, p)
                mrs.append(jnp.pad(m_r, ((0, 0), (0, 128 - lr)))
                           if lr < 128 else m_r)
        acc_ov = acc_ov + jnp.concatenate(ovs, axis=1)
        if cfg.radial:
            acc_mr = acc_mr + jnp.concatenate(mrs, axis=1)
        return acc_ov, acc_mr

    ov0 = jnp.zeros((T, H * sv), jnp.float32)
    mr0 = jnp.zeros((T, H * 128), jnp.float32)
    ov, mr = jax.lax.fori_loop(t0, t1, body2, (ov0, mr0))
    ov_ref[...] = ov.astype(ov_ref.dtype)
    mr_ref[...] = mr.astype(mr_ref.dtype)


# -- backward kernels --------------------------------------------------------

def _bwd_q_kernel(kmin_ref, kmax_ref,
                  qcat_ref, gcat_ref, auxq_ref, aux2q_ref,
                  kcat_hbm, vcat_hbm, auxk_hbm,
                  dqk_ref, mqr_ref,
                  kcat_s, vcat_s, auxk_s, sems,
                  *, cfg: FlashRPEConfig):
    """Grid over query tiles: dq (raw + diff masses) and radial ds-masses."""
    T, H, d = cfg.tile, cfg.h, cfg.d
    wd, lr, sk, sv = cfg.wd, cfg.lr, cfg.sk, cfg.sv
    t = pl.program_id(0)
    t0 = kmin_ref[t] // T
    t1 = (kmax_ref[t] - 1) // T + 1

    qcat = qcat_ref[...]
    gcat = gcat_ref[...]
    auxq = auxq_ref[...]
    aux2 = aux2q_ref[...]
    rank_q = auxq[:, 0:1]
    r_q = auxq[:, 1]
    lse = aux2[:, 0:H]
    dfac = aux2[:, 32:32 + H]

    def cps(kt, slot):
        return [
            pltpu.make_async_copy(kcat_hbm.at[pl.ds(kt * T, T), :],
                                  kcat_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(vcat_hbm.at[pl.ds(kt * T, T), :],
                                  vcat_s.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(auxk_hbm.at[pl.ds(kt * T, T), :],
                                  auxk_s.at[slot], sems.at[slot, 2]),
        ]

    dqk_ref[...] = jnp.zeros_like(dqk_ref)
    mqr_ref[...] = jnp.zeros_like(mqr_ref)

    for cp in cps(t0, 0):
        cp.start()

    def body(kt, _):
        slot = jax.lax.rem(kt - t0, 2)

        @pl.when(kt + 1 < t1)
        def _():
            for cp in cps(kt + 1, 1 - slot):
                cp.start()

        for cp in cps(kt, slot):
            cp.wait()
        kcat_blk = kcat_s[slot]
        vcat_blk = vcat_s[slot]
        auxk_blk = auxk_s[slot]
        same = rank_q == auxk_blk[:, 0:1].T
        oh3 = None
        if cfg.radial:
            bins = _exp_split_bins(r_q[:, None] - auxk_blk[:, 1][None, :],
                                   cfg.a, lr)
            oh3 = _radial_oh(bins, lr)
        for hh in range(H):
            s = _dot_nt(qcat[:, hh * sk:(hh + 1) * sk],
                        kcat_blk[:, hh * sk:(hh + 1) * sk])
            if cfg.radial:
                o_q = d + 2 * wd
                o_k = d + 2 * wd + lr
                qr = qcat[:, hh * sk + o_q:hh * sk + o_q + lr].astype(jnp.float32)
                kr = kcat_blk[:, hh * sk + o_k:hh * sk + o_k + lr].astype(jnp.float32)
                s = s + _lkq(oh3, qr) + _lkk(oh3, kr)
            p = jnp.where(same, jnp.exp(s - lse[:, hh:hh + 1]), 0.0)
            dp = _dot_nt(gcat[:, hh * sv:(hh + 1) * sv],
                         vcat_blk[:, hh * sv:(hh + 1) * sv])
            if cfg.radial:
                o_e = d + wd
                edor = gcat[:, hh * sv + o_e:hh * sv + o_e + lr].astype(jnp.float32)
                dp = dp + _lkq(oh3, edor)
            ds = p * (dp - dfac[:, hh:hh + 1])
            dsc = ds.astype(kcat_blk.dtype)
            dqk = _dot_nn(dsc, kcat_blk[:, hh * sk:(hh + 1) * sk])
            dqk_ref[:, hh * sk:(hh + 1) * sk] = (
                dqk_ref[:, hh * sk:(hh + 1) * sk] + dqk.astype(dqk_ref.dtype))
            if cfg.radial:
                mqr_ref[:, hh * 128:hh * 128 + lr] = (
                    mqr_ref[:, hh * 128:hh * 128 + lr]
                    + _massq(oh3, ds).astype(mqr_ref.dtype))
        return 0

    jax.lax.fori_loop(t0, t1, body, 0)


def _bwd_k_kernel(kmin_ref, kmax_ref,
                  kcat_ref, vcat_ref, auxk_ref,
                  qcat_hbm, gcat_hbm, auxq_hbm, aux2q_hbm,
                  dkq_ref, dv_ref, mkr_ref,
                  qcat_s, gcat_s, auxq_s, aux2q_s, sems,
                  *, cfg: FlashRPEConfig):
    """Grid over key tiles: dk (raw + diff masses), dv, radial ds-masses.

    Window runs are contiguous in the sorted order, so key tile t's partner
    queries span the same [kmin[t], kmax[t]) range used by the forward."""
    T, H, d = cfg.tile, cfg.h, cfg.d
    wd, lr, sk, sv = cfg.wd, cfg.lr, cfg.sk, cfg.sv
    t = pl.program_id(0)
    t0 = kmin_ref[t] // T
    t1 = (kmax_ref[t] - 1) // T + 1

    kcat = kcat_ref[...]
    vcat = vcat_ref[...]
    auxk = auxk_ref[...]
    rank_k = auxk[:, 0:1]
    r_k = auxk[:, 1]

    def cps(qt, slot):
        return [
            pltpu.make_async_copy(qcat_hbm.at[pl.ds(qt * T, T), :],
                                  qcat_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(gcat_hbm.at[pl.ds(qt * T, T), :],
                                  gcat_s.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(auxq_hbm.at[pl.ds(qt * T, T), :],
                                  auxq_s.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(aux2q_hbm.at[pl.ds(qt * T, T), :],
                                  aux2q_s.at[slot], sems.at[slot, 3]),
        ]

    dkq_ref[...] = jnp.zeros_like(dkq_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)
    mkr_ref[...] = jnp.zeros_like(mkr_ref)

    for cp in cps(t0, 0):
        cp.start()

    def body(qt, _):
        slot = jax.lax.rem(qt - t0, 2)

        @pl.when(qt + 1 < t1)
        def _():
            for cp in cps(qt + 1, 1 - slot):
                cp.start()

        for cp in cps(qt, slot):
            cp.wait()
        qcat_blk = qcat_s[slot]
        gcat_blk = gcat_s[slot]
        auxq_blk = auxq_s[slot]
        aux2_blk = aux2q_s[slot]
        same = auxq_blk[:, 0:1] == rank_k.T            # [Tq, Tk]
        lse = aux2_blk[:, 0:H]
        dfac = aux2_blk[:, 32:32 + H]
        oh3 = None
        if cfg.radial:
            bins = _exp_split_bins(auxq_blk[:, 1][:, None] - r_k[None, :],
                                   cfg.a, lr)
            oh3 = _radial_oh(bins, lr)
        for hh in range(H):
            s = _dot_nt(qcat_blk[:, hh * sk:(hh + 1) * sk],
                        kcat[:, hh * sk:(hh + 1) * sk])
            if cfg.radial:
                o_q = d + 2 * wd
                o_k = d + 2 * wd + lr
                qr = qcat_blk[:, hh * sk + o_q:hh * sk + o_q + lr].astype(jnp.float32)
                kr = kcat[:, hh * sk + o_k:hh * sk + o_k + lr].astype(jnp.float32)
                s = s + _lkq(oh3, qr) + _lkk(oh3, kr)
            p = jnp.where(same, jnp.exp(s - lse[:, hh:hh + 1]), 0.0)
            dp = _dot_nt(gcat_blk[:, hh * sv:(hh + 1) * sv],
                         vcat[:, hh * sv:(hh + 1) * sv])
            if cfg.radial:
                o_e = d + wd
                edor = gcat_blk[:, hh * sv + o_e:hh * sv + o_e + lr].astype(jnp.float32)
                dp = dp + _lkq(oh3, edor)
            ds = p * (dp - dfac[:, hh:hh + 1])
            pc = p.astype(gcat_blk.dtype)
            dsc = ds.astype(qcat_blk.dtype)
            dv = _dot_tn(pc, gcat_blk[:, hh * sv:(hh + 1) * sv])
            dv_ref[:, hh * sv:(hh + 1) * sv] = (
                dv_ref[:, hh * sv:(hh + 1) * sv] + dv.astype(dv_ref.dtype))
            dkq = _dot_tn(dsc, qcat_blk[:, hh * sk:(hh + 1) * sk])
            dkq_ref[:, hh * sk:(hh + 1) * sk] = (
                dkq_ref[:, hh * sk:(hh + 1) * sk] + dkq.astype(dkq_ref.dtype))
            if cfg.radial:
                mkr_ref[:, hh * 128:hh * 128 + lr] = (
                    mkr_ref[:, hh * 128:hh * 128 + lr]
                    + _massk(oh3, ds).astype(mkr_ref.dtype))
        return 0

    jax.lax.fori_loop(t0, t1, body, 0)


# -- XLA-side builders --------------------------------------------------------

def _window_take(y, u, out_len, max_u):
    """y[..., u : u + out_len] with a PER-ROW offset u (int, broadcastable to
    y.shape[:-1]), via bit-decomposed conditional rolls.

    Per-element gathers (take_along_axis) serialize on TPU — they were 10x
    the kernel's own cost. A dynamic window slice with bounded offset is
    instead log2(max_u) lane rotations + selects, fully vectorized.
    Requires 0 <= u <= max_u and u + out_len <= y.shape[-1] pointwise."""
    for j in range(int(max_u).bit_length()):
        bit = ((u >> j) & 1).astype(bool)
        y = jnp.where(bit[..., None], jnp.roll(y, -(1 << j), axis=-1), y)
    return y[..., :out_len]


def _proj_shift(x, table, quant, cfg, side):
    """Per-element shifted table projections, gather-free.

    x [N, h, d]; table [L2, 3, h, d] (first n_diff slots used);
    side='q': qsh[i,a,h,g] = x_i . T[q_i - g + G - 1]  (reversed window)
    side='k': ksh[i,a,h,g] = x_i . T[g - q_i + G - 1]
    Both are contiguous length-G windows of the per-element projection row
    xt[i,a,h,:] at an offset determined by the (clipped) quant coordinate.
    Returns [N, h, A*G] (head-major, axis-then-g inner)."""
    n = x.shape[0]
    g, l2 = cfg.g, cfg.l2
    xt = jnp.einsum("ihd,lahd->iahl", x, table[:, :cfg.n_diff])  # [N,A,h,L2]
    qc = jnp.clip(quant[:, :cfg.n_diff], 0, g - 1)[:, :, None]   # [N,A,1]
    if side == "q":
        sh = _window_take(xt[..., ::-1], (l2 - g) - qc, g, l2 - g)
    else:
        sh = _window_take(xt, (g - 1) - qc, g, g - 1)
    return jnp.moveaxis(sh, 1, 2).reshape(n, cfg.h, cfg.wd)


def _onehot_diff(quant, cfg, dtype):
    oh = jax.nn.one_hot(
        jnp.clip(quant[:, :cfg.n_diff], 0, cfg.g - 1), cfg.g, dtype=dtype
    )
    return oh.reshape(quant.shape[0], cfg.wd)                     # [N, wd]


def _build_cats(qs, ks, vs, tq, tk, tv, quant, cfg, *, want_v=True):
    """Build the zero-padded per-head segment arrays (see module comment)."""
    from u2mkd_tpu.ops.precision import cast_compute

    n = qs.shape[0]
    d, wd, lr, sk, sv = cfg.d, cfg.wd, cfg.lr, cfg.sk, cfg.sv
    dt = cast_compute(qs).dtype
    qs, ks, vs = cast_compute(qs, ks, vs)
    qsh = _proj_shift(qs, cast_compute(tq), quant, cfg, "q")
    ksh = _proj_shift(ks, cast_compute(tk), quant, cfg, "k")
    ohd = _onehot_diff(quant, cfg, dt)
    ohd_h = jnp.broadcast_to(ohd[:, None], (n, cfg.h, wd))

    # Segment layout [d | wd | wd | lr | lr | pad->sk] built with ONE
    # concatenate (+ trailing zero pad). The previous .at[:, :, o:o+w].set
    # composition lowered each segment to a full-buffer pad+DUS at ~5 GB/s
    # — 13.4 ms/step across the 4 levels (round-5 xplane profile).
    def seg(parts, width):
        have = sum(p.shape[-1] for p in parts)
        if have < width:
            parts = parts + [jnp.zeros((n, cfg.h, width - have), dt)]
        return jnp.concatenate([p.astype(dt) for p in parts], axis=-1)

    zlr = jnp.zeros((n, cfg.h, lr), dt) if cfg.radial else None
    if cfg.radial:
        qr = jnp.einsum("ihd,lhd->ihl", qs,
                        cast_compute(tq[:, cfg.n_diff]))          # [N,h,lr]
        kr = jnp.einsum("ihd,lhd->ihl", ks,
                        cast_compute(tk[:, cfg.n_diff]))
        qcat = seg([qs, qsh, ohd_h, qr, zlr], sk)
        kcat = seg([ks, ohd_h, ksh, zlr, kr], sk)
    else:
        qcat = seg([qs, qsh, ohd_h], sk)
        kcat = seg([ks, ohd_h, ksh], sk)
    vcat = None
    if want_v:
        vcat = seg([vs, ohd_h], sv)
    return (qcat.reshape(n, cfg.h * sk), kcat.reshape(n, cfg.h * sk),
            None if vcat is None else vcat.reshape(n, cfg.h * sv))


def _build_gcat(do, tv, quant, cfg, dt):
    """Gradient-side segment [do | edo | edor | 0]: edo/edor are the do-side
    V-table projections (mirror of qsh/qr)."""
    n = do.shape[0]
    d, wd, lr, sv = cfg.d, cfg.wd, cfg.lr, cfg.sv
    edo = _proj_shift(do, tv.astype(do.dtype), quant, cfg, "q")   # [N,h,wd]
    parts = [do.astype(dt), edo.astype(dt)]
    if cfg.radial:
        edor = jnp.einsum("ihd,lhd->ihl", do,
                          tv[:, cfg.n_diff].astype(do.dtype))
        parts.append(edor.astype(dt))
    have = sum(p.shape[-1] for p in parts)
    if have < sv:
        parts.append(jnp.zeros((n, cfg.h, sv - have), dt))
    gcat = jnp.concatenate(parts, axis=-1)
    return gcat.reshape(n, cfg.h * sv)


def _mass_pad(mass, cfg):
    """Zero-pad the G axis by G on both sides: out-of-range shift reads land
    in the padding and contribute 0, matching the one-hot semantics."""
    return jnp.pad(mass, [(0, 0)] * (mass.ndim - 1) + [(cfg.g, cfg.g)])


def _shifted_mass_q(mass, quant, cfg):
    """w[i,h,a,l] = mass[i,h,a, q_i^a - l + G - 1] (0 out of range).

    mass [N, h, A, G] -> [N, h, A, L2]. Used for the V-table forward
    epilogue and for every q-side table gradient (the 'shifted-mass' trick:
    exactly the transpose of the forward shifted projections). Gather-free:
    a reversed window of the zero-padded mass row at offset G - q."""
    qc = jnp.clip(quant[:, :cfg.n_diff], 0, cfg.g - 1)[:, None, :]  # [N,1,A]
    y = _mass_pad(mass, cfg)[..., ::-1]
    return _window_take(y, cfg.g - qc, cfg.l2, cfg.g)


def _shifted_mass_k(mass, quant, cfg):
    """w[j,h,a,l] = mass[j,h,a, l + q_j^a - (G - 1)] (0 out of range):
    forward window of the zero-padded mass row at offset q + 1."""
    qc = jnp.clip(quant[:, :cfg.n_diff], 0, cfg.g - 1)[:, None, :]
    return _window_take(_mass_pad(mass, cfg), qc + 1, cfg.l2, cfg.g)


def _grid_ranges(seg_start, seg_end, tile, pad_to):
    n_tiles = pad_to // tile
    firsts = seg_start[::tile][:n_tiles]
    lasts = seg_end[tile - 1::tile][:n_tiles]
    kmin = firsts.astype(jnp.int32)
    kmax = jnp.maximum(lasts.astype(jnp.int32), kmin + 1)
    return kmin, kmax


# -- pallas_call wrappers ----------------------------------------------------

def _call_fwd(cfg, qcat, kcat, vcat, aux, kmin, kmax):
    n = qcat.shape[0]
    T, H = cfg.tile, cfg.h
    sk, sv = cfg.sk, cfg.sv
    dt = qcat.dtype

    def blk(width):
        return pl.BlockSpec((T, width), lambda t, *_: (t, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // T,),
        in_specs=[
            blk(H * sk),                       # qcat
            blk(128),                          # auxq
            pl.BlockSpec(memory_space=pl.ANY),  # kcat
            pl.BlockSpec(memory_space=pl.ANY),  # vcat
            pl.BlockSpec(memory_space=pl.ANY),  # auxk
        ],
        out_specs=(blk(H * sv), blk(H * 128), blk(128)),
        scratch_shapes=[
            pltpu.VMEM((2, T, H * sk), dt),
            pltpu.VMEM((2, T, H * sv), dt),
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((n, H * sv), jnp.float32),   # out | massd
            jax.ShapeDtypeStruct((n, H * 128), jnp.float32),  # radial mass
            jax.ShapeDtypeStruct((n, 128), jnp.float32),      # lse
        ),
        grid_spec=grid_spec,
        interpret=cfg.interpret,
    )(kmin, kmax, qcat, aux, kcat, vcat, aux)


def _call_bwd_q(cfg, qcat, kcat, vcat, gcat, aux, aux2, kmin, kmax):
    n = qcat.shape[0]
    T, H = cfg.tile, cfg.h
    sk, sv = cfg.sk, cfg.sv
    dt = qcat.dtype

    def blk(width):
        return pl.BlockSpec((T, width), lambda t, *_: (t, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // T,),
        in_specs=[
            blk(H * sk), blk(H * sv), blk(128), blk(128),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(blk(H * sk), blk(H * 128)),
        scratch_shapes=[
            pltpu.VMEM((2, T, H * sk), dt),
            pltpu.VMEM((2, T, H * sv), dt),
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_q_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((n, H * sk), jnp.float32),   # ds@kseg
            jax.ShapeDtypeStruct((n, H * 128), jnp.float32),  # radial ds-mass
        ),
        grid_spec=grid_spec,
        interpret=cfg.interpret,
    )(kmin, kmax, qcat, gcat, aux, aux2, kcat, vcat, aux)


def _call_bwd_k(cfg, qcat, kcat, vcat, gcat, aux, aux2, kmin, kmax):
    n = qcat.shape[0]
    T, H = cfg.tile, cfg.h
    sk, sv = cfg.sk, cfg.sv
    dt = qcat.dtype

    def blk(width):
        return pl.BlockSpec((T, width), lambda t, *_: (t, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // T,),
        in_specs=[
            blk(H * sk), blk(H * sv), blk(128),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(blk(H * sk), blk(H * sv), blk(H * 128)),
        scratch_shapes=[
            pltpu.VMEM((2, T, H * sk), dt),
            pltpu.VMEM((2, T, H * sv), dt),
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.VMEM((2, T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_k_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((n, H * sk), jnp.float32),   # ds^T@qseg
            jax.ShapeDtypeStruct((n, H * sv), jnp.float32),   # p^T@gseg (dv)
            jax.ShapeDtypeStruct((n, H * 128), jnp.float32),  # radial mass
        ),
        grid_spec=grid_spec,
        interpret=cfg.interpret,
    )(kmin, kmax, kcat, vcat, aux, qcat, gcat, aux, aux2)


def _split_heads(call, cfg, qcat, kcat, vcat, gcat, aux, aux2, kmin, kmax):
    """Run a backward pallas_call wrapper in scoped-VMEM-safe head groups.

    Heads are independent: the concatenated per-head column blocks of
    qcat/kcat ([N, H*sk]) and vcat/gcat ([N, H*sv]) are sliced per group,
    the per-head lse/dfac lanes of aux2 are repacked to group-local offsets,
    and the group outputs are concatenated back — bit-identical to the
    single-call result."""
    hg = _bwd_head_groups(cfg)
    if hg >= cfg.h:
        return call(cfg, qcat, kcat, vcat, gcat, aux, aux2, kmin, kmax)
    sk, sv = cfg.sk, cfg.sv
    outs = []
    for g0 in range(0, cfg.h, hg):
        h = min(hg, cfg.h - g0)
        cfg_g = cfg._replace(h=h)
        aux2_g = jnp.zeros_like(aux2)
        aux2_g = aux2_g.at[:, 0:h].set(aux2[:, g0:g0 + h])
        aux2_g = aux2_g.at[:, 32:32 + h].set(aux2[:, 32 + g0:32 + g0 + h])
        outs.append(call(
            cfg_g,
            qcat[:, g0 * sk:(g0 + h) * sk],
            kcat[:, g0 * sk:(g0 + h) * sk],
            vcat[:, g0 * sv:(g0 + h) * sv],
            gcat[:, g0 * sv:(g0 + h) * sv],
            aux, aux2_g, kmin, kmax,
        ))
    return tuple(jnp.concatenate(parts, axis=1) for parts in zip(*outs))


# -- custom VJP ---------------------------------------------------------------

def _f0(x):
    """float0 cotangent for integer primals."""
    return onp.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_rpe_sorted(cfg, qs, ks, vs, tq, tk, tv, quant, aux, kmin, kmax):
    """Window attention with contextual RPE over a window-sorted, padded
    sequence. Returns f32 [N, h, d]."""
    out, _ = _flash_rpe_fwd(cfg, qs, ks, vs, tq, tk, tv, quant, aux,
                            kmin, kmax)
    return out


def _flash_rpe_fwd(cfg, qs, ks, vs, tq, tk, tv, quant, aux, kmin, kmax):
    n = qs.shape[0]
    qcat, kcat, vcat = _build_cats(qs, ks, vs, tq, tk, tv, quant, cfg)
    ov, mr, lse = _call_fwd(cfg, qcat, kcat, vcat, aux, kmin, kmax)
    ovh = ov.reshape(n, cfg.h, cfg.sv)
    out = ovh[:, :, :cfg.d]
    massd = ovh[:, :, cfg.d:cfg.d + cfg.wd].reshape(
        n, cfg.h, cfg.n_diff, cfg.g)
    # pair-free V-table epilogue (attention_step2_with_rel_pos_value parity)
    wv = _shifted_mass_q(massd, quant, cfg)
    out = out + jnp.einsum(
        "ihal,lahd->ihd", wv, _f32(tv[:, :cfg.n_diff]))
    massr = None
    if cfg.radial:
        massr = mr.reshape(n, cfg.h, 128)[:, :, :cfg.lr]
        out = out + jnp.einsum(
            "ihl,lhd->ihd", massr, _f32(tv[:, cfg.n_diff]))
    res = (qs, ks, vs, tq, tk, tv, quant, aux, kmin, kmax,
           qcat, kcat, vcat, lse, massd, massr, out)
    return out, res


def _f32(x):
    return x.astype(jnp.float32)


def _flash_rpe_bwd(cfg, res, g):
    (qs, ks, vs, tq, tk, tv, quant, aux, kmin, kmax,
     qcat, kcat, vcat, lse, massd, massr, out) = res
    n, h, d = qs.shape[0], cfg.h, cfg.d
    a_r = cfg.n_diff   # radial table slot
    do = g.astype(jnp.float32)
    dfac = jnp.sum(do * out, axis=-1)                  # [N, h]
    aux2 = jnp.zeros((n, 128), jnp.float32)
    aux2 = aux2.at[:, 0:h].set(lse[:, 0:h])
    aux2 = aux2.at[:, 32:32 + h].set(dfac)
    gcat = _build_gcat(do, _f32(tv), quant, cfg, qcat.dtype)

    dqk, mqr = _split_heads(_call_bwd_q, cfg, qcat, kcat, vcat, gcat,
                            aux, aux2, kmin, kmax)
    dkq, dvv, mkr = _split_heads(_call_bwd_k, cfg, qcat, kcat, vcat, gcat,
                                 aux, aux2, kmin, kmax)

    qsf, ksf = _f32(qs), _f32(ks)
    dqk = dqk.reshape(n, h, cfg.sk)
    dq = dqk[:, :, :d]
    sdmq = dqk[:, :, d:d + cfg.wd].reshape(n, h, cfg.n_diff, cfg.g)
    wq = _shifted_mass_q(sdmq, quant, cfg)
    dq = dq + jnp.einsum("ihal,lahd->ihd", wq, _f32(tq[:, :cfg.n_diff]))
    dtq = jnp.zeros(tq.shape, jnp.float32)
    dtq = dtq.at[:, :cfg.n_diff].set(
        jnp.einsum("ihd,ihal->lahd", qsf, wq))

    dkq = dkq.reshape(n, h, cfg.sk)
    dk = dkq[:, :, :d]
    sdmk = dkq[:, :, d + cfg.wd:d + 2 * cfg.wd].reshape(
        n, h, cfg.n_diff, cfg.g)
    wk = _shifted_mass_k(sdmk, quant, cfg)
    dk = dk + jnp.einsum("jhal,lahd->jhd", wk, _f32(tk[:, :cfg.n_diff]))
    dtk = jnp.zeros(tk.shape, jnp.float32)
    dtk = dtk.at[:, :cfg.n_diff].set(
        jnp.einsum("jhd,jhal->lahd", ksf, wk))

    dv = dvv.reshape(n, h, cfg.sv)[:, :, :d]

    wv = _shifted_mass_q(massd, quant, cfg)
    dtv = jnp.zeros(tv.shape, jnp.float32)
    dtv = dtv.at[:, :cfg.n_diff].set(
        jnp.einsum("ihd,ihal->lahd", do, wv))

    if cfg.radial:
        sdmqr = mqr.reshape(n, h, 128)[:, :, :cfg.lr]
        sdmkr = mkr.reshape(n, h, 128)[:, :, :cfg.lr]
        dq = dq + jnp.einsum("ihl,lhd->ihd", sdmqr, _f32(tq[:, a_r]))
        dk = dk + jnp.einsum("jhl,lhd->jhd", sdmkr, _f32(tk[:, a_r]))
        dtq = dtq.at[:, a_r].set(jnp.einsum("ihd,ihl->lhd", qsf, sdmqr))
        dtk = dtk.at[:, a_r].set(jnp.einsum("jhd,jhl->lhd", ksf, sdmkr))
        dtv = dtv.at[:, a_r].set(jnp.einsum("ihd,ihl->lhd", do, massr))

    return (dq.astype(qs.dtype), dk.astype(ks.dtype), dv.astype(vs.dtype),
            dtq.astype(tq.dtype), dtk.astype(tk.dtype), dtv.astype(tv.dtype),
            _f0(quant), jnp.zeros_like(aux), _f0(kmin), _f0(kmax))


def _flash_rpe_fwd_rule(cfg, *args):
    return _flash_rpe_fwd(cfg, *args)


_flash_rpe_sorted.defvjp(_flash_rpe_fwd_rule, _flash_rpe_bwd)


# -- public wrappers ----------------------------------------------------------

def _sorted_setup(whi, wlo, valid, tile):
    """Sort by window key; dead rows (invalid or pad) get one unique window
    each so their dynamic key ranges stay minimal. Returns
    (order, rank_f32 [pad_to], kmin, kmax, pad_to)."""
    from u2mkd_tpu.ops import hashing

    vcap = whi.shape[0]
    order = jax.lax.sort(
        (whi, wlo, jnp.arange(vcap, dtype=jnp.int32)), num_keys=2,
        is_stable=True,
    )[2]
    whi_s, wlo_s = whi[order], wlo[order]
    valid_s = valid[order]
    pad_to = -(-vcap // tile) * tile
    padn = pad_to - vcap
    rows = jnp.arange(pad_to, dtype=jnp.uint32)
    live = jnp.pad(valid_s, (0, padn), constant_values=False)
    whi_p = jnp.where(live, jnp.pad(whi_s, (0, padn)), hashing.INVALID_KEY)
    wlo_p = jnp.where(live, jnp.pad(wlo_s, (0, padn)), rows)
    seg_start, seg_end = window_bounds_from_sorted(whi_p, wlo_p)
    new = jnp.concatenate(
        [jnp.ones((1,), bool),
         (whi_p[1:] != whi_p[:-1]) | (wlo_p[1:] != wlo_p[:-1])]
    )
    rank = (jnp.cumsum(new.astype(jnp.int32)) - 1).astype(jnp.float32)
    kmin, kmax = _grid_ranges(seg_start, seg_end, tile, pad_to)
    return order, rank, kmin, kmax, pad_to


def _flash_from_keys(q, k, v, whi, wlo, valid, rpe, tile, interpret):
    if interpret is None:  # auto: compiled on TPU, interpreted elsewhere
        interpret = jax.default_backend() != "tpu"
    vcap, h, d = q.shape
    radial = rpe.r is not None
    g = int(rpe.grid_len)
    tile = min(tile, branch_tile(h, d, g, radial))  # scoped-VMEM clamp
    cfg = FlashRPEConfig(
        tile=tile, h=h, d=d, g=g, l2=int(rpe.table_q.shape[0]),
        n_diff=2 if radial else 3, radial=radial,
        lr=2 * g if radial else 0, a=float(rpe.a), interpret=interpret,
    )
    order, rank, kmin, kmax, pad_to = _sorted_setup(whi, wlo, valid, tile)
    padn = pad_to - vcap

    def pz(x):
        return jnp.pad(x, [(0, padn)] + [(0, 0)] * (x.ndim - 1))

    qs, ks, vs = pz(q[order]), pz(k[order]), pz(v[order])
    quant_s = pz(rpe.quant[order])
    aux = jnp.zeros((pad_to, 128), jnp.float32).at[:, 0].set(rank)
    if radial:
        aux = aux.at[:, 1].set(pz(rpe.r[order]).astype(jnp.float32))
    out_s = _flash_rpe_sorted(cfg, qs, ks, vs, rpe.table_q, rpe.table_k,
                              rpe.table_v, quant_s, aux, kmin, kmax)
    out = out_s[:vcap]
    res = jnp.zeros_like(out).at[order].set(out)
    return jnp.where(valid[:, None, None], res, 0.0).astype(q.dtype)


def sparse_window_attention_flash(
    q, k, v, xyz, valid, window_size, shift: bool = False,
    rpe=None, tile: int = 128, interpret: Optional[bool] = None,
):
    """Drop-in flash counterpart of ``wattn.sparse_window_attention`` with
    contextual RPE (both branches), exact at any window occupancy and
    trainable end to end (custom VJP). Per-sample [V, h, d] inputs."""
    assert rpe is not None, "use sparse_window_attention_pallas for no-RPE"
    whi, wlo = _wattn.window_keys(xyz, valid, window_size, shift)
    return _flash_from_keys(q, k, v, whi, wlo, valid, rpe, tile, interpret)


def flash_pregeom_batched(
    q, k, v,            # [B, V, h, d]
    valid,              # [B, V] bool
    geom,               # core.structures.WindowGeom (host-precomputed)
    table_q, table_k, table_v,
    grid_len: int, a: float = 0.0125,
    tile: int = 128, interpret: Optional[bool] = None,
):
    """Flash window attention over HOST-precomputed geometry.

    Functionally identical to ``sparse_window_attention_flash_batched`` but
    with every sort / segment scan / quantization moved off-device (see
    ``data/wgeom_host.py``): the program is gather -> kernel -> gather.
    This is the round-3 fix for the in-context attention serialization
    (PERF.md round-2 investigation): the in-program sorts and index math
    around the custom calls were defeating XLA's async overlap.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, vcap, h, d = q.shape
    n = b * vcap
    radial = geom.r is not None
    g = int(grid_len)
    # the geometry defines the tile: its [kmin, kmax) ranges were laid out
    # on the host with the branch's scoped-VMEM-safe tile (branch_tile)
    pad_to = geom.rank.shape[0]
    tile = pad_to // geom.kmin.shape[0]
    cfg = FlashRPEConfig(
        tile=tile, h=h, d=d, g=g, l2=int(table_q.shape[0]),
        n_diff=2 if radial else 3, radial=radial,
        lr=2 * g if radial else 0, a=float(a), interpret=interpret,
    )
    assert geom.order.shape[0] == pad_to and pad_to % tile == 0

    def flat(x):
        return x.reshape((n,) + x.shape[2:])

    # order is host-padded to pad_to (pads point at row 0 but carry a unique
    # window rank, so they attend nothing live and are never read back)
    qs = flat(q)[geom.order]
    ks = flat(k)[geom.order]
    vs = flat(v)[geom.order]
    aux = jnp.zeros((pad_to, 128), jnp.float32).at[:, 0].set(geom.rank)
    if radial:
        aux = aux.at[:, 1].set(geom.r)
    out_s = _flash_rpe_sorted(cfg, qs, ks, vs, table_q, table_k, table_v,
                              geom.quant, aux, geom.kmin, geom.kmax)
    res = out_s[geom.inv]
    res = jnp.where(flat(valid)[:, None, None], res, 0.0).astype(q.dtype)
    return res.reshape(b, vcap, h, d)


def sparse_window_attention_flash_batched(
    q, k, v, xyz, valid, window_size, shift: bool = False,
    rpe=None, tile: int = 128, interpret: Optional[bool] = None,
):
    """Batched variant: [B, V, h, d]. The batch is flattened into one long
    window-sorted sequence (window keys made batch-unique) so the whole batch
    runs as ONE kernel launch — no vmap over pallas_call."""
    from u2mkd_tpu.ops import hashing

    assert rpe is not None
    b, vcap = q.shape[:2]
    assert b < 32768, "batch tag uses 15 bits of the window key"
    whi, wlo = jax.vmap(
        lambda x, m: _wattn.window_keys(x, m, window_size, shift)
    )(xyz, valid)
    boff = (jnp.arange(b, dtype=jnp.uint32) << 16)[:, None]
    whi = jnp.where(valid, whi + boff, hashing.INVALID_KEY)

    def flat(x):
        return x.reshape((b * vcap,) + x.shape[2:])

    rpe_flat = rpe._replace(
        quant=flat(rpe.quant),
        r=None if rpe.r is None else flat(rpe.r),
    )
    out = _flash_from_keys(flat(q), flat(k), flat(v), flat(whi), flat(wlo),
                           flat(valid), rpe_flat, tile, interpret)
    return out.reshape(b, vcap, *out.shape[1:])
