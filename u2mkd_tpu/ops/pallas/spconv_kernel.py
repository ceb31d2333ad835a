"""Pallas rulebook sparse-conv: banded one-hot gather-GEMM on the MXU.

Why this exists (round-5 profile, PERF.md): the XLA path's 27-offset
rulebook gathers run at ~8 GB/s on TPU (gather of short rows is
latency-bound) — 28.6 ms of a 66 ms teacher forward at P=8192, and the
corresponding scatter-adds dominate the backward. This kernel does the
gather ON the MXU instead: voxel rows are Morton-ordered by the host
(``data/plumbing_host.py``), so each output tile's neighbor rows cluster
into a handful of source tiles (measured p50=8, max=23 of 1024 at
V=131072); for each packed source tile the kernel builds a {0,1} selection
matrix from the rulebook indices and uses a [T,T]@[T,Cin] matmul as the
gather. Two MXU ops per (output-tile, source-tile, active-offset) replace
per-row latency-bound loads.

Backward structure (the reason no scatter ever appears): for the symmetric
ks=3 offset set each per-offset selection matrix ``P_k`` is a partial
permutation, and ``P_k^T`` equals ``P_{rev(k)}`` over the SAME rulebook
(reference semantics: torchsparse transposed kmaps,
``core/models/build_blocks.py:39-52``). So

    d/dX: grad_x = conv(grad_out, nbr, W2)   with W2[k] = W[rev(k)]^T
    d/dW: grad_w[k] = (P_k X)^T grad_out     from the fwd-saved gathered
                                             concat (the XLA path's own
                                             residual, emitted by the
                                             kernel as a side output)

Both are MXU matmuls; the backward reuses this very kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rev_perm_27() -> np.ndarray:
    """rev[k] = index of -offset[k] in the ks=3 offset ordering."""
    from u2mkd_tpu.ops.spconv import kernel_offsets

    offs = kernel_offsets(3)
    lut = {tuple(o): i for i, o in enumerate(offs)}
    return np.asarray([lut[tuple(-o)] for o in offs], np.int32)


def supported(cin: int, cout: int, k: int = 27, t: int = 128) -> bool:
    """Static predicate: does this conv fit the kernel's VMEM budget?
    (wflat + catbuf scratch + cat out block + x prefetch ring, bf16, with
    the lane-padded Cin the kernel actually allocates.)"""
    cinp = ((cin + 127) // 128) * 128
    wflat = k * cinp * cout * 2
    cat = t * k * cinp * 2          # catbuf scratch AND the cat out block
    xring = 4 * t * cinp * 2
    return (cin <= 192 and cout <= 256
            and (wflat + 2 * cat + xring) <= 6 * 1024 * 1024)


def _kernel(jl_ref, jn_ref, kr_ref, nbrt_ref, w_ref, x_ref,
            *out_and_scratch, T, K, CIN, NT, emit_cat, cdtype):
    if emit_cat:
        out_ref, cat_ref, xbuf, sem, catbuf = out_and_scratch
    else:
        out_ref, xbuf, sem, catbuf = out_and_scratch
        cat_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    # control arrays are flattened [B*NT(+pad), ...] and blocked in rows of
    # 8 (TPU block tiling floor); this program's row within its block:
    row = jax.lax.rem(b * NT + i, 8)
    n = jn_ref[row, 0]
    catbuf[...] = jnp.zeros(catbuf.shape, catbuf.dtype)

    def jt_of(jj):
        return jnp.minimum(jl_ref[row, jj], NT - 1)

    def start(slot, jj):
        pltpu.make_async_copy(
            x_ref.at[b, pl.ds(jt_of(jj) * T, T), :],
            xbuf.at[slot], sem.at[slot],
        ).start()

    # 4-deep prefetch ring: the source-tile DMAs are issued 3 iterations
    # ahead so their ~1-2 us latency hides under the selection matmuls
    # (double-buffering alone left the loop DMA-wait bound).
    SLOTS = 4
    for s in range(SLOTS - 1):
        @pl.when(s < n)
        def _(s=s):
            start(s, s)

    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)

    def body(jj, carry):
        slot = jax.lax.rem(jj, SLOTS)
        nxt = jj + SLOTS - 1

        @pl.when(nxt < n)
        def _():
            start(jax.lax.rem(nxt, SLOTS), nxt)

        pltpu.make_async_copy(
            x_ref.at[b, pl.ds(0, T), :], xbuf.at[slot], sem.at[slot]
        ).wait()
        xj = xbuf[slot]
        jt = jt_of(jj)
        base = jt * T
        for k in range(K):
            lo = kr_ref[row, k, 0]
            hi = kr_ref[row, k, 1]

            @pl.when((jt >= lo) & (jt < hi))
            def _(k=k):
                idx = nbrt_ref[0, :, k:k + 1]           # [T, 1] int32
                oh = (idx - base == col).astype(cdtype)  # [T, T] selection
                g = jax.lax.dot(oh, xj,
                                preferred_element_type=jnp.float32)
                catbuf[:, k * CIN:(k + 1) * CIN] += g.astype(cdtype)

        return carry

    jax.lax.fori_loop(0, n, body, 0, unroll=False)
    acc = jax.lax.dot(catbuf[...], w_ref[...],
                      preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)
    if emit_cat:
        cat_ref[0] = catbuf[...]


def _call(x, nbr_t, w, jl, jn, kr, T, emit_cat):
    """x [B,V,Cin], nbr_t [B,V,K], w [K, Cin, Cout], jl [B,NT,BM],
    jn [B,NT], kr [B,NT,K,2] -> out [B,V,Cout] (+ cat [B,V,K*CinP]).

    Cin is lane-padded to a multiple of 128 here (zero pad) so the
    kernel's banded x-tile DMAs are tile-aligned; the pad columns carry
    zeros through the selection matmul and meet zero weight rows."""
    B, V, CIN0 = x.shape
    K = nbr_t.shape[-1]
    COUT = w.shape[-1]
    CIN = CIN0
    if V > T and CIN0 % 128:
        # multi-tile: banded DMA slices must be lane-tile aligned
        CIN = ((CIN0 + 127) // 128) * 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, CIN - CIN0)))
        w = jnp.pad(w, ((0, 0), (0, CIN - CIN0), (0, 0)))
    wflat = w.reshape(K * CIN, COUT)
    NT = V // T
    BM = jl.shape[-1]
    cdtype = x.dtype
    # control arrays: flatten to [B*NT(+pad to 8), ...] so SMEM blocks of 8
    # rows satisfy the TPU block-tiling floor; the kernel picks its row via
    # rem(b*NT+i, 8)
    BN = B * NT
    pad = (-BN) % 8
    jl2 = jl.reshape(BN, BM)
    jn2 = jn.reshape(BN, 1)
    kr2 = kr.reshape(BN, K, 2)
    if pad:
        jl2 = jnp.pad(jl2, ((0, pad), (0, 0)))
        jn2 = jnp.pad(jn2, ((0, pad), (0, 0)))
        kr2 = jnp.pad(kr2, ((0, pad), (0, 0), (0, 0)))

    def cmap(b, i):
        return ((b * NT + i) // 8,)

    out_shape = [jax.ShapeDtypeStruct((B, V, COUT), x.dtype)]
    out_specs = [pl.BlockSpec((1, T, COUT), lambda b, i: (b, i, 0))]
    if emit_cat:
        out_shape.append(jax.ShapeDtypeStruct((B, V, K * CIN), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, T, K * CIN), lambda b, i: (b, i, 0)))
    kern = functools.partial(_kernel, T=T, K=K, CIN=CIN, NT=NT,
                             emit_cat=emit_cat, cdtype=cdtype)
    res = pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((8, BM), lambda b, i: (*cmap(b, i), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda b, i: (*cmap(b, i), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, K, 2), lambda b, i: (*cmap(b, i), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, K), lambda b, i: (b, i, 0)),
            pl.BlockSpec((K * CIN, COUT), lambda b, i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs if emit_cat else out_specs[0],
        out_shape=out_shape if emit_cat else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((4, T, CIN), cdtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((T, K * CIN), cdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(jl2, jn2, kr2, nbr_t, wflat, x)
    return res if emit_cat else (res, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def rulebook_conv(x, w, nbr_t, jl, jn, kr, T=128):
    """Banded-MXU sparse conv: out[b,v] = sum_k x[b, nbr_t[b,v,k]] @ w[k].

    x [B,V,Cin] (invalid rulebook entries — -1 or >=V — contribute zero,
    matching ``spconv.gather_rows``), w [K,Cin,Cout], nbr_t [B,V,K] (the
    LevelContext nbr27 transposed); jl/jn/kr from ``plumbing_host``
    (Morton-tiled source-tile lists/ranges).
    """
    out, _ = _call(x, nbr_t, w, jl, jn, kr, T, emit_cat=False)
    return out


# Above this many bytes the gathered-concat residual is recomputed in the
# backward instead of saved: at full capacity (V=131072, Cin=96) one conv's
# concat is ~900 MB bf16 — saving ~15 of them sank the whole-model compile
# (the same residual blow-up the XLA path's scan+checkpoint strategy
# handles, spconv.sparse_conv).
_CAT_SAVE_BYTES = 256 * 1024 * 1024


def _rc_fwd(x, w, nbr_t, jl, jn, kr, T):
    B, V, CIN0 = x.shape
    K = w.shape[0]
    cinp = ((CIN0 + 127) // 128) * 128 if (V > T and CIN0 % 128) else CIN0
    big = B * V * K * cinp * x.dtype.itemsize > _CAT_SAVE_BYTES
    if big:
        out = rulebook_conv(x, w, nbr_t, jl, jn, kr, T)
        return out, (None, x, w, nbr_t, jl, jn, kr)
    out, cat = _call(x, nbr_t, w, jl, jn, kr, T, emit_cat=True)
    return out, (cat, None, w, nbr_t, jl, jn, kr)


def _rc_bwd(T, res, g):
    cat, x_saved, w, nbr_t, jl, jn, kr = res
    K, CIN, COUT = w.shape
    if cat is None:  # recompute the gathered concat (one extra kernel pass)
        _, cat = _call(x_saved, nbr_t, w, jl, jn, kr, T, emit_cat=True)
    CINP = cat.shape[-1] // K  # lane-padded Cin of the saved concat
    # d/dW from the gathered concat (the fwd kernel's side output):
    # grad_w[k] = (P_k X)^T @ g
    gw = jnp.einsum(
        "bvm,bvd->md", cat, g, preferred_element_type=jnp.float32,
    ).reshape(K, CINP, COUT)[:, :CIN].astype(w.dtype)
    # d/dX through the transposed rulebook = the SAME kernel with the
    # reversed-offset, transposed weights (P_k^T == P_{rev(k)})
    rev = rev_perm_27() if K == 27 else np.arange(K)
    w2 = jnp.transpose(w[rev], (0, 2, 1)).astype(cat.dtype)  # [K,Cout,Cin]
    gxp, _ = _call(g.astype(cat.dtype), nbr_t, w2, jl, jn, kr, T,
                   emit_cat=False)
    return gxp.astype(cat.dtype), gw, None, None, None, None


rulebook_conv.defvjp(_rc_fwd, _rc_bwd)
