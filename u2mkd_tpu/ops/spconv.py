"""Sparse 3D convolution: cached rulebooks + gather-GEMM accumulation.

TPU-native replacement for torchsparse ``spnn.Conv3d`` (gather-GEMM-scatter
with ``cmaps``/``kmaps`` kernel-map caching; reference call sites
``core/models/build_blocks.py:25-77``). Three variants cover everything the
reference models use:

  * stride-1 ks=3 (and ks=1): output coords == input coords ("submanifold"
    style in torchsparse v1.4); rulebook = 27 neighbor-row lookups, conv =
    27 x (gather + [V,Cin]@[Cin,Cout] MXU matmul) accumulated.
  * ks=2 stride=2 downsample: output = unique(floor(c/2s)*2s); each output
    gathers from <=8 finer rows.
  * ks=2 stride=2 transposed (decoder): output coords are the *cached
    encoder-level coords* (torchsparse reuses forward kmaps — decoder
    correctness depends on this, see SURVEY §7 hard-part 1); each fine voxel
    receives from exactly its parent coarse voxel with the weight slice
    selected by its intra-parent offset.

All per-sample; callers vmap over batch. Weights are [K, Cin, Cout].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from u2mkd_tpu.core.structures import VoxelGrid, LevelContext
from u2mkd_tpu.ops import hashing


@functools.lru_cache(maxsize=None)
def kernel_offsets(ks: int) -> np.ndarray:
    """Integer kernel offsets [K, 3] for kernel size ks.

    ks=3 -> {-1,0,1}^3 (27), ks=2 -> {0,1}^3 (8, (0,0,0) first), ks=1 -> {0}.
    Order is z-fastest, matching :func:`voxelize.kernel_offsets_2`.
    """
    if ks == 1:
        rng = [0]
    elif ks == 2:
        rng = [0, 1]
    elif ks == 3:
        rng = [-1, 0, 1]
    else:
        raise NotImplementedError(f"kernel size {ks}")
    offs = [(dx, dy, dz) for dz in rng for dy in rng for dx in rng]
    # put (0,0,0) first for cache-friendliness of the self term
    offs.sort(key=lambda o: (o != (0, 0, 0)))
    return np.asarray(offs, np.int32)


def build_nbr(grid: VoxelGrid, ks: int) -> jax.Array:
    """Neighbor rulebook [K, V]: row of each kernel-offset neighbor, -1 absent.

    Offsets are scaled by the grid stride (torchsparse
    ``get_kernel_offsets(ks, stride)`` semantics).
    """
    offs = jnp.asarray(kernel_offsets(ks) * grid.stride)  # [K, 3]
    qc = grid.coords[None, :, :] + offs[:, None, :]  # [K, V, 3]
    qvalid = jnp.broadcast_to(grid.mask[None, :], qc.shape[:2])
    return hashing.lookup_coords(qc, qvalid, grid.key_hi, grid.key_lo)  # [K, V]


def gather_rows(feats: jax.Array, rows: jax.Array) -> jax.Array:
    """feats[rows] with -1/-out-of-range rows producing zero rows.

    Both drop conventions zero out: -1 sentinels (the in-jit rulebook
    builders) AND rows >= len(feats) (the ``capacity``-as-drop-index
    convention of unique_keys/segment ops) — a clip-only guard would leak
    the LAST row's features into absent-neighbor slots."""
    safe = jnp.clip(rows, 0, feats.shape[0] - 1)
    g = feats[safe]
    ok = (rows >= 0) & (rows < feats.shape[0])
    return jnp.where(ok[..., None], g, 0)


def sparse_conv(feats: jax.Array, nbr: jax.Array, weight: jax.Array,
                strategy: str = "auto") -> jax.Array:
    """Apply a sparse conv given a rulebook.

    feats:  [Vin, Cin]
    nbr:    [K, Vout] rows into feats (-1 = absent)
    weight: [K, Cin, Cout]
    Returns [Vout, Cout].

    strategy:
      'concat': gather all K neighbors into one [Vout, K*Cin] buffer and do a
        single MXU matmul against [K*Cin, Cout] — best utilization (the K*Cin
        contraction is 128-aligned-ish), transient memory K*Cin per row.
      'scan': K sequential gather+matmul steps — minimal peak memory.
      'auto': concat when the transient is <= ~64MB, else scan.
    """

    from u2mkd_tpu.ops.precision import cast_compute

    k, cin, cout = weight.shape
    vout = nbr.shape[1]
    if strategy == "auto":
        transient = vout * k * cin * 2  # bf16 bytes
        strategy = "concat" if transient <= 64 * 1024 * 1024 else "scan"

    if strategy == "concat":
        g = gather_rows(feats, nbr)                  # [K, Vout, Cin]
        g = jnp.moveaxis(g, 0, 1).reshape(vout, k * cin)
        w = weight.reshape(k * cin, cout)
        g, w = cast_compute(g, w)
        return jnp.dot(g, w, preferred_element_type=jnp.float32).astype(
            feats.dtype
        )

    def body(acc, inputs):
        nbr_k, w_k = inputs
        g = gather_rows(feats, nbr_k)  # [Vout, Cin]
        g, w_k = cast_compute(g, w_k)
        return acc + jnp.dot(g, w_k, preferred_element_type=acc.dtype), None

    # Checkpoint the body when the stacked residual would be large: scan's AD
    # saves every iteration's gathered rows as one [K, Vout, Cin] tensor
    # (648MB bf16 at V=131072, Cin=96 — the top allocation in the
    # full-capacity HBM OOM, PERF.md round 3); recomputing the gather in the
    # backward sweep is one cheap HBM-speed row lookup per step. Below the
    # threshold the residual is harmless and the recompute is pure overhead.
    if vout * k * cin * 2 > 256 * 1024 * 1024:  # bf16 bytes
        body = jax.checkpoint(body)

    acc0 = jnp.zeros((vout, weight.shape[-1]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (nbr, weight))
    return acc.astype(feats.dtype)


def sparse_conv_transposed_2x2(
    feats: jax.Array,      # [Vcoarse, Cin]
    up_parent: jax.Array,  # [Vfine] row in coarse level (-1 invalid)
    up_koff: jax.Array,    # [Vfine] kernel-offset index in [0, 8)
    weight: jax.Array,     # [8, Cin, Cout]
) -> jax.Array:
    """Transposed ks=2/s=2 conv onto the cached finer-level coords.

    Each fine voxel receives exactly one term: W[koff] applied to its parent's
    features (the transpose of the downsample kernel map).
    """
    from u2mkd_tpu.ops.precision import cast_compute, compute_dtype

    g = gather_rows(feats, up_parent)  # [Vfine, Cin]
    onehot = jax.nn.one_hot(up_koff, weight.shape[0], dtype=compute_dtype())
    g, w = cast_compute(g, weight)
    # y[v] = sum_k onehot[v,k] * (g[v] @ W[k]) — XLA contracts as 8 matmuls
    return jnp.einsum("vc,vk,kcd->vd", g, onehot, w,
                      preferred_element_type=jnp.float32).astype(feats.dtype)


def downsample_grid(grid: VoxelGrid, capacity: int) -> Tuple[VoxelGrid, jax.Array, jax.Array]:
    """Build the 2x-coarser grid from ``grid``.

    Output coords = unique(floor(c / 2s) * 2s) over active voxels — exactly
    the active set torchsparse's ks=2/s=2 conv produces.

    Returns (coarse_grid, child2parent [V] row of each fine voxel's parent,
    child_koff [V] intra-parent offset index in [0,8)).
    """
    s2 = grid.stride * 2
    parent_coords = (grid.coords // s2) * s2  # jnp // floors toward -inf
    hi, lo = hashing.pack_coords(parent_coords, grid.mask)
    uhi, ulo, inverse, counts, num = hashing.unique_keys(hi, lo, capacity)
    vcoords = hashing.unpack_coords(uhi, ulo)
    vmask = uhi != hashing.INVALID_KEY
    vcoords = jnp.where(vmask[:, None], vcoords, 0)
    coarse = VoxelGrid(
        coords=vcoords, mask=vmask, key_hi=uhi, key_lo=ulo, num=num, stride=s2
    )
    child2parent = jnp.where(inverse < capacity, inverse, -1)
    delta = (grid.coords - parent_coords) // grid.stride  # in {0,1}^3
    # koff must match kernel_offsets(2) ordering: (0,0,0) first, then z-fastest
    offs = kernel_offsets(2)  # [8,3] numpy
    # build index: koff = position of delta in offs
    lut = np.zeros((2, 2, 2), np.int32)
    for k, (dx, dy, dz) in enumerate(offs):
        lut[dx, dy, dz] = k
    lut_flat = jnp.asarray(lut.reshape(-1))
    d = jnp.clip(delta, 0, 1)
    child_koff = lut_flat[d[:, 0] * 4 + d[:, 1] * 2 + d[:, 2]]
    return coarse, child2parent, child_koff


def build_down_nbr8(coarse: VoxelGrid, fine: VoxelGrid) -> jax.Array:
    """Rulebook [8, Vcoarse] of finer-level rows feeding each coarse voxel
    through the ks=2/s=2 downsample conv."""
    offs = jnp.asarray(kernel_offsets(2) * fine.stride)  # [8, 3]
    qc = coarse.coords[None, :, :] + offs[:, None, :]  # [8, Vc, 3]
    qvalid = jnp.broadcast_to(coarse.mask[None, :], qc.shape[:2])
    return hashing.lookup_coords(qc, qvalid, fine.key_hi, fine.key_lo)


def build_levels(grid0: VoxelGrid, capacities: Tuple[int, ...]) -> Tuple[LevelContext, ...]:
    """Build the full U-Net level plumbing: grids, 27-rulebooks, down/up maps.

    capacities[i] is the voxel capacity of level i (level 0 = grid0's own).
    Built once per forward pass and shared by every conv at each level —
    the analogue of torchsparse cmaps/kmaps caching.
    """
    levels = []
    nbr27 = build_nbr(grid0, 3)
    levels.append(dict(grid=grid0, nbr27=nbr27))
    fine = grid0
    for li in range(1, len(capacities)):
        coarse, child2parent, child_koff = downsample_grid(fine, capacities[li])
        levels[-1]["up_parent_next"] = child2parent  # fine voxel -> coarse row
        levels[-1]["up_koff_next"] = child_koff
        levels.append(
            dict(
                grid=coarse,
                nbr27=build_nbr(coarse, 3),
                down_nbr8=build_down_nbr8(coarse, fine),
            )
        )
        fine = coarse
    out = []
    for li, lv in enumerate(levels):
        out.append(
            LevelContext(
                grid=lv["grid"],
                nbr27=lv["nbr27"],
                down_nbr8=lv.get("down_nbr8"),
                up_parent=lv.get("up_parent_next"),
                up_koff=lv.get("up_koff_next"),
            )
        )
    return tuple(out)
