"""Point <-> voxel transfer ops: voxelize (segment-mean), devoxelize (trilinear).

TPU-native equivalents of torchsparse ``spvoxelize`` / ``spdevoxelize`` /
``calc_ti_weights`` as used by the reference's point-voxel stack
(``core/models/utils.py:15-135``):

  * ``initial_voxelize``   -> :func:`voxelize_initial`
  * ``point_to_voxel``     -> :func:`point_to_voxel_mean` (given a lookup idx)
  * ``voxel_to_point``     -> :func:`trilinear_devoxelize`

All functions are per-sample (callers vmap over batch) and static-shape:
points are ``[P, *]`` with a validity mask, voxel tables are fixed capacity
``[V, *]``. Scatter/segment ops use an extra "drop bucket" row at index V.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from u2mkd_tpu.ops import hashing


def segment_mean(feats: jax.Array, seg_ids: jax.Array, capacity: int,
                 counts: jax.Array | None = None) -> jax.Array:
    """Mean of ``feats`` rows grouped by ``seg_ids`` into ``capacity`` buckets.

    ``seg_ids`` must be in [0, capacity]; id == capacity is the drop bucket
    (invalid points). Equivalent to ``spvoxelize`` with ``spcount`` counts
    (reference ``core/models/utils.py:22-26``).
    """
    valid = seg_ids < capacity
    seg = jnp.where(valid, seg_ids, capacity)
    sums = (
        jnp.zeros((capacity + 1, feats.shape[-1]), feats.dtype)
        .at[seg]
        .add(jnp.where(valid[:, None], feats, 0), mode="drop")[:capacity]
    )
    if counts is None:
        counts = (
            jnp.zeros((capacity + 1,), jnp.int32)
            .at[seg]
            .add(valid.astype(jnp.int32), mode="drop")[:capacity]
        )
    return sums / jnp.maximum(counts, 1)[:, None].astype(feats.dtype)


def voxelize_initial(
    pcoords: jax.Array,  # [P, 3] float: point coords in *voxel units* (xyz/voxel_size)
    pfeats: jax.Array,   # [P, C] float
    pmask: jax.Array,    # [P] bool
    capacity: int,
):
    """Initial point-cloud voxelization (reference ``initial_voxelize``,
    ``core/models/utils.py:15-35``).

    floor the float coords, build the unique voxel table (sorted by packed
    key), and mean-pool features per voxel. The reference's
    ``round(spvoxelize(floor(coords)))`` equals the floored coords directly.

    Returns a dict with:
      vcoords [V,3] int32, vfeats [V,C], vmask [V] bool, key_hi/key_lo [V],
      p2v [P] int32 (== point's voxel row; capacity for invalid/overflow),
      counts [V] int32, num [] int32.
    """
    ic = jnp.floor(pcoords).astype(jnp.int32)
    hi, lo = hashing.pack_coords(ic, pmask)
    uhi, ulo, inverse, counts, num = hashing.unique_keys(hi, lo, capacity)
    vfeats = segment_mean(pfeats, inverse, capacity, counts)
    vcoords = hashing.unpack_coords(uhi, ulo)
    vmask = uhi != hashing.INVALID_KEY
    vcoords = jnp.where(vmask[:, None], vcoords, 0)
    return dict(
        vcoords=vcoords, vfeats=vfeats, vmask=vmask,
        key_hi=uhi, key_lo=ulo, p2v=inverse, counts=counts, num=num,
    )


def point_voxel_query(
    pcoords: jax.Array,  # [P, 3] float point coords (voxel units, stride-1 scale)
    pmask: jax.Array,
    stride: int,
    key_hi: jax.Array,   # [V] sorted voxel key table at this stride
    key_lo: jax.Array,
) -> jax.Array:
    """For each point, the row of its containing voxel at ``stride`` (-1 if none).

    Mirrors the hash build in ``point_to_voxel`` (reference
    ``core/models/utils.py:43-51``): floor(C/s)*s then lookup.
    """
    qc = (jnp.floor(pcoords / stride).astype(jnp.int32)) * stride
    qhi, qlo = hashing.pack_coords(qc, pmask)
    return hashing.lookup(qhi, qlo, key_hi, key_lo)


def point_to_voxel_mean(
    pfeats: jax.Array,   # [P, C]
    p2v: jax.Array,      # [P] int32 voxel row per point (-1 or capacity = drop)
    capacity: int,
) -> jax.Array:
    """Scatter-mean point features onto voxel rows (``point_to_voxel``,
    reference ``core/models/utils.py:40-65``)."""
    seg = jnp.where((p2v >= 0) & (p2v < capacity), p2v, capacity)
    return segment_mean(pfeats, seg, capacity)


import numpy as _np

# the 8 offsets of a size-2 kernel, (0,0,0) first (matches
# ``get_kernel_offsets(2, s, 1)`` ordering required by ``nearest=True`` in
# reference ``voxel_to_point``). Kept as numpy — caching a jnp array built
# inside a trace would leak a tracer.
_OFFSETS8_NP = _np.asarray(
    [(dx, dy, dz) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
    _np.int32,
)


def kernel_offsets_2() -> jax.Array:
    return jnp.asarray(_OFFSETS8_NP)


def trilinear_weights(pcoords: jax.Array, stride: int) -> jax.Array:
    """Per-point trilinear weights for the 8 kernel-offset neighbors.

    The raw-product stage of torchsparse ``calc_ti_weights(z.C, idx_query,
    scale=s)`` (reference ``core/models/utils.py:94``): with p = C/s,
    frac = p - floor(p), weight for offset (dx,dy,dz) = prod(frac if d==1
    else 1-frac). The caller zeroes missing neighbors and renormalizes over
    the present ones (calc_ti_weights ends with ``w /= w.sum(0) + 1e-8``).
    """
    p = pcoords / stride
    frac = p - jnp.floor(p)  # [P, 3]
    offs = kernel_offsets_2().astype(pcoords.dtype)  # [8, 3]
    w = jnp.where(offs[None, :, :] > 0, frac[:, None, :], 1.0 - frac[:, None, :])
    return jnp.prod(w, axis=-1)  # [P, 8]


def voxel_to_point_query(
    pcoords: jax.Array,  # [P, 3] float (stride-1 voxel units)
    pmask: jax.Array,
    stride: int,
    key_hi: jax.Array,
    key_lo: jax.Array,
    nearest: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """8-neighbor voxel rows + trilinear weights for devoxelization.

    Mirrors reference ``voxel_to_point`` query build
    (``core/models/utils.py:81-98``). Returns (idx8 [P,8] int32 with -1 for
    missing, w8 [P,8] float with zeros for missing). Weights are zeroed for
    missing neighbors then renormalized over the present ones
    (torchsparse ``calc_ti_weights`` ends with ``w /= w.sum(0) + 1e-8``).
    ``nearest`` zeroes the non-self entries AFTER that normalization with
    NO renorm — the reference applies it on calc_ti_weights' output
    (``utils.py:95-97``), so the self weight stays the normalized trilinear
    w0 <= 1, not 1.0.
    """
    base = jnp.floor(pcoords / stride).astype(jnp.int32) * stride
    offs = kernel_offsets_2() * stride  # [8, 3]
    qc = base[:, None, :] + offs[None, :, :]  # [P, 8, 3]
    qvalid = jnp.broadcast_to(pmask[:, None], qc.shape[:2])
    idx8 = hashing.lookup_coords(qc, qvalid, key_hi, key_lo)  # [P, 8]
    w8 = trilinear_weights(pcoords, stride).astype(jnp.float32)
    w8 = jnp.where(idx8 >= 0, w8, 0.0)
    w8 = w8 / (jnp.sum(w8, axis=-1, keepdims=True) + 1e-8)
    if nearest:
        w8 = w8.at[:, 1:].set(0.0)
        idx8 = idx8.at[:, 1:].set(-1)
    return idx8, w8


def trilinear_devoxelize(vfeats: jax.Array, idx8: jax.Array, w8: jax.Array) -> jax.Array:
    """Gather 8 neighbor voxel features and blend (``spdevoxelize``,
    reference ``core/models/utils.py:99``)."""
    safe = jnp.clip(idx8, 0, vfeats.shape[0] - 1)
    g = vfeats[safe]  # [P, 8, C]
    w = jnp.where(idx8 >= 0, w8, 0.0).astype(vfeats.dtype)
    return jnp.einsum("pkc,pk->pc", g, w)
