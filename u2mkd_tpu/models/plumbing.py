"""Per-forward index plumbing for point-voxel U-Nets.

Builds, once per step, everything the reference computes lazily and caches on
its tensors (torchsparse ``cmaps``/``kmaps``, ``PointTensor.additional_features``
idx_query/counts per stride, ``idx_query``/``weights`` per stride for
devoxelize — reference ``core/models/utils.py:15-118``):

  * the 5 U-Net voxel grids (stride 1..16) with their conv rulebooks,
  * point->voxel row maps per level (``point_to_voxel``),
  * 8-neighbor trilinear queries per level (``voxel_to_point``),
  * level0-voxel -> level-L row maps and per-level mean metric xyz
    (the ``zz`` PointTensor trick in ``spvcnn_spformer.py:136-147``).

Everything is index/int math — no gradients — and fully batched via vmap.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from typing import Optional

from u2mkd_tpu.core.structures import LevelContext, VoxelGrid, WindowGeom
from u2mkd_tpu.ops import hashing, spconv, voxelize


class UNetPlumbing(flax.struct.PyTreeNode):
    levels: Tuple[LevelContext, ...]   # batched grids + rulebooks
    p2v: Tuple[jax.Array, ...]         # [L] x [B, P] point -> voxel row (-1 none)
    devox_idx: Tuple[jax.Array, ...]   # [L] x [B, P, 8]
    devox_w: Tuple[jax.Array, ...]     # [L] x [B, P, 8]
    v0_to_v: Tuple[jax.Array, ...]     # [L] x [B, V0] level0 voxel -> level-L row
    vox_xyz: Tuple[jax.Array, ...]     # [L] x [B, V_L, 3] mean metric xyz
    pmask: jax.Array                   # [B, P]
    p2v0_feats_seg: jax.Array          # [B, P] segment ids for initial voxelize
    # host-precomputed window geometry for encoder levels 1..4
    # ({"cubic": (WindowGeom, ...), "sphere": (...)}) — None -> in-jit geometry
    wgeom: Optional[dict] = None


def _build_single(pcoords, metric_xyz, pmask, capacities):
    """Per-sample plumbing build. pcoords [P,3] float voxel units."""
    nlev = len(capacities)
    v0 = voxelize.voxelize_initial(pcoords, metric_xyz, pmask, capacities[0])
    grid0 = VoxelGrid(
        coords=v0["vcoords"], mask=v0["vmask"], key_hi=v0["key_hi"],
        key_lo=v0["key_lo"], num=v0["num"], stride=1,
    )
    levels = spconv.build_levels(grid0, capacities)
    p2v, dvi, dvw, v0_to_v, vox_xyz = [], [], [], [], []
    xyz0 = v0["vfeats"]  # [V0, 3] mean metric xyz
    for li, lv in enumerate(levels):
        s = lv.grid.stride
        p2v.append(
            voxelize.point_voxel_query(pcoords, pmask, s, lv.grid.key_hi, lv.grid.key_lo)
        )
        idx8, w8 = voxelize.voxel_to_point_query(
            pcoords, pmask, s, lv.grid.key_hi, lv.grid.key_lo
        )
        dvi.append(idx8)
        dvw.append(w8)
        if li == 0:
            v0_to_v.append(jnp.where(grid0.mask, jnp.arange(grid0.capacity), -1))
            vox_xyz.append(xyz0)
        else:
            qc = (grid0.coords // s) * s
            rows = hashing.lookup_coords(qc, grid0.mask, lv.grid.key_hi, lv.grid.key_lo)
            v0_to_v.append(rows)
            seg = jnp.where((rows >= 0) & grid0.mask, rows, lv.grid.capacity)
            vox_xyz.append(voxelize.segment_mean(xyz0, seg, lv.grid.capacity))
    return dict(
        levels=levels, p2v=tuple(p2v), devox_idx=tuple(dvi), devox_w=tuple(dvw),
        v0_to_v=tuple(v0_to_v), vox_xyz=tuple(vox_xyz), p2v0=v0["p2v"],
    )


def build_plumbing(pcoords: jax.Array, metric_xyz: jax.Array, pmask: jax.Array,
                   capacities: Tuple[int, ...]) -> UNetPlumbing:
    """Batched plumbing build.

    pcoords:    [B, P, 3] float point coords in voxel units.
    metric_xyz: [B, P, 3] float metric xyz (for transformer window geometry).
    pmask:      [B, P] bool.
    """
    out = jax.vmap(lambda a, b, m: _build_single(a, b, m, tuple(capacities)))(
        pcoords, metric_xyz, pmask
    )
    return UNetPlumbing(
        levels=out["levels"], p2v=out["p2v"], devox_idx=out["devox_idx"],
        devox_w=out["devox_w"], v0_to_v=out["v0_to_v"], vox_xyz=out["vox_xyz"],
        pmask=pmask, p2v0_feats_seg=out["p2v0"],
    )


def from_precomputed(arrays, pmask: jax.Array) -> UNetPlumbing:
    """Assemble a UNetPlumbing from host-precomputed batched arrays
    (see ``data/plumbing_host.py``): each entry of ``arrays`` is a list over
    levels of [B, ...] arrays. Voxel key tables are not materialized (every
    lookup was resolved on the host); grids carry coords/mask only.
    """
    n_levels = len(arrays["coords"])
    levels = []
    p2v, dvi, dvw, vox_xyz, v0_to_v = [], [], [], [], []
    for li in range(n_levels):
        vm = arrays["vmask"][li].astype(bool)
        cap = vm.shape[-1]
        grid = VoxelGrid(
            coords=arrays["coords"][li],
            mask=vm,
            key_hi=jnp.zeros(vm.shape, jnp.uint32),
            key_lo=jnp.zeros(vm.shape, jnp.uint32),
            num=arrays["nums"][li][..., 0],
            stride=1 << li,
        )
        has_plan = "cr27jl" in arrays
        levels.append(
            LevelContext(
                grid=grid,
                nbr27=arrays["nbr27"][li],
                down_nbr8=arrays["down8"][li] if li >= 1 else None,
                up_parent=arrays["parent"][li] if li < n_levels - 1 else None,
                up_koff=arrays["koff"][li] if li < n_levels - 1 else None,
                conv_jl=arrays["cr27jl"][li] if has_plan else None,
                conv_jn=arrays["cr27jn"][li] if has_plan else None,
                conv_kr=arrays["cr27kr"][li] if has_plan else None,
                nbr27_t=jnp.swapaxes(arrays["nbr27"][li], 1, 2)
                if has_plan else None,
            )
        )
        p2v.append(arrays["p2v"][li])
        dvi.append(arrays["dvi"][li])
        dvw.append(arrays["dvw"][li])
        vox_xyz.append(arrays["voxxyz"][li])
        v0_to_v.append(None)  # not needed: vox_xyz precomputed
    cap0 = arrays["vmask"][0].shape[-1]
    p2v0 = jnp.where(p2v[0] >= 0, p2v[0], cap0)
    wgeom = None
    if "wgeom" in arrays:
        wgeom = {
            branch: tuple(
                _window_geom_from_arrays(g) for g in arrays["wgeom"][branch]
            )
            for branch in arrays["wgeom"]
        }
    return UNetPlumbing(
        levels=tuple(levels), p2v=tuple(p2v), devox_idx=tuple(dvi),
        devox_w=tuple(dvw), v0_to_v=tuple(v0_to_v), vox_xyz=tuple(vox_xyz),
        pmask=pmask, p2v0_feats_seg=p2v0, wgeom=wgeom,
    )


def _window_geom_from_arrays(g: dict) -> WindowGeom:
    """Assemble a WindowGeom from host-shipped arrays. A leading shard axis
    of 1 (added by ``plumbing_host`` so the loader batch shards cleanly over
    the data mesh axis) is squeezed here, inside the (possibly shard_map'd)
    step."""

    def un(x):
        assert x.shape[0] == 1, (
            "window geometry built for a different shard count: leading dim "
            f"{x.shape[0]} != 1 — pass n_shards=<local device count> to "
            "plumbing_host.batch_plumbing")
        return x[0]

    return WindowGeom(
        order=un(g["order"]), inv=un(g["inv"]), rank=un(g["rank"]),
        quant=un(g["quant"]), kmin=un(g["kmin"]), kmax=un(g["kmax"]),
        occ=un(g["occ"]), r=un(g["r"]) if "r" in g else None,
    )


def recursive_vox_xyz(pl: UNetPlumbing) -> Tuple[jax.Array, ...]:
    """Per-level voxel xyz by RECURSIVE mean-of-means through the downsample
    rulebooks — the official SphereFormer U-Net's coordinate tracking
    (reference ``unet_spherical_transformer.py:223-247``: ``scatter_mean``
    of the finer level's xyz over the ks2/s2 conv kmap pairs), as opposed to
    the flat level-0 mean in ``vox_xyz`` that SPVCNN_SPFORMER's ``zz``
    PointTensor trick produces (``spvcnn_spformer.py:136-147``)."""
    out = [pl.vox_xyz[0]]
    for li in range(1, len(pl.levels)):
        nbr = pl.levels[li].down_nbr8          # [B, 8, V] finer-level rows
        mask = pl.levels[li].grid.mask

        def one(prev_s, nbr_s, mask_s):
            ok = nbr_s >= 0                                     # [8, V]
            vals = prev_s[jnp.clip(nbr_s, 0)]                   # [8, V, 3]
            s = jnp.sum(jnp.where(ok[..., None], vals, 0.0), axis=0)
            c = jnp.sum(ok, axis=0)[..., None].astype(s.dtype)
            return jnp.where(mask_s[..., None], s / jnp.maximum(c, 1.0), 0.0)

        out.append(jax.vmap(one)(out[-1], nbr, mask))
    return tuple(out)


def level_geom(pl: UNetPlumbing, idx: int):
    """Window geometry dict for encoder stage ``idx`` (U-Net level idx+1),
    or None when the batch carries no host geometry."""
    if pl.wgeom is None:
        return None
    return {branch: pl.wgeom[branch][idx] for branch in pl.wgeom}


def point_to_voxel(pfeats: jax.Array, p2v: jax.Array, capacity: int) -> jax.Array:
    """Batched scatter-mean of point features onto voxel rows."""
    return jax.vmap(lambda f, m: voxelize.point_to_voxel_mean(f, m, capacity))(
        pfeats, p2v
    )


def voxel_to_point(vfeats: jax.Array, idx8: jax.Array, w8: jax.Array) -> jax.Array:
    """Batched trilinear devoxelize."""
    return jax.vmap(voxelize.trilinear_devoxelize)(vfeats, idx8, w8)
