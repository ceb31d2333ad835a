"""Official SphereFormer U-Net (alternative teacher architecture).

Re-design of the reference's vendored SphereFormer model
(``core/models/sphereformer/unet_spherical_transformer.py:45-377``): a
recursive ``UBlock`` U-Net with pre-activation residual blocks
(norm-relu-conv-norm-relu-conv + 1x1 identity), a SphereFormer transformer
at each level (gated by ``sphere_layers``), ks2/s2 down/up convs, skip
concatenation, and a ``Semantic`` wrapper (stem conv + U + norm-relu +
linear head). The builder keeps this path available though the live teacher
is ``SPVCNN_SPFORMER`` (reference ``builder.py:502-532``, commented out).

Voxel-center xyz per level uses the reference's RECURSIVE mean-of-means
tracking (``scatter_mean`` of the finer level's xyz over the downsample conv
kmaps, ``unet_spherical_transformer.py:223-247``), computed by
``plumbing.recursive_vox_xyz`` from the down rulebooks — NOT the flat
level-0 mean the SPVCNN_SPFORMER teacher uses (that model's ``zz`` trick is
the flat mean, which ``plumbing.vox_xyz`` matches).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from u2mkd_tpu.models import blocks
from u2mkd_tpu.models.plumbing import UNetPlumbing
from u2mkd_tpu.models.sphereformer import SphereFormerBlock


class PreActResBlock(nn.Module):
    """norm-relu-conv3-norm-relu-conv3 + (1x1 conv identity if needed)."""

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, level, train: bool):
        mask = level.grid.mask
        x = blocks.MaskedBatchNorm(feats.shape[-1], axis_name=self.axis_name,
                                   name="bn1")(feats, mask, train)
        x = nn.relu(x)
        x = blocks.SparseConv(self.out_ch, 3, name="conv1")(x, level.nbr27, plan=level.conv_plan())
        x = blocks.MaskedBatchNorm(self.out_ch, axis_name=self.axis_name,
                                   name="bn2")(x, mask, train)
        x = nn.relu(x)
        x = blocks.SparseConv(self.out_ch, 3, name="conv2")(x, level.nbr27, plan=level.conv_plan())
        if feats.shape[-1] == self.out_ch:
            ident = feats
        else:
            ident = blocks.SparseConv(self.out_ch, 1, name="i_branch")(feats, None)
        return x + ident


class VGGBlock(nn.Module):
    """norm-relu-conv3, no residual (reference ``VGGBlock``,
    ``unet_spherical_transformer.py:70-81``) — the lighter block option the
    reference's ``UBlock(block=...)`` parameter selects."""

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, level, train: bool):
        mask = level.grid.mask
        x = blocks.MaskedBatchNorm(feats.shape[-1], axis_name=self.axis_name,
                                   name="bn1")(feats, mask, train)
        x = nn.relu(x)
        return blocks.SparseConv(self.out_ch, 3, name="conv1")(x, level.nbr27, plan=level.conv_plan())


_BLOCK_TYPES = {"residual": PreActResBlock, "vgg": VGGBlock}


class UBlock(nn.Module):
    """Recursive U level."""

    n_planes: Tuple[int, ...]
    level_idx: int  # index into plumbing.levels for this block's grid
    window_size: Tuple[float, float, float]
    window_size_sphere: Tuple[float, float, float]
    quant_size: Tuple[float, float, float]
    quant_size_sphere: Tuple[float, float, float]
    window_size_scale: Tuple[float, float] = (2.0, 2.0)
    block_reps: int = 2
    head_dim: int = 16
    drop_path: float = 0.0
    sphere_layers: Sequence[int] = (1, 2, 3, 4, 5)
    a: float = 0.0125
    block_type: str = "residual"  # reference UBlock(block=ResidualBlock|VGGBlock)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, plumbing: UNetPlumbing, train: bool,
                 vox_xyz=None):
        """``vox_xyz``: per-level recursive mean-of-means voxel coordinates
        (``plumbing.recursive_vox_xyz``), matching the reference's
        scatter_mean-through-kmaps tracking
        (``unet_spherical_transformer.py:223-247``). Falls back to the flat
        level-0 means when not supplied."""
        if vox_xyz is None:
            vox_xyz = plumbing.vox_xyz
        lv = plumbing.levels[self.level_idx]
        block_cls = _BLOCK_TYPES[self.block_type]
        for i in range(self.block_reps):
            feats = block_cls(self.n_planes[0], self.axis_name,
                              name=f"block{i}")(feats, lv, train)
        layer_id = self.level_idx + 1
        if layer_id in self.sphere_layers:
            feats = SphereFormerBlock(
                dim=self.n_planes[0],
                num_heads=self.n_planes[0] // self.head_dim,
                window_size=self.window_size,
                window_size_sphere=self.window_size_sphere,
                quant_size=self.quant_size,
                quant_size_sphere=self.quant_size_sphere,
                drop_path=self.drop_path, a=self.a, axis_name=self.axis_name,
                name="transformer_block",
            )(feats, vox_xyz[self.level_idx], lv.grid.mask, train)

        if len(self.n_planes) > 1:
            nxt = plumbing.levels[self.level_idx + 1]
            # down: norm-relu-conv(ks2/s2)
            d = blocks.MaskedBatchNorm(self.n_planes[0], axis_name=self.axis_name,
                                       name="down_bn")(feats, lv.grid.mask, train)
            d = nn.relu(d)
            d = blocks.SparseDownConv(self.n_planes[1], name="down_conv")(
                d, nxt.down_nbr8
            )
            wsc, wss = self.window_size_scale
            child = UBlock(
                n_planes=tuple(self.n_planes[1:]),
                level_idx=self.level_idx + 1,
                window_size=tuple(w * wsc for w in self.window_size),
                quant_size=tuple(q * wsc for q in self.quant_size),
                window_size_sphere=(
                    self.window_size_sphere[0] * wss,
                    self.window_size_sphere[1] * wss,
                    self.window_size_sphere[2],
                ),
                quant_size_sphere=(
                    self.quant_size_sphere[0] * wss,
                    self.quant_size_sphere[1] * wss,
                    self.quant_size_sphere[2],
                ),
                window_size_scale=self.window_size_scale,
                block_reps=self.block_reps, head_dim=self.head_dim,
                drop_path=self.drop_path, sphere_layers=self.sphere_layers,
                a=self.a, block_type=self.block_type,
                axis_name=self.axis_name, name="u",
            )(d, plumbing, train, vox_xyz=vox_xyz)
            # up: norm-relu-deconv(ks2/s2) back to this level's coords
            u = blocks.MaskedBatchNorm(child.shape[-1], axis_name=self.axis_name,
                                       name="up_bn")(child, nxt.grid.mask, train)
            u = nn.relu(u)
            u = blocks.SparseDeconv(self.n_planes[0], name="up_conv")(
                u, lv.up_parent, lv.up_koff
            )
            feats = jnp.concatenate([feats, u], axis=-1)
            for i in range(self.block_reps):
                feats = block_cls(self.n_planes[0], self.axis_name,
                                  name=f"tail{i}")(feats, lv, train)
        return feats


class SphereFormerSemantic(nn.Module):
    """``Semantic`` wrapper (stem conv + UBlock + norm-relu + linear head)."""

    num_classes: int = 17
    in_channel: int = 4
    n_planes: Tuple[int, ...] = (32, 64, 128, 256, 256)
    window_size: Tuple[float, float, float] = (0.3, 0.3, 0.3)
    window_size_sphere: Tuple[float, float, float] = (2.0, 2.0, 120.0)
    quant_size: Tuple[float, float, float] = (0.3 / 24, 0.3 / 24, 0.3 / 24)
    quant_size_sphere: Tuple[float, float, float] = (2.0 / 24, 2.0 / 24, 5.0)
    window_size_scale: Tuple[float, float] = (2.0, 2.0)
    head_dim: int = 16
    drop_path_rate: float = 0.3
    sphere_layers: Sequence[int] = (1, 2, 3, 4, 5)
    a: float = 0.0125
    block_type: str = "residual"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pfeats, plumbing: UNetPlumbing, train: bool):
        from u2mkd_tpu.models.plumbing import (
            point_to_voxel, recursive_vox_xyz, voxel_to_point,
        )

        lv0 = plumbing.levels[0]
        x = point_to_voxel(pfeats, plumbing.p2v0_feats_seg, lv0.grid.capacity)
        x = blocks.SparseConv(self.n_planes[0], 3, name="input_conv")(x, lv0.nbr27, plan=lv0.conv_plan())
        # reference roundtrip after input_conv: devoxelize to points then
        # re-pool per voxel (unet_spherical_transformer.py:366-367 —
        # z0 = voxel_to_point(output, z); output = point_to_voxel(output, z0))
        z0 = voxel_to_point(x, plumbing.devox_idx[0], plumbing.devox_w[0])
        x = point_to_voxel(z0, plumbing.p2v0_feats_seg, lv0.grid.capacity)
        vox_xyz = recursive_vox_xyz(plumbing)
        x = UBlock(
            n_planes=self.n_planes, level_idx=0,
            window_size=self.window_size,
            window_size_sphere=self.window_size_sphere,
            quant_size=self.quant_size,
            quant_size_sphere=self.quant_size_sphere,
            window_size_scale=self.window_size_scale,
            head_dim=self.head_dim, drop_path=self.drop_path_rate,
            sphere_layers=self.sphere_layers, a=self.a,
            block_type=self.block_type, axis_name=self.axis_name,
            name="unet",
        )(x, plumbing, train, vox_xyz=vox_xyz)
        x = blocks.MaskedBatchNorm(self.n_planes[0], axis_name=self.axis_name,
                                   name="output_bn")(x, lv0.grid.mask, train)
        x = nn.relu(x)
        # per-point logits: each point reads its OWN level-0 voxel row — the
        # reference scores the deduplicated voxel set and its trainer maps
        # scores to points via the exact inverse map
        # (unet_spherical_transformer.py:372-375), NOT a trilinear blend
        rows = plumbing.p2v[0]  # [B, P], -1 for dead rows
        safe = jnp.clip(rows, 0, x.shape[1] - 1)
        z = jnp.take_along_axis(x, safe[..., None], axis=1)
        z = jnp.where(rows[..., None] >= 0, z, 0.0)
        return {"x_vox": nn.Dense(self.num_classes, name="classifier")(z)}
