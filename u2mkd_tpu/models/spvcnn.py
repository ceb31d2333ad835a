"""SPVCNN: sparse point-voxel U-Net (pure-LiDAR baseline model).

TPU-native re-design of the reference ``SPVCNN``
(``core/models/semantickitti/spvcnn.py:10-142``): stem (2x ks3 conv) ->
4 encoder stages (ks2/s2 down + 2 residual) -> 4 decoder stages
(transposed conv + skip concat + 2 residual), with three point-stream MLP
residual fusions between the voxel and point representations, dropout 0.3
before decoder stages 1 and 3, and a linear per-point classifier.

Optionally interleaves a SphereFormer attention block after each encoder
stage (``SPVCNN_SPFORMER``, ``core/models/nuscenes/spvcnn_spformer.py``)
when ``sphereformer=True``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2mkd_tpu.models import blocks
from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.plumbing import UNetPlumbing, point_to_voxel, voxel_to_point


class SPVCNN(nn.Module):
    num_classes: int = 17
    cr: float = 1.0
    in_channel: int = 4
    base_channels: Tuple[int, ...] = (32, 32, 64, 128, 256, 256, 128, 96, 96)
    dropout_rate: float = 0.3
    axis_name: Optional[str] = None
    # SphereFormer options (used by SPVCNN_SPFORMER configs)
    sphereformer: bool = False
    window_size: Tuple[float, float, float] = (0.3, 0.3, 0.3)
    window_size_sphere: Tuple[float, float, float] = (2.0, 2.0, 120.0)
    quant_size: Tuple[float, float, float] = (0.3 / 24, 0.3 / 24, 0.3 / 24)
    quant_size_sphere: Tuple[float, float, float] = (2.0 / 24, 2.0 / 24, 5.0)
    window_size_scale: Tuple[float, float] = (2.0, 1.5)
    drop_path_rate: float = 0.3
    sphere_a: float = 0.0125
    head_dim: int = 16
    return_point_feats: bool = False
    pallas_attention: bool = False  # flash kernel path (exact, fast compile)
    pallas_cubic: bool = True       # flash for the cubic branch too

    @nn.compact
    def __call__(self, pfeats: jax.Array, plumbing: UNetPlumbing, train: bool):
        """pfeats [B, P, Cin]; returns dict with 'x_vox' [B, P, num_classes]."""
        cs = [int(self.cr * x) for x in self.base_channels]
        ax = self.axis_name
        lv = plumbing.levels
        pmask = plumbing.pmask
        caps = [l.grid.capacity for l in lv]

        # initial voxelize: mean point features per level-0 voxel
        x0 = point_to_voxel(pfeats, plumbing.p2v0_feats_seg, caps[0])

        # stem: 2x (ks3 conv + BN + ReLU)
        x0 = blocks.SparseConvBlock(cs[0], ks=3, axis_name=ax, name="stem0")(
            x0, lv[0], train
        )
        x0 = blocks.SparseConvBlock(cs[0], ks=3, axis_name=ax, name="stem1")(
            x0, lv[0], train
        )
        z0 = voxel_to_point(x0, plumbing.devox_idx[0], plumbing.devox_w[0])

        # encoder
        if self.sphereformer:
            import numpy as np
            from u2mkd_tpu.models.sphereformer import SphereFormerBlock
            dpr = [float(x) for x in np.linspace(0, self.drop_path_rate, 7)]
            ws = list(self.window_size)
            qs = list(self.quant_size)
            wss = list(self.window_size_sphere)
            qss = list(self.quant_size_sphere)

        vox_feats = [point_to_voxel(z0, plumbing.p2v[0], caps[0])]
        for idx in range(4):
            f = vox_feats[idx]
            f = blocks.SparseConvBlock(
                cs[idx], stride=2, axis_name=ax, name=f"down{idx}_conv"
            )(f, lv[idx], train, down_nbr8=lv[idx + 1].down_nbr8,
              out_mask=lv[idx + 1].grid.mask)
            f = blocks.SparseResBlock(cs[idx + 1], axis_name=ax, name=f"down{idx}_res0")(
                f, lv[idx + 1], train
            )
            f = blocks.SparseResBlock(cs[idx + 1], axis_name=ax, name=f"down{idx}_res1")(
                f, lv[idx + 1], train
            )
            if self.sphereformer:
                f = SphereFormerBlock(
                    dim=cs[idx + 1],
                    num_heads=cs[idx + 1] // self.head_dim,
                    window_size=tuple(ws),
                    window_size_sphere=tuple(wss),
                    quant_size=tuple(qs),
                    quant_size_sphere=tuple(qss),
                    drop_path=dpr[idx + 1],
                    a=self.sphere_a,
                    axis_name=ax,
                    use_flash=self.pallas_attention,
                    flash_cubic=self.pallas_cubic,
                    name=f"sphereformer{idx + 1}",
                )(f, plumbing.vox_xyz[idx + 1], lv[idx + 1].grid.mask, train,
                  geom=P.level_geom(plumbing, idx))
                wsc, wss_scale = self.window_size_scale
                ws = [w * wsc for w in ws]
                qs = [q * wsc for q in qs]
                wss = [wss[0] * wss_scale, wss[1] * wss_scale, wss[2]]
                qss = [qss[0] * wss_scale, qss[1] * wss_scale, qss[2]]
            vox_feats.append(f)

        x1, x2, x3, x4 = vox_feats[1], vox_feats[2], vox_feats[3], vox_feats[4]

        x4_pts = voxel_to_point(x4, plumbing.devox_idx[4], plumbing.devox_w[4])
        if self.return_point_feats:
            # KD feature export: stage-4 encoder(+transformer) output
            # devoxelized to points — the SAME tensor the decoder consumes
            # as z1's base (reference teacher inside the TSD wrapper,
            # spvcnn_swiftnet18_spformer_tsd_full.py:153-154)
            kd_pts_feats = x4_pts

        z1 = x4_pts
        z1 = z1 + blocks.PointMLP(cs[4], axis_name=ax, name="point_transform0")(
            z0, pmask, train
        )

        def dropout(x):
            return nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        # decoder stage 1: level 4 -> 3
        y1 = point_to_voxel(z1, plumbing.p2v[4], caps[4])
        y1 = dropout(y1)
        y1 = blocks.SparseDeconvBlock(cs[5], axis_name=ax, name="up0_deconv")(
            y1, lv[3].up_parent, lv[3].up_koff, lv[3].grid.mask, train
        )
        y1 = jnp.concatenate([y1, x3], axis=-1)
        y1 = blocks.SparseResBlock(cs[5], axis_name=ax, name="up0_res0")(y1, lv[3], train)
        y1 = blocks.SparseResBlock(cs[5], axis_name=ax, name="up0_res1")(y1, lv[3], train)

        # decoder stage 2: level 3 -> 2
        y2 = blocks.SparseDeconvBlock(cs[6], axis_name=ax, name="up1_deconv")(
            y1, lv[2].up_parent, lv[2].up_koff, lv[2].grid.mask, train
        )
        y2 = jnp.concatenate([y2, x2], axis=-1)
        y2 = blocks.SparseResBlock(cs[6], axis_name=ax, name="up1_res0")(y2, lv[2], train)
        y2 = blocks.SparseResBlock(cs[6], axis_name=ax, name="up1_res1")(y2, lv[2], train)
        z2 = voxel_to_point(y2, plumbing.devox_idx[2], plumbing.devox_w[2])
        z2 = z2 + blocks.PointMLP(cs[6], axis_name=ax, name="point_transform1")(
            z1, pmask, train
        )

        # decoder stage 3: level 2 -> 1
        y3 = point_to_voxel(z2, plumbing.p2v[2], caps[2])
        y3 = dropout(y3)
        y3 = blocks.SparseDeconvBlock(cs[7], axis_name=ax, name="up2_deconv")(
            y3, lv[1].up_parent, lv[1].up_koff, lv[1].grid.mask, train
        )
        y3 = jnp.concatenate([y3, x1], axis=-1)
        y3 = blocks.SparseResBlock(cs[7], axis_name=ax, name="up2_res0")(y3, lv[1], train)
        y3 = blocks.SparseResBlock(cs[7], axis_name=ax, name="up2_res1")(y3, lv[1], train)

        # decoder stage 4: level 1 -> 0
        y4 = blocks.SparseDeconvBlock(cs[8], axis_name=ax, name="up3_deconv")(
            y3, lv[0].up_parent, lv[0].up_koff, lv[0].grid.mask, train
        )
        y4 = jnp.concatenate([y4, x0], axis=-1)
        y4 = blocks.SparseResBlock(cs[8], axis_name=ax, name="up3_res0")(y4, lv[0], train)
        y4 = blocks.SparseResBlock(cs[8], axis_name=ax, name="up3_res1")(y4, lv[0], train)
        z3 = voxel_to_point(y4, plumbing.devox_idx[0], plumbing.devox_w[0])
        z3 = z3 + blocks.PointMLP(cs[8], axis_name=ax, name="point_transform2")(
            z2, pmask, train
        )

        x_vox = nn.Dense(self.num_classes, name="classifier_vox")(z3)
        out = {"x_vox": x_vox}
        if self.return_point_feats:
            out["pts_feats"] = kd_pts_feats
        return out
