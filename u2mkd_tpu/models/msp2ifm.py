"""Cross-modal student: SPVCNN+SphereFormer LiDAR branch fused bidirectionally
with a SwiftNet-18 image branch (MSP2IFM).

Re-design of ``SPVCNN_SWIFTNET18_SPFORMER_MSP2IFM`` (reference
``core/models/nuscenes/spvcnn_swiftnet18_spformer_tsd_full.py:197-559``).
Per encoder stage:

  * sparse down + SphereFormer -> ``voxel_to_point`` (stage point features)
  * image ResNet stage (+ SPP at stage 4)
  * **L2C**: multi-scale scatter of point features into the camera grid
    (``:449-478``) — the reference's per-camera python loop with
    unique-uv/sparse_coo becomes a vmapped fixed-shape segment-mean over the
    (B, 6) camera axis — then :class:`L2CFusion`
  * **C2L**: bilinear gather of image features at point projections,
    learner MLP hallucinating pseudo-image features outside camera FOV with a
    per-stage MSE loss (``:482-498``), then :class:`AttenFusionConv`
  * ``point_to_voxel`` back into the voxel stream.

Decoder is the SPVCNN decoder; a pixel decoder head produces per-point
``x_pix`` via ``Feature_Fetch``; ``forward_lidar_only`` is the camera-free
inference path using learner features (``:334-399``, note: it skips the
transformer blocks, as the reference does).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from u2mkd_tpu.models import blocks, fusion
from u2mkd_tpu.models.plumbing import (
    UNetPlumbing, level_geom, point_to_voxel, voxel_to_point,
)
from u2mkd_tpu.models.sphereformer import SphereFormerBlock
from u2mkd_tpu.models.swiftnet import (
    BNReluConv, SwiftNetResNet, resize_bilinear_align_corners,
)
from u2mkd_tpu.ops import losses


class SPVCNNSwiftNetMSP2IFM(nn.Module):
    num_classes: int = 17
    cr: float = 1.0
    in_channel: int = 4
    base_channels: Tuple[int, ...] = (32, 32, 64, 128, 256, 256, 128, 96, 96)
    dropout_rate: float = 0.3
    axis_name: Optional[str] = None
    window_size: Tuple[float, float, float] = (0.3, 0.3, 0.3)
    window_size_sphere: Tuple[float, float, float] = (2.0, 2.0, 120.0)
    quant_size: Tuple[float, float, float] = (0.3 / 24, 0.3 / 24, 0.3 / 24)
    quant_size_sphere: Tuple[float, float, float] = (2.0 / 24, 2.0 / 24, 5.0)
    window_size_scale: Tuple[float, float] = (2.0, 2.0)
    drop_path_rate: float = 0.3
    sphere_a: float = 0.0125
    head_dim: int = 16
    adapt_out_ch: Optional[int] = None  # teacher cs[4] for KD (TSD wrapper)
    run_pix_decoder: bool = True
    pallas_attention: bool = False
    pallas_cubic: bool = True

    def _cs(self):
        return [int(self.cr * x) for x in self.base_channels]

    @nn.compact
    def __call__(self, pfeats, plumbing: UNetPlumbing, images, pix_coords,
                 cam_masks, fov_mask, train: bool, lidar_only: bool = False):
        """
        pfeats:     [B, P, Cin]
        images:     [B, NCAM, H, W, 3] (None if lidar_only)
        pix_coords: [B, NCAM, P, 2] normalized [-1,1]
        cam_masks:  [B, NCAM, P] bool
        fov_mask:   [B, P] bool
        """
        cs = self._cs()
        ax = self.axis_name
        lv = plumbing.levels
        pmask = plumbing.pmask
        caps = [l.grid.capacity for l in lv]
        img_cs = [64, 64, 128, 256, 128]

        pix_branch = SwiftNetResNet(axis_name=ax, name="pix_branch")
        dpr = [float(x) for x in np.linspace(0, self.drop_path_rate, 7)]

        x0 = point_to_voxel(pfeats, plumbing.p2v0_feats_seg, caps[0])
        x0 = blocks.SparseConvBlock(cs[0], ks=3, axis_name=ax, name="stem0")(
            x0, lv[0], train
        )
        x0 = blocks.SparseConvBlock(cs[0], ks=3, axis_name=ax, name="stem1")(
            x0, lv[0], train
        )
        z0 = voxel_to_point(x0, plumbing.devox_idx[0], plumbing.devox_w[0])

        if not lidar_only:
            b, ncam, ih, iw, _ = images.shape
            im = images.reshape(b * ncam, ih, iw, 3)
            x_im = pix_branch.forward_stem(im, train)

        ws = list(self.window_size)
        qs = list(self.quant_size)
        wss = list(self.window_size_sphere)
        qss = list(self.quant_size_sphere)

        vox_feats = [point_to_voxel(z0, plumbing.p2v[0], caps[0])]
        img_skips = []
        mse_losses = []
        kd_feats = None
        pts_feat = None
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
            if not lidar_only:
                # forward_lidar_only skips the transformer (reference :351-356)
                f = SphereFormerBlock(
                    dim=cs[idx + 1], num_heads=cs[idx + 1] // self.head_dim,
                    window_size=tuple(ws), window_size_sphere=tuple(wss),
                    quant_size=tuple(qs), quant_size_sphere=tuple(qss),
                    drop_path=dpr[idx + 1], a=self.sphere_a, axis_name=ax,
                    use_flash=self.pallas_attention,
                    flash_cubic=self.pallas_cubic,
                    name=f"sphereformer{idx + 1}",
                )(f, plumbing.vox_xyz[idx + 1], lv[idx + 1].grid.mask, train,
                  geom=level_geom(plumbing, idx))
            wsc, wss_scale = self.window_size_scale
            ws = [w * wsc for w in ws]
            qs = [q * wsc for q in qs]
            wss = [wss[0] * wss_scale, wss[1] * wss_scale, wss[2]]
            qss = [qss[0] * wss_scale, qss[1] * wss_scale, qss[2]]

            pts_feat = voxel_to_point(
                f, plumbing.devox_idx[idx + 1], plumbing.devox_w[idx + 1]
            )
            if idx == 3 and self.adapt_out_ch is not None:
                kd = nn.Dense(self.adapt_out_ch, name="adapt_fc")(pts_feat)
                kd = blocks.MaskedBatchNorm(
                    self.adapt_out_ch, axis_name=ax, name="adapt_bn"
                )(kd, pmask, train)
                kd_feats = nn.relu(kd)

            if lidar_only:
                pseudo = fusion.LearnerMLP(
                    img_cs[idx + 1], axis_name=ax, name=f"learner{idx}"
                )(pts_feat, pmask, train)
                pts_feat = fusion.AttenFusionConv(
                    cs[idx + 1], axis_name=ax, name=f"c2l{idx}"
                )(pts_feat, pseudo, pmask, train)
            else:
                x_im, skip = pix_branch.forward_resblock(x_im, idx, train)
                if idx == 3:
                    skip = pix_branch.forward_spp(skip, train)
                ifh, ifw = skip.shape[-3], skip.shape[-2]

                # L2C: multiscale scatter of point feats into camera grids
                n_scales = 4 - idx
                cam_pf = jnp.broadcast_to(
                    pts_feat[:, None], (pts_feat.shape[0], ncam) + pts_feat.shape[1:]
                ).reshape(b * ncam, *pts_feat.shape[1:])
                cam_co = pix_coords.reshape(b * ncam, -1, 2)
                cam_ma = cam_masks.reshape(b * ncam, -1)
                l2c_map = jnp.zeros((b * ncam, ifh, ifw, pts_feat.shape[-1]))
                cnt = 1
                for _ in range(n_scales):
                    c_ih = int(round(ifh / cnt + 0.01))
                    c_iw = int(round(ifw / cnt + 0.01))
                    grid = jax.vmap(
                        lambda pf, co, ma: fusion.point_to_grid(
                            pf, co, ma, (c_ih, c_iw)
                        )
                    )(cam_pf, cam_co, cam_ma)
                    l2c_map = l2c_map + resize_bilinear_align_corners(
                        grid, (ifh, ifw)
                    )
                    cnt *= 2
                l2c_map = l2c_map / n_scales
                x_im, skip = fusion.L2CFusion(
                    img_cs[idx + 1], axis_name=ax, name=f"l2c{idx}"
                )(l2c_map, skip, train)
                img_skips.append(skip)

                # C2L: gather image features at point projections
                ifc = skip.shape[-1]
                fmaps = skip.reshape(b, ncam, ifh, ifw, ifc)
                imf = jax.vmap(fusion.feature_fetch)(fmaps, pix_coords, cam_masks)
                pseudo = fusion.LearnerMLP(
                    ifc, axis_name=ax, name=f"learner{idx}"
                )(pts_feat, pmask, train)
                imf = jnp.where(fov_mask[..., None], imf, pseudo)
                mse_valid = (fov_mask & pmask).reshape(-1)
                mse_losses.append(
                    losses.masked_mse(
                        pseudo.reshape(-1, ifc),
                        jax.lax.stop_gradient(imf.reshape(-1, ifc)),
                        mse_valid,
                    )
                )
                pts_feat = fusion.AttenFusionConv(
                    cs[idx + 1], axis_name=ax, name=f"c2l{idx}"
                )(pts_feat, imf, pmask, train)

            vox_feats.append(point_to_voxel(pts_feat, plumbing.p2v[idx + 1],
                                            caps[idx + 1]))

        x1, x2, x3, x4 = vox_feats[1], vox_feats[2], vox_feats[3], vox_feats[4]

        z1 = pts_feat  # stage-4 fused point features (reference :511)
        z1 = z1 + blocks.PointMLP(cs[4], axis_name=ax, name="point_transform0")(
            z0, pmask, train
        )

        def dropout(x):
            return nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        y1 = point_to_voxel(z1, plumbing.p2v[4], caps[4])
        y1 = dropout(y1)
        y1 = blocks.SparseDeconvBlock(cs[5], axis_name=ax, name="up0_deconv")(
            y1, lv[3].up_parent, lv[3].up_koff, lv[3].grid.mask, train
        )
        y1 = jnp.concatenate([y1, x3], axis=-1)
        y1 = blocks.SparseResBlock(cs[5], axis_name=ax, name="up0_res0")(y1, lv[3], train)
        y1 = blocks.SparseResBlock(cs[5], axis_name=ax, name="up0_res1")(y1, lv[3], train)

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

        y3 = point_to_voxel(z2, plumbing.p2v[2], caps[2])
        y3 = dropout(y3)
        y3 = blocks.SparseDeconvBlock(cs[7], axis_name=ax, name="up2_deconv")(
            y3, lv[1].up_parent, lv[1].up_koff, lv[1].grid.mask, train
        )
        y3 = jnp.concatenate([y3, x1], axis=-1)
        y3 = blocks.SparseResBlock(cs[7], axis_name=ax, name="up2_res0")(y3, lv[1], train)
        y3 = blocks.SparseResBlock(cs[7], axis_name=ax, name="up2_res1")(y3, lv[1], train)

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

        out = {"x_vox": nn.Dense(self.num_classes, name="classifier_vox")(z3)}
        if not lidar_only:
            out["mse_loss"] = mse_losses
            if kd_feats is not None:
                out["pts_feats"] = kd_feats
            if self.run_pix_decoder:
                pix_up = pix_branch.forward_up(img_skips, train, im_size=(ih, iw))
                fmap_pix = BNReluConv(self.num_classes, k=1, name="classifier_pix")(
                    pix_up, train
                )
                fmap_pix = fmap_pix.reshape(
                    b, ncam, ih, iw, self.num_classes
                )
                out["x_pix"] = jax.vmap(fusion.feature_fetch)(
                    fmap_pix, pix_coords, cam_masks
                )
        return out
