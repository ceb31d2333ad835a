"""LiDAR<->camera fusion blocks and projection ops.

Re-design of the reference ``core/models/fusion_blocks.py``:

  * :func:`feature_gather` — bilinear sampling of an image feature map at
    normalized [-1,1] point projections (``Feature_Gather`` =
    ``F.grid_sample(align_corners=True, padding='zeros')``,
    ``fusion_blocks.py:241-254``), vmapped over the camera axis instead of
    python per-camera loops.
  * :func:`point_to_grid` — scatter-mean of point features into a pixel grid
    (``Point2Grid`` / the in-model L2C scatter,
    ``spvcnn_swiftnet18_spformer_tsd_full.py:449-478``). The reference's
    unique-uv + scatter_add + sparse_coo.to_dense() collapses to one
    fixed-shape segment-mean over h*w buckets.
  * :func:`feature_fetch` — multi-camera gather with sequential overwrite
    (``Feature_Fetch``, ``fusion_blocks.py:257-278``).
  * :class:`AttenFusionConv` — camera->LiDAR gated fusion (``IA_Layer`` +
    ``Atten_Fusion_Conv``, ``fusion_blocks.py:9-93``).
  * :class:`L2CFusion` — LiDAR->camera 2D analog (``L2CAILayer`` +
    ``L2CFusion``, ``fusion_blocks.py:96-153``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2mkd_tpu.models.blocks import MaskedBatchNorm
from u2mkd_tpu.models.swiftnet import BatchNorm2d, conv


def feature_gather(fmap: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample fmap [H, W, C] at normalized coords [P, 2] ((x, y) in
    [-1, 1], align_corners=True, zeros padding). Returns [P, C]."""
    h, w, c = fmap.shape
    u = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    v = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0).astype(fmap.dtype)
    dv = (v - v0).astype(fmap.dtype)

    def tap(vi, ui, wgt):
        inside = (vi >= 0) & (vi < h) & (ui >= 0) & (ui < w)
        val = fmap[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        return jnp.where(inside[:, None], val, 0.0) * wgt[:, None]

    return (
        tap(v0, u0, (1 - du) * (1 - dv))
        + tap(v0, u0 + 1, du * (1 - dv))
        + tap(v0 + 1, u0, (1 - du) * dv)
        + tap(v0 + 1, u0 + 1, du * dv)
    )


def point_to_grid(pfeats: jax.Array, coords: jax.Array, mask: jax.Array,
                  size: Tuple[int, int]) -> jax.Array:
    """Scatter-mean point features [P, C] into a [h, w, C] grid.

    uv = floor((coord + 1)/2 * (dim - 1)); points sharing a pixel average.
    """
    from u2mkd_tpu.ops.voxelize import segment_mean

    h, w = size
    u = jnp.floor((coords[:, 0] + 1.0) * 0.5 * (w - 1)).astype(jnp.int32)
    v = jnp.floor((coords[:, 1] + 1.0) * 0.5 * (h - 1)).astype(jnp.int32)
    ok = mask & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    pid = jnp.where(ok, v * w + u, h * w)  # drop bucket = h*w
    grid = segment_mean(pfeats, pid, h * w)
    return grid.reshape(h, w, pfeats.shape[-1])


def feature_fetch(fmaps: jax.Array, coords: jax.Array, cam_masks: jax.Array) -> jax.Array:
    """Gather per-point features from 6 camera maps with sequential
    overwrite (later cameras win), zeros outside all FOVs.

    fmaps [NCAM, H, W, C]; coords [NCAM, P, 2]; cam_masks [NCAM, P].
    Returns [P, C].
    """
    gathered = jax.vmap(feature_gather)(fmaps, coords)  # [NCAM, P, C]
    out = jnp.zeros(gathered.shape[1:], gathered.dtype)
    for i in range(fmaps.shape[0]):
        out = jnp.where(cam_masks[i][:, None], gathered[i], out)
    return out


class AttenFusionConv(nn.Module):
    """Camera->LiDAR gated attention fusion on per-point features.

    img/point feats are [B, P, C]; BatchNorms are masked over valid points.
    """

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, point_feats, img_feats, mask, train: bool):
        pc = point_feats.shape[-1]
        rc = pc // 4
        # IA layer
        ri = MaskedBatchNorm(img_feats.shape[-1], axis_name=self.axis_name,
                             name="ia_fc1_bn")(img_feats, mask, train)
        ri = nn.Dense(rc, name="ia_fc1")(nn.relu(ri))
        rp = nn.Dense(rc, name="ia_fc2")(point_feats)
        att = jax.nn.sigmoid(nn.Dense(1, name="ia_fc3")(jnp.tanh(ri + rp)))
        img_new = nn.Dense(pc, name="ia_conv1")(img_feats)
        img_new = MaskedBatchNorm(pc, axis_name=self.axis_name,
                                  name="ia_conv1_bn")(img_new, mask, train)
        img_new = nn.relu(img_new) * att
        # fuse
        fused = jnp.concatenate([point_feats, img_new], axis=-1)
        fused = nn.Dense(self.out_ch, name="fuse_conv")(fused)
        fused = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name,
                                name="fuse_bn")(fused, mask, train)
        return nn.relu(fused)


class L2CFusion(nn.Module):
    """LiDAR->camera gated fusion on 2D maps [N, H, W, C].

    Returns (relu(fused), fused) — the reference feeds relu forward and keeps
    the pre-activation as the stage skip.
    """

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, point_grid, img_feats, train: bool):
        ic = img_feats.shape[-1]
        rc = ic // 4

        def conv1x1(ch, name):
            # the reference's 1x1 Conv2d layers carry biases
            # (fusion_blocks.py:104-110) — the attention path (fc1/fc2/fc3)
            # has no BN to absorb them, so they affect the gate
            return nn.Conv(ch, (1, 1), use_bias=True, name=name)

        ri = conv1x1(rc, "ai_fc1")(img_feats)
        rp = conv1x1(rc, "ai_fc2")(point_grid)
        att = jax.nn.sigmoid(conv1x1(1, "ai_fc3")(jnp.tanh(ri + rp)))
        p_new = conv1x1(ic, "ai_conv1")(point_grid)
        p_new = BatchNorm2d(ic, axis_name=self.axis_name,
                            name="ai_conv1_bn")(p_new, train)
        p_new = nn.relu(p_new) * att
        fused = jnp.concatenate([img_feats, p_new], axis=-1)
        fused = conv1x1(self.out_ch, "fuse_conv")(fused)
        fused = BatchNorm2d(self.out_ch, axis_name=self.axis_name,
                            name="fuse_bn")(fused, train)
        return nn.relu(fused), fused


class LearnerMLP(nn.Module):
    """Pseudo-image-feature learner: Linear-BN-ReLU-Linear-BN
    (reference ``spvcnn_swiftnet18_spformer_tsd_full.py:279-287``)."""

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.out_ch, name="fc1")(x)
        x = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name,
                            name="bn1")(x, mask, train)
        x = nn.relu(x)
        x = nn.Dense(self.out_ch, name="fc2")(x)
        return MaskedBatchNorm(self.out_ch, axis_name=self.axis_name,
                               name="bn2")(x, mask, train)
