"""CamLiFlow-style bidirectional fusion modules (CLFM).

Re-design of the reference's kNN-based fusion capability surface
(``core/models/fusion_blocks.py:285-558``; not on the live student path —
only ``CLFM``/``FusionAwareInterp`` use the csrc kNN op):

  * :class:`FusionAwareInterp` — splat sparse 3D point features onto the
    pixel grid by kNN in projected uv space with a learned offset-score gate.
  * :class:`SKFusion` — selective-kernel channel gating between a 2D and a
    3D feature map.
  * :class:`CLFM` — the bidirectional wrapper (2D<-interp(3D), 3D<-sample(2D)).

kNN runs through :func:`u2mkd_tpu.ops.pointops.knn` (tiled brute force on
the MXU) instead of the CUDA register-heap kernel. Layout is channel-last.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2mkd_tpu.models.fusion import feature_gather
from u2mkd_tpu.ops.pointops import knn


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class FusionAwareInterp(nn.Module):
    """Scatter 3D point features to the pixel grid via uv-space kNN."""

    n_channels_3d: int
    k: int = 1

    @nn.compact
    def __call__(self, uv, feat_3d, grid_hw: Tuple[int, int], mask=None):
        """uv [N, 2] pixel coords; feat_3d [N, C3]; returns [H, W, C3].

        ``mask`` [N] bool excludes padded/invalid points from the kNN —
        fixed-capacity point buffers park dead rows at uv=(0, 0), which
        would otherwise win nearest-neighbor for pixels near the origin
        and splat zero features at distance ~0."""
        h, w = grid_hw
        gx = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
        gy = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
        grid = jnp.stack([gx, gy], axis=-1)  # [HW, 2]
        idx = knn(grid, uv, self.k, points_valid=mask)  # [HW, k]
        knn_uv = uv[idx]  # [HW, k, 2]
        knn_f = feat_3d[idx]  # [HW, k, C3]
        off = knn_uv - grid[:, None, :]
        off_norm = jnp.linalg.norm(off, axis=-1, keepdims=True)
        score_in = jnp.concatenate([off, off_norm], axis=-1)  # [HW, k, 3]
        s = _leaky(nn.Dense(16, name="score_fc1")(score_in))
        s = jax.nn.sigmoid(nn.Dense(self.n_channels_3d, name="score_fc2")(s))
        out = jnp.sum(s * knn_f, axis=1).reshape(h, w, self.n_channels_3d)
        return _leaky(nn.Dense(self.n_channels_3d, name="out_conv")(out))


class SKFusion(nn.Module):
    """Selective-kernel gate between two aligned feature maps."""

    out_channels: int
    reduction: int = 1

    @nn.compact
    def __call__(self, feat_a, feat_b):
        """feat_a/feat_b: [..., C] (2D map [H,W,C] or point set [N,C])."""
        a = _leaky(nn.Dense(self.out_channels, name="align1")(feat_a))
        b = _leaky(nn.Dense(self.out_channels, name="align2")(feat_b))
        pooled = jnp.mean((a + b).reshape(-1, self.out_channels), axis=0)
        wgt = nn.relu(nn.Dense(self.out_channels // self.reduction,
                               use_bias=False, name="fc_mid")(pooled))
        wgt = jax.nn.sigmoid(
            nn.Dense(self.out_channels * 2, use_bias=False, name="fc_out")(wgt)
        ).reshape(self.out_channels, 2)
        wgt = jax.nn.softmax(wgt, axis=-1)
        return a * wgt[:, 0] + b * wgt[:, 1]


class CLFM(nn.Module):
    """Bidirectional camera-LiDAR fusion (reference ``CLFM``)."""

    in_channels_2d: int
    in_channels_3d: int

    @nn.compact
    def __call__(self, uv, feat_2d, feat_3d, mask=None):
        """uv [N, 2] pixel coords; feat_2d [H, W, C2]; feat_3d [N, C3];
        ``mask`` [N] bool marks live points (padding excluded from the kNN
        splat). Returns (out2d [H, W, C2], out3d [N, C3])."""
        h, w, _ = feat_2d.shape
        sg = jax.lax.stop_gradient
        interp = FusionAwareInterp(self.in_channels_3d, name="interp")(
            uv, sg(feat_3d), (h, w), mask=mask
        )
        out2d = SKFusion(self.in_channels_2d, reduction=2, name="fuse2d")(
            feat_2d, interp
        )
        # sample 2D features at uv (align-corners bilinear over pixel coords)
        norm_uv = jnp.stack(
            [uv[:, 0] / (w - 1.0) * 2 - 1, uv[:, 1] / (h - 1.0) * 2 - 1], -1
        )
        sampled = feature_gather(sg(feat_2d), norm_uv)  # [N, C2]
        sampled = _leaky(nn.Dense(self.in_channels_2d, name="mlps3d")(sampled))
        out3d = SKFusion(self.in_channels_3d, reduction=2, name="fuse3d")(
            sampled, feat_3d
        )
        return out2d, out3d
