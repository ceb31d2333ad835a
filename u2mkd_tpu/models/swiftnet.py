"""SwiftNet-ResNet image branch (channels-last dense CNN).

Re-design of the reference ``SwiftNetResNet``
(``core/models/image_branch/swiftnet.py:115-368``): ResNet-18/34 backbone
with a stride-1 7x7 stem conv + 3x3/s2 maxpool, BasicBlocks that return both
the post-ReLU activation and the pre-activation skip, a 3-level Spatial
Pyramid Pooling bottleneck, and a lightweight _Upsample decoder
(bottleneck-skip + bilinear align_corners upsample + blend conv).

Layout is NHWC (TPU-native); the staged API (``forward_stem`` /
``forward_resblock`` / ``forward_up``) mirrors the reference so the fusion
student can interleave LiDAR stages.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with torch ``align_corners=True`` semantics.

    x: [..., H, W, C] -> [..., h, w, C]. Sample grid = linspace(0, H-1, h).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x

    def coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.linspace(0.0, n_in - 1.0, n_out)

    ys = coords(h_in, h_out)
    xs = coords(w_in, w_out)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h_in - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(w_in - 2, 0))
    wy = (ys - y0).astype(x.dtype)
    wx = (xs - x0).astype(x.dtype)
    y1 = jnp.minimum(y0 + 1, h_in - 1)
    x1 = jnp.minimum(x0 + 1, w_in - 1)
    top = x[..., y0, :, :]
    bot = x[..., y1, :, :]
    row = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    left = row[..., :, x0, :]
    right = row[..., :, x1, :]
    return left * (1 - wx)[None, :, None] + right * wx[None, :, None]


def adaptive_avg_pool_matrices(n_in: int, n_out: int) -> np.ndarray:
    """Torch ``adaptive_avg_pool2d`` as an exact [n_out, n_in] averaging
    matrix (windows floor(i*n/g) .. ceil((i+1)*n/g))."""
    a = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = int(np.floor(i * n_in / n_out))
        e = int(np.ceil((i + 1) * n_in / n_out))
        a[i, s:e] = 1.0 / (e - s)
    return a


class BatchNorm2d(nn.Module):
    """Plain torch-semantics BN over NHWC maps (optionally mesh-synced)."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if train:
            axes = tuple(range(x.ndim - 1))
            cnt = jnp.asarray(np.prod(x.shape[:-1]), jnp.float32)
            # f32 statistics regardless of the bf16 compute policy
            # (ops/precision.py): bf16 sums over millions of pixels lose
            # the variance to cancellation in s2/cnt - mean^2
            xf = x.astype(jnp.float32)
            s1 = jnp.sum(xf, axis=axes)
            s2 = jnp.sum(xf * xf, axis=axes)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def conv(out_ch, k, stride=1, name=None):
    from u2mkd_tpu.ops.precision import compute_dtype

    return nn.Conv(out_ch, (k, k), strides=(stride, stride), padding=k // 2,
                   use_bias=False, name=name, dtype=compute_dtype(),
                   kernel_init=nn.initializers.variance_scaling(
                       2.0, "fan_out", "truncated_normal"))


class BasicBlock(nn.Module):
    """ResNet BasicBlock returning (relu(out), skip).

    The reference intends the skip to be the pre-activation sum (its
    docstrings say "skip = conv+bn"), but its ``nn.ReLU(inplace=True)``
    mutates the sum tensor before the pair is returned
    (``swiftnet.py:28,47-50``), so the skip the decoder/fusion actually
    receives is POST-relu — both returned tensors are the same storage.
    Matching the executed behavior, not the comment (caught by
    ``test_ref_swiftnet_oracle`` with shared weights)."""

    planes: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = conv(self.planes, 3, self.stride, name="conv1")(x)
        out = BatchNorm2d(self.planes, axis_name=self.axis_name, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv(self.planes, 3, name="conv2")(out)
        out = BatchNorm2d(self.planes, axis_name=self.axis_name, name="bn2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = conv(self.planes, 1, self.stride, name="down_conv")(x)
            residual = BatchNorm2d(self.planes, axis_name=self.axis_name,
                                   name="down_bn")(residual, train)
        act = nn.relu(out + residual)
        return act, act


class BNReluConv(nn.Module):
    """BN -> ReLU -> conv (reference ``_BNReluConv``)."""

    out_ch: int
    k: int = 3
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = BatchNorm2d(x.shape[-1], momentum=self.bn_momentum,
                        axis_name=self.axis_name, name="norm")(x, train)
        x = nn.relu(x)
        return conv(self.out_ch, self.k, name="conv")(x)


class SpatialPyramidPooling(nn.Module):
    """3-level SPP (reference ``SpatialPyramidPooling``)."""

    bt_size: int = 128
    level_size: int = 42
    out_size: int = 128
    grids: Tuple[int, ...] = (8, 4, 2, 1)
    num_levels: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        ar = w / h
        x = BNReluConv(self.bt_size, k=1, bn_momentum=0.012,
                       axis_name=self.axis_name, name="spp_bn")(x, train)
        levels = [x]
        for i in range(self.num_levels):
            g = self.grids[i]
            gh, gw = g, max(1, round(ar * g))
            ah = jnp.asarray(adaptive_avg_pool_matrices(h, gh))
            aw = jnp.asarray(adaptive_avg_pool_matrices(w, gw))
            pooled = jnp.einsum("ph,bhwc,qw->bpqc", ah, x, aw)
            lvl = BNReluConv(self.level_size, k=1, bn_momentum=0.012,
                             axis_name=self.axis_name, name=f"spp{i}")(pooled, train)
            levels.append(resize_bilinear_align_corners(lvl, (h, w)))
        out = jnp.concatenate(levels, axis=-1)
        return BNReluConv(self.out_size, k=1, bn_momentum=0.012,
                          axis_name=self.axis_name, name="spp_fuse")(out, train)


class Upsample(nn.Module):
    """Skip bottleneck + align-corners upsample + blend (reference
    ``_Upsample``)."""

    num_maps_in: int
    num_maps_out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool):
        skip = BNReluConv(self.num_maps_in, k=1, axis_name=self.axis_name,
                          name="bottleneck")(skip, train)
        x = resize_bilinear_align_corners(x, skip.shape[-3:-1])
        x = x + skip
        return BNReluConv(self.num_maps_out, k=3, axis_name=self.axis_name,
                          name="blend_conv")(x, train)


class SwiftNetResNet(nn.Module):
    """ResNet-18/34 SwiftNet with staged API.

    img_cs (stage channels incl. stem and SPP) = [64, 64, 128, 256, 128]
    for ResNet-18 (reference ``swiftnet.py:123``).
    """

    layers: Tuple[int, ...] = (2, 2, 2, 2)
    num_features: Tuple[int, int, int] = (128, 128, 128)
    axis_name: Optional[str] = None

    @property
    def img_cs(self):
        return [64, 64, 128, 256, self.num_features[0]]

    def setup(self):
        blocks = []
        planes = (64, 128, 256, 512)
        for li, n in enumerate(self.layers):
            stage = []
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                stage.append(
                    BasicBlock(planes[li], stride, self.axis_name,
                               name=f"layer{li + 1}_{bi}")
                )
            blocks.append(stage)
        self.blocks = blocks
        self.stem_conv = conv(64, 7, 1, name="conv1")
        self.stem_bn = BatchNorm2d(64, axis_name=self.axis_name, name="bn1")
        self.spp = SpatialPyramidPooling(
            bt_size=self.num_features[0], level_size=self.num_features[0] // 3,
            out_size=self.num_features[0], axis_name=self.axis_name, name="spp",
        )
        ups = []
        skips = (64, 128, 256)
        for i in range(3):
            ups.append(
                Upsample(self.num_features[0], self.num_features[0],
                         axis_name=self.axis_name, name=f"up{i}")
            )
        self.ups = ups

    def forward_stem(self, image, train: bool):
        """7x7/s1 conv + BN + ReLU + 3x3/s2 maxpool (image NHWC)."""
        x = self.stem_conv(image)
        x = self.stem_bn(x, train)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def forward_resblock(self, x, stage_idx: int, train: bool):
        skip = None
        for blk in self.blocks[stage_idx]:
            x, skip = blk(x, train)
        return x, skip

    def forward_spp(self, skip, train: bool):
        return self.spp(skip, train)

    def forward_down(self, image, train: bool):
        x = self.forward_stem(image, train)
        feats = []
        for i in range(4):
            x, skip = self.forward_resblock(x, i, train)
            feats.append(skip if i < 3 else self.forward_spp(skip, train))
        return feats

    def forward_up(self, features, train: bool, im_size=None):
        features = features[::-1]
        x = features[0]
        for skip, up in zip(features[1:], self.ups):
            x = up(x, skip, train)
        if im_size is not None:
            x = resize_bilinear_align_corners(x, im_size)
        return x

    def __call__(self, image, train: bool, im_size=None):
        return self.forward_up(self.forward_down(image, train), train, im_size)
