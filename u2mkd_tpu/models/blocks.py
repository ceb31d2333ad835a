"""Flax building blocks for the sparse U-Net models.

Equivalents of the reference's ``core/models/build_blocks.py`` (conv-BN-ReLU,
transposed block, residual block) and ``SparseSyncBatchNorm``
(``core/models/utils.py:138-220``). Feature arrays are batched ``[B, V, C]``
with a validity mask ``[B, V]``; rulebooks come from
:mod:`u2mkd_tpu.ops.spconv` via the per-forward level plumbing.

SyncBN semantics come for free: statistics are reduced over the whole
(masked) batch axis here, and over the data-parallel mesh axis via
``lax.pmean`` when ``axis_name`` is set — the TPU-native replacement for
NCCL SyncBatchNorm.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2mkd_tpu.core.structures import LevelContext
from u2mkd_tpu.ops import spconv


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """torchsparse Conv3d init: uniform(-s, s) with s = 1/sqrt(K * Cin)
    (torchsparse 1.4 ``reset_parameters``; same bound as torch's default
    ``kaiming_uniform_(a=sqrt(5))``). NOT plain He-uniform — that bound is
    sqrt(6)x wider and changes from-scratch training dynamics vs the
    reference recipe."""
    k, cin, cout = shape
    bound = (k * cin) ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def deconv_kernel_init(key, shape, dtype=jnp.float32):
    """Transposed variant: torchsparse uses OUT channels in the fan
    (``reset_parameters`` picks out_channels when transposed)."""
    k, cin, cout = shape
    bound = (k * cout) ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of [B, V, C] with optional mesh-axis sync.

    Torch-compatible: momentum 0.1 (new-stat weight), eps 1e-5, biased batch
    variance for normalization, unbiased for the running estimate.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.sum(m)
            s1 = jnp.sum(x * m, axis=(0, 1))
            s2 = jnp.sum((x * x) * m, axis=(0, 1))
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class SparseConv(nn.Module):
    """Stride-1 sparse conv (ks in {1, 3}) over a cached rulebook.

    With a host conv ``plan`` (Morton tiling, ``LevelContext.conv_plan``)
    and sizes inside the kernel's VMEM budget, the 27-neighbor gather runs
    as the pallas banded one-hot gather-GEMM (``ops/pallas/spconv_kernel``)
    — the XLA gather path is the fallback and the numerical oracle."""

    out_ch: int
    ks: int = 3

    @nn.compact
    def __call__(self, feats, nbr, plan=None):
        k = spconv.kernel_offsets(self.ks).shape[0]
        w = self.param("kernel", conv_kernel_init, (k, feats.shape[-1], self.out_ch))
        if self.ks == 1:
            return jnp.einsum("bvc,cd->bvd", feats, w[0])
        if plan is not None:
            from u2mkd_tpu.ops.pallas import spconv_kernel as spk

            nbr_t, jl, jn, kr = plan
            t = feats.shape[1] // jn.shape[-1]  # host-chosen tile
            if spk.supported(feats.shape[-1], self.out_ch, k, t):
                from u2mkd_tpu.ops.precision import cast_compute

                f, wc = cast_compute(feats, w)
                return spk.rulebook_conv(
                    f, wc, nbr_t, jl, jn, kr, t
                ).astype(feats.dtype)
        return jax.vmap(lambda f, n: spconv.sparse_conv(f, n, w))(feats, nbr)


class SparseDownConv(nn.Module):
    """ks=2 / stride=2 downsample conv: fine level -> coarse level."""

    out_ch: int

    @nn.compact
    def __call__(self, feats, down_nbr8):
        w = self.param("kernel", conv_kernel_init, (8, feats.shape[-1], self.out_ch))
        return jax.vmap(lambda f, n: spconv.sparse_conv(f, n, w))(feats, down_nbr8)


class SparseDeconv(nn.Module):
    """ks=2 / stride=2 transposed conv onto the cached finer-level coords."""

    out_ch: int

    @nn.compact
    def __call__(self, feats, up_parent, up_koff):
        w = self.param("kernel", deconv_kernel_init,
                       (8, feats.shape[-1], self.out_ch))
        return jax.vmap(
            lambda f, p, k: spconv.sparse_conv_transposed_2x2(f, p, k, w)
        )(feats, up_parent, up_koff)


class SparseConvBlock(nn.Module):
    """conv-BN-ReLU (``BasicConvolutionBlock``, reference
    ``build_blocks.py:21-36``). stride=2 uses the down rulebook."""

    out_ch: int
    ks: int = 3
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, level: LevelContext, train: bool,
                 down_nbr8=None, out_mask=None):
        if self.stride == 1:
            nbr = level.nbr27 if self.ks == 3 else None
            x = SparseConv(self.out_ch, self.ks)(feats, nbr,
                                                 plan=level.conv_plan())
            mask = level.grid.mask
        else:
            x = SparseDownConv(self.out_ch)(feats, down_nbr8)
            mask = out_mask
        x = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name)(x, mask, train)
        return nn.relu(x)


class SparseDeconvBlock(nn.Module):
    """deconv-BN-ReLU (``BasicDeconvolutionBlock``, reference
    ``build_blocks.py:39-52``)."""

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, up_parent, up_koff, out_mask, train: bool):
        x = SparseDeconv(self.out_ch)(feats, up_parent, up_koff)
        x = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name)(x, out_mask, train)
        return nn.relu(x)


class SparseResBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + (1x1 conv-BN shortcut if needed), ReLU
    (``ResidualBlock``, reference ``build_blocks.py:55-84``)."""

    out_ch: int
    ks: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, level: LevelContext, train: bool):
        mask = level.grid.mask
        nbr = level.nbr27
        plan = level.conv_plan()
        x = SparseConv(self.out_ch, self.ks)(feats, nbr, plan=plan)
        x = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name)(x, mask, train)
        x = nn.relu(x)
        x = SparseConv(self.out_ch, self.ks)(x, nbr, plan=plan)
        x = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name)(x, mask, train)
        if feats.shape[-1] == self.out_ch:
            short = feats
        else:
            short = SparseConv(self.out_ch, 1)(feats, None)
            short = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name)(
                short, mask, train
            )
        return nn.relu(x + short)


class PointMLP(nn.Module):
    """Linear-BN-ReLU on per-point features (the reference's
    ``point_transforms``, ``spvcnn.py:58-74``)."""

    out_ch: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        x = nn.Dense(self.out_ch)(feats)
        x = MaskedBatchNorm(self.out_ch, axis_name=self.axis_name)(x, mask, train)
        return nn.relu(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm ``DropPath`` semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
