"""Sine / Fourier coordinate position embeddings.

Equivalent of sptr's vendored ``PositionEmbeddingCoordsSine``
(reference ``third_party/SparseTransformer/sptr/position_embedding.py:
42-173``, 3DETR-derived): embeds D-dimensional coordinates either with
per-axis sine/cosine ladders or with a random Fourier projection. Offered
for the generic attention module's 'sine'/'fourier' pe_type options (the
live SphereFormer path uses contextual RPE instead).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def shift_scale_points(xyz: jax.Array, src_range, dst_range=None) -> jax.Array:
    """Map coords from src_range boxes to dst_range (default unit cube)."""
    src_min, src_max = src_range
    if dst_range is None:
        dst_min = jnp.zeros_like(src_min)
        dst_max = jnp.ones_like(src_min)
    else:
        dst_min, dst_max = dst_range
    return (xyz - src_min) / jnp.maximum(src_max - src_min, 1e-12) * (
        dst_max - dst_min
    ) + dst_min


class PositionEmbeddingCoordsSine(nn.Module):
    """pos_type in {'sine', 'fourier'}; input xyz [N, D] -> [N, d_pos]."""

    d_pos: int
    pos_type: str = "sine"
    normalize: bool = True
    gauss_scale: float = 1.0
    temperature: float = 10000.0

    @nn.compact
    def __call__(self, xyz: jax.Array, input_range=None) -> jax.Array:
        n, d = xyz.shape
        if self.normalize and input_range is not None:
            xyz = shift_scale_points(xyz, input_range)
        if self.pos_type == "sine":
            # per-axis channel budget (multiple of 2), remainder to early axes
            cdim = 2 * int(np.floor(self.d_pos / (d * 2)))
            rems = self.d_pos - cdim * d
            embeds = []
            for ax in range(d):
                cd = cdim + (2 if rems > 0 else 0)
                rems -= 2
                dim_t = self.temperature ** (
                    2 * (jnp.arange(cd // 2, dtype=jnp.float32)) / cd
                )
                raw = xyz[:, ax:ax + 1] * 2 * jnp.pi / dim_t[None, :]
                # reference interleaves sin/cos per frequency
                # (position_embedding.py:112-114), not blocked [sin..|cos..]
                embeds.append(jnp.stack(
                    [jnp.sin(raw), jnp.cos(raw)], axis=-1).reshape(n, cd))
            out = jnp.concatenate(embeds, axis=-1)
            return out[:, : self.d_pos]
        elif self.pos_type == "fourier":
            b = self.param(
                "gauss_B",
                lambda key, shape: self.gauss_scale * jax.random.normal(key, shape),
                (d, self.d_pos // 2),
            )
            raw = 2 * jnp.pi * xyz @ jax.lax.stop_gradient(b)
            return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=-1)
        raise NotImplementedError(self.pos_type)


class WindowMultiheadSA(nn.Module):
    """Generic single-geometry windowed attention module (the
    ``VarLengthMultiheadSA`` shape, reference ``sptr/modules.py:69-199``):
    one window geometry, optional sine/fourier absolute PE added to the
    inputs, qkv + windowed attention + projection. The SphereConcat variant
    used by the models lives in :mod:`u2mkd_tpu.models.sphereformer`."""

    dim: int
    num_heads: int
    window_size: tuple
    pe_type: str = "none"  # none | sine | fourier
    qkv_bias: bool = True
    band: int = 2
    tile: int = 128

    @nn.compact
    def __call__(self, feats, xyz, mask):
        from u2mkd_tpu.ops import wattn

        b, vcap, c = feats.shape
        h = self.num_heads
        dd = c // h
        if self.pe_type in ("sine", "fourier"):
            pe = PositionEmbeddingCoordsSine(
                d_pos=c, pos_type=self.pe_type, name="pos_enc"
            )
            feats = feats + jax.vmap(pe)(xyz)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(feats)
        qkv = qkv.reshape(b, vcap, 3, h, dd)
        q, k, v = qkv[:, :, 0] * dd ** -0.5, qkv[:, :, 1], qkv[:, :, 2]
        out = jax.vmap(
            lambda qb, kb, vb, xb, mb: wattn.sparse_window_attention(
                qb, kb, vb, xb, mb, self.window_size, band=self.band,
                tile=self.tile,
            )
        )(q, k, v, xyz, mask)
        out = out.reshape(b, vcap, c)
        out = nn.Dense(c, name="proj")(out)
        return jnp.where(mask[..., None], out, 0.0)
