"""SphereFormer transformer block: dual cubic + radial window attention.

Re-design of the reference ``SphereFormer`` /
``SparseMultiheadSASphereConcat`` (``core/models/sphereformer/
spherical_transformer.py:68-348``): pre-LN block whose heads are split into a
cubic-window branch over cartesian xyz and a radial-window branch over
spherical (theta, beta, r) coordinates, each with contextual relative
position encoding (the radial axis via exponential splitting), concatenated
and projected; then an MLP(4x) residual. Both branches run through the
banded sort-by-window attention in :mod:`u2mkd_tpu.ops.wattn` instead of the
sptr CUDA pair-expansion pipeline.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2mkd_tpu.models.blocks import DropPath
from u2mkd_tpu.ops import wattn


def trunc_normal_init(std):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class SphereAttention(nn.Module):
    """``SparseMultiheadSASphereConcat`` equivalent."""

    dim: int
    num_heads: int
    window_size: Tuple[float, float, float]
    window_size_sphere: Tuple[float, float, float]
    quant_size: Tuple[float, float, float]
    quant_size_sphere: Tuple[float, float, float]
    a: float = 0.0125
    qkv_bias: bool = True
    band_cubic: int = 1  # cubic windows hold <= (patch*window)^3 = 27 cells,
    # always within one tile of the sorted order -> band 1 is exact
    band_sphere: int = 4
    tile: int = 128
    use_flash: bool = False  # Pallas flash kernel for the sphere branch:
    # exact at any occupancy (the banded XLA path silently truncates radial
    # windows beyond band*tile keys), 1.65x faster fwd+bwd on TPU, and
    # compiles in seconds. The cubic branch keeps the banded XLA path by
    # default: band=1 is provably exact there (<=27-cell windows) and faster.
    flash_cubic: bool = True  # at in-model per-sample sizes the batched
    # flash kernel beats the vmap'd banded scan on the cubic branch too

    @nn.compact
    def __call__(self, feats, xyz, mask, geom=None):
        """feats [B, V, C], xyz [B, V, 3] metric, mask [B, V].

        ``geom``: optional {"cubic": WindowGeom, "sphere": WindowGeom} of
        host-precomputed window geometry (``data/wgeom_host.py``) — removes
        every in-program sort and quantization from the flash path."""
        b, vcap, c = feats.shape
        h = self.num_heads
        d = c // h
        scale = d ** -0.5
        h1 = h // 2
        h2 = h - h1

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(feats)
        qkv = qkv.reshape(b, vcap, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * scale

        g_cub = int((self.window_size[0] + 1e-4) / self.quant_size[0])
        g_sph = int((self.window_size_sphere[0] + 1e-4) / self.quant_size_sphere[0])
        init = trunc_normal_init(0.02)
        tq_c = self.param("rel_q_cubic", init, (2 * g_cub - 1, 3, h1, d))
        tk_c = self.param("rel_k_cubic", init, (2 * g_cub - 1, 3, h1, d))
        tv_c = self.param("rel_v_cubic", init, (2 * g_cub - 1, 3, h1, d))
        tq_s = self.param("rel_q_sphere", init, (2 * g_sph, 3, h2, d))
        tk_s = self.param("rel_k_sphere", init, (2 * g_sph, 3, h2, d))
        tv_s = self.param("rel_v_sphere", init, (2 * g_sph, 3, h2, d))

        def cubic_branch(qb, kb, vb, xyzb, maskb):
            quant = wattn.quantize_in_window(
                xyzb, maskb, self.window_size, self.quant_size, shift=False
            )
            rpe = wattn.RPEParams(
                table_q=tq_c, table_k=tk_c, table_v=tv_c,
                quant=quant, grid_len=g_cub,
            )
            return wattn.sparse_window_attention(
                qb, kb, vb, xyzb, maskb, self.window_size, shift=False,
                rpe=rpe, band=self.band_cubic, tile=self.tile,
            )

        def sphere_branch(qb, kb, vb, xyzb, maskb):
            sph = wattn.cart2sphere(xyzb)
            quant = wattn.quantize_in_window(
                sph, maskb, self.window_size_sphere, self.quant_size_sphere,
                shift=False,
            )
            rpe = wattn.RPEParams(
                table_q=tq_s, table_k=tk_s, table_v=tv_s,
                quant=quant, grid_len=g_sph, r=sph[:, 2], a=self.a,
            )
            return wattn.sparse_window_attention(
                qb, kb, vb, sph, maskb, self.window_size_sphere, shift=False,
                rpe=rpe, band=self.band_sphere, tile=self.tile,
            )

        def cubic_flash(qb, kb, vb):
            from u2mkd_tpu.ops.pallas import wattn_kernel as pk

            quant = jax.vmap(
                lambda x, m: wattn.quantize_in_window(
                    x, m, self.window_size, self.quant_size, shift=False)
            )(xyz, mask)
            rpe = wattn.RPEParams(
                table_q=tq_c, table_k=tk_c, table_v=tv_c,
                quant=quant, grid_len=g_cub,
            )
            return pk.sparse_window_attention_flash_batched(
                qb, kb, vb, xyz, mask, self.window_size, shift=False,
                rpe=rpe, tile=self.tile,
            )

        def sphere_flash(qb, kb, vb):
            from u2mkd_tpu.ops.pallas import wattn_kernel as pk

            sph = jax.vmap(wattn.cart2sphere)(xyz)
            quant = jax.vmap(
                lambda x, m: wattn.quantize_in_window(
                    x, m, self.window_size_sphere, self.quant_size_sphere,
                    shift=False)
            )(sph, mask)
            rpe = wattn.RPEParams(
                table_q=tq_s, table_k=tk_s, table_v=tv_s,
                quant=quant, grid_len=g_sph, r=sph[:, :, 2], a=self.a,
            )
            return pk.sparse_window_attention_flash_batched(
                qb, kb, vb, sph, mask, self.window_size_sphere, shift=False,
                rpe=rpe, tile=self.tile,
            )

        def pregeom(qb, kb, vb, branch, tq, tk, tv, g, a):
            from u2mkd_tpu.ops.pallas import wattn_kernel as pk

            return pk.flash_pregeom_batched(
                qb, kb, vb, mask, geom[branch], tq, tk, tv,
                grid_len=g, a=a, tile=self.tile,
            )

        q1 = q[:, :, :h1].astype(jnp.float32)
        k1 = k[:, :, :h1].astype(jnp.float32)
        v1 = v[:, :, :h1].astype(jnp.float32)
        q2 = q[:, :, h1:].astype(jnp.float32)
        k2 = k[:, :, h1:].astype(jnp.float32)
        v2 = v[:, :, h1:].astype(jnp.float32)
        has_geom = geom is not None
        if self.use_flash and self.flash_cubic:
            if has_geom:
                out1 = pregeom(q1, k1, v1, "cubic", tq_c, tk_c, tv_c,
                               g_cub, 0.0)
            else:
                out1 = cubic_flash(q1, k1, v1)
        else:
            out1 = jax.vmap(cubic_branch)(q1, k1, v1, xyz, mask)
        if self.use_flash:
            if has_geom:
                out2 = pregeom(q2, k2, v2, "sphere", tq_s, tk_s, tv_s,
                               g_sph, self.a)
            else:
                out2 = sphere_flash(q2, k2, v2)
        else:
            out2 = jax.vmap(sphere_branch)(q2, k2, v2, xyz, mask)
        out = jnp.concatenate([out1, out2], axis=2).reshape(b, vcap, c)
        out = nn.Dense(c, name="proj")(out)
        return jnp.where(mask[..., None], out, 0.0)


class SphereFormerBlock(nn.Module):
    """Pre-LN transformer block (reference ``SphereFormer``,
    ``spherical_transformer.py:286-348``)."""

    dim: int
    num_heads: int
    window_size: Tuple[float, float, float]
    window_size_sphere: Tuple[float, float, float]
    quant_size: Tuple[float, float, float]
    quant_size_sphere: Tuple[float, float, float]
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    a: float = 0.0125
    axis_name: Optional[str] = None
    band_cubic: int = 1  # cubic windows hold <= (patch*window)^3 = 27 cells,
    # always within one tile of the sorted order -> band 1 is exact
    band_sphere: int = 4
    tile: int = 128
    use_flash: bool = False
    flash_cubic: bool = True

    @nn.compact
    def __call__(self, feats, xyz, mask, train: bool, geom=None):
        short = feats
        x = nn.LayerNorm(name="norm1")(feats)
        x = SphereAttention(
            dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size,
            window_size_sphere=self.window_size_sphere,
            quant_size=self.quant_size,
            quant_size_sphere=self.quant_size_sphere,
            a=self.a, band_cubic=self.band_cubic, band_sphere=self.band_sphere,
            tile=self.tile, use_flash=self.use_flash,
            flash_cubic=self.flash_cubic, name="attn",
        )(x, xyz, mask, geom=geom)
        x = short + DropPath(self.drop_path, name="drop_path1")(x, train)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, train)
        return jnp.where(mask[..., None], x, 0.0)
