"""Point-cloud utility ops: kNN, farthest point sampling, 2D correlation.

TPU-native equivalents of the reference's ``third_party/csrc`` CUDA ops
(``wrapper.py:40-127``; capability surface for the CamLiFlow-derived fusion
blocks — ``k_nearest_neighbor`` feeds ``FusionAwareInterp``/``CLFM``,
``fusion_blocks.py:285,467``):

  * kNN (2D/3D): tiled brute-force distances + ``lax.top_k`` per tile — the
    register-insertion-sort CUDA kernel becomes an MXU-friendly blocked
    ||a-b||^2 = |a|^2 + |b|^2 - 2ab computation.
  * FPS: ``lax.fori_loop`` of masked argmax distance updates.
  * correlation2d: (2d+1)^2 displacement dot products as shifted windows —
    an einsum over rolled feature maps instead of a custom kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def knn(query: jax.Array, points: jax.Array, k: int,
        points_valid: jax.Array | None = None,
        tile: int = 2048) -> jax.Array:
    """Indices [Q, k] of the k nearest ``points`` rows for each query row.

    query [Q, D], points [N, D] (D = 2 or 3). Invalid points get +inf
    distance. Brute-force in tiles of queries to bound memory.
    """
    q, d = query.shape
    n = points.shape[0]
    if points_valid is None:
        points_valid = jnp.ones((n,), bool)
    pn2 = jnp.sum(points * points, axis=-1)
    pn2 = jnp.where(points_valid, pn2, jnp.inf)

    pad_q = -(-q // tile) * tile
    qp = jnp.zeros((pad_q, d), query.dtype).at[:q].set(query)

    def body(i, out):
        qt = jax.lax.dynamic_slice_in_dim(qp, i * tile, tile)
        qn2 = jnp.sum(qt * qt, axis=-1, keepdims=True)
        d2 = qn2 + pn2[None, :] - 2.0 * qt @ points.T  # [tile, N]
        d2 = jnp.where(points_valid[None, :], d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, k)
        return jax.lax.dynamic_update_slice_in_dim(out, idx, i * tile, 0)

    out = jnp.zeros((pad_q, k), jnp.int32)
    out = jax.lax.fori_loop(0, pad_q // tile, body, out)
    return out[:q]


def farthest_point_sampling(points: jax.Array, num_samples: int,
                            valid: jax.Array | None = None) -> jax.Array:
    """FPS indices [num_samples] (first sample = row 0, torch/CUDA
    convention). points [N, 3]."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    first = jnp.argmax(valid)  # first valid row

    def body(i, carry):
        mind2, idxs = carry
        last = points[idxs[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        mind2 = jnp.minimum(mind2, d2)
        mind2 = jnp.where(valid, mind2, -jnp.inf)
        nxt = jnp.argmax(mind2)
        return mind2, idxs.at[i].set(nxt.astype(jnp.int32))

    idxs = jnp.zeros((num_samples,), jnp.int32).at[0].set(first.astype(jnp.int32))
    mind2 = jnp.where(valid, jnp.inf, -jnp.inf)
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (mind2, idxs))
    return idxs


def correlation2d(a: jax.Array, b: jax.Array, max_displacement: int) -> jax.Array:
    """Cost volume between two NHWC feature maps.

    Output [..., H, W, (2d+1)^2]: out[..., y, x, k] = <a[y,x], b[y+dy, x+dx]>
    / C for each displacement (dy, dx) in [-d, d]^2 (torch correlation
    semantics with channel-mean, reference ``csrc/correlation``).
    """
    d = max_displacement
    c = a.shape[-1]
    pads = [(0, 0)] * (b.ndim - 3) + [(d, d), (d, d), (0, 0)]
    bp = jnp.pad(b, pads)
    h, w = a.shape[-3], a.shape[-2]
    outs = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(bp, dy, dy + h, axis=-3),
                dx, dx + w, axis=-2,
            )
            outs.append(jnp.sum(a * shifted, axis=-1) / c)
    return jnp.stack(outs, axis=-1)
