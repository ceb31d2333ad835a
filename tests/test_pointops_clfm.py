"""kNN/FPS/correlation ops vs torch oracles; CLFM fusion smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from u2mkd_tpu.models.clfm import CLFM, FusionAwareInterp, SKFusion
from u2mkd_tpu.ops import pointops


def test_knn_matches_torch(rng):
    q = rng.randn(200, 3).astype(np.float32)
    p = rng.randn(500, 3).astype(np.float32)
    k = 8
    got = np.asarray(pointops.knn(jnp.asarray(q), jnp.asarray(p), k, tile=64))
    d = torch.cdist(torch.tensor(q), torch.tensor(p))
    exp = torch.topk(d, k, largest=False).indices.numpy()
    # allow tie-order differences: compare distances
    dq = np.linalg.norm(q[:, None] - p[got], axis=-1)
    de = np.linalg.norm(q[:, None] - p[exp], axis=-1)
    np.testing.assert_allclose(np.sort(dq, -1), np.sort(de, -1), atol=1e-4)


def test_knn_respects_validity(rng):
    q = rng.randn(50, 2).astype(np.float32)
    p = rng.randn(100, 2).astype(np.float32)
    valid = np.zeros(100, bool)
    valid[:10] = True
    got = np.asarray(
        pointops.knn(jnp.asarray(q), jnp.asarray(p), 3, jnp.asarray(valid), tile=64)
    )
    assert got.max() < 10


def test_fps_spreads_points(rng):
    pts = rng.randn(300, 3).astype(np.float32)
    idx = np.asarray(pointops.farthest_point_sampling(jnp.asarray(pts), 32))
    assert len(np.unique(idx)) == 32
    assert idx[0] == 0
    # FPS min pairwise distance must exceed random sampling's (spread test)
    d_fps = np.linalg.norm(pts[idx][:, None] - pts[idx][None], axis=-1)
    d_fps = np.where(np.eye(32, dtype=bool), np.inf, d_fps).min()
    ridx = rng.choice(300, 32, replace=False)
    d_rand = np.linalg.norm(pts[ridx][:, None] - pts[ridx][None], axis=-1)
    d_rand = np.where(np.eye(32, dtype=bool), np.inf, d_rand).min()
    assert d_fps >= d_rand


def test_correlation2d_matches_manual(rng):
    a = rng.randn(6, 8, 4).astype(np.float32)
    b = rng.randn(6, 8, 4).astype(np.float32)
    d = 2
    got = np.asarray(pointops.correlation2d(jnp.asarray(a), jnp.asarray(b), d))
    assert got.shape == (6, 8, 25)
    # manual check at a center pixel for displacement (dy=1, dx=-1)
    y, x = 3, 4
    kidx = (1 + d) * (2 * d + 1) + (-1 + d)
    exp = np.dot(a[y, x], b[y + 1, x - 1]) / 4
    np.testing.assert_allclose(got[y, x, kidx], exp, rtol=1e-5)
    # out-of-range displacement contributes zero at the border
    assert got[0, 0, 0] == np.dot(a[0, 0], b[0 - d if d <= 0 else 0, 0]) / 4 or True
    np.testing.assert_allclose(
        got[0, 0, 0], 0.0, atol=1e-6
    )  # (dy=-2, dx=-2) from (0,0) is outside -> zero padding


def test_clfm_shapes(rng):
    n, h, w, c2, c3 = 100, 16, 24, 32, 48
    uv = (rng.rand(n, 2) * [w - 1, h - 1]).astype(np.float32)
    f2d = rng.randn(h, w, c2).astype(np.float32)
    f3d = rng.randn(n, c3).astype(np.float32)
    model = CLFM(c2, c3)
    var = model.init(jax.random.PRNGKey(0), jnp.asarray(uv), jnp.asarray(f2d),
                     jnp.asarray(f3d))
    out2d, out3d = model.apply(var, jnp.asarray(uv), jnp.asarray(f2d),
                               jnp.asarray(f3d))
    assert out2d.shape == (h, w, c2)
    assert out3d.shape == (n, c3)
    assert np.isfinite(np.asarray(out2d)).all()
    assert np.isfinite(np.asarray(out3d)).all()
