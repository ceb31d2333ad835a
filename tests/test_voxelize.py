"""Parity tests for voxelize/devoxelize ops vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.ops import hashing, voxelize


def make_cloud(rng, p=1000, scale=20.0, c=4):
    pts = (rng.rand(p, 3) * scale - scale / 2).astype(np.float32)
    feats = rng.randn(p, c).astype(np.float32)
    mask = rng.rand(p) > 0.1
    return pts, feats, mask


def np_voxel_table(pts, mask):
    """Oracle: floor coords, sorted-unique table, inverse."""
    ic = np.floor(pts).astype(np.int64)
    order = np.lexsort((ic[:, 2], ic[:, 1], ic[:, 0]))
    vc = ic[mask]
    uniq, inv = np.unique(vc, axis=0, return_inverse=True)
    # np.unique(axis=0) sorts lexicographically — same order as our packed keys
    return uniq, inv


def test_voxelize_initial_matches_oracle(rng):
    pts, feats, mask = make_cloud(rng)
    cap = 900
    out = jax.jit(lambda a, b, m: voxelize.voxelize_initial(a, b, m, cap))(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask)
    )
    uniq, inv = np_voxel_table(pts, mask)
    num = int(out["num"])
    assert num == len(uniq)
    np.testing.assert_array_equal(np.asarray(out["vcoords"])[:num], uniq)
    # mean features per voxel
    vfeats = np.asarray(out["vfeats"])[:num]
    exp = np.zeros_like(vfeats)
    cnt = np.zeros(num)
    for j, i in zip(inv, np.where(mask)[0]):
        exp[j] += feats[i]
        cnt[j] += 1
    exp /= cnt[:, None]
    np.testing.assert_allclose(vfeats, exp, rtol=1e-5, atol=1e-5)
    # counts
    np.testing.assert_array_equal(np.asarray(out["counts"])[:num], cnt.astype(np.int32))
    # p2v consistent
    p2v = np.asarray(out["p2v"])
    valid_rows = p2v[mask]
    np.testing.assert_array_equal(valid_rows, inv)
    assert np.all(p2v[~mask] == cap)


def test_point_voxel_query_stride(rng):
    pts, feats, mask = make_cloud(rng)
    cap = 900
    out = voxelize.voxelize_initial(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask), cap)
    # stride 1: query of each point's own floor coord must hit its own voxel
    q = voxelize.point_voxel_query(jnp.asarray(pts), jnp.asarray(mask), 1,
                                   out["key_hi"], out["key_lo"])
    q = np.asarray(q)
    p2v = np.asarray(out["p2v"])
    np.testing.assert_array_equal(q[mask], p2v[mask])
    assert np.all(q[~mask] == -1)


def test_trilinear_weights_sum_to_one(rng):
    pts = (rng.rand(100, 3) * 10).astype(np.float32)
    for s in (1, 2, 4):
        w = np.asarray(voxelize.trilinear_weights(jnp.asarray(pts), s))
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        assert np.all(w >= 0)


def test_trilinear_weights_values(rng):
    # A point at fractional position (0.25, 0.5, 0.75) within its cell:
    pts = jnp.asarray([[3.25, -2.5, 0.75]], jnp.float32)
    w = np.asarray(voxelize.trilinear_weights(pts, 1))[0]
    fx, fy, fz = 0.25, 0.5, 0.75
    offs = np.asarray(voxelize.kernel_offsets_2())
    exp = []
    for dx, dy, dz in offs:
        exp.append(
            (fx if dx else 1 - fx) * (fy if dy else 1 - fy) * (fz if dz else 1 - fz)
        )
    np.testing.assert_allclose(w, exp, atol=1e-6)


def test_devoxelize_roundtrip_constant_field(rng):
    """With a constant voxel feature field, trilinear blending returns the
    constant wherever all 8 neighbors exist."""
    pts, feats, mask = make_cloud(rng, p=500, scale=8.0)
    cap = 800
    out = voxelize.voxelize_initial(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask), cap)
    vfeats = jnp.where(out["vmask"][:, None], 7.5, 0.0) * jnp.ones((1, 4))
    idx8, w8 = voxelize.voxel_to_point_query(
        jnp.asarray(pts), jnp.asarray(mask), 1, out["key_hi"], out["key_lo"]
    )
    res = np.asarray(voxelize.trilinear_devoxelize(vfeats, idx8, w8))
    idx8 = np.asarray(idx8)
    # weights renormalize over present neighbors, so a constant field is
    # reproduced exactly for every valid point (containing voxel always exists)
    np.testing.assert_allclose(res[mask], 7.5, atol=1e-3)
    # containing voxel must always be present for valid points
    np.testing.assert_array_equal(idx8[mask, 0], np.asarray(out["p2v"])[mask])


def test_devoxelize_nearest(rng):
    pts, feats, mask = make_cloud(rng, p=300)
    cap = 400
    out = voxelize.voxelize_initial(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask), cap)
    idx8, w8 = voxelize.voxel_to_point_query(
        jnp.asarray(pts), jnp.asarray(mask), 1, out["key_hi"], out["key_lo"], nearest=True
    )
    res = np.asarray(voxelize.trilinear_devoxelize(out["vfeats"], idx8, w8))
    vfeats = np.asarray(out["vfeats"])
    p2v = np.asarray(out["p2v"])
    # reference nearest semantics (utils.py:95-97): zero the non-self
    # entries of calc_ti_weights' NORMALIZED output, no renorm -> the own
    # voxel's feature scaled by its normalized trilinear weight w0 <= 1
    idx8f, w8f = voxelize.voxel_to_point_query(
        jnp.asarray(pts), jnp.asarray(mask), 1, out["key_hi"], out["key_lo"],
        nearest=False,
    )
    w0 = np.asarray(w8f)[:, 0]
    exp = vfeats[np.clip(p2v, 0, cap - 1)] * w0[:, None]
    np.testing.assert_allclose(res[mask], exp[mask], rtol=1e-3, atol=1e-4)
    # self-row weight never exceeds 1 and is strictly < 1 for off-center pts
    assert np.all(np.asarray(w8)[:, 0] <= 1.0 + 1e-6)
    assert np.all(np.asarray(w8)[mask, 1:] == 0.0)


def test_point_to_voxel_mean(rng):
    pts, feats, mask = make_cloud(rng)
    cap = 900
    out = voxelize.voxelize_initial(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask), cap)
    res = np.asarray(voxelize.point_to_voxel_mean(jnp.asarray(feats), out["p2v"], cap))
    np.testing.assert_allclose(res, np.asarray(out["vfeats"]), rtol=1e-5, atol=1e-5)


def test_vmap_over_batch(rng):
    """All ops vmap cleanly over a batch axis."""
    B, P, cap = 3, 400, 600
    pts = np.stack([make_cloud(rng, p=P)[0] for _ in range(B)])
    feats = np.stack([rng.randn(P, 4).astype(np.float32) for _ in range(B)])
    mask = np.ones((B, P), bool)
    fn = jax.vmap(lambda a, b, m: voxelize.voxelize_initial(a, b, m, cap))
    out = fn(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask))
    assert out["vcoords"].shape == (B, cap, 3)
    for b in range(B):
        uniq, _ = np_voxel_table(pts[b], mask[b])
        assert int(out["num"][b]) == len(uniq)
