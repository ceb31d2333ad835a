"""Window attention parity vs a dense per-window numpy oracle."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.ops import wattn


def np_exponential_split(rel, a):
    rel_abs = np.abs(rel)
    flag = (rel >= 0).astype(np.float64)
    idx = 2 * np.floor(np.log((rel_abs + 2 * a) / a) / math.log(2.0)) - 2
    idx = idx + ((3 * (2.0 ** np.floor(idx / 2)) - 2) * a <= rel_abs)
    idx = idx * (2 * flag - 1) + (flag - 1)
    return idx.astype(np.int64) + 24


def np_window_attention(q, k, v, xyz, valid, ws, quant=None, tables=None,
                        grid_len=None, r=None, a=None):
    """Dense oracle: exact softmax attention within each window."""
    vcap, h, d = q.shape
    pos = xyz[valid]
    start = pos.min(0)
    cell = np.floor((xyz - start) / np.asarray(ws)).astype(np.int64)
    out = np.zeros_like(q)
    keys = [tuple(c) for c in cell]
    for w in set(k2 for k2, ok in zip(keys, valid) if ok):
        idx = np.array([i for i in range(vcap) if valid[i] and keys[i] == w])
        qq, kk, vv = q[idx], k[idx], v[idx]  # [n, h, d]
        attn = np.einsum("qhd,khd->qkh", qq, kk)
        if tables is not None:
            tq, tk, tv = tables
            relq = quant[idx][:, None, :] - quant[idx][None, :, :]  # [n,n,3]
            ridx = relq + grid_len - 1
            if r is not None:
                rr = r[idx][:, None] - r[idx][None, :]
                ridx[:, :, 2] = np_exponential_split(rr, a)
                ridx = np.clip(ridx, 0, 2 * grid_len - 1)
            for ax in range(3):
                tq_g = tq[ridx[:, :, ax], ax]  # [n, n, h, d]
                attn += np.einsum("qhd,qkhd->qkh", qq, tq_g)
                tk_g = tk[ridx[:, :, ax], ax]
                attn += np.einsum("khd,qkhd->qkh", kk, tk_g)
        attn = attn - attn.max(1, keepdims=True)
        p = np.exp(attn)
        p /= p.sum(1, keepdims=True)
        o = np.einsum("qkh,khd->qhd", p, vv)
        if tables is not None:
            for ax in range(3):
                tv_g = tables[2][ridx[:, :, ax], ax]
                o += np.einsum("qkh,qkhd->qhd", p, tv_g)
        out[idx] = o
    return out


def make_attn_inputs(rng, vcap=200, h=2, d=8, spread=6.0):
    q = rng.randn(vcap, h, d).astype(np.float32) * 0.5
    k = rng.randn(vcap, h, d).astype(np.float32) * 0.5
    v = rng.randn(vcap, h, d).astype(np.float32)
    xyz = (rng.rand(vcap, 3) * spread).astype(np.float32)
    valid = rng.rand(vcap) > 0.15
    return q, k, v, xyz, valid


def test_exponential_split_bins():
    a = 0.0125
    # documented mapping: [0,a)->0, [a,2a)->1, [2a,4a)->2, [4a,6a)->3,
    # [6a,10a)->4, [10a,14a)->5; negatives: [-a,0)->-1, [-2a,-a)->-2 ...
    vals = np.array([0.0, 0.5 * a, 1.5 * a, 3 * a, 5 * a, 8 * a, 12 * a,
                     -0.5 * a, -1.5 * a, -3 * a])
    exp = np.array([0, 0, 1, 2, 3, 4, 5, -1, -2, -3]) + 24
    got = np.asarray(wattn.exponential_split_index(jnp.asarray(vals), a))
    np.testing.assert_array_equal(got, exp)
    # parity with the independent numpy version on random data
    r = np.random.RandomState(1).randn(500) * 0.3
    np.testing.assert_array_equal(
        np.asarray(wattn.exponential_split_index(jnp.asarray(r), a)),
        np_exponential_split(r, a),
    )


def test_plain_window_attention_matches_oracle(rng):
    q, k, v, xyz, valid = make_attn_inputs(rng)
    ws = (1.5, 1.5, 1.5)
    got = np.asarray(
        wattn.sparse_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), ws, band=2, tile=32,
        )
    )
    exp = np_window_attention(q, k, v, xyz, valid, ws)
    np.testing.assert_allclose(got[valid], exp[valid], atol=2e-5)
    assert np.all(got[~valid] == 0)


def test_rpe_cubic_matches_oracle(rng):
    vcap, h, d = 150, 2, 8
    q, k, v, xyz, valid = make_attn_inputs(rng, vcap, h, d, spread=4.0)
    ws = (2.0, 2.0, 2.0)
    g = 8
    qs = tuple(w / g for w in ws)
    tq = (rng.randn(2 * g - 1, 3, h, d) * 0.05).astype(np.float32)
    tk = (rng.randn(2 * g - 1, 3, h, d) * 0.05).astype(np.float32)
    tv = (rng.randn(2 * g - 1, 3, h, d) * 0.05).astype(np.float32)
    quant = np.asarray(
        wattn.quantize_in_window(jnp.asarray(xyz), jnp.asarray(valid), ws, qs, False)
    )
    rpe = wattn.RPEParams(
        table_q=jnp.asarray(tq), table_k=jnp.asarray(tk), table_v=jnp.asarray(tv),
        quant=jnp.asarray(quant), grid_len=g,
    )
    got = np.asarray(
        wattn.sparse_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), ws, rpe=rpe, band=2, tile=32,
        )
    )
    exp = np_window_attention(q, k, v, xyz, valid, ws, quant=quant,
                              tables=(tq, tk, tv), grid_len=g)
    np.testing.assert_allclose(got[valid], exp[valid], atol=3e-5)


def test_rpe_sphere_matches_oracle(rng):
    vcap, h, d = 120, 2, 8
    q, k, v, _, valid = make_attn_inputs(rng, vcap, h, d)
    cart = (rng.randn(vcap, 3) * 10).astype(np.float32)
    sph = np.asarray(wattn.cart2sphere(jnp.asarray(cart)))
    ws = (24.0, 24.0, 120.0)
    g = 12
    qs = (24.0 / g, 24.0 / g, 5.0)
    a = 0.0125
    tq = (rng.randn(2 * g, 3, h, d) * 0.05).astype(np.float32)
    tk = (rng.randn(2 * g, 3, h, d) * 0.05).astype(np.float32)
    tv = (rng.randn(2 * g, 3, h, d) * 0.05).astype(np.float32)
    quant = np.asarray(
        wattn.quantize_in_window(jnp.asarray(sph), jnp.asarray(valid), ws, qs, False)
    )
    rpe = wattn.RPEParams(
        table_q=jnp.asarray(tq), table_k=jnp.asarray(tk), table_v=jnp.asarray(tv),
        quant=jnp.asarray(quant), grid_len=g, r=jnp.asarray(sph[:, 2]), a=a,
    )
    got = np.asarray(
        wattn.sparse_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(sph),
            jnp.asarray(valid), ws, rpe=rpe, band=3, tile=32,
        )
    )
    exp = np_window_attention(q, k, v, sph, valid, ws, quant=quant,
                              tables=(tq, tk, tv), grid_len=g, r=sph[:, 2], a=a)
    np.testing.assert_allclose(got[valid], exp[valid], atol=3e-5)


def test_band_truncation_no_nan(rng):
    # one giant window, band too small: output must stay finite
    q, k, v, xyz, valid = make_attn_inputs(rng, vcap=300)
    ws = (1000.0, 1000.0, 1000.0)
    got = np.asarray(
        wattn.sparse_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), ws, band=1, tile=32,
        )
    )
    assert np.isfinite(got).all()


def test_cart2sphere_ranges(rng):
    xyz = rng.randn(500, 3).astype(np.float32) * 20
    s = np.asarray(wattn.cart2sphere(jnp.asarray(xyz)))
    assert (s[:, 0] >= 0).all() and (s[:, 0] <= 360).all()
    assert (s[:, 1] >= 0).all() and (s[:, 1] <= 180).all()
    np.testing.assert_allclose(s[:, 2], np.linalg.norm(xyz, axis=1), rtol=1e-5)
