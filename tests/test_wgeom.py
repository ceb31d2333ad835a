"""Host-precomputed window geometry parity with the in-jit flash path.

The round-3 perf work moves every attention-side sort / rank / quantization
off-device (``data/wgeom_host.py``). These tests pin the host geometry to the
in-jit builders it replaces: identical grouping, identical sorted order for
live rows (both sorts are stable over (batch, cell-x, cell-y, cell-z)), and
therefore near-identical kernel outputs and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2mkd_tpu.core.structures import WindowGeom
from u2mkd_tpu.data import wgeom_host
from u2mkd_tpu.ops import wattn
from u2mkd_tpu.ops.pallas import wattn_kernel as pk


def _rand_inputs(rng, b=2, v=384, h=2, d=16, g=6, radial=False):
    xyz = rng.uniform(-8, 8, (b, v, 3)).astype(np.float32)
    valid = rng.rand(b, v) < 0.9
    q = rng.randn(b, v, h, d).astype(np.float32) * 0.3
    k = rng.randn(b, v, h, d).astype(np.float32) * 0.3
    vv = rng.randn(b, v, h, d).astype(np.float32) * 0.3
    l2 = 2 * g if radial else 2 * g - 1
    tq = rng.randn(l2, 3, h, d).astype(np.float32) * 0.05
    tk = rng.randn(l2, 3, h, d).astype(np.float32) * 0.05
    tv = rng.randn(l2, 3, h, d).astype(np.float32) * 0.05
    return xyz, valid, q, k, vv, tq, tk, tv


def _geom_from_host(xyz, valid, ws, qs, radial, tile=128):
    out = wgeom_host._branch_geometry(
        np.asarray(xyz, np.float32), np.asarray(valid), ws, qs, tile, radial
    )
    return WindowGeom(
        order=jnp.asarray(out["order"]), inv=jnp.asarray(out["inv"]),
        rank=jnp.asarray(out["rank"]), quant=jnp.asarray(out["quant"]),
        kmin=jnp.asarray(out["kmin"]), kmax=jnp.asarray(out["kmax"]),
        occ=jnp.asarray(out["occ"]),
        r=jnp.asarray(out["r"]) if radial else None,
    )


@pytest.mark.parametrize("radial", [False, True])
def test_pregeom_matches_injit(rng, radial):
    g = 6
    ws = (4.0, 4.0, 4.0)
    qs = tuple(w / g for w in ws)
    xyz, valid, q, k, v, tq, tk, tv = _rand_inputs(rng, radial=radial)
    b = xyz.shape[0]
    coords = (np.stack([wgeom_host.cart2sphere(xyz[i]) for i in range(b)])
              if radial else xyz)
    quant = np.stack([
        wgeom_host.quantize_in_window(coords[i], valid[i], ws, qs)
        for i in range(b)
    ])
    rpe = wattn.RPEParams(
        table_q=jnp.asarray(tq), table_k=jnp.asarray(tk),
        table_v=jnp.asarray(tv), quant=jnp.asarray(quant), grid_len=g,
        r=jnp.asarray(coords[..., 2]) if radial else None, a=0.5,
    )
    ref = pk.sparse_window_attention_flash_batched(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(coords), jnp.asarray(valid), ws, rpe=rpe, interpret=True,
    )
    geom = _geom_from_host(coords, valid, ws, qs, radial)
    out = pk.flash_pregeom_batched(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid),
        geom, jnp.asarray(tq), jnp.asarray(tk), jnp.asarray(tv),
        grid_len=g, a=0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("radial", [False, True])
def test_pregeom_grads_match(rng, radial):
    g = 4
    ws = (5.0, 5.0, 5.0)
    qs = tuple(w / g for w in ws)
    xyz, valid, q, k, v, tq, tk, tv = _rand_inputs(
        rng, b=1, v=256, radial=radial, g=g)
    coords = (wgeom_host.cart2sphere(xyz[0])[None] if radial else xyz)
    quant = wgeom_host.quantize_in_window(coords[0], valid[0], ws, qs)[None]
    geom = _geom_from_host(coords, valid, ws, qs, radial)

    def loss_pre(q_, tq_):
        o = pk.flash_pregeom_batched(
            q_, jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid), geom,
            tq_, jnp.asarray(tk), jnp.asarray(tv), grid_len=g, a=0.5,
            interpret=True,
        )
        return jnp.sum(o * o)

    def loss_ref(q_, tq_):
        rpe = wattn.RPEParams(
            table_q=tq_, table_k=jnp.asarray(tk), table_v=jnp.asarray(tv),
            quant=jnp.asarray(quant), grid_len=g,
            r=jnp.asarray(coords[..., 2]) if radial else None, a=0.5,
        )
        o = pk.sparse_window_attention_flash_batched(
            q_, jnp.asarray(k), jnp.asarray(v), jnp.asarray(coords),
            jnp.asarray(valid), ws, rpe=rpe, interpret=True,
        )
        return jnp.sum(o * o)

    gp = jax.grad(loss_pre, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(tq))
    gr = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(tq))
    for a_, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=3e-4, atol=3e-5)


def test_batch_plumbing_wgeom_sharding(rng):
    """n_shards splits the batch into independent flattened sequences with a
    leading shard axis on every geometry leaf."""
    from u2mkd_tpu.data import plumbing_host

    b, p = 4, 512
    caps = (256, 128, 64, 32, 16)
    pcoords = rng.uniform(0, 40, (b, p, 3)).astype(np.float32)
    pxyz = (pcoords * 0.1).astype(np.float32)
    pmask = np.ones((b, p), bool)
    params = wgeom_host.level_window_params(
        (0.8, 0.8, 0.8), (2.0, 2.0, 40.0), (0.1, 0.1, 0.1), (0.25, 0.25, 5.0),
        (2.0, 1.5),
    )
    out = plumbing_host.batch_plumbing(
        pcoords, pxyz, pmask, caps,
        wgeom_params=dict(levels=params, tile=128), n_shards=2,
    )
    wg = out["wgeom"]
    assert set(wg) == {"cubic", "sphere"}
    for branch in ("cubic", "sphere"):
        assert len(wg[branch]) == 4
        for li, gdict in enumerate(wg[branch]):
            cap = caps[li + 1]
            n = 2 * cap  # 2 samples per shard
            pad_to = -(-n // 128) * 128
            assert gdict["order"].shape == (2, pad_to)
            assert gdict["inv"].shape == (2, n)
            assert gdict["rank"].shape == (2, pad_to)
            assert gdict["quant"].shape == (2, pad_to, 3)
            assert gdict["kmin"].shape == (2, pad_to // 128)
            assert gdict["occ"].shape == (2, 1)
            if branch == "sphere":
                assert gdict["r"].shape == (2, pad_to)
            # every live row round-trips through order/inv
            for s in range(2):
                order = gdict["order"][s]
                inv = gdict["inv"][s]
                assert np.array_equal(order[inv], np.arange(n))


@pytest.mark.slow
def test_model_forward_with_wgeom_matches(rng):
    """End-to-end: SPVCNN+SphereFormer forward with host geometry equals the
    in-jit geometry forward (same host plumbing, flash path, eval mode)."""
    from u2mkd_tpu.data import plumbing_host
    from u2mkd_tpu.models.plumbing import from_precomputed
    from u2mkd_tpu.models.spvcnn import SPVCNN

    b, p = 1, 512
    caps = (256, 128, 64, 32, 16)
    voxel = 0.1
    pxyz = rng.uniform(-6, 6, (b, p, 3)).astype(np.float32)
    pcoords = (pxyz - pxyz.min(axis=1, keepdims=True)) / voxel
    pmask = np.ones((b, p), bool)
    feats = rng.randn(b, p, 4).astype(np.float32)

    model = SPVCNN(
        num_classes=5, cr=0.25, sphereformer=True,
        window_size=(0.6, 0.6, 0.6), quant_size=(0.6 / 6,) * 3,
        window_size_sphere=(6.0, 6.0, 40.0),
        quant_size_sphere=(1.0, 1.0, 5.0),
        window_size_scale=(2.0, 1.5), drop_path_rate=0.0,
        head_dim=4, pallas_attention=True, pallas_cubic=True,
    )
    wp = wgeom_host.params_from_model(model)
    pl_arrays = plumbing_host.batch_plumbing(
        pcoords, pxyz, pmask, caps, wgeom_params=wp, n_shards=1
    )
    pl_arrays = jax.tree_util.tree_map(jnp.asarray, pl_arrays)
    pl_no = {k: v for k, v in pl_arrays.items() if k != "wgeom"}

    pmask_j = jnp.asarray(pmask)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(feats), from_precomputed(pl_no, pmask_j), False,
    )

    @jax.jit
    def fwd(arrays):
        return model.apply(
            variables, jnp.asarray(feats),
            from_precomputed(arrays, pmask_j), False,
        )["x_vox"]

    out_no = fwd(pl_no)
    out_wg = fwd(pl_arrays)
    np.testing.assert_allclose(np.asarray(out_wg), np.asarray(out_no),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("radial", [False, True])
def test_native_branch_parity(rng, radial):
    """C fast path (native/pointcore.cpp:build_wgeom_branch) is bit-identical
    to the numpy oracle on every output, including dead-row ordering (numpy
    sorts the overflowed int64 window keys signed), empty samples, and
    non-default tiles."""
    from u2mkd_tpu.data import native

    if not native.available() or not hasattr(native._load(),
                                             "build_wgeom_branch"):
        pytest.skip("native pointcore unavailable")
    ws, qs = (((1.875, 1.875, 80.0), (0.117, 0.117, 5.0)) if radial
              else ((0.3, 0.3, 0.3), (0.02, 0.02, 0.02)))
    for b, v, tile, p_valid in [(2, 1000, 128, 0.9), (3, 700, 64, 0.5),
                                (1, 5, 128, 0.0), (2, 333, 32, 1.0)]:
        coords = (rng.rand(b, v, 3).astype(np.float32) * 400 - 200)
        valid = rng.rand(b, v) < p_valid
        ref = wgeom_host._branch_geometry(coords, valid, ws, qs, tile,
                                          radial, use_native=False)
        out = wgeom_host._branch_geometry(coords, valid, ws, qs, tile,
                                          radial, use_native=True)
        assert set(ref) == set(out)
        for key in ref:
            np.testing.assert_array_equal(ref[key], out[key],
                                          err_msg=f"{key} b={b} v={v}")
            assert ref[key].dtype == out[key].dtype, key
