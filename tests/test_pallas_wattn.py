"""Pallas flash window attention (interpret mode) vs the dense oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from u2mkd_tpu.ops.pallas import wattn_kernel as pk

from test_wattn import make_attn_inputs, np_window_attention


def test_window_bounds(rng):
    hi = jnp.asarray(np.array([1, 1, 2, 2, 2, 5], np.uint32))
    lo = jnp.zeros(6, jnp.uint32)
    start, end = pk.window_bounds_from_sorted(hi, lo)
    np.testing.assert_array_equal(np.asarray(start), [0, 0, 2, 2, 2, 5])
    np.testing.assert_array_equal(np.asarray(end), [2, 2, 5, 5, 5, 6])


@pytest.mark.slow
def test_flash_matches_oracle(rng):
    q, k, v, xyz, valid = make_attn_inputs(rng, vcap=200)
    ws = (1.5, 1.5, 1.5)
    got = np.asarray(
        pk.sparse_window_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), ws, tile=64, interpret=True,
        )
    )
    exp = np_window_attention(q, k, v, xyz, valid, ws)
    np.testing.assert_allclose(got[valid], exp[valid], atol=3e-5)
    assert np.all(got[~valid] == 0)


@pytest.mark.slow
def test_flash_matches_banded_xla(rng):
    """Pallas (dynamic ranges) vs the XLA banded path on a skewed layout."""
    from u2mkd_tpu.ops import wattn

    q, k, v, _, valid = make_attn_inputs(rng, vcap=300)
    # one big window + many small ones (radial-window-like skew)
    xyz = np.zeros((300, 3), np.float32)
    xyz[:150] = 0.1  # all in one window
    xyz[150:] = (np.arange(150)[:, None] * [2.0, 0, 0] + 10).astype(np.float32)
    got = np.asarray(
        pk.sparse_window_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), (1.0, 1.0, 1.0), tile=64, interpret=True,
        )
    )
    ref = np.asarray(
        wattn.sparse_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), (1.0, 1.0, 1.0), band=3, tile=64,
        )
    )
    np.testing.assert_allclose(got[valid], ref[valid], atol=3e-5)


# --- v3: contextual-RPE flash kernel with custom VJP ----------------------

from test_wattn import np_exponential_split  # noqa: E402
from u2mkd_tpu.ops import wattn  # noqa: E402


def make_rpe_inputs(rng, vcap=200, h=2, d=8, g=6, radial=False, spread=6.0):
    q, k, v, xyz, valid = make_attn_inputs(rng, vcap, h, d, spread)
    l2 = 2 * g if radial else 2 * g - 1
    tq = rng.randn(l2, 3, h, d).astype(np.float32) * 0.1
    tk = rng.randn(l2, 3, h, d).astype(np.float32) * 0.1
    tv = rng.randn(l2, 3, h, d).astype(np.float32) * 0.1
    ws = (1.5, 1.5, 1.5)
    quant = np.asarray(wattn.quantize_in_window(
        jnp.asarray(xyz), jnp.asarray(valid), ws, tuple(w / g for w in ws),
        shift=False))
    r = np.linalg.norm(xyz, axis=-1).astype(np.float32) if radial else None
    return q, k, v, xyz, valid, quant, (tq, tk, tv), ws, r


def _flash_out(q, k, v, xyz, valid, quant, tables, ws, g, r, tile=64):
    tq, tk, tv = tables
    rpe = wattn.RPEParams(
        table_q=jnp.asarray(tq), table_k=jnp.asarray(tk),
        table_v=jnp.asarray(tv), quant=jnp.asarray(quant), grid_len=g,
        r=None if r is None else jnp.asarray(r), a=0.05,
    )
    return pk.sparse_window_attention_flash(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
        jnp.asarray(valid), ws, rpe=rpe, tile=tile, interpret=True,
    )


@pytest.mark.slow
def test_flash_rpe_cubic_matches_oracle(rng):
    g = 6
    q, k, v, xyz, valid, quant, tables, ws, _ = make_rpe_inputs(rng, g=g)
    got = np.asarray(_flash_out(q, k, v, xyz, valid, quant, tables, ws, g,
                                None))
    exp = np_window_attention(q, k, v, xyz, valid, ws, quant=quant,
                              tables=tables, grid_len=g)
    np.testing.assert_allclose(got[valid], exp[valid], atol=5e-5)
    assert np.all(got[~valid] == 0)


def test_flash_rpe_sphere_matches_oracle(rng):
    g = 6
    q, k, v, xyz, valid, quant, tables, ws, r = make_rpe_inputs(
        rng, g=g, radial=True)
    got = np.asarray(_flash_out(q, k, v, xyz, valid, quant, tables, ws, g, r))
    exp = np_window_attention(q, k, v, xyz, valid, ws, quant=quant,
                              tables=tables, grid_len=g, r=r, a=0.05)
    np.testing.assert_allclose(got[valid], exp[valid], atol=5e-5)


def _loss_through(path, q, k, v, xyz, valid, quant, tables, ws, g, r,
                  dloss):
    """Scalar loss through either attention path; args are jnp arrays."""
    tq, tk, tv = tables
    rpe = wattn.RPEParams(table_q=tq, table_k=tk, table_v=tv, quant=quant,
                          grid_len=g, r=r, a=0.05)
    if path == "flash":
        out = pk.sparse_window_attention_flash(
            q, k, v, xyz, valid, ws, rpe=rpe, tile=64, interpret=True)
    else:
        out = wattn.sparse_window_attention(
            q, k, v, xyz, valid, ws, rpe=rpe, band=3, tile=64)
    return jnp.sum(out * dloss)


@pytest.mark.slow
@pytest.mark.parametrize("radial", [False, True])
def test_flash_rpe_grads_match_xla(rng, radial):
    """d(loss)/d(q,k,v,tables) through the Pallas custom VJP must match the
    XLA banded path (which autodiffs through the same math)."""
    g = 6
    q, k, v, xyz, valid, quant, tables, ws, r = make_rpe_inputs(
        rng, vcap=150, g=g, radial=radial)
    dloss = rng.randn(*q.shape).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (q, k, v) + tables)

    def make_fn(path):
        def fn(q_, k_, v_, tq_, tk_, tv_):
            return _loss_through(
                path, q_, k_, v_, jnp.asarray(xyz), jnp.asarray(valid),
                jnp.asarray(quant), (tq_, tk_, tv_), ws, g,
                None if r is None else jnp.asarray(r), jnp.asarray(dloss))
        return fn

    g_flash = jax.grad(make_fn("flash"), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_xla = jax.grad(make_fn("xla"), argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["dq", "dk", "dv", "dtq", "dtk", "dtv"]
    for name, a, b in zip(names, g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            err_msg=f"{name} mismatch (radial={radial})")


@pytest.mark.parametrize("radial", [False, True])
def test_flash_bwd_head_split_exact(rng, radial, monkeypatch):
    """The scoped-VMEM head-group split in the backward wrappers must be
    bit-identical to the single-call backward: force single-head groups and
    compare every gradient against the unsplit run."""
    g = 6
    q, k, v, xyz, valid, quant, tables, ws, r = make_rpe_inputs(
        rng, vcap=150, h=2, g=g, radial=radial)
    dloss = rng.randn(*q.shape).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (q, k, v) + tables)

    def fn(q_, k_, v_, tq_, tk_, tv_):
        return _loss_through(
            "flash", q_, k_, v_, jnp.asarray(xyz), jnp.asarray(valid),
            jnp.asarray(quant), (tq_, tk_, tv_), ws, g,
            None if r is None else jnp.asarray(r), jnp.asarray(dloss))

    g_whole = jax.grad(fn, argnums=(0, 1, 2, 3, 4, 5))(*args)
    monkeypatch.setattr(pk, "_bwd_head_groups", lambda cfg: 1)
    g_split = jax.grad(fn, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for name, a, b in zip(["dq", "dk", "dv", "dtq", "dtk", "dtv"],
                          g_split, g_whole):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{name} split/unsplit mismatch (radial={radial})")


@pytest.mark.slow
def test_flash_batched_matches_per_sample(rng):
    g = 6
    b = 2
    qs, kss, vs, xyzs, valids, quants, rs = [], [], [], [], [], [], []
    tables = None
    for i in range(b):
        q, k, v, xyz, valid, quant, tabs, ws, r = make_rpe_inputs(
            np.random.RandomState(i), vcap=150, g=g, radial=True)
        tables = tabs if tables is None else tables
        qs.append(q); kss.append(k); vs.append(v); xyzs.append(xyz)
        valids.append(valid); quants.append(quant); rs.append(r)
    st = lambda xs: jnp.asarray(np.stack(xs))
    tq, tk, tv = (jnp.asarray(t) for t in tables)
    rpe_b = wattn.RPEParams(table_q=tq, table_k=tk, table_v=tv,
                            quant=st(quants), grid_len=g, r=st(rs), a=0.05)
    got = np.asarray(pk.sparse_window_attention_flash_batched(
        st(qs), st(kss), st(vs), st(xyzs), st(valids), (1.5, 1.5, 1.5),
        rpe=rpe_b, tile=64, interpret=True))
    for i in range(b):
        rpe_i = wattn.RPEParams(table_q=tq, table_k=tk, table_v=tv,
                                quant=jnp.asarray(quants[i]), grid_len=g,
                                r=jnp.asarray(rs[i]), a=0.05)
        exp = np.asarray(pk.sparse_window_attention_flash(
            jnp.asarray(qs[i]), jnp.asarray(kss[i]), jnp.asarray(vs[i]),
            jnp.asarray(xyzs[i]), jnp.asarray(valids[i]), (1.5, 1.5, 1.5),
            rpe=rpe_i, tile=64, interpret=True))
        np.testing.assert_allclose(got[i], exp, atol=1e-5)


@pytest.mark.slow
def test_sphereformer_block_flash_parity(rng):
    """SphereFormerBlock(use_flash=True) must match the XLA-path block on
    the same parameters — forward and parameter gradients. The XLA path's
    sphere band is capacity-truncated, so the fixture keeps windows small
    enough that both paths are exact."""
    import flax.linen as nn  # noqa: F401
    from u2mkd_tpu.models.sphereformer import SphereFormerBlock

    b, vcap, c = 2, 96, 16
    feats = rng.randn(b, vcap, c).astype(np.float32)
    xyz = (rng.rand(b, vcap, 3) * 8 + 1.0).astype(np.float32)
    mask = rng.rand(b, vcap) > 0.2

    def block(use_flash):
        return SphereFormerBlock(
            dim=c, num_heads=2, window_size=(1.5, 1.5, 1.5),
            window_size_sphere=(30.0, 30.0, 120.0),
            quant_size=(1.5 / 6, 1.5 / 6, 1.5 / 6),
            quant_size_sphere=(5.0, 5.0, 5.0),
            a=0.05, band_sphere=4, tile=64, use_flash=use_flash,
        )

    params = block(False).init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(feats), jnp.asarray(xyz), jnp.asarray(mask), False,
    )

    outs, grads = {}, {}
    for flash in (False, True):
        def loss_fn(p):
            out = block(flash).apply(
                p, jnp.asarray(feats), jnp.asarray(xyz), jnp.asarray(mask),
                False,
            )
            return jnp.sum(out ** 2), out

        (l, out), gr = jax.value_and_grad(loss_fn, has_aux=True)(params)
        outs[flash] = np.asarray(out)
        grads[flash] = gr
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-4)
    flat_t = jax.tree_util.tree_leaves_with_path(grads[True])
    flat_f = dict(jax.tree_util.tree_leaves_with_path(grads[False]))
    # dict over paths to compare matching leaves
    flat_f = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(grads[False])}
    for kp, v in flat_t:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_f[key]), atol=5e-4,
            err_msg=f"grad mismatch at {key}")
