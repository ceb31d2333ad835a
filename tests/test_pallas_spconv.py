"""Pallas banded rulebook conv vs the XLA gather path (fwd + both grads).

The XLA formulation (``spconv.sparse_conv``) is the numerical oracle; the
pallas kernel must match it bit-for-bit in f32 on CPU (interpret mode) —
the gather is an exact selection, the W-matmul contraction order is the
same K*Cin flattening as the 'concat' strategy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from u2mkd_tpu.data import plumbing_host, synthetic
from u2mkd_tpu.ops import spconv
from u2mkd_tpu.ops.pallas import spconv_kernel as spk


def _setup(P=512, B=2, cin=8, cout=16, seed=0, level=0):
    caps = (P, P // 2, P // 4, P // 8, P // 16)
    raw = synthetic.make_batch(np.random.RandomState(seed), B, P,
                               voxel_size=0.25)
    pl_ = plumbing_host.batch_plumbing(raw["pcoords"], raw["xyz"],
                                       raw["pmask"], caps)
    nbr = jnp.asarray(pl_["nbr27"][level])      # [B, 27, V]
    jl = jnp.asarray(pl_["cr27jl"][level])
    jn = jnp.asarray(pl_["cr27jn"][level])
    kr = jnp.asarray(pl_["cr27kr"][level])
    rng = np.random.RandomState(seed + 1)
    V = nbr.shape[-1]
    x = jnp.asarray(rng.randn(B, V, cin), jnp.float32)
    # zero out invalid rows like the models do
    vm = jnp.asarray(pl_["vmask"][level]).astype(bool)
    x = jnp.where(vm[..., None], x, 0.0)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.1, jnp.float32)
    return x, w, nbr, jl, jn, kr


def _oracle(x, nbr, w):
    return jax.vmap(lambda f, n: spconv.sparse_conv(f, n, w, "concat"))(
        x, nbr)


def test_fwd_matches_xla():
    x, w, nbr, jl, jn, kr = _setup()
    t = x.shape[1] // jn.shape[-1]
    out = spk.rulebook_conv(x, w, jnp.swapaxes(nbr, 1, 2), jl, jn, kr, t)
    ref = _oracle(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fwd_small_capacity_tile():
    # cap < 128 -> T = cap (single tile per level)
    x, w, nbr, jl, jn, kr = _setup(P=256, B=1, cin=4, cout=8, level=2)
    t = x.shape[1] // jn.shape[-1]
    out = spk.rulebook_conv(x, w, jnp.swapaxes(nbr, 1, 2), jl, jn, kr, t)
    ref = _oracle(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla():
    x, w, nbr, jl, jn, kr = _setup(P=256, B=2, cin=8, cout=8)
    t = x.shape[1] // jn.shape[-1]
    nbr_t = jnp.swapaxes(nbr, 1, 2)

    def loss_pallas(x, w):
        out = spk.rulebook_conv(x, w, nbr_t, jl, jn, kr, t)
        return jnp.sum(jnp.sin(out))

    def loss_xla(x, w):
        return jnp.sum(jnp.sin(_oracle(x, nbr, w)))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-5)


def test_rev_perm_is_involution():
    rev = spk.rev_perm_27()
    assert (rev[rev] == np.arange(27)).all()
    offs = spconv.kernel_offsets(3)
    np.testing.assert_array_equal(offs[rev], -offs)


def test_model_uses_kernel_and_matches():
    """SPVCNN forward with host plumbing (pallas conv path) vs the same
    model with the conv plan stripped (XLA path): identical f32 outputs."""
    from u2mkd_tpu.models import plumbing as P
    from u2mkd_tpu.models.spvcnn import SPVCNN

    Pn = 512
    caps = (Pn, Pn // 2, Pn // 4, Pn // 8, Pn // 16)
    raw = synthetic.make_batch(np.random.RandomState(3), 2, Pn,
                               voxel_size=0.25)
    arrs = plumbing_host.batch_plumbing(raw["pcoords"], raw["xyz"],
                                        raw["pmask"], caps)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    arrs_j = jax.tree_util.tree_map(jnp.asarray, arrs)
    pl_full = P.from_precomputed(arrs_j, batch["pmask"])
    arrs_noplan = {k: v for k, v in arrs_j.items()
                   if not k.startswith("cr27")}
    pl_xla = P.from_precomputed(arrs_noplan, batch["pmask"])
    assert pl_full.levels[0].conv_plan() is not None
    assert pl_xla.levels[0].conv_plan() is None

    model = SPVCNN(num_classes=5, cr=0.25)
    var = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["feats"], pl_xla, False,
    )
    out_xla = model.apply(var, batch["feats"], pl_xla, False)["x_vox"]
    out_pal = model.apply(var, batch["feats"], pl_full, False)["x_vox"]
    m = np.asarray(batch["pmask"])
    np.testing.assert_allclose(np.asarray(out_pal)[m], np.asarray(out_xla)[m],
                               rtol=1e-4, atol=1e-4)


def test_grads_match_with_recomputed_concat(monkeypatch):
    """Large-residual path: the gathered concat is recomputed in the bwd
    instead of saved (full-capacity programs OOM'd otherwise)."""
    monkeypatch.setattr(spk, "_CAT_SAVE_BYTES", 1)
    x, w, nbr, jl, jn, kr = _setup(P=256, B=2, cin=8, cout=8)
    t = x.shape[1] // jn.shape[-1]
    nbr_t = jnp.swapaxes(nbr, 1, 2)

    def loss_pallas(x, w):
        return jnp.sum(jnp.sin(spk.rulebook_conv(x, w, nbr_t, jl, jn, kr, t)))

    def loss_xla(x, w):
        return jnp.sum(jnp.sin(_oracle(x, nbr, w)))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-5)
