"""Exec'd-reference oracle for ``PositionEmbeddingCoordsSine``.

Runs the reference's own pure-torch module
(``third_party/SparseTransformer/sptr/position_embedding.py:42-173``,
3DETR-derived, capability surface for the generic ``VarLengthMultiheadSA``
pe_type options) and bit-matches :mod:`u2mkd_tpu.models.position_embedding`
on both pos types, including the remainder-channel sine case and the
normalize path. Fourier parity shares the reference's gauss_B draw.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from u2mkd_tpu.models.position_embedding import (  # noqa: E402
    PositionEmbeddingCoordsSine,
    WindowMultiheadSA,
)

_REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_posenc():
    path = os.path.join(
        _REF, "third_party/SparseTransformer/sptr/position_embedding.py")
    if not os.path.exists(path):
        pytest.skip("reference snapshot absent")
    ns = {}
    exec(compile(open(path).read(), path, "exec"), ns)  # reference oracle
    return ns


@pytest.mark.parametrize("d_pos", [30, 32, 16])  # 16/3: remainder channels
def test_sine_ref_parity(ref_posenc, rng, d_pos):
    n = 257
    xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    ref = ref_posenc["PositionEmbeddingCoordsSine"](
        pos_type="sine", d_pos=d_pos, normalize=False)
    want = ref(torch.from_numpy(xyz)[None]).numpy()[0].T  # [N, d_pos]

    mod = PositionEmbeddingCoordsSine(
        d_pos=d_pos, pos_type="sine", normalize=False)
    got = mod.apply(mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz)),
                    jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_sine_normalize_ref_parity(ref_posenc, rng):
    n = 129
    xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    lo = xyz.min(0)
    hi = xyz.max(0)
    ref = ref_posenc["PositionEmbeddingCoordsSine"](
        pos_type="sine", d_pos=24, normalize=True)
    want = ref(
        torch.from_numpy(xyz)[None],
        input_range=[torch.from_numpy(lo)[None], torch.from_numpy(hi)[None]],
    ).numpy()[0].T

    mod = PositionEmbeddingCoordsSine(d_pos=24, pos_type="sine",
                                      normalize=True)
    got = mod.apply(
        mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz)),
        jnp.asarray(xyz),
        input_range=(jnp.asarray(lo), jnp.asarray(hi)),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fourier_ref_parity(ref_posenc, rng):
    n, d_pos = 200, 32
    xyz = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    torch.manual_seed(3)
    ref = ref_posenc["PositionEmbeddingCoordsSine"](
        pos_type="fourier", d_pos=d_pos, normalize=False, gauss_scale=1.0)
    want = ref(torch.from_numpy(xyz)[None]).numpy()[0].T
    gauss_b = ref.gauss_B.numpy()

    mod = PositionEmbeddingCoordsSine(d_pos=d_pos, pos_type="fourier",
                                      normalize=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz))
    params = jax.tree_util.tree_map(
        lambda _: jnp.asarray(gauss_b), params)  # single leaf: gauss_B
    got = mod.apply(params, jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("pe_type", ["sine", "fourier"])
def test_window_msa_smoke(rng, pe_type):
    """VarLengthMultiheadSA-shaped module runs and masks padding."""
    b, vcap, c = 2, 64, 32
    feats = jnp.asarray(rng.normal(size=(b, vcap, c)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(0, 8, (b, vcap, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(b, vcap)) < 0.8)
    mod = WindowMultiheadSA(dim=c, num_heads=4, window_size=(4.0, 4.0, 4.0),
                            pe_type=pe_type, tile=32)
    params = mod.init(jax.random.PRNGKey(1), feats, xyz, mask)
    out = mod.apply(params, feats, xyz, mask)
    assert out.shape == (b, vcap, c)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out)[~np.asarray(mask)] == 0)
