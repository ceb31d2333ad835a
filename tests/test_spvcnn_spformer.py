"""Teacher model (SPVCNN + SphereFormer) forward/backward smoke tests."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.spvcnn import SPVCNN

CAPS = (512, 256, 128, 64, 32)


def make_batch(rng, b=2, p=300):
    xyz = (rng.rand(b, p, 3) * 8 - 4).astype(np.float32)
    pcoords = xyz / 0.5
    feats = np.concatenate([xyz, rng.rand(b, p, 1).astype(np.float32)], -1)
    mask = np.ones((b, p), bool)
    mask[:, -30:] = False
    return jnp.asarray(pcoords), jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(mask)


@pytest.mark.slow
def test_spformer_forward_and_grad(rng):
    pcoords, xyz, feats, mask = make_batch(rng)
    pl = P.build_plumbing(pcoords, xyz, mask, CAPS)
    model = SPVCNN(
        num_classes=5, cr=0.5, sphereformer=True,
        window_size=(1.0, 1.0, 1.0), quant_size=(1.0 / 8, 1.0 / 8, 1.0 / 8),
        window_size_sphere=(30.0, 30.0, 120.0),
        quant_size_sphere=(30.0 / 8, 30.0 / 8, 5.0),
        head_dim=8, drop_path_rate=0.3,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, pl, False,
    )
    out = model.apply(variables, feats, pl, False)
    x = np.asarray(out["x_vox"])
    assert x.shape == (2, 300, 5)
    assert np.isfinite(x).all()

    # transformer params exist per stage
    names = jax.tree_util.tree_leaves_with_path(variables["params"])
    keys = {"/".join(str(p) for p in path) for path, _ in names}
    assert any("sphereformer1" in s for s in keys)
    assert any("sphereformer4" in s for s in keys)
    assert any("rel_q_sphere" in s for s in keys)

    # gradient flows through attention tables
    def loss_fn(p):
        o = model.apply({**variables, "params": p}, feats, pl, False)
        return jnp.sum(o["x_vox"] ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    leaf = g["sphereformer1"]["attn"]["rel_q_cubic"]
    assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(leaf)).sum() > 0
