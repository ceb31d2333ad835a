"""SPVCNN end-to-end forward/backward smoke and semantics tests."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.spvcnn import SPVCNN
from u2mkd_tpu.ops import losses

CAPS = (512, 256, 128, 64, 32)


def make_batch(rng, b=2, p=400):
    xyz = (rng.rand(b, p, 3) * 12 - 6).astype(np.float32)  # metric
    voxel_size = 0.5
    pcoords = xyz / voxel_size
    feats = np.concatenate([xyz, rng.rand(b, p, 1).astype(np.float32)], -1)
    mask = np.ones((b, p), bool)
    mask[:, -20:] = False  # some padding
    labels = rng.randint(0, 5, (b, p))
    return (
        jnp.asarray(pcoords), jnp.asarray(xyz), jnp.asarray(feats),
        jnp.asarray(mask), jnp.asarray(labels),
    )


@pytest.mark.slow
def test_forward_shapes_and_finite(rng):
    pcoords, xyz, feats, mask, labels = make_batch(rng)
    pl = P.build_plumbing(pcoords, xyz, mask, CAPS)
    model = SPVCNN(num_classes=5, cr=0.25)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, pl, True,
    )
    out, mutated = model.apply(
        variables, feats, pl, True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    x = np.asarray(out["x_vox"])
    assert x.shape == (2, 400, 5)
    assert np.isfinite(x).all()
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_eval_mode_deterministic(rng):
    pcoords, xyz, feats, mask, labels = make_batch(rng)
    pl = P.build_plumbing(pcoords, xyz, mask, CAPS)
    model = SPVCNN(num_classes=5, cr=0.25)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, pl, False,
    )
    o1 = model.apply(variables, feats, pl, False)
    o2 = model.apply(variables, feats, pl, False)
    np.testing.assert_array_equal(np.asarray(o1["x_vox"]), np.asarray(o2["x_vox"]))


@pytest.mark.slow
def test_train_step_decreases_loss(rng):
    import optax

    pcoords, xyz, feats, mask, labels = make_batch(rng)
    pl = P.build_plumbing(pcoords, xyz, mask, CAPS)
    model = SPVCNN(num_classes=5, cr=0.25)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, pl, True,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, feats, pl, True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            lg = out["x_vox"].reshape(-1, 5)
            lb = labels.reshape(-1)
            vm = mask.reshape(-1)
            return losses.lovasz_ce(lg, lb, vm), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    key = jax.random.PRNGKey(0)
    losses_seen = []
    for i in range(8):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, sub)
        losses_seen.append(float(loss))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]


@pytest.mark.slow
def test_invalid_points_get_no_gradient(rng):
    pcoords, xyz, feats, mask, labels = make_batch(rng, b=1, p=200)
    pl = P.build_plumbing(pcoords, xyz, mask, CAPS)
    model = SPVCNN(num_classes=5, cr=0.25)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, pl, False,
    )
    out = model.apply(variables, feats, pl, False)
    # outputs at padded rows must not be NaN (they can be arbitrary, but finite)
    assert np.isfinite(np.asarray(out["x_vox"])).all()
