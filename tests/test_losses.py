"""Loss parity vs torch (CE/KL oracles) and an independent numpy Lovász oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from u2mkd_tpu.ops import losses


def np_lovasz_softmax(probs, labels):
    """Independent numpy implementation of the published Lovász-softmax
    (Berman et al. 2018, Alg. 1), classes='present'."""
    C = probs.shape[1]
    vals = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        perm = np.argsort(-errors, kind="stable")
        e = errors[perm]
        f = fg[perm]
        gts = f.sum()
        inter = gts - np.cumsum(f)
        union = gts + np.cumsum(1 - f)
        jac = 1 - inter / union
        if len(f) > 1:
            jac[1:] = jac[1:] - jac[:-1]
        vals.append((e * jac).sum())
    return np.mean(vals) if vals else 0.0


def test_lovasz_matches_numpy_oracle(rng):
    n, c = 500, 17
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n)
    valid = rng.rand(n) > 0.3
    got = float(
        losses.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[valid]), -1), np.float64)
    exp = np_lovasz_softmax(probs, labels[valid])
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_lovasz_missing_class(rng):
    n, c = 200, 5
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, 3, n)  # classes 3,4 absent
    valid = np.ones(n, bool)
    got = float(
        losses.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1), np.float64)
    exp = np_lovasz_softmax(probs, labels)
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_lovasz_gradient_finite(rng):
    n, c = 100, 4
    logits = jnp.asarray(rng.randn(n, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, n))
    valid = jnp.asarray(rng.rand(n) > 0.2)
    g = jax.grad(lambda x: losses.lovasz_softmax(x, labels, valid))(logits)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # invalid rows receive zero gradient
    assert np.abs(g[~np.asarray(valid)]).max() == 0.0


def test_cross_entropy_matches_torch(rng):
    n, c = 300, 17
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n)
    valid = labels != 0  # emulate ignore_index=0
    got = float(
        losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))
    )
    exp = F.cross_entropy(torch.tensor(logits), torch.tensor(labels), ignore_index=0)
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_cross_entropy_class_weight_matches_torch(rng):
    n, c = 300, 6
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n)
    w = rng.rand(c).astype(np.float32) + 0.5
    valid = labels != 0
    got = float(
        losses.cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid), jnp.asarray(w)
        )
    )
    exp = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(w), ignore_index=0
    )
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_kl_matches_torch_batchmean(rng):
    n, c = 200, 17
    s = rng.randn(n, c).astype(np.float32)
    t = rng.randn(n, c).astype(np.float32)
    valid = np.ones(n, bool)
    got = float(
        losses.kl_div_batchmean(jnp.asarray(s), jnp.asarray(t), jnp.asarray(valid))
    )
    exp = F.kl_div(
        F.log_softmax(torch.tensor(s), 1), F.softmax(torch.tensor(t), 1),
        reduction="batchmean",
    )
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_kl_masked_subset(rng):
    n, c = 200, 8
    s = rng.randn(n, c).astype(np.float32)
    t = rng.randn(n, c).astype(np.float32)
    valid = rng.rand(n) > 0.4
    got = float(
        losses.kl_div_batchmean(jnp.asarray(s), jnp.asarray(t), jnp.asarray(valid))
    )
    exp = F.kl_div(
        F.log_softmax(torch.tensor(s[valid]), 1), F.softmax(torch.tensor(t[valid]), 1),
        reduction="batchmean",
    )
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_masked_mse_matches_torch(rng):
    n, c = 100, 32
    a = rng.randn(n, c).astype(np.float32)
    b = rng.randn(n, c).astype(np.float32)
    valid = rng.rand(n) > 0.5
    got = float(losses.masked_mse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid)))
    exp = F.mse_loss(torch.tensor(a[valid]), torch.tensor(b[valid]))
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)
