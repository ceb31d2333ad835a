"""TSD distillation end-to-end: student+teacher forward, full loss stack,
frozen-teacher optimizer, lidar-only path."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.data import synthetic
from u2mkd_tpu.models.tsd import TSDFull
from u2mkd_tpu.train import distill, optim

S_CAPS = (192, 96, 48, 24, 12)
T_CAPS = (256, 128, 64, 32, 16)
NCLS = 5


def _model():
    return TSDFull(
        num_classes=NCLS, cr=0.25, cr_t=0.5, head_dim=4,
        window_size=(1.2, 1.2, 1.2), quant_size=(1.2 / 8, 1.2 / 8, 1.2 / 8),
        window_size_sphere=(30.0, 30.0, 120.0),
        quant_size_sphere=(30.0 / 8, 30.0 / 8, 5.0),
    )


def _batch(rng, b=2, p=200, tp=280):
    raw = synthetic.make_multimodal_batch(rng, b, p, tp, voxel_size=0.3,
                                          num_cams=2, im_hw=(32, 48))
    return jax.tree_util.tree_map(jnp.asarray, raw)


@pytest.mark.slow
def test_distill_train_step(rng):
    batch = _batch(rng)
    model = _model()
    base_tx = optim.make_optimizer("sgd_spformer", 0.01)
    tx = distill.make_frozen_teacher_optimizer(base_tx)
    st = distill.create_distill_state(
        model, tx, batch["student"], batch["teacher"], S_CAPS, T_CAPS,
        jax.random.PRNGKey(0),
    )
    step = jax.jit(distill.make_distill_train_step(model, tx, S_CAPS, T_CAPS))

    t_leaf_before = np.asarray(
        jax.tree_util.tree_leaves(st.params["model_t"])[0]
    ).copy()
    s_leaf_before = np.asarray(
        jax.tree_util.tree_leaves(st.params["model_s"])[0]
    ).copy()

    aux0 = None
    for i in range(3):
        st, aux = step(st, batch, jax.random.PRNGKey(5))
        if aux0 is None:
            aux0 = {k: float(v) for k, v in aux.items()}
    for k, v in aux.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # all loss terms present and nonzero-ish
    assert aux0["ce_vox"] > 0 and aux0["ce_pix"] > 0
    assert aux0["kl"] >= 0 and aux0["feat"] >= 0 and aux0["mse"] >= 0
    # training reduces total loss
    assert float(aux["loss"]) < aux0["loss"]

    # teacher frozen, student updated
    t_leaf_after = np.asarray(jax.tree_util.tree_leaves(st.params["model_t"])[0])
    s_leaf_after = np.asarray(jax.tree_util.tree_leaves(st.params["model_s"])[0])
    np.testing.assert_array_equal(t_leaf_before, t_leaf_after)
    assert not np.allclose(s_leaf_before, s_leaf_after)


def test_student_raw_point_eval_counts(rng, tmp_path):
    """Student eval devoxelizes vox+pix logits to the raw cloud before
    scoring (reference nusc_trainers.py:368-390): Trainer raw counters must
    match a hand-devoxelized per-point oracle, both heads."""
    from u2mkd_tpu.train.loop import RawSpec, Trainer

    ncls, n_raw, cap = 4, 50, 16
    inverse = rng.randint(0, 12, n_raw).astype(np.int32)
    inverse[:12] = np.arange(12)  # every voxel row referenced
    labels_full = rng.randint(0, ncls, n_raw).astype(np.int32)
    fov_full = rng.rand(n_raw) < 0.6
    pmask = np.zeros((1, cap), bool)
    pmask[0, :12] = True
    logits_vox = rng.randn(1, cap, ncls).astype(np.float32)
    logits_pix = rng.randn(1, cap, ncls).astype(np.float32)
    info = dict(inverse_map=inverse, labels_full=labels_full,
                fov_full=fov_full)
    batch = {"student": {"pmask": pmask},
             "infos": [{"student": info, "teacher": None}]}
    out = {"logits": jnp.asarray(logits_vox),
           "logits_pix": jnp.asarray(logits_pix)}

    tr = Trainer(
        run_dir=str(tmp_path), state=None, train_step=None, eval_step=None,
        train_loader=None, val_loader=None, num_epochs=0, num_classes=ncls,
        ignore_label=0,
        raw_specs=[RawSpec("counts_vox", "logits", "student", None),
                   RawSpec("counts_pix", "logits_pix", "student", "fov_full")],
    )
    got_vox = tr._raw_point_counts(out, batch, tr.raw_specs[0])
    got_pix = tr._raw_point_counts(out, batch, tr.raw_specs[1])

    for got, logits, extra in ((got_vox, logits_vox, None),
                               (got_pix, logits_pix, fov_full)):
        seen = np.zeros(ncls, np.int64)
        correct = np.zeros(ncls, np.int64)
        positive = np.zeros(ncls, np.int64)
        for p in range(n_raw):
            if labels_full[p] == 0:
                continue
            if extra is not None and not extra[p]:
                continue
            pred = int(np.argmax(logits[0, inverse[p]]))
            seen[labels_full[p]] += 1
            positive[pred] += 1
            if pred == labels_full[p]:
                correct[pred] += 1
        np.testing.assert_array_equal(got["seen"], seen)
        np.testing.assert_array_equal(got["positive"], positive)
        np.testing.assert_array_equal(got["correct"], correct)


@pytest.mark.slow
def test_distill_eval_and_lidar_only(rng):
    batch = _batch(rng)
    model = _model()
    base_tx = optim.make_optimizer("sgd", 0.01)
    tx = distill.make_frozen_teacher_optimizer(base_tx)
    st = distill.create_distill_state(
        model, tx, batch["student"], batch["teacher"], S_CAPS, T_CAPS,
        jax.random.PRNGKey(0),
    )
    ev = jax.jit(
        distill.make_distill_eval_step(model, S_CAPS, T_CAPS, NCLS,
                                       run_teacher=True)
    )
    res = ev(st, batch)
    assert np.asarray(res["pred_vox"]).shape == batch["student"]["labels"].shape
    assert np.asarray(res["pred_pix"]).shape == batch["student"]["labels"].shape
    for k in ("counts_vox", "counts_pix", "counts_teacher"):
        for a in res[k].values():
            assert np.all(np.asarray(a) >= 0)
    # teacher counters reflect the multisweep cloud's keyframe points
    t_valid = np.asarray(batch["teacher"]["pmask"] &
                         batch["teacher"]["keyframe_mask"])
    t_labels = np.asarray(batch["teacher"]["labels"])
    exp_seen = np.bincount(t_labels[t_valid & (t_labels != 0)], minlength=NCLS)
    np.testing.assert_array_equal(np.asarray(res["counts_teacher"]["seen"]),
                                  exp_seen)

    # camera-free inference path (uses learner pseudo features)
    from u2mkd_tpu.models import plumbing as P

    sb = batch["student"]
    spl = P.build_plumbing(sb["pcoords"], sb["xyz"], sb["pmask"], S_CAPS)
    out = model.apply(
        {"params": st.params, "batch_stats": st.batch_stats},
        sb, spl, False, method=TSDFull.lidar_only,
    )
    x = np.asarray(out["x_vox"])
    assert x.shape == (2, 200, NCLS)
    assert np.isfinite(x).all()


@pytest.mark.slow
def test_split_steps_match_fused(rng):
    """``make_distill_split_steps`` (teacher fwd jit + student train jit —
    the compile-limited two-program fallback) must reproduce the fused
    ``make_distill_train_step`` exactly: the teacher is stop_gradient'ed
    either way, so splitting at that boundary changes nothing
    mathematically."""
    batch = _batch(rng)
    model = _model()
    tx = distill.make_frozen_teacher_optimizer(
        optim.make_optimizer("sgd_spformer", 0.01))
    st = distill.create_distill_state(
        model, tx, batch["student"], batch["teacher"], S_CAPS, T_CAPS,
        jax.random.PRNGKey(0))

    fused = jax.jit(distill.make_distill_train_step(model, tx, S_CAPS, T_CAPS))
    st_f, aux_f = fused(st, batch, jax.random.PRNGKey(3))

    split = distill.make_distill_split_steps(model, tx, S_CAPS, T_CAPS)
    st_s, aux_s = split(st, batch, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(aux_s["loss"]), float(aux_f["loss"]),
                               rtol=1e-5)
    for k in ("ce_vox", "ce_pix", "kl", "feat", "mse"):
        np.testing.assert_allclose(float(aux_s[k]), float(aux_f[k]),
                                   rtol=1e-5, atol=1e-6)
    # updated student params agree; teacher subtree preserved bit-exact
    for a, b in zip(jax.tree_util.tree_leaves(st_f.params["model_s"]),
                    jax.tree_util.tree_leaves(st_s.params["model_s"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st.params["model_t"]),
                    jax.tree_util.tree_leaves(st_s.params["model_t"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # batch_stats: student subtree updated, teacher subtree preserved
    assert "model_t" in st_s.batch_stats
    for a, b in zip(jax.tree_util.tree_leaves(st_f.batch_stats["model_s"]),
                    jax.tree_util.tree_leaves(st_s.batch_stats["model_s"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
