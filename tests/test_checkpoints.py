"""Checkpoint save/restore: latest/best semantics + the three restore modes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from u2mkd_tpu.data import synthetic
from u2mkd_tpu.models.spvcnn import SPVCNN
from u2mkd_tpu.train import checkpoints as C
from u2mkd_tpu.train import optim, state as train_state

CAPS = (128, 64, 32, 16, 8)


def _state(rng_seed=0):
    raw = synthetic.make_batch(np.random.RandomState(3), 1, 120, voxel_size=0.5)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model = SPVCNN(num_classes=5, cr=0.25)
    tx = optim.make_optimizer("sgd", 0.01)
    st = train_state.create_train_state(model, tx, batch, CAPS,
                                        jax.random.PRNGKey(rng_seed))
    return st, model, tx, batch


@pytest.mark.slow
def test_latest_best_epoch_savers(tmp_path):
    st, model, tx, batch = _state()
    mgr = C.CheckpointManager(str(tmp_path), epoch_to_save=2)
    mgr.save_latest(st, epoch=1)
    assert os.path.exists(os.path.join(tmp_path, "checkpoints", "latest"))
    assert not os.path.exists(os.path.join(tmp_path, "checkpoints", "epoch-1"))
    mgr.save_latest(st, epoch=2)
    assert os.path.exists(os.path.join(tmp_path, "checkpoints", "epoch-2"))

    assert mgr.save_best(st, 0.5)
    assert not mgr.save_best(st, 0.4)  # no improvement
    assert mgr.save_best(st, 0.6)
    assert os.path.exists(os.path.join(tmp_path, "checkpoints", "max-iou-val-vox"))

    # MaxSaver state survives a new manager (resume)
    mgr2 = C.CheckpointManager(str(tmp_path))
    assert not mgr2.save_best(st, 0.55)
    assert mgr2.save_best(st, 0.7)

    # full restore round-trips exactly
    restored = mgr.restore("latest", jax.device_get(st))
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_restore_skips_classifier(tmp_path):
    st, model, tx, batch = _state(0)
    mgr = C.CheckpointManager(str(tmp_path))
    mgr.save_latest(st, 1)

    st2, *_ = _state(1)  # different init
    merged = C.load_pretrain_params(
        os.path.join(tmp_path, "checkpoints", "latest"), st2.params
    )
    # backbone keys come from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(merged["stem0"]["SparseConv_0"]["kernel"]),
        np.asarray(st.params["stem0"]["SparseConv_0"]["kernel"]),
    )
    # classifier keys stay at the new init
    np.testing.assert_array_equal(
        np.asarray(merged["classifier_vox"]["kernel"]),
        np.asarray(st2.params["classifier_vox"]["kernel"]),
    )


def test_crash_between_renames_recovers(tmp_path):
    """A save preempted between its two renames leaves the only intact
    checkpoint under ``latest.old``; both restore and the next save must
    promote it back instead of treating it as garbage (regression: the old
    cleanup rmtree'd ``.old`` first, destroying the sole survivor)."""
    st, model, tx, batch = _state()
    mgr = C.CheckpointManager(str(tmp_path))
    mgr.save_latest(st, epoch=1)
    live = os.path.join(tmp_path, "checkpoints", "latest")

    # simulate the crash window: live has been renamed to .old, the new
    # .tmp never made it to the live name (crash discarded it)
    os.rename(live, live + ".old")
    assert not os.path.exists(live)

    restored = mgr.restore("latest", jax.device_get(st))
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same window again, but the next event is a save — it must not rmtree
    # the orphan before writing the replacement
    os.rename(live, live + ".old")
    mgr.save_latest(st, epoch=2)
    assert os.path.exists(live)
    assert not os.path.exists(live + ".old")
    mgr.restore("latest", jax.device_get(st))


def test_pretrain_batch_stats_zero_match_raises(tmp_path):
    """Restoring BN statistics from an incompatible checkpoint must fail
    loudly — eval-mode forwards on init running stats (mean 0 / var 1) are
    silently wrong in a way no later metric exposes."""
    st, model, tx, batch = _state()
    mgr = C.CheckpointManager(str(tmp_path))
    mgr.save_latest(st, 1)
    ckpt = os.path.join(tmp_path, "checkpoints", "latest")

    alien = {"totally": {"different": {"mean": np.zeros((7,), np.float32)}}}
    with pytest.raises(ValueError, match="ZERO batch-stats"):
        C.load_pretrain_batch_stats(ckpt, alien)

    # matching target still round-trips
    out = C.load_pretrain_batch_stats(ckpt, jax.device_get(st.batch_stats))
    for a, b in zip(jax.tree_util.tree_leaves(st.batch_stats),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_restore_into_tsd(tmp_path):
    st, model, tx, batch = _state(0)
    mgr = C.CheckpointManager(str(tmp_path))
    mgr.save_latest(st, 1)
    ckpt = os.path.join(tmp_path, "checkpoints", "latest")

    fake_tsd_params = {
        "model_s": {"w": jnp.ones((2, 2))},
        "model_t": jax.tree_util.tree_map(jnp.zeros_like, st.params),
    }
    out = C.load_teacher_params(ckpt, fake_tsd_params)
    np.testing.assert_array_equal(
        np.asarray(out["model_t"]["classifier_vox"]["kernel"]),
        np.asarray(st.params["classifier_vox"]["kernel"]),
    )
    np.testing.assert_array_equal(np.asarray(out["model_s"]["w"]), 1.0)
