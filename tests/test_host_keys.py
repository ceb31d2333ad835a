"""Host-only batch leaves must never reach a jitted step.

Real-dataset collates (``semantic_nusc.collate``, ``collate_tsd``) attach
``infos`` (ragged per-sample dicts) and ``lidar_tokens`` (strings) to every
batch for host-side raw-point eval; jax rejects string leaves at trace time
and ragged ones force per-batch recompiles. ``parallel.mesh.device_batch``
is the single strip point — these tests run the ACTUAL loop entry points
(``Trainer.evaluate``, ``Trainer.train``, ``evaluator.evaluate_tta``) with
genuinely jitted steps over real-data-shaped batches, the configuration
that previously crashed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from u2mkd_tpu.parallel.mesh import HOST_LOCAL_KEYS, device_batch


def _real_shaped_batch(rng, b=2, v=16, ncls=4):
    pts = 2 * v
    return {
        "feats": rng.normal(size=(b, v, 4)).astype(np.float32),
        "labels": rng.randint(0, ncls, (b, v)).astype(np.int32),
        "pmask": np.ones((b, v), bool),
        "keyframe_mask": np.ones((b, v), bool),
        "infos": [
            {
                "inverse_map": rng.randint(0, v, pts),
                "labels_full": rng.randint(0, ncls, pts),
                "keyframe_mask_full": np.ones(pts, bool),
            }
            for _ in range(b)
        ],
        "lidar_tokens": [f"token-{i}" for i in range(b)],
    }


def test_device_batch_strips_host_keys():
    batch = {"feats": np.zeros(3), "infos": [{}], "lidar_tokens": ["x"]}
    db = device_batch(batch)
    assert set(db) == {"feats"}
    for k in HOST_LOCAL_KEYS:
        assert k not in db
    # non-dict passthrough
    assert device_batch(3) == 3


def test_trainer_evaluate_jitted_step_with_real_batch(rng, tmp_path):
    """Trainer.evaluate end-to-end: jitted eval step + infos/tokens batch
    + raw-point scoring (the real-dataset eval configuration)."""
    from u2mkd_tpu.train import metrics as M
    from u2mkd_tpu.train.loop import Trainer

    ncls = 4

    @jax.jit
    def eval_step(state, batch):
        # any string/ragged leaf in `batch` fails here at trace time
        logits = jnp.einsum("bvc,cd->bvd", batch["feats"], state["w"])
        pred = jnp.argmax(logits, -1)
        counts = M.iou_counts(pred, batch["labels"], batch["pmask"], ncls, 0)
        return {"logits": logits, "counts": counts}

    state = {"w": jnp.asarray(rng.normal(size=(4, ncls)).astype(np.float32))}
    batches = [_real_shaped_batch(rng) for _ in range(2)]

    tr = Trainer(
        run_dir=str(tmp_path / "run"),
        state=state,
        train_step=None,
        eval_step=eval_step,
        train_loader=lambda: iter(()),
        val_loader=lambda: iter(batches),
        num_epochs=1,
        num_classes=ncls,
        eval_raw_points=True,
    )
    res = tr.evaluate()
    assert "counts" in res and np.isfinite(res["counts"])


def test_trainer_train_jitted_step_with_real_batch(rng, tmp_path):
    from u2mkd_tpu.train.loop import Trainer

    @jax.jit
    def train_step(state, batch, _rng):
        loss = jnp.sum(batch["feats"] * state["w"][None, None])
        return {"w": state["w"] - 0.1}, {"loss": loss}

    state = {"w": jnp.zeros(4)}
    batches = [_real_shaped_batch(rng) for _ in range(2)]
    tr = Trainer(
        run_dir=str(tmp_path / "run"),
        state=state,
        train_step=train_step,
        eval_step=None,
        train_loader=lambda: iter(batches),
        val_loader=lambda: iter(()),
        num_epochs=1,
        num_classes=4,
    )
    # evaluate() on the empty val loader would divide by zero metrics; just
    # drive the train epoch loop
    for batch in tr.train_loader():
        tr.rng, sub = jax.random.split(tr.rng)
        from u2mkd_tpu.parallel.mesh import device_batch as db

        tr.state, aux = tr.train_step(tr.state, db(batch), sub)
    assert np.isfinite(float(aux["loss"]))


def test_evaluate_tta_jitted_step_with_real_batch(rng):
    from u2mkd_tpu.train import evaluator as E

    ncls = 4

    @jax.jit
    def eval_step(state, batch):
        logits = jnp.einsum("bvc,cd->bvd", batch["feats"], state["w"])
        return {"logits": logits}

    state = {"w": jnp.asarray(rng.normal(size=(4, ncls)).astype(np.float32))}
    batches = [_real_shaped_batch(rng)]
    res = E.evaluate_tta(eval_step, state, lambda: iter(batches), ncls, 0,
                         num_vote=2)
    assert 0.0 <= res["miou"] <= 1.0


def test_to_local_device_keeps_infos_host_side(rng):
    from u2mkd_tpu.parallel.mesh import to_local_device

    batch = _real_shaped_batch(rng)
    up = to_local_device(batch)
    # array leaves uploaded
    assert isinstance(up["feats"], jax.Array)
    assert isinstance(up["pmask"], jax.Array)
    # host-local metadata untouched (no H2D of raw-cloud arrays)
    assert isinstance(up["infos"][0]["inverse_map"], np.ndarray)
    assert up["lidar_tokens"] == batch["lidar_tokens"]
    # nested dicts (distill batches) walk through
    nested = {"student": {"feats": batch["feats"]}, "infos": batch["infos"]}
    up2 = to_local_device(nested)
    assert isinstance(up2["student"]["feats"], jax.Array)
    assert isinstance(up2["infos"][0]["labels_full"], np.ndarray)
