"""Raw-point evaluation semantics: devoxelized scoring vs manual oracle."""

import numpy as np
import jax.numpy as jnp

from u2mkd_tpu.train import evaluator as E


def test_devoxelize_predictions_and_counts(rng):
    # 3 raw points; points 0 and 2 share a voxel (dedup rep = point 0)
    ncls = 4
    logits = np.array([[5, 0, 0, 0], [0, 5, 0, 0]], np.float32)  # 2 voxels
    pmask = np.array([True, True, False])  # padded to 3 rows upstream
    info = {
        "inverse_map": np.array([0, 1, 0]),
        "labels_full": np.array([1, 2, 3]),  # point 2 has a DIFFERENT label
        "keyframe_mask_full": np.array([True, True, True]),
    }
    raw = E.devoxelize_predictions(logits, pmask, info)
    assert raw.shape == (3, ncls)
    pred = raw.argmax(-1)
    np.testing.assert_array_equal(pred, [0, 1, 0])
    # scoring every raw point against its own label: point 0 wrong (pred 0,
    # label 1), point 1 wrong (pred 1, label 2)... build counts manually
    labels = info["labels_full"]
    keep = labels != 0
    seen = np.bincount(labels[keep], minlength=ncls)
    np.testing.assert_array_equal(seen, [0, 1, 1, 1])
    correct = np.bincount(labels[keep & (pred == labels)], minlength=ncls)
    assert correct.sum() == 0  # all mismatched in this fixture


def test_trainer_raw_eval_integration(rng):
    """Trainer._raw_point_counts over a fabricated eval output."""
    from u2mkd_tpu.train.loop import Trainer

    from u2mkd_tpu.train.loop import RawSpec

    class Dummy(Trainer):
        def __init__(self):
            self.num_classes = 4
            self.ignore_label = 0
            self.logits_key = "logits"
            self.raw_specs = [
                RawSpec("counts", "logits", None, "keyframe_mask_full")
            ]

    t = Dummy()
    logits = np.zeros((1, 2, 4), np.float32)
    logits[0, 0, 1] = 5  # voxel 0 predicts class 1
    logits[0, 1, 2] = 5  # voxel 1 predicts class 2
    batch = {
        "pmask": np.array([[True, True]]),
        "infos": [{
            "inverse_map": np.array([0, 1, 0, 1]),
            "labels_full": np.array([1, 2, 1, 3]),
            "keyframe_mask_full": np.array([True, True, True, False]),
        }],
    }
    out = {"logits": jnp.asarray(logits)}
    counts = t._raw_point_counts(out, batch, t.raw_specs[0])
    # kept raw points: 0 (lab 1, pred 1 OK), 1 (lab 2, pred 2 OK),
    # 2 (lab 1, pred 1 OK); point 3 dropped by keyframe mask
    np.testing.assert_array_equal(counts["seen"], [0, 2, 1, 0])
    np.testing.assert_array_equal(counts["correct"], [0, 2, 1, 0])
    np.testing.assert_array_equal(counts["positive"], [0, 2, 1, 0])
