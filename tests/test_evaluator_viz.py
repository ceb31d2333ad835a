"""TTA evaluator vote-summing and visualization utils."""

import os

import numpy as np
import jax.numpy as jnp

from u2mkd_tpu.train import evaluator as E
from u2mkd_tpu.utils import visualize as V


def test_evaluate_tta_vote_summing(rng):
    """Two votes whose logits individually mispredict but vote-sum correctly."""
    ncls = 3
    labels = np.array([1, 2, 1, 0])  # last is ignore

    def loader():
        yield {
            "pmask": np.ones((1, 4), bool),
            "labels": np.array([labels]),
            "keyframe_mask": np.ones((1, 4), bool),
        }

    calls = {"n": 0}

    def eval_step(state, batch):
        # vote 0 predicts class 1 everywhere weakly-wrong on row 1;
        # vote 1 compensates so the SUM predicts the labels
        logits = np.zeros((1, 4, ncls), np.float32)
        if calls["n"] % 2 == 0:
            logits[0, :, 1] = 1.0
            logits[0, 1, 2] = 0.4
        else:
            logits[0, 1, 2] = 2.0
        calls["n"] += 1
        return {"logits": jnp.asarray(logits)}

    res = E.evaluate_tta(eval_step, None, loader, ncls, ignore_label=0,
                         num_vote=2)
    # summed logits: rows 0,2,3 -> class 1; row 1 -> class 2 (1.0 vs 2.4)
    # labels (ignoring row 3): [1, 2, 1] all correct
    assert res["miou"] == 1.0


def test_bev_and_overlay_render(tmp_path, rng):
    xyz = (rng.rand(500, 3) * 60 - 30).astype(np.float32)
    labels = rng.randint(0, 17, 500)
    p1 = os.path.join(tmp_path, "bev.png")
    V.save_bev_png(p1, xyz, labels)
    assert os.path.getsize(p1) > 0

    img = (rng.rand(60, 90, 3) * 255).astype(np.uint8)
    uv = (rng.rand(500, 2) * 2 - 1).astype(np.float32)
    mask = rng.rand(500) > 0.5
    p2 = os.path.join(tmp_path, "overlay.png")
    V.save_projection_overlay(p2, img, uv, mask, labels)
    assert os.path.getsize(p2) > 0


def test_confusion_matrix(rng):
    pred = np.array([1, 2, 1, 1])
    target = np.array([1, 2, 2, 0])
    cm = V.confusion_matrix(pred, target, 3, ignore_label=0)
    assert cm[1, 1] == 1 and cm[2, 2] == 1 and cm[2, 1] == 1
    assert cm.sum() == 3  # ignore-label row dropped


def test_export_html_viewer(tmp_path, rng):
    from u2mkd_tpu.utils import visualize

    xyz = rng.randn(500, 3).astype(np.float32) * 10
    labels = rng.randint(0, 5, 500)
    out = visualize.export_html_viewer(
        str(tmp_path / "cloud.html"), xyz, labels,
        class_names=[f"c{i}" for i in range(5)])
    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    assert '"pts"' in html and '"palette"' in html
    assert "orbit" in html
    # payload round-trips: same number of points
    import json as _json
    payload = html.split("const D=", 1)[1].split(";\nconst cv", 1)[0]
    data = _json.loads(payload)
    assert len(data["pts"]) == 500 and len(data["lab"]) == 500
