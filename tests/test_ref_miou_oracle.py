"""Golden-oracle parity vs the reference's own MeanIoU callback.

Execs ``/root/reference/core/callbacks.py`` with the torchpack / nuscenes /
prettytable imports stubbed and drives the reference ``MeanIoU`` callback
(_before_epoch/_after_step/_after_epoch, callbacks.py:91-171) on numpy
predictions, capturing the per-class IoU row it renders. Our streaming
counters (``train/metrics.py``) must accumulate the identical seen/correct/
positive counts, and ``compute_miou`` must reproduce the reference's
empty-class=1 / skip-ignore-class semantics.
"""

import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from u2mkd_tpu.train import metrics

_REF = "/root/reference"


class _FakePrettyTable:
    rows = []

    def __init__(self):
        self.field_names = []

    def add_row(self, row):
        _FakePrettyTable.rows.append(list(row))

    def __str__(self):
        return "<table>"


def _load_ref_callbacks():
    path = os.path.join(_REF, "core", "callbacks.py")
    if not os.path.exists(path):
        pytest.skip("reference snapshot unavailable")
    with open(path) as f:
        src = f.read()

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    dist = mod("torchpack.distributed",
               allreduce=lambda x, reduction="sum": x,  # single process
               size=lambda: 1, rank=lambda: 0)
    stubs = {
        "torchpack": mod("torchpack", distributed=dist),
        "torchpack.environ": mod("torchpack.environ",
                                 get_run_dir=lambda: "/tmp"),
        "torchpack.distributed": dist,
        "torchpack.callbacks": mod("torchpack.callbacks",
                                   TFEventWriter=type("TFEventWriter", (), {})),
        "torchpack.callbacks.callback": mod("torchpack.callbacks.callback",
                                            Callback=type("Callback", (), {})),
        "torchpack.utils": mod("torchpack.utils", fs=mod("fs"), io=mod("io")),
        "torchpack.utils.fs": mod("torchpack.utils.fs"),
        "torchpack.utils.io": mod("torchpack.utils.io"),
        "torchpack.utils.logging": mod("torchpack.utils.logging",
                                       logger=mod("logger")),
        "nuscenes": mod("nuscenes"),
        "nuscenes.eval": mod("nuscenes.eval"),
        "nuscenes.eval.lidarseg": mod("nuscenes.eval.lidarseg"),
        "nuscenes.eval.lidarseg.utils": mod("nuscenes.eval.lidarseg.utils",
                                            ConfusionMatrix=object),
        "prettytable": mod("prettytable", PrettyTable=_FakePrettyTable),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        ns = {"__name__": "ref_callbacks"}
        exec(compile(src, path, "exec"), ns)  # reference numpy code as oracle
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


def test_miou_counters_and_iou_match_exec_reference(rng):
    ns = _load_ref_callbacks()
    C, ignore = 17, 0
    ref = ns["MeanIoU"](num_classes=C, ignore_label=ignore)
    ref._before_epoch()

    ours = metrics.zeros_counts(C)
    for step in range(3):
        n = 400 + 37 * step
        target = rng.randint(0, C, size=n)
        target[target == 5] = 1  # class 5 never seen -> empty-class=1 path
        pred = target.copy()
        flip = rng.rand(n) < 0.35
        pred[flip] = rng.randint(0, C, size=int(flip.sum()))
        ref._after_step({"outputs": pred, "targets": target})
        ours = metrics.merge_counts(ours, metrics.iou_counts(
            jnp.asarray(pred), jnp.asarray(target),
            jnp.ones(n, bool), C, ignore))

    np.testing.assert_array_equal(np.asarray(ours["seen"]), ref.total_seen)
    np.testing.assert_array_equal(np.asarray(ours["correct"]),
                                  ref.total_correct)
    # reference counts ignore-label predictions in total_positive only for
    # rows whose TARGET is non-ignore; ours filters identically
    np.testing.assert_array_equal(np.asarray(ours["positive"]),
                                  ref.total_positive)

    _FakePrettyTable.rows = []
    ref._after_epoch()
    assert _FakePrettyTable.rows, "reference did not render its IoU table"
    row = _FakePrettyTable.rows[-1]
    ref_ious = np.asarray(row[1:-1], np.float64)  # percent, rounded to 2dp
    ref_miou = float(row[-1])

    miou, per_class = metrics.compute_miou(ours, ignore)
    got = np.asarray([per_class[i] for i in range(C) if i != ignore]) * 100
    np.testing.assert_allclose(got, ref_ious, atol=0.006)  # 2dp rounding
    np.testing.assert_allclose(miou * 100, ref_miou, atol=0.006)
