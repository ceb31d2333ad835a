"""Streaming mean-IoU metric (reference ``MeanIoU``,
``core/callbacks.py:91-171``).

Counters accumulate on-device as fixed [C] arrays; the cross-rank
``dist.allreduce`` becomes a ``psum`` inside the jitted eval step (or a host
sum of per-device counters). IoU semantics match the reference exactly:
targets equal to the ignore label are dropped, per-class
iou = correct / (seen + positive - correct), classes never seen count as 1
(except the ignore class, which is skipped).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def iou_counts(pred: jax.Array, target: jax.Array, valid: jax.Array,
               num_classes: int, ignore_label: int = 0) -> Dict[str, jax.Array]:
    """Per-class seen/correct/positive counts for one batch.

    pred/target [N...] int; valid [N...] bool (padding). Targets equal to
    ``ignore_label`` are excluded (reference ``callbacks.py:117-120``).
    """
    keep = valid & (target != ignore_label)
    t1 = jax.nn.one_hot(target, num_classes, dtype=jnp.int32) * keep[..., None]
    p1 = jax.nn.one_hot(pred, num_classes, dtype=jnp.int32) * keep[..., None]
    axes = tuple(range(t1.ndim - 1))
    seen = jnp.sum(t1, axis=axes)
    positive = jnp.sum(p1, axis=axes)
    correct = jnp.sum(t1 * p1, axis=axes)
    return {"seen": seen, "correct": correct, "positive": positive}


def merge_counts(a: Dict, b: Dict) -> Dict:
    return {k: a[k] + b[k] for k in a}


def zeros_counts(num_classes: int) -> Dict[str, jax.Array]:
    z = jnp.zeros((num_classes,), jnp.int32)
    return {"seen": z, "correct": z, "positive": z}


def compute_miou(counts: Dict, ignore_label: int = 0):
    """Returns (miou, per-class iou array with nan for the skipped ignore
    class). Host-side numpy."""
    seen = np.asarray(counts["seen"], np.float64)
    correct = np.asarray(counts["correct"], np.float64)
    positive = np.asarray(counts["positive"], np.float64)
    ious = []
    per_class = np.full(len(seen), np.nan)
    for i in range(len(seen)):
        if seen[i] == 0:
            if i == ignore_label:
                continue
            ious.append(1.0)
            per_class[i] = 1.0
        else:
            v = correct[i] / (seen[i] + positive[i] - correct[i])
            ious.append(v)
            per_class[i] = v
    return (float(np.mean(ious)) if ious else 0.0), per_class
