"""Standalone evaluator with multi-vote test-time augmentation.

Equivalent of the reference ``NuScenes_Evaluator``
(``core/nusc_trainers.py:441-550``): run the model over the val split,
optionally summing logits over ``num_vote`` augmented copies of each scan
(TTA), devoxelize predictions back to the raw points via the stored inverse
maps, and compute per-class IoU. Vote aggregation and devoxelization happen
host-side on the full-resolution clouds; the jitted eval step stays
fixed-shape.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from u2mkd_tpu.parallel.mesh import device_batch
from u2mkd_tpu.train import metrics as M


def devoxelize_predictions(logits: np.ndarray, pmask: np.ndarray,
                           info: Dict) -> np.ndarray:
    """Map per-voxel(point) logits back to the raw cloud via the inverse map
    (reference eval branch ``spformer_trainer.py:96-115``). Returns raw-point
    logits [N_raw, C]."""
    inverse = info["inverse_map"]
    n_model = int(pmask.sum())
    # rows beyond capacity were dropped; clamp and zero them
    safe = np.clip(inverse, 0, n_model - 1)
    out = logits[safe]
    out[inverse >= n_model] = 0.0
    return out


def evaluate_tta(
    eval_step: Callable,
    state,
    loader: Callable[[], Iterable],
    num_classes: int,
    ignore_label: int = 0,
    num_vote: int = 1,
    logits_key: str = "logits",
    sample_view: Optional[Callable[[Dict], Dict]] = None,
) -> Dict:
    """Accumulate IoU over the val set with optional vote-summed logits.

    ``loader()`` must yield, for each vote round, batches with identical
    sample order (vote > 1 implies the loader applies fresh random TTA
    augmentation per round; reference sums logits over votes,
    ``nusc_trainers.py:517-536``).

    ``sample_view`` maps a loader batch to the flat scoring view
    ``{pmask, labels, keyframe_mask, infos}`` for batch layouts that nest
    those keys — the TSD student batches nest them under ``"student"``
    (the reference's evaluator likewise scores the student's
    ``outputs_vox`` only, ``nusc_trainers.py:517-536``). The full batch is
    still what ``eval_step`` receives.
    """
    counts = M.zeros_counts(num_classes)
    counts = {k: np.asarray(v) for k, v in counts.items()}
    vote_sums: Dict[int, np.ndarray] = {}
    sample_meta: Dict[int, Dict] = {}
    for vote in range(num_vote):
        si = 0
        for batch in loader():
            out = eval_step(state, device_batch(batch))
            logits = np.asarray(jax.device_get(out[logits_key]))
            view = sample_view(batch) if sample_view is not None else batch
            infos = view.get("infos")
            b = logits.shape[0]
            for i in range(b):
                info = infos[i] if infos else None
                pmask = np.asarray(view["pmask"][i])
                if info is not None:
                    raw_logits = devoxelize_predictions(logits[i], pmask, info)
                    labels = info["labels_full"]
                    kf = info.get("keyframe_mask_full")
                else:
                    raw_logits = logits[i][pmask]
                    labels = np.asarray(view["labels"][i])[pmask]
                    kf = np.asarray(view["keyframe_mask"][i])[pmask]
                if num_vote > 1:
                    vote_sums[si] = vote_sums.get(si, 0) + raw_logits
                    sample_meta[si] = {"labels": labels, "kf": kf}
                else:
                    _accumulate(counts, raw_logits, labels, kf, num_classes,
                                ignore_label)
                si += 1
    if num_vote > 1:
        for si, summed in vote_sums.items():
            meta = sample_meta[si]
            _accumulate(counts, summed, meta["labels"], meta["kf"],
                        num_classes, ignore_label)
    miou, per_class = M.compute_miou(counts, ignore_label)
    return {"miou": miou, "per_class": per_class, "counts": counts}


def _accumulate(counts, logits, labels, kf, num_classes, ignore_label):
    pred = np.argmax(logits, axis=-1)
    keep = np.ones(len(pred), bool) if kf is None else kf.astype(bool)
    keep &= labels != ignore_label
    for name, arr in (
        ("seen", labels), ("positive", pred),
    ):
        binc = np.bincount(arr[keep] if name == "seen" else pred[keep],
                           minlength=num_classes)[:num_classes]
        counts[name] = counts[name] + binc
    correct = (pred == labels) & keep
    counts["correct"] = counts["correct"] + np.bincount(
        labels[correct], minlength=num_classes
    )[:num_classes]
