"""Checkpointing with the reference's saver semantics, on orbax.

Reference behavior (SURVEY §5.4): torchpack ``Saver(max_to_keep=1)`` saves
the latest step; ``MaxSaver('iou/val/vox')`` keeps the best checkpoint as
``max-iou-val-vox``; optional ``EpochSaver`` every N epochs; trainer state =
model + optimizer + scheduler (+ AMP scaler — not needed in bf16/f32 JAX).
Three stage-2 restore modes (reference ``nusc_trainers.py:173-201``):
full resume / backbone pretrain without classifier keys / teacher-only.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(run_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(run_dir), "checkpoints", name)


class CheckpointManager:
    """Latest + best-metric + periodic-epoch checkpoints."""

    def __init__(self, run_dir: str, metric_name: str = "iou-val-vox",
                 epoch_to_save: int = 0):
        self.run_dir = os.path.abspath(run_dir)
        self.dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.metric_name = metric_name
        self.epoch_to_save = epoch_to_save
        self.best = -np.inf
        self._ckpt = ocp.StandardCheckpointer()
        meta = os.path.join(self.dir, "best.json")
        if os.path.exists(meta):
            with open(meta) as f:
                self.best = json.load(f)["best"]

    def _save(self, name: str, state):
        """Crash-safe save: write to <name>.tmp, then swap via renames.

        Deleting the live checkpoint before the replacement exists would
        leave a preempted run with NO resumable state; with the rename
        dance every interruption point leaves either the old or the new
        checkpoint intact on disk. A crash between the two renames leaves
        the survivor under the ``.old`` name only, so both this method and
        :meth:`restore` first promote an orphaned ``.old`` back to the live
        name (stale .tmp dirs are reclaimed on the next save)."""
        import shutil

        path = _path(self.run_dir, name)
        tmp, old = path + ".tmp", path + ".old"
        self._recover(path)
        for p in (tmp, old):
            if os.path.exists(p):
                shutil.rmtree(p)
        self._ckpt.save(tmp, jax.device_get(state))
        self._ckpt.wait_until_finished()
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def save_latest(self, state, epoch: int):
        self._save("latest", state)
        with open(os.path.join(self.dir, "latest.json"), "w") as f:
            json.dump({"epoch": epoch}, f)
        if self.epoch_to_save and epoch and epoch % self.epoch_to_save == 0:
            self._save(f"epoch-{epoch}", state)

    def save_best(self, state, metric_value: float) -> bool:
        """MaxSaver: keep checkpoint named max-<metric> when improved."""
        if metric_value > self.best:
            self.best = float(metric_value)
            self._save(f"max-{self.metric_name}", state)
            with open(os.path.join(self.dir, "best.json"), "w") as f:
                json.dump({"best": self.best}, f)
            return True
        return False

    @staticmethod
    def _recover(path: str) -> None:
        """Promote an orphaned ``<path>.old`` back to the live name: a save
        preempted between its two renames leaves the only intact checkpoint
        under ``.old``, which neither restore nor the next save's cleanup
        would otherwise consult."""
        old = path + ".old"
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)

    def restore(self, name: str, target):
        path = _path(self.run_dir, name)
        self._recover(path)
        return self._ckpt.restore(path, target=target)

    def latest_epoch(self) -> Optional[int]:
        meta = os.path.join(self.dir, "latest.json")
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return json.load(f)["epoch"]


def _merge_matching(dst, src, skip_classifier, stats):
    """Copy src leaves into dst where key paths and shapes match; count
    matched/unmatched leaves into ``stats`` so a totally-mismatched
    checkpoint cannot be silently ignored."""
    out = {}
    for k, v in dst.items():
        if skip_classifier and "classifier" in k:
            out[k] = v
            stats["skipped"] += sum(
                1 for _ in jax.tree_util.tree_leaves(v))
        elif k in src and isinstance(v, dict):
            out[k] = _merge_matching(v, src[k], skip_classifier, stats)
        elif k in src and np.shape(src[k]) == np.shape(v):
            out[k] = jax.numpy.asarray(src[k])
            stats["matched"] += 1
        else:
            out[k] = v
            stats["unmatched"] += sum(
                1 for _ in jax.tree_util.tree_leaves(v))
    return out


def load_pretrain_params(path: str, target_params, skip_classifier: bool = True):
    """Backbone pretrain restore: load matching params, skip classifier keys
    (reference ``nusc_trainers.py:180-188``, strict=False minus
    ``classifier``). Raises when NOTHING matches (a wrong checkpoint would
    otherwise silently train from random init) and reports partial
    mismatches."""
    ckpt = ocp.StandardCheckpointer()
    loaded = ckpt.restore(os.path.abspath(path))
    params = loaded["params"] if "params" in loaded else loaded
    stats = {"matched": 0, "unmatched": 0, "skipped": 0}
    out = _merge_matching(target_params, params, skip_classifier, stats)
    if stats["matched"] == 0:
        raise ValueError(
            f"pretrain restore from {path} matched ZERO parameters "
            f"(target has {stats['unmatched']} unmatched leaves) — wrong "
            f"checkpoint or incompatible architecture/cr")
    if stats["unmatched"]:
        print(f"pretrain restore: {stats['matched']} leaves loaded, "
              f"{stats['unmatched']} left at init, "
              f"{stats['skipped']} classifier leaves skipped")
    return out


def load_pretrain_batch_stats(path: str, target_stats):
    """Companion to :func:`load_pretrain_params`: restore the pretrained
    backbone's BN running statistics (the reference's ``strict=False``
    ``load_state_dict`` restores buffers too, ``nusc_trainers.py:180-188``);
    leaving them at init (mean 0 / var 1) would corrupt every eval-mode
    forward early in stage 2."""
    ckpt = ocp.StandardCheckpointer()
    loaded = ckpt.restore(os.path.abspath(path))
    if "batch_stats" not in loaded:
        return target_stats
    stats = {"matched": 0, "unmatched": 0, "skipped": 0}
    out = _merge_matching(target_stats, loaded["batch_stats"], False, stats)
    n_target = len(jax.tree_util.tree_leaves(target_stats))
    if n_target and stats["matched"] == 0:
        raise ValueError(
            f"pretrain restore from {path} matched ZERO batch-stats buffers "
            f"(target has {n_target} BN leaves) — eval-mode forwards would "
            f"run on init running stats; wrong checkpoint or incompatible "
            f"architecture/cr")
    if stats["unmatched"]:
        print(f"pretrain restore: {stats['matched']} BN buffers loaded, "
              f"{stats['unmatched']} left at init")
    return out


def load_teacher_any(path: str, tsd_params, tsd_batch_stats):
    """Teacher-only restore dispatch: an orbax checkpoint DIRECTORY (our
    stage-1 output) or a reference torch ``.pt`` FILE (e.g. the published
    ``max-iou-val-vox.pt``, ``README.md:95``) — the latter goes through the
    strict ``convert_weights.load_teacher_pt`` importer. Returns
    (params, batch_stats)."""
    p = os.path.abspath(path)
    if os.path.isfile(p):
        from u2mkd_tpu.models.convert_weights import load_teacher_pt

        vs = load_teacher_pt(
            p, {"params": tsd_params, "batch_stats": tsd_batch_stats},
            scope="model_t")
        return vs["params"], vs["batch_stats"]
    return (load_teacher_params(p, tsd_params),
            load_teacher_batch_stats(p, tsd_batch_stats))


def load_teacher_params(teacher_ckpt_dir: str, tsd_params):
    """Teacher-only restore into the TSD wrapper: the stage-1 teacher
    checkpoint's params become ``model_t`` (reference
    ``nusc_trainers.py:190-199``, strict=True)."""
    ckpt = ocp.StandardCheckpointer()
    loaded = ckpt.restore(os.path.abspath(teacher_ckpt_dir))
    t_params = loaded["params"] if "params" in loaded else loaded
    out = dict(tsd_params)
    out["model_t"] = jax.tree_util.tree_map(jax.numpy.asarray, t_params)
    return out


def load_teacher_batch_stats(teacher_ckpt_dir: str, tsd_batch_stats):
    ckpt = ocp.StandardCheckpointer()
    loaded = ckpt.restore(os.path.abspath(teacher_ckpt_dir))
    if "batch_stats" in loaded:
        out = dict(tsd_batch_stats)
        out["model_t"] = jax.tree_util.tree_map(
            jax.numpy.asarray, loaded["batch_stats"]
        )
        return out
    return tsd_batch_stats
