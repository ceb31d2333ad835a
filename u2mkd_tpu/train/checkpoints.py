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
        path = _path(self.run_dir, name)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(state))
        self._ckpt.wait_until_finished()

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

    def restore(self, name: str, target):
        return self._ckpt.restore(_path(self.run_dir, name), target=target)

    def latest_epoch(self) -> Optional[int]:
        meta = os.path.join(self.dir, "latest.json")
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return json.load(f)["epoch"]


def load_pretrain_params(path: str, target_params, skip_classifier: bool = True):
    """Backbone pretrain restore: load matching params, skip classifier keys
    (reference ``nusc_trainers.py:180-188``, strict=False minus
    ``classifier``)."""
    ckpt = ocp.StandardCheckpointer()
    loaded = ckpt.restore(os.path.abspath(path))
    params = loaded["params"] if "params" in loaded else loaded

    def merge(dst, src, prefix=""):
        out = {}
        for k, v in dst.items():
            name = f"{prefix}{k}"
            if skip_classifier and "classifier" in k:
                out[k] = v
            elif k in src and isinstance(v, dict):
                out[k] = merge(v, src[k], name + "/")
            elif k in src and np.shape(src[k]) == np.shape(v):
                out[k] = jax.numpy.asarray(src[k])
            else:
                out[k] = v
        return out

    return merge(target_params, params)


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
