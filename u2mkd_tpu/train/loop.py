"""Epoch training loop with eval, metric logging and checkpoint callbacks.

Replaces torchpack's ``Trainer.train_with_defaults`` + ``InferenceRunner`` +
``MeanIoU``/``Saver``/``MaxSaver`` callback stack (reference
``train_spformer.py:97-115``, ``core/callbacks.py``): one plain Python loop
driving jitted steps, JSONL + optional TensorBoard metric writers, per-class
IoU table, per-step latency tracking with warmup trim (``InferTime``,
``callbacks.py:203-220``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, List, NamedTuple, Optional

import jax
import numpy as np

from u2mkd_tpu.parallel.mesh import device_batch
from u2mkd_tpu.train import metrics as M
from u2mkd_tpu.train.checkpoints import CheckpointManager


class SummaryWriter:
    """JSONL metrics log + optional TF events (via torch.utils.tensorboard)."""

    def __init__(self, run_dir: str, tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self._f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter

                self._tb = TBWriter(log_dir=os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    def add_scalar(self, name: str, value: float, step: int):
        self._f.write(json.dumps({"name": name, "value": float(value),
                                  "step": int(step), "ts": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def format_iou_table(per_class: np.ndarray, miou: float,
                     class_names: Optional[List[str]] = None) -> str:
    names = class_names or [f"c{i}" for i in range(len(per_class))]
    rows = [
        (n, f"{v * 100:.2f}")
        for n, v in zip(names, per_class)
        if not np.isnan(v)
    ]
    rows.append(("Mean", f"{miou * 100:.2f}"))
    w1 = max(len(r[0]) for r in rows)
    w2 = max(len(r[1]) for r in rows)
    sep = "+" + "-" * (w1 + 2) + "+" + "-" * (w2 + 2) + "+"
    lines = [sep]
    for n, v in rows:
        lines.append(f"| {n:<{w1}} | {v:>{w2}} |")
    lines.append(sep)
    return "\n".join(lines)


class RawSpec(NamedTuple):
    """One raw-point scoring rule for ``Trainer.evaluate``.

    counts_key:  counter dict in the totals to accumulate into.
    logits_key:  eval-step output holding padded per-voxel logits [B, P, C].
    info_key:    sub-entry of ``batch['infos'][i]`` holding the devox info
                 (None -> the info dict itself; "student" for distill
                 batches), also selects the sub-batch carrying ``pmask``.
    filter_key:  optional boolean raw-cloud mask inside the info to restrict
                 scoring (e.g. "keyframe_mask_full" for multisweep teachers,
                 "fov_full" for the student pixel head).
    """

    counts_key: str
    logits_key: str
    info_key: Optional[str] = None
    filter_key: Optional[str] = "keyframe_mask_full"


class _NullSummary:
    """No-op writer for non-master processes in multihost runs."""

    def add_scalar(self, name, value, step):
        pass

    def close(self):
        pass


class Trainer:
    """Generic epoch loop over jitted train/eval steps.

    train_loader()/val_loader(): callables returning an iterable of batch
    dicts (fresh each epoch). eval_counts_key selects which counter dict in
    the eval output feeds the checkpointed mIoU (vox head by default).
    """

    def __init__(
        self,
        run_dir: str,
        state,
        train_step: Callable,
        eval_step: Callable,
        train_loader: Callable[[], Iterable],
        val_loader: Callable[[], Iterable],
        num_epochs: int,
        num_classes: int,
        seed: int = 0,
        ignore_label: int = 0,
        class_names: Optional[List[str]] = None,
        eval_counts_key: str = "counts",
        extra_count_keys: Iterable[str] = (),
        epoch_to_save: int = 0,
        log_every: int = 10,
        eval_raw_points: bool = True,
        logits_key: str = "logits",
        strict_capacity: bool = False,
        raw_specs: Optional[List["RawSpec"]] = None,
    ):
        # multihost: only process 0 writes summaries/checkpoints into the
        # (possibly shared) run_dir; collective calls still run everywhere
        self.is_master = jax.process_index() == 0
        self.run_dir = os.path.abspath(run_dir)
        if self.is_master:
            os.makedirs(self.run_dir, exist_ok=True)
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.strict_capacity = strict_capacity
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.num_epochs = num_epochs
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.class_names = class_names
        self.eval_counts_key = eval_counts_key
        self.extra_count_keys = tuple(extra_count_keys)
        self.summary = (SummaryWriter(self.run_dir) if self.is_master
                        else _NullSummary())
        self.ckpt = CheckpointManager(self.run_dir, epoch_to_save=epoch_to_save)
        self.log_every = log_every
        self.rng = jax.random.PRNGKey(seed)
        self.global_step = 0
        self.eval_raw_points = eval_raw_points
        self.logits_key = logits_key
        self.raw_specs = raw_specs or [
            RawSpec(eval_counts_key, logits_key, None, "keyframe_mask_full")
        ]

    def _spec_info(self, batch, spec, i):
        info = batch["infos"][i]
        if info is not None and spec.info_key is not None:
            info = info.get(spec.info_key)
        return info

    def _raw_point_counts(self, out, batch, spec: RawSpec):
        """Exact reference eval semantics: devoxelize logits to the raw cloud
        via stored inverse maps, apply the spec's raw-cloud filter (keyframe
        points for multisweep teachers, FOV for the student pixel head),
        score every raw point against its own label
        (``spformer_trainer.py:96-115``, ``nusc_trainers.py:368-390``)."""
        from u2mkd_tpu.train import evaluator as E

        from u2mkd_tpu.parallel.mesh import local_data

        sub = batch if spec.info_key is None else batch[spec.info_key]
        # multihost: infos are process-local; score this process's block of
        # the sharded logits, counters are summed across processes at the
        # end of evaluate()
        logits = local_data(out[spec.logits_key])
        pmasks = local_data(sub["pmask"])
        total = {k: np.zeros(self.num_classes, np.int64)
                 for k in ("seen", "correct", "positive")}
        for i in range(len(batch["infos"])):
            info = self._spec_info(batch, spec, i)
            pmask = pmasks[i]
            raw_logits = E.devoxelize_predictions(logits[i], pmask, info)
            pred = np.argmax(raw_logits, axis=-1)
            labels = info["labels_full"]
            keep = labels != self.ignore_label
            if spec.filter_key is not None:
                filt = info.get(spec.filter_key)
                if filt is not None:
                    keep &= filt.astype(bool)
            total["seen"] += np.bincount(labels[keep],
                                         minlength=self.num_classes)
            total["positive"] += np.bincount(pred[keep],
                                             minlength=self.num_classes)
            agree = keep & (pred == labels)
            total["correct"] += np.bincount(labels[agree],
                                            minlength=self.num_classes)
        return total

    def evaluate(self) -> Dict[str, float]:
        totals = {
            k: M.zeros_counts(self.num_classes)
            for k in (self.eval_counts_key,) + self.extra_count_keys
        }
        infer_times = []
        raw_keys = set()
        for batch in self.val_loader():
            t0 = time.time()
            out = self.eval_step(self.state, device_batch(batch))
            jax.block_until_ready(out)
            infer_times.append(time.time() - t0)
            use_raw = (
                self.eval_raw_points
                and batch.get("infos")
                and self._spec_info(batch, self.raw_specs[0], 0) is not None
                and all(s.logits_key in out for s in self.raw_specs)
            )
            if use_raw:
                for spec in self.raw_specs:
                    raw_keys.add(spec.counts_key)
                    totals[spec.counts_key] = M.merge_counts(
                        totals[spec.counts_key],
                        self._raw_point_counts(out, batch, spec),
                    )
                for k in totals:
                    if k not in raw_keys:
                        totals[k] = M.merge_counts(totals[k],
                                                   jax.device_get(out[k]))
                continue
            for k in totals:
                totals[k] = M.merge_counts(totals[k], jax.device_get(out[k]))
        if raw_keys and jax.process_count() > 1:
            # raw-point counters were accumulated process-locally (each
            # process scored its own loader's samples); device counters were
            # already psum'd inside the step
            from jax.experimental import multihost_utils

            for k in raw_keys:
                totals[k] = {
                    name: np.asarray(
                        multihost_utils.process_allgather(np.asarray(v))
                    ).sum(axis=0)
                    for name, v in totals[k].items()
                }
        results = {}
        for k, counts in totals.items():
            miou, per_class = M.compute_miou(counts, self.ignore_label)
            results[k] = miou
            print(f"[val] {k}:")
            print(format_iou_table(per_class, miou, self.class_names))
        if len(infer_times) > 13:  # warmup trim like InferTime ([10:-3])
            results["infer_time_ms"] = float(np.mean(infer_times[10:-3]) * 1000)
        return results

    def train(self):
        for epoch in range(1, self.num_epochs + 1):
            t_epoch = time.time()
            n_steps = 0
            for batch in self.train_loader():
                self.rng, sub = jax.random.split(self.rng)
                self.state, aux = self.train_step(self.state,
                                                  device_batch(batch), sub)
                self.global_step += 1
                n_steps += 1
                if self.global_step % self.log_every == 0:
                    host_aux = jax.device_get(aux)
                    for k, v in host_aux.items():
                        self.summary.add_scalar(f"train/{k}", float(v),
                                                self.global_step)
                    from u2mkd_tpu.train import overflow as _ovf

                    _ovf.check_aux(host_aux, self.strict_capacity)
            results = self.evaluate()
            for k, v in results.items():
                self.summary.add_scalar(f"val/{k}", v, self.global_step)
            miou = results[self.eval_counts_key]
            improved = False
            if self.is_master:
                self.ckpt.save_latest(self.state, epoch)
                improved = self.ckpt.save_best(self.state, miou)
            print(
                f"epoch {epoch}/{self.num_epochs}: steps={n_steps} "
                f"miou={miou * 100:.2f}{' (best)' if improved else ''} "
                f"wall={time.time() - t_epoch:.1f}s"
            )
        self.summary.close()
        return self.state
