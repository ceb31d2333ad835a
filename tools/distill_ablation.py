"""Distillation-efficacy ablation: does the frozen teacher actually help?

The framework's namesake claim (reference U2MKD: a strong multisweep
uni-modal teacher distills into a label-starved multi-modal student,
``core/nusc_trainers.py:203-340``) is tested in a controlled label-scarce
regime on the on-disk devkit-schema nuScenes-mini fixture:

  1. stage-1 teacher trains on FULL labels (multisweep, uni-modal);
  2. student A (distilled) trains with ``dataset.label_drop_p`` of its
     keyframe point labels re-marked ignore, plus the teacher's dense
     KL + feature losses;
  3. student B (scratch) trains on the SAME starved labels and the same
     rng stream, with ``criterion.w_kl=0 criterion.w_feat=0`` — every
     other term (Lovasz vox+pix, cross-modal learner MSE) identical.

The gap  distilled_miou - scratch_miou  is what the teacher contributes
beyond the annotations. Prints ONE JSON line; asserted by
``tests/test_distill_ablation.py`` (slow tier).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python tools/distill_ablation.py \
           [--root=<nusc-mini root>] [--workdir=/tmp/ablation] \
           [--drop=0.9] [--teacher-epochs=3] [--student-epochs=2]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _arg(name, default, cast):
    for a in sys.argv:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


def _run(args, timeout=3600):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    res = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=timeout,
    )
    if res.returncode != 0:
        raise RuntimeError(f"{args} failed:\n{res.stdout[-5000:]}")
    return res.stdout


def _mious(out):
    return [float(m) / 100 for m in re.findall(r"miou=([0-9.]+)", out)]


def _vox_tables(out):
    """Per-epoch ``{class_row: iou}`` dicts parsed from the ``[val]
    counts_vox:`` tables the train loop prints (``loop.format_iou_table``;
    rows are ``c{i}`` with i the class index, plus ``Mean``)."""
    tables = []
    for block in out.split("[val] counts_vox:")[1:]:
        rows = {}
        for line in block.splitlines():
            m = re.match(r"\| *(\S+) *\| *([0-9.]+) *\|", line)
            if m:
                rows[m.group(1)] = float(m.group(2)) / 100
            elif rows and not line.startswith(("|", "+")):
                break
        tables.append(rows)
    return tables


def _held_iou(out, drop_classes):
    """Mean IoU over the held-out classes at the best-val epoch (the
    MaxSaver checkpoint — the same protocol ``evaluate.py`` ships)."""
    tables = _vox_tables(out)
    if not tables or not drop_classes:
        return None
    best = max(range(len(tables)),
               key=lambda i: tables[i].get("Mean", 0.0))
    vals = [tables[best].get(f"c{int(c)}", 0.0) for c in drop_classes]
    return sum(vals) / len(vals)


def run_ablation(root=None, workdir=None, drop=0.9, teacher_epochs=3,
                 student_epochs=2, teacher_ckpt=None, teacher_miou=None,
                 drop_classes=None):
    workdir = workdir or tempfile.mkdtemp(prefix="distill_ablation_")
    if root is None:
        from make_nusc_mini import generate

        root = os.path.join(workdir, "nusc_mini")
        generate(root)

    prebuilt_teacher = teacher_ckpt is not None
    if teacher_ckpt is None:
        teacher_dir = os.path.join(workdir, "teacher")
        out = _run([
            "train_spformer.py", "configs/nuscenes/mini/spformer_mini.yaml",
            "--run-dir", teacher_dir, "--cpu", f"dataset.root={root}",
            f"num_epochs={teacher_epochs}",
        ])
        teacher_miou = _mious(out)[-1]
        teacher_ckpt = os.path.join(teacher_dir, "checkpoints",
                                    "max-iou-val-vox")
    elif teacher_miou is None:
        teacher_miou = float("nan")

    # identical configs except the two teacher-loss weights; the rng stream
    # (label drop, camera drop, augmentation) is byte-identical between arms
    common = [
        "train_lc_nusc_tsd_full.py", "configs/nuscenes/mini/tsd_mini.yaml",
        "--cpu", f"dataset.root={root}", f"num_epochs={student_epochs}",
        f"dataset.label_drop_p={drop}",
        f"model.teacher_pretrain={teacher_ckpt}",
    ]
    if drop_classes:
        # class-holdout regime: the scratch arm structurally cannot learn a
        # class no train label ever shows it; the distilled arm can, from
        # the teacher's dense predictions — the decisive efficacy axis
        cls = "[" + ",".join(str(int(c)) for c in drop_classes) + "]"
        common.append(f"dataset.label_drop_classes={cls}")
    out_d = _run(common + ["--run-dir", os.path.join(workdir, "distilled")])
    out_s = _run(common + ["--run-dir", os.path.join(workdir, "scratch"),
                           "criterion.w_kl=0.0", "criterion.w_feat=0.0"])
    # best-val over epochs — the MaxSaver protocol both the reference and
    # evaluate.py use (core/nusc_trainers.py MaxSaver), and far less noisy
    # than the final epoch on the tiny fixture
    distilled, scratch = max(_mious(out_d)), max(_mious(out_s))
    result = {
        "metric": "distill_gap_miou",
        "teacher_miou": round(teacher_miou, 4),
        "distilled_miou": round(distilled, 4),
        "scratch_miou": round(scratch, 4),
        "gap": round(distilled - scratch, 4),
        "config": {"label_drop_p": drop,
                   "label_drop_classes": list(drop_classes or ()),
                   "teacher_epochs": ("prebuilt" if prebuilt_teacher
                                      else teacher_epochs),
                   "student_epochs": student_epochs, "fixture": "nusc_mini"},
    }
    if drop_classes:
        # the structural readout: a scratch student receives no gradient
        # toward a held-out class (CE ignores, Lovász skips absent classes),
        # so its held-class IoU pins to ~0; any held-class IoU the distilled
        # arm earns is attributable to the teacher's dense predictions alone
        hd, hs = _held_iou(out_d, drop_classes), _held_iou(out_s, drop_classes)
        result["held_iou_distilled"] = round(hd, 4)
        result["held_iou_scratch"] = round(hs, 4)
        result["held_gap"] = round(hd - hs, 4)
    return result


if __name__ == "__main__":
    result = run_ablation(
        root=_arg("root", None, str), workdir=_arg("workdir", None, str),
        drop=_arg("drop", 0.9, float),
        teacher_epochs=_arg("teacher-epochs", 3, int),
        student_epochs=_arg("student-epochs", 2, int),
        teacher_ckpt=_arg("teacher-ckpt", None, str),
        teacher_miou=_arg("teacher-miou", None, float),
        drop_classes=_arg("drop-classes", None,
                          lambda s: [int(c) for c in s.split(",") if c]),
    )
    print(json.dumps(result))
