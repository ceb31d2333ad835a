"""End-to-end CLI smoke tests: drive the actual entry points in
subprocesses (reference workflow: train under ``torchpack dist-run``, then
evaluate the saved checkpoint — ``README.md:89-101``).

These catch wiring regressions the step-level tests can't (loader/CLI
argument plumbing, checkpoint layout, evaluate.py model dispatch). Marked
slow: each run pays a whole-model XLA compile.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=REPO):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=1800,
    )
    assert res.returncode == 0, f"{args} failed:\n{res.stdout[-4000:]}"
    return res.stdout


def final_miou(out: str) -> float:
    ms = re.findall(r"mIoU: ([0-9.]+)", out)
    assert ms, f"no mIoU line in:\n{out[-2000:]}"
    return float(ms[-1])


@pytest.mark.slow
def test_teacher_cli_then_evaluate(tmp_path):
    run_dir = str(tmp_path / "teacher")
    out = run_cli([
        "train_spformer.py", "configs/synthetic/train/spformer_tiny.yaml",
        "--run-dir", run_dir, "--cpu", "num_epochs=1",
        "data.training_size=8",
    ])
    assert "miou" in out
    ckpt = os.path.join(run_dir, "checkpoints", "latest")
    assert os.path.isdir(ckpt)

    ev = run_cli([
        "evaluate.py", "configs/synthetic/train/spformer_tiny.yaml",
        "--checkpoint", ckpt, "--cpu", "data.training_size=8",
    ])
    assert final_miou(ev) >= 0.0


@pytest.mark.slow
def test_student_cli_then_evaluate(tmp_path):
    run_dir = str(tmp_path / "student")
    out = run_cli([
        "train_lc_nusc_tsd_full.py", "configs/synthetic/train/tsd_tiny.yaml",
        "--run-dir", run_dir, "--cpu", "num_epochs=1",
        "data.training_size=8",
    ])
    # the loop prints the val miou at epoch end
    m_train = re.search(r"miou=([0-9.]+)", out)
    assert m_train is not None, out[-2000:]
    ckpt = os.path.join(run_dir, "checkpoints", "latest")
    assert os.path.isdir(ckpt)

    # evaluate.py dispatches TSD configs to the student evaluator
    # (reference NuScenes_Evaluator path) and must reproduce the training
    # loop's val number on the same (synthetic, deterministic) val stream
    ev = run_cli([
        "evaluate.py", "configs/synthetic/train/tsd_tiny.yaml",
        "--checkpoint", ckpt, "--cpu", "data.training_size=8",
    ])
    assert abs(final_miou(ev) - float(m_train.group(1))) < 1e-2
