"""Distillation efficacy: the teacher teaches classes the labels cannot.

The reference's two-stage pipeline exists because the frozen multisweep
teacher is supposed to add supervision the labels alone don't provide
(``core/nusc_trainers.py:203-340``). The decisive, noise-immune probe is
**class holdout** (``dataset.label_drop_classes``): every train keyframe
label in the held-out classes is re-marked ignore, so the scratch arm
(``w_kl=w_feat=0``) receives *no gradient* toward those classes — its
held-class IoU is structurally pinned to ~0 — while the distilled arm can
learn them from the teacher's dense predictions alone. Both arms see a
byte-identical data/rng stream and differ ONLY in the two teacher-loss
weights.

Calibration on the on-disk devkit-schema fixture (RESULTS.md "Distillation
efficacy"): 12-epoch teacher reaches 82.4 mIoU; at 15 student epochs the
distilled arm scores **51.1 IoU on the held-out classes vs scratch 0.0**
(aggregate 69.5 vs 56.4). The random-drop regime (label_drop_p=0.99)
measures +5.4 best-val mIoU with the same protocol (tools/distill_ablation).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

HELD = (4, 7, 10)


@pytest.mark.slow
def test_distilled_learns_heldout_classes_scratch_cannot(tmp_path):
    from distill_ablation import run_ablation

    r = run_ablation(workdir=str(tmp_path), drop=0.0, drop_classes=HELD,
                     teacher_epochs=12, student_epochs=12)
    # the teacher must be worth distilling from (measured 0.8242)
    assert r["teacher_miou"] >= 0.70, r
    # structural: no label ever shows the scratch arm a held-out class
    assert r["held_iou_scratch"] <= 0.02, r
    # the teacher's dense predictions transfer the held classes (measured
    # 0.51 at 15 epochs, ~0.35+ at 12; asserted with a wide margin)
    assert r["held_iou_distilled"] >= 0.10, r
    assert r["held_gap"] >= 0.08, r
    # and the aggregate mIoU gap is positive too (measured +13.1)
    assert r["gap"] > 0.0, r
