"""Golden-oracle parity vs the reference's own PolarMix / LaserMix code.

Execs ``/root/reference/core/datasets/utils.py`` (pure numpy; only the
``visualize_utils`` import needs a stub) and compares our mixers against
the reference classes (utils.py:460-648) with the random draws pinned:
PolarMix's omegas come from the reference object itself and the sector-swap
coin is scripted; LaserMix is constructed with a single-element
``num_areas`` so its one ``np.random.choice`` is deterministic.
"""

import os
import sys
import types

import numpy as np
import pytest

from u2mkd_tpu.data import mix as ours

_REF = "/root/reference"


def _load_ref_utils():
    path = os.path.join(_REF, "core", "datasets", "utils.py")
    if not os.path.exists(path):
        pytest.skip("reference snapshot unavailable")
    with open(path) as f:
        src = f.read()
    stub = types.ModuleType("visualize_utils")
    stub.visualize_pcd = lambda *a, **k: None
    saved = sys.modules.get("visualize_utils")
    sys.modules["visualize_utils"] = stub
    try:
        ns = {"__name__": "ref_dataset_utils"}
        exec(compile(src, path, "exec"), ns)  # reference numpy code as oracle
    finally:
        if saved is None:
            sys.modules.pop("visualize_utils", None)
        else:
            sys.modules["visualize_utils"] = saved
    return ns


class _ScriptedRng:
    """Feeds a fixed queue of draws to our mixers' rng calls."""

    def __init__(self, vals):
        self.vals = list(vals)

    def random(self):
        return self.vals.pop(0)

    def rand(self):
        return self.vals.pop(0)

    def choice(self, seq):
        return seq[0]


def _scan(rng, n, nf=4, c=10):
    pts = rng.randn(n, nf).astype(np.float32) * 8
    labels = rng.randint(0, c, size=n)
    return pts, labels


def _row_sorted(pts, labels):
    order = np.lexsort((labels,) + tuple(pts[:, i] for i in range(pts.shape[1])))
    return pts[order], labels[order]


def test_polarmix_matches_exec_reference(rng):
    ns = _load_ref_utils()
    inst_classes = [2, 5, 7]
    pts1, labels1 = _scan(rng, 600)
    pts2, labels2 = _scan(rng, 500)

    np.random.seed(7)
    ref = ns["PolarMix"](inst_classes)  # draws its omegas here
    alpha, beta = 0.4, 0.4 + np.pi
    np.random.seed(11)
    swap_coin = np.random.random()  # replicate the module-global draw order
    np.random.seed(11)
    ref_pts, ref_labels = ref.polar_mix(pts1.copy(), labels1.copy(),
                                        pts2.copy(), labels2.copy(),
                                        alpha, beta)

    mixer = ours.PolarMix(inst_classes, rng=_ScriptedRng([swap_coin]))
    got_pts, got_labels = mixer(pts1, labels1, pts2, labels2,
                                alpha=alpha, beta=beta, omegas=ref.omega)
    # the reference groups pasted instance points by class; ours keeps scan
    # order — same multiset of rows
    assert got_pts.shape == ref_pts.shape
    rp, rl = _row_sorted(ref_pts, ref_labels)
    gp, gl = _row_sorted(got_pts, got_labels)
    np.testing.assert_allclose(gp, rp, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(gl, rl)


def test_lasermix_matches_exec_reference(rng):
    ns = _load_ref_utils()
    pts1, labels1 = _scan(rng, 700)
    pts2, labels2 = _scan(rng, 650)
    for num_areas in (3, 4, 6):
        ref = ns["LaserMix"](num_areas=[num_areas],
                             pitch_angles=[-25.0, 3.0], prob=1.0)
        ref_pts, ref_labels, ref_mask = ref.laser_mix_transform(
            pts1, labels1, pts2, labels2)
        mixer = ours.LaserMix([num_areas], (-25.0, 3.0), prob=1.0,
                              rng=_ScriptedRng([0.0]))
        got_pts, got_labels, got_mask = mixer(pts1, labels1, pts2, labels2)
        np.testing.assert_array_equal(got_pts, ref_pts)
        np.testing.assert_array_equal(got_labels, ref_labels)
        np.testing.assert_array_equal(got_mask, ref_mask)
