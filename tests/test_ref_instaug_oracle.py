"""Golden-oracle parity vs the reference's own InstAugmentationV2 code.

Execs ``/root/reference/core/datasets/utils.py`` (numpy; ``visualize_utils``
stubbed) and compares our instance augmentation (``data/instaug.py``)
against the reference class (utils.py:226-457):

  * ``ground_analyze`` — 5x5 m grid patch centers with >=20 points;
  * ``calc_rot_matrix`` — azimuth-alignment rotation incl. the cross-sign
    convention;
  * full ``inst_aug`` end-to-end with the randomness forced deterministic
    (one thing class, one DB record, random flip/rotate/trans off), driven
    off a real tiny on-disk database in both implementations' shared
    format.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from u2mkd_tpu.data import instaug as ours

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


def _sorted_rows(a):
    return a[np.lexsort(tuple(a[:, i] for i in range(a.shape[1] - 1, -1, -1)))]


def test_ground_analyze_matches_exec_reference(rng):
    ns = _load_ref_utils()
    cls = ns["InstAugmentationV2"]
    ref = cls.__new__(cls)  # skip __init__ (needs a DB); set what we use
    ref.ground_list = [11, 13]
    ref.grid_size = np.array([5.0, 5.0], np.float32)

    n = 4000
    xyz = (rng.rand(n, 3).astype(np.float32) * 60 - 30)
    labels = rng.randint(0, 17, size=n)
    labels[rng.rand(n) < 0.4] = 11  # dense ground so cells pass min_pts
    want = ref.ground_analyze(xyz, labels)
    got = ours.ground_patches(xyz, labels, [11, 13],
                              grid_size=(5.0, 5.0), min_pts=20)
    assert set(want) == set(got)
    for g in want:
        np.testing.assert_allclose(_sorted_rows(got[g]),
                                   _sorted_rows(np.asarray(want[g])),
                                   rtol=1e-9, atol=1e-9)


def test_rot_matrix_matches_exec_reference(rng):
    ns = _load_ref_utils()
    cls = ns["InstAugmentationV2"]
    ref = cls.__new__(cls)
    for _ in range(20):
        obj = rng.randn(3) * 10
        gnd = rng.randn(3) * 10
        want = ref.calc_rot_matrix(obj, gnd)
        got = ours.rot_z_to_azimuth(obj, gnd)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def _make_db(tmp_path, thing_id, n_inst_pts, rng):
    """One-class instance DB in the shared prepare_inst_database format."""
    inst = np.zeros((n_inst_pts, 5), np.float32)
    inst[:, 0] = rng.rand(n_inst_pts) * 2 + 1.0
    inst[:, 1] = rng.rand(n_inst_pts) * 1.5
    inst[:, 2] = rng.rand(n_inst_pts) * 1.2
    inst[:, 3:] = rng.rand(n_inst_pts, 2)
    sub = tmp_path / "car"
    sub.mkdir()
    binpath = sub / "inst0.bin"
    inst.tofile(binpath)
    pkl = tmp_path / "db.pkl"
    with open(pkl, "w+b") as f:
        pickle.dump({"car": [{"path": os.path.join("car", "inst0.bin")}]}, f)
    return str(pkl), inst


def test_inst_aug_end_to_end_matches_exec_reference(rng, tmp_path):
    ns = _load_ref_utils()
    thing, ground = 4, 11
    pkl, inst = _make_db(tmp_path, thing, 60, rng)

    n = 6000
    xyz = (rng.rand(n, 3).astype(np.float32) * 50 - 25)
    xyz[:, 2] = rng.rand(n) * 0.3  # flat-ish ground plane
    labels = np.full(n, ground, dtype=np.int64)
    far = np.linalg.norm(xyz[:, :2], axis=1) > 20
    labels[far] = 1  # some non-ground, non-thing points

    common = dict(thing_list=[thing], ground_list=[ground],
                  pair_list=[[ground]], add_num=1, num_classes=17,
                  class_name=["car"], class_weight=[1.0] * 17,
                  random_flip=False, random_rotate=False, random_trans=False)
    ref = ns["InstAugmentationV2"](pkl, feat_dim=4, feat_dim_s=5, **common)
    np.random.seed(0)
    ref_xyz, ref_labels = ref.inst_aug(xyz.copy(), labels.copy())

    aug = ours.InstAugmentation(pkl, feat_dim_s=5,
                                rng=np.random.RandomState(0), **common)
    got_xyz, got_labels = aug.inst_aug(xyz.copy(), labels.copy())

    assert ref_xyz.shape[0] > n, "reference placed no instance; test is vacuous"
    assert got_xyz.shape == ref_xyz.shape
    np.testing.assert_allclose(got_xyz, ref_xyz, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(got_labels.astype(np.int64),
                                  ref_labels.astype(np.int64))
