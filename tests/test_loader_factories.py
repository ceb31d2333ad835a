"""Loader-factory construction paths that only real configs exercise.

The `inst_aug` wiring and the nuScenes devkit reverse index broke without
any test noticing because the synthetic suite never constructs them — these
tests build the actual factory/reader paths with tiny fixtures.
"""

import json
import os
import pickle

import numpy as np

from u2mkd_tpu.utils.config import Config


def _cfg(d):
    def wrap(x):
        if isinstance(x, dict):
            return Config({k: wrap(v) for k, v in x.items()})
        return x

    return wrap(d)


def test_maybe_inst_augmenter_constructs(tmp_path):
    """loaders._maybe_inst_augmenter must construct InstAugmentation with
    the reference's keyword names (feat_dim_s) for BOTH dataset kinds —
    a renamed parameter here crashes every inst_aug-enabled config."""
    from u2mkd_tpu.data import loaders

    db = {name: [] for name in [
        "barrier", "bicycle", "bus", "car", "construction_vehicle",
        "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
        # KITTI class names
        "car_k", "bicycle_k", "motorcycle_k", "truck_k", "other-vehicle",
        "person", "bicyclist", "motorcyclist",
    ]}
    pkl = tmp_path / "inst.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(db, f)

    from u2mkd_tpu.data.semantic_kitti import KITTI_CLASS_NAME

    for name in KITTI_CLASS_NAME:
        db[name] = []
    with open(pkl, "wb") as f:
        pickle.dump(db, f)

    cfg = _cfg({
        "dataset": {"inst_aug": True, "inst_pkl_path": str(pkl),
                    "inst_add_num": 5},
        "data": {"num_classes": 17},
    })
    aug = loaders._maybe_inst_augmenter(cfg, "nusc")
    assert aug is not None and aug.feat_dim_src == 5

    cfg.data["num_classes"] = 20
    aug_k = loaders._maybe_inst_augmenter(cfg, "kitti")
    assert aug_k is not None and aug_k.feat_dim_src == 4


def test_nusc_reader_builds_reverse_index(tmp_path):
    """Real nuScenes sample.json has NO 'data' channel map — the reader
    must synthesize it from keyframe sample_data rows like the devkit's
    __make_reverse_index__."""
    from u2mkd_tpu.data.nusc_reader import NuScenesTables

    ver = "v1.0-trainval"
    d = tmp_path / ver
    os.makedirs(d)

    def dump(name, rows):
        with open(d / f"{name}.json", "w") as f:
            json.dump(rows, f)

    dump("scene", [{"token": "sc0", "name": "scene-0001"}])
    # raw sample rows: no "data" key, as on a real download
    dump("sample", [{"token": "s0", "scene_token": "sc0",
                     "timestamp": 0, "prev": "", "next": ""}])
    dump("sensor", [{"token": "se0", "channel": "LIDAR_TOP",
                     "modality": "lidar"},
                    {"token": "se1", "channel": "CAM_FRONT",
                     "modality": "camera"}])
    dump("calibrated_sensor", [
        {"token": "cs0", "sensor_token": "se0"},
        {"token": "cs1", "sensor_token": "se1"},
    ])
    dump("sample_data", [
        {"token": "sd0", "sample_token": "s0",
         "calibrated_sensor_token": "cs0", "is_key_frame": True,
         "filename": "x.bin", "ego_pose_token": "e0", "prev": "",
         "next": ""},
        {"token": "sd1", "sample_token": "s0",
         "calibrated_sensor_token": "cs1", "is_key_frame": True,
         "filename": "x.jpg", "ego_pose_token": "e0", "prev": "",
         "next": ""},
        # non-keyframe sweep must NOT enter the map
        {"token": "sd2", "sample_token": "s0",
         "calibrated_sensor_token": "cs0", "is_key_frame": False,
         "filename": "y.bin", "ego_pose_token": "e1", "prev": "",
         "next": ""},
    ])
    dump("ego_pose", [{"token": "e0"}, {"token": "e1"}])
    dump("lidarseg", [])

    t = NuScenesTables(str(tmp_path), ver)
    s = t.sample[0]
    assert s["data"]["LIDAR_TOP"] == "sd0"
    assert s["data"]["CAM_FRONT"] == "sd1"


def test_select_samples_test_split():
    """split='test' returns every sample (the reference evaluates the whole
    v1.0-test table; no official index file exists for it)."""
    from u2mkd_tpu.data import nusc_splits

    samples = [{"token": f"s{i}"} for i in range(7)]
    out = nusc_splits.select_samples(samples, "test", lambda s: "scene-x")
    assert out == samples


def test_waymo_hash_split_stable(tmp_path):
    """Frame membership must not change when keyframes.txt grows."""
    from u2mkd_tpu.data.waymo import WaymoSeg

    names = [f"frame_{i:04d}.npy" for i in range(40)]
    with open(tmp_path / "keyframes.txt", "w") as f:
        f.write("\n".join(names[:30]) + "\n")
    val_a = set(WaymoSeg(str(tmp_path), 0.1, 64, split="val").frames)
    with open(tmp_path / "keyframes.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    val_b = set(WaymoSeg(str(tmp_path), 0.1, 64, split="val").frames)
    assert val_a <= val_b  # old members stay put when the list grows
