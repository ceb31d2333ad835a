"""SemanticKITTI dataset on a synthetic sequence fixture."""

import os

import numpy as np
import yaml

from u2mkd_tpu.data.semantic_kitti import SemanticKITTI


def make_fake_kitti(tmp_path, n_frames=4, n_pts=400):
    root = str(tmp_path)
    # minimal learning map: raw ids 0..259 -> a few classes
    lm = {i: 0 for i in range(260)}
    lm.update({10: 1, 30: 6, 40: 9, 48: 11, 50: 13, 70: 15})
    with open(os.path.join(root, "semantic-kitti.yaml"), "w") as f:
        yaml.safe_dump({"learning_map": lm}, f)
    seq_dir = os.path.join(root, "sequences", "08")
    os.makedirs(os.path.join(seq_dir, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "labels"), exist_ok=True)
    rng = np.random.RandomState(0)
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        for name in ("P0", "P1", "P2", "P3"):
            f.write(name + ": " + " ".join(["7.0"] * 12) + "\n")
        tr = np.eye(4)[:3].reshape(-1)
        f.write("Tr: " + " ".join(str(x) for x in tr) + "\n")
    with open(os.path.join(seq_dir, "poses.txt"), "w") as f:
        for i in range(n_frames):
            pose = np.eye(4)[:3]
            pose[0, 3] = i * 2.0  # moving forward
            f.write(" ".join(str(x) for x in pose.reshape(-1)) + "\n")
    for i in range(n_frames):
        pts = np.zeros((n_pts, 4), np.float32)
        pts[:, :3] = rng.rand(n_pts, 3) * 40 - 20
        pts[:, 3] = rng.rand(n_pts)
        pts.tofile(os.path.join(seq_dir, "velodyne", f"{i:06d}.bin"))
        raw = rng.choice([10, 30, 40, 48, 50, 70, 0], n_pts).astype(np.int32)
        inst = (raw.astype(np.int32) | (rng.randint(0, 5, n_pts) << 16))
        inst.astype(np.int32).tofile(
            os.path.join(seq_dir, "labels", f"{i:06d}.label")
        )
    return root


def test_kitti_end_to_end(tmp_path):
    root = make_fake_kitti(tmp_path)
    ds = SemanticKITTI(root, voxel_size=0.2, capacity=2048, split="val",
                       num_sweeps=1)
    assert len(ds) == 4
    feed = ds[1]
    assert feed["feats"].shape == (2048, 4)
    m = feed["pmask"]
    assert 0 < m.sum() <= 2048
    # sweeps present with REAL labels (not forced to ignore) and marked
    kf = feed["keyframe_mask"][m]
    lab = feed["labels"][m]
    assert (~kf).sum() > 0
    assert lab[~kf].max() > 0  # kitti keeps sweep labels
    assert lab.max() <= 16


def test_kitti_pose_warp(tmp_path):
    """With identity Tr and translation-only poses, a sweep frame's points
    shift by the ego displacement when warped into the reference frame."""
    root = make_fake_kitti(tmp_path, n_frames=2)
    ds = SemanticKITTI(root, voxel_size=0.2, capacity=2048, split="val",
                       num_sweeps=1)
    sw_pts, sw_lab = ds._aggregate_sweeps(0, 1)
    # frame 0 at x=0, reference frame 1 at x=2 -> warped x = raw x - 2
    raw = np.fromfile(
        os.path.join(root, "sequences", "08", "velodyne", "000000.bin"),
        np.float32,
    ).reshape(-1, 4)
    np.testing.assert_allclose(sw_pts[0][:, 0], raw[:, 0] - 2.0, atol=1e-5)
    np.testing.assert_allclose(sw_pts[0][:, 1:3], raw[:, 1:3], atol=1e-5)


def test_kitti_tta_votes_differ(tmp_path):
    """tta=True applies fresh flip/rotate-scale per val pass (the
    NuScenes_Evaluator vote semantics, nusc_trainers.py:441-550), so
    evaluate.py --num-vote on a KITTI config sums genuinely different
    views; tta=False stays deterministic."""
    root = make_fake_kitti(tmp_path)
    plain = SemanticKITTI(root, voxel_size=0.2, capacity=2048, split="val")
    a, b = plain[1], plain[1]
    np.testing.assert_array_equal(a["xyz"], b["xyz"])

    tta = SemanticKITTI(root, voxel_size=0.2, capacity=2048, split="val",
                        tta=True)
    v1, v2 = tta[1], tta[1]
    m = v1["pmask"] & v2["pmask"]
    assert not np.allclose(v1["xyz"][m], v2["xyz"][m])
    # labels of shared raw points are unaffected by the geometry aug
    assert v1["labels"].shape == v2["labels"].shape
