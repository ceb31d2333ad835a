"""LC (LiDAR+camera) paired dataset on an extended synthetic fixture."""

import json
import os

import numpy as np
from PIL import Image

from u2mkd_tpu.data.lc_semantic_nusc import LCSemanticNuscTSD, collate_tsd
from u2mkd_tpu.data.semantic_nusc import CAM_CHANNELS

from test_nusc_dataset import make_fake_nusc


def add_cameras(root, n_samples=3, im_hw=(90, 160)):
    vdir = [d for d in os.listdir(root) if d.startswith("v1.0")][0]
    vdir = os.path.join(root, vdir)

    def load(name):
        with open(os.path.join(vdir, f"{name}.json")) as f:
            return json.load(f)

    def save(name, rows):
        with open(os.path.join(vdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)

    samples = load("sample")
    sds = load("sample_data")
    poses = load("ego_pose")
    css = load("calibrated_sensor")
    os.makedirs(os.path.join(root, "cams"), exist_ok=True)
    rng = np.random.RandomState(1)
    # full-resolution intrinsics for the nominal (900, 1600) image
    fx = fy = 800.0
    intr = [[fx, 0, 800.0], [0, fy, 450.0], [0, 0, 1]]
    for j, s in enumerate(samples):
        for ci, ch in enumerate(CAM_CHANNELS):
            yaw = 2 * np.pi * ci / len(CAM_CHANNELS)
            # camera facing yaw: rotation mapping cam axes (z forward) to car
            c, si = np.cos(yaw), np.sin(yaw)
            # build quaternion for rotz(yaw) @ cam-to-car base (z->x, x->-y, y->-z)
            # keep it simple: identity rotation (camera looks up +z); points
            # with z > 1 in lidar frame land in FOV — fine for plumbing tests
            tok = f"cam{j}_{ci}"
            img = (rng.rand(*im_hw, 3) * 255).astype(np.uint8)
            fn = f"cams/{tok}.jpg"
            Image.fromarray(img).resize((1600, 900)).save(os.path.join(root, fn))
            poses.append({"token": f"ep_{tok}", "translation": [0, 0, 0],
                          "rotation": [1, 0, 0, 0]})
            css.append({"token": f"cs_{tok}", "translation": [0, 0, 0],
                        "rotation": [1, 0, 0, 0], "camera_intrinsic": intr})
            sds.append({
                "token": f"sd_{tok}", "sample_token": s["token"],
                "ego_pose_token": f"ep_{tok}",
                "calibrated_sensor_token": f"cs_{tok}",
                "filename": fn, "timestamp": 0, "is_key_frame": True,
                "prev": "", "next": "",
            })
            s["data"][ch] = f"sd_{tok}"
    save("sample", samples)
    save("sample_data", sds)
    save("ego_pose", poses)
    save("calibrated_sensor", css)


def test_lc_dataset_end_to_end(tmp_path, rng):
    root = make_fake_nusc(tmp_path)
    add_cameras(root)
    for split in ("val", "train"):
        ds = LCSemanticNuscTSD(
            root, voxel_size=0.1, student_capacity=512, teacher_capacity=1024,
            version="v1.0-test", split=split, num_sweeps=1, im_drop=3,
            im_cr=0.1, allow_unofficial_split=True,
        )
        if len(ds):
            break
    assert len(ds) > 0
    item = ds[0]
    s, t = item["student"], item["teacher"]
    n_keep = 3 if ds.train else 6
    assert s["images"].shape == (n_keep, 90, 160, 3)
    assert s["pix_coords"].shape == (n_keep, 512, 2)
    assert s["cam_masks"].shape == (n_keep, 512)
    assert s["fov_mask"].shape == (512,)
    assert t["feats"].shape == (1024, 4)
    # teacher has sweep points, student does not
    assert (~t["keyframe_mask"][t["pmask"]]).sum() > 0
    assert s["keyframe_mask"][s["pmask"]].all()
    # t2s: valid rows point into the teacher table and labels agree where the
    # teacher kept the keyframe point first (dedup representative identity can
    # differ between the clouds, so just check range validity)
    t2s = item["t2s"]
    valid = t2s >= 0
    assert valid.sum() > 0
    assert t2s[valid].max() < 1024
    # FOV points: with identity extrinsics and z-forward intrinsics, points
    # with z > 1 project; fixture guarantees some
    assert s["fov_mask"].sum() >= 0

    batch = collate_tsd([ds[0], ds[min(1, len(ds) - 1)]])
    assert batch["student"]["images"].shape[0] == 2
    assert batch["t2s"].shape == (2, 512)


def test_lc_tta_votes_differ(tmp_path, rng):
    """TTA on the LC val dataset: fresh rotate-scale per pass on the student
    cloud (and fresh flip/rotate on the teacher cloud) with fixed raw labels,
    so `evaluate.py --num-vote` on a student config sums genuinely different
    views (reference NuScenes_Evaluator, nusc_trainers.py:441-550)."""
    root = make_fake_nusc(tmp_path)
    add_cameras(root)

    kw = dict(voxel_size=0.1, student_capacity=512, teacher_capacity=1024,
              version="v1.0-test", num_sweeps=0, im_drop=0, im_cr=0.1,
              allow_unofficial_split=True)
    donor = LCSemanticNuscTSD(root, split="train", **kw)
    assert len(donor) > 0

    def build(tta):
        ds = LCSemanticNuscTSD(root, split="val", tta=tta, **kw)
        ds.samples = donor.samples
        return ds

    plain = build(False)
    a, b = plain[0], plain[0]
    np.testing.assert_array_equal(a["student"]["xyz"], b["student"]["xyz"])

    ds = build(True)
    v1, v2 = ds[0], ds[0]
    i1 = v1["student"]["info"]
    i2 = v2["student"]["info"]
    # raw cloud + labels fixed; geometry freshly augmented per vote
    np.testing.assert_array_equal(i1["labels_full"], i2["labels_full"])
    assert not np.allclose(v1["student"]["xyz"][v1["student"]["pmask"]],
                           v2["student"]["xyz"][v2["student"]["pmask"]])
    # inverse maps still target the full raw cloud (devox-to-raw valid)
    assert len(i1["inverse_map"]) == len(i1["labels_full"])
    # camera projections are computed from the un-augmented cloud: identical
    # across votes (rotation never reorders points)
    np.testing.assert_array_equal(v1["student"]["images"],
                                  v2["student"]["images"])


def test_t2s_label_consistency(tmp_path, rng):
    """Student point labels must equal teacher labels at t2s rows whenever
    both representatives are the same raw point (teacher dedup may pick a
    different representative, but labels of co-voxel keyframe points mostly
    agree; we check the exact-identity subset)."""
    root = make_fake_nusc(tmp_path)
    add_cameras(root)
    for split in ("val", "train"):
        ds = LCSemanticNuscTSD(
            root, voxel_size=0.1, student_capacity=512, teacher_capacity=1024,
            version="v1.0-test", split=split, num_sweeps=0, im_drop=0,
            im_cr=0.1, allow_unofficial_split=True,
        )
        if len(ds):
            break
    item = ds[0]
    s, t = item["student"], item["teacher"]
    t2s = item["t2s"]
    valid = (t2s >= 0) & s["pmask"]
    # with num_sweeps=0 and the same base cloud, the teacher's voxel at the
    # t2s row contains the student's raw point, so labels agree on the
    # exact-representative subset; check a majority agreement overall
    sl = s["labels"][valid]
    tl = t["labels"][t2s[valid]]
    assert (sl == tl).mean() > 0.7


def test_label_drop_p_train_only(tmp_path, rng):
    """``label_drop_p`` (the distill-ablation label-scarcity knob,
    tools/distill_ablation.py) re-marks ~p of TRAIN keyframe labels as
    ignore_index 0 and never touches val."""
    root = make_fake_nusc(tmp_path)
    add_cameras(root)
    kw = dict(voxel_size=0.1, student_capacity=512, teacher_capacity=1024,
              version="v1.0-test", num_sweeps=0, im_drop=0, im_cr=0.1,
              allow_unofficial_split=True)
    donor = LCSemanticNuscTSD(root, split="train", **kw)
    assert len(donor) > 0

    def labeled_frac(split, p):
        ds = LCSemanticNuscTSD(root, split=split, label_drop_p=p, **kw)
        ds.samples = donor.samples
        ds.train = split == "train"
        lab = ds[0]["student"]["info"]["labels_full"]
        return (lab != 0).mean(), lab

    full, lab_full = labeled_frac("train", 0.0)
    starved, _ = labeled_frac("train", 0.9)
    assert full > 0.5  # fixture labels are dense
    assert starved < 0.35 * full  # ~90% dropped
    # val split: knob is inert even when set
    v0, lv0 = labeled_frac("val", 0.0)
    v9, lv9 = labeled_frac("val", 0.9)
    assert v0 == v9
    np.testing.assert_array_equal(lv0, lv9)


def test_label_drop_classes_train_only(tmp_path, rng):
    """``label_drop_classes`` (class-holdout distill-ablation knob) re-marks
    every TRAIN keyframe label in the held-out classes as ignore_index 0,
    leaves all other classes and the val split untouched."""
    root = make_fake_nusc(tmp_path)
    add_cameras(root)
    kw = dict(voxel_size=0.1, student_capacity=512, teacher_capacity=1024,
              version="v1.0-test", num_sweeps=0, im_drop=0, im_cr=0.1,
              allow_unofficial_split=True)
    donor = LCSemanticNuscTSD(root, split="train", **kw)
    assert len(donor) > 0

    def labels_for(split, held):
        ds = LCSemanticNuscTSD(root, split=split, label_drop_classes=held,
                               **kw)
        ds.samples = donor.samples
        ds.train = split == "train"
        return ds[0]["student"]["info"]["labels_full"]

    base = labels_for("train", ())
    present = sorted(set(np.unique(base)) - {0})
    assert len(present) >= 2, "fixture must contain >=2 labeled classes"
    held = present[: len(present) // 2]
    dropped = labels_for("train", held)
    assert not np.isin(dropped, held).any()
    keep = ~np.isin(base, held)
    np.testing.assert_array_equal(dropped[keep], base[keep])
    # val split: knob is inert even when set
    np.testing.assert_array_equal(labels_for("val", held),
                                  labels_for("val", ()))
