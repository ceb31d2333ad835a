"""PolarMix/LaserMix, instance-aug, config system, and determinism tests."""

import os
import pickle

import numpy as np
import pytest

from u2mkd_tpu.data.instaug import InstAugmentation, ground_patches
from u2mkd_tpu.data.mix import LaserMix, PolarMix
from u2mkd_tpu.utils import config as config_lib


def make_scan(rng, n=2000):
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = rng.randn(n, 3) * 15
    pts[:, 2] = rng.randn(n) * 3 - 1  # span pitch angles below and above 0
    pts[:, 3] = rng.rand(n)
    labels = rng.randint(0, 5, n).astype(np.int32)
    return pts, labels


def test_polarmix(rng):
    p1, l1 = make_scan(rng)
    p2, l2 = make_scan(rng)
    pm = PolarMix(instance_classes=[2, 3], rng=np.random.RandomState(0))
    out_p, out_l = pm(p1, l1, p2, l2)
    assert out_p.shape[1] == 4
    assert len(out_p) == len(out_l)
    # rotate-paste adds instance points: output has at least the instance
    # points from scan 2 plus 2 rotated copies
    n_inst2 = np.isin(l2, [2, 3]).sum()
    assert len(out_p) >= len(p1) - n_inst2 + 3 * n_inst2 - len(p2)


def test_lasermix(rng):
    p1, l1 = make_scan(rng)
    p2, l2 = make_scan(rng)
    lm = LaserMix(num_areas=[3, 4], pitch_angles=(-30, 10),
                  rng=np.random.RandomState(1))
    out_p, out_l, src1 = lm(p1, l1, p2, l2)
    assert len(out_p) == len(out_l) == len(src1)
    assert src1.any() and (~src1).any()  # both scans contribute


def test_lasermix_prob_zero(rng):
    p1, l1 = make_scan(rng)
    p2, l2 = make_scan(rng)
    lm = LaserMix(num_areas=[3], pitch_angles=(-30, 10), prob=0.0)
    out_p, out_l, src = lm(p1, l1, p2, l2)
    np.testing.assert_array_equal(out_p, p1)


def test_ground_patches(rng):
    xyz = np.zeros((5000, 3), np.float32)
    xyz[:, :2] = rng.rand(5000, 2) * 20 - 10
    labels = np.full(5000, 1, np.int32)
    patches = ground_patches(xyz, labels, [1], grid_size=(5.0, 5.0), min_pts=20)
    assert 1 in patches
    assert len(patches[1]) > 0
    # patch centers lie inside the data extent
    assert np.abs(patches[1][:, :2]).max() < 12


def test_inst_augmentation(tmp_path, rng):
    # build a tiny database: 2 classes, a few instances
    db_dir = str(tmp_path)
    db = {"car": [], "pedestrian": []}
    for ci, name in enumerate(db.keys()):
        os.makedirs(os.path.join(db_dir, name), exist_ok=True)
        for i in range(3):
            inst = np.zeros((50, 4), np.float32)
            inst[:, :3] = rng.randn(50, 3) * 0.5 + [5 + i, 0, 0]
            inst[:, 2] = np.abs(inst[:, 2])
            inst[:, 3] = rng.rand(50)
            p = os.path.join(db_dir, name, f"i{i}.bin")
            inst.tofile(p)
            db[name].append(os.path.join(name, f"i{i}.bin"))
    pkl = os.path.join(db_dir, "db.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(db, f)

    # scene: dense ground plane class 3
    xyz = np.zeros((8000, 3), np.float32)
    xyz[:, :2] = rng.rand(8000, 2) * 40 - 20
    labels = np.full(8000, 3, np.int32)
    feats = rng.rand(8000, 1).astype(np.float32)

    aug = InstAugmentation(
        instance_pkl_path=pkl, thing_list=[1, 2], ground_list=[3],
        pair_list=[[3], [3]], add_num=4, num_classes=5,
        class_name=["car", "pedestrian"], feat_dim_s=4,
        rng=np.random.RandomState(2),
    )
    out_xyz, out_labels, out_feats = aug.inst_aug(xyz, labels, feats)
    added = len(out_xyz) - len(xyz)
    assert added > 0 and added % 50 == 0
    assert set(np.unique(out_labels[len(xyz):])) <= {1, 2}
    assert len(out_feats) == len(out_xyz)


def test_config_recursive_and_overrides(tmp_path):
    os.makedirs(os.path.join(tmp_path, "a", "b"), exist_ok=True)
    with open(os.path.join(tmp_path, "default.yaml"), "w") as f:
        f.write("x: 1\nnested:\n  p: 1\n  q: 2\n")
    with open(os.path.join(tmp_path, "a", "default.yaml"), "w") as f:
        f.write("nested:\n  q: 3\n")
    with open(os.path.join(tmp_path, "a", "b", "leaf.yaml"), "w") as f:
        f.write("y: 10\nnested:\n  r: 4\n")
    cfg = config_lib.load(os.path.join(tmp_path, "a", "b", "leaf.yaml"))
    assert cfg.x == 1 and cfg.y == 10
    assert cfg.nested.p == 1 and cfg.nested.q == 3 and cfg.nested.r == 4
    config_lib.update_dotted(cfg, ["nested.q=99", "new.key=[1,2]"])
    assert cfg.nested.q == 99
    assert cfg.new.key == [1, 2]
    assert cfg.get_path("nested.missing", "dflt") == "dflt"


@pytest.mark.slow
def test_train_step_determinism(rng):
    """Same seed => identical loss (SURVEY §5.2: the reference only gestures
    at determinism; we assert it)."""
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.models.spvcnn import SPVCNN
    from u2mkd_tpu.train import optim, state as train_state

    caps = (128, 64, 32, 16, 8)
    raw = synthetic.make_batch(np.random.RandomState(3), 1, 120, voxel_size=0.5)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model = SPVCNN(num_classes=5, cr=0.25)
    tx = optim.make_optimizer("sgd", 0.01)
    losses = []
    for _ in range(2):
        st = train_state.create_train_state(model, tx, batch, caps,
                                            jax.random.PRNGKey(7))
        step = jax.jit(train_state.make_train_step(model, tx, caps))
        st, out = step(st, batch, jax.random.PRNGKey(11))
        losses.append(float(out["loss"]))
    assert losses[0] == losses[1]


# --- reference-config key parity (VERDICT r1 #7) -------------------------

_REF = "/root/reference/configs"
_REPO_CFG = os.path.join(os.path.dirname(__file__), "..", "configs")

# reference dotted key -> repo dotted key. Identity unless listed here;
# None = intentionally dropped, with the reason recorded in the comment.
_KEYMAP = {
    "workers_per_gpu": "workers",
    "amp_enabled": "precision",      # bf16 compute policy replaces torch AMP
    "model.align_loss": None,        # align loss fixed to MSE (train/criterions.py)
    "debug.show_image": None,        # open3d viewer -> headless utils/visualize.py
}


def _flat_keys(d, prefix=""):
    out = []
    for k, v in d.items():
        kk = f"{prefix}{k}"
        if isinstance(v, dict):
            out.extend(_flat_keys(v, kk + "."))
        else:
            out.append(kk)
    return out


def _has_path(cfg, dotted):
    sentinel = object()
    return cfg.get_path(dotted, sentinel) is not sentinel


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference snapshot absent")
@pytest.mark.parametrize(
    "ref_yaml,repo_yaml",
    [
        ("nuscenes/train/spformer.yaml", "nuscenes/train/spformer.yaml"),
        ("nuscenes/train/spformer_tsd_full_ours_star.yaml",
         "nuscenes/train/spformer_tsd_full_ours_star.yaml"),
        ("nuscenes/train/spformer_tsd_full_ours_star_B.yaml",
         "nuscenes/train/spformer_tsd_full_ours_star_B.yaml"),
    ],
)
def test_reference_config_key_parity(ref_yaml, repo_yaml):
    """Every key the reference recipe defines (including its recursive
    defaults) must resolve in the repo's matching recursive config, modulo
    the explicit _KEYMAP renames/drops."""
    import yaml

    ref_keys = set()
    # torchpack-style recursion: default.yaml files up the directory tree
    parts = ref_yaml.split("/")
    chain = [os.path.join(_REF, *parts[:i], "default.yaml")
             for i in range(len(parts))] + [os.path.join(_REF, ref_yaml)]
    for path in chain:
        if os.path.exists(path):
            with open(path) as f:
                ref_keys.update(_flat_keys(yaml.safe_load(f) or {}))

    cfg = config_lib.load(os.path.join(_REPO_CFG, repo_yaml))
    missing = []
    for key in sorted(ref_keys):
        mapped = _KEYMAP.get(key, key)
        if mapped is None:
            continue
        if not _has_path(cfg, mapped):
            missing.append(f"{key} -> {mapped}")
    assert not missing, f"unmapped reference config keys: {missing}"


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference snapshot absent")
def test_b_variant_builds():
    """The paper's B student (w_kl=w_feat=2, cr 2.0, batch 3 — reference
    spformer_tsd_full_ours_star_B.yaml) must build through the factories."""
    from u2mkd_tpu.train import builder

    cfg = config_lib.load(
        os.path.join(_REPO_CFG, "nuscenes/train/spformer_tsd_full_ours_star_B.yaml")
    )
    assert cfg.criterion.w_kl == 2.0 and cfg.criterion.w_feat == 2.0
    assert cfg.model.cr == 2.0 and cfg.batch_size == 3
    model = builder.make_model(cfg)
    assert type(model).__name__ == "TSDFull"
    assert model.cr == 2.0 and model.cr_t == 2.0
    tx = builder.make_optimizer_and_schedule(cfg, world_size=1)
    assert tx is not None


@pytest.mark.slow
def test_overflow_observability(rng):
    """An undersized run must visibly report clipping (VERDICT r1 #4):
    saturated voxel grids and over-band window occupancies show up as
    counters + a violations count, and the strict guard raises."""
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.models import plumbing as P
    from u2mkd_tpu.models.spvcnn import SPVCNN
    from u2mkd_tpu.train import overflow

    # dense cloud + tiny capacities -> level grids saturate
    raw = synthetic.make_batch(np.random.RandomState(0), 1, 512,
                               voxel_size=0.2)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    caps = (64, 32, 16, 8, 4)
    pl = P.build_plumbing(batch["pcoords"], batch["xyz"], batch["pmask"],
                          caps)
    model = SPVCNN(
        num_classes=5, cr=0.25, sphereformer=True,
        # giant windows -> occupancy far above band*tile with a tiny tile
        window_size=(100.0, 100.0, 100.0),
        quant_size=(100 / 24,) * 3,
        window_size_sphere=(360.0, 180.0, 120.0),
        quant_size_sphere=(15.0, 7.5, 5.0),
    )
    stats = jax.jit(
        lambda p: overflow.stats_for_model(model, p, tile=8, band_cubic=1,
                                           band_sphere=1)
    )(pl)
    host = jax.device_get(stats)
    assert host["overflow/violations"] > 0
    assert host["overflow/vox_fill_l0"] >= 1.0
    assert host["overflow/occ_cubic_l1"] > 8
    with pytest.raises(RuntimeError, match="capacity overflow"):
        overflow.check_aux(host, strict=True)
    overflow.check_aux(host, strict=False)  # observe-only mode passes

    # generously sized run: no violations
    caps2 = (1024, 768, 640, 576, 544)  # deep levels shrink
    # slowly for a volumetric cloud - /2-per-level caps genuinely saturate
    pl2 = P.build_plumbing(batch["pcoords"], batch["xyz"], batch["pmask"],
                           caps2)
    model2 = SPVCNN(num_classes=5, cr=0.25, sphereformer=True,
                    window_size=(0.6, 0.6, 0.6), quant_size=(0.6 / 24,) * 3,
                    window_size_sphere=(2.0, 2.0, 120.0),
                    quant_size_sphere=(2 / 24, 2 / 24, 5.0))
    host2 = jax.device_get(jax.jit(
        lambda p: overflow.stats_for_model(model2, p))(pl2))
    assert host2["overflow/violations"] == 0
