"""Golden-oracle parity: fusion blocks and camera projection vs the
reference's own pure-torch/numpy code (VERDICT r1 #6).

The reference modules in ``core/models/fusion_blocks.py`` and the
``PCDTransformTool`` in ``core/datasets/utils.py`` are pure torch/numpy —
they run on CPU and serve as golden oracles with shared weights. They are
exec'd from the reference snapshot with the torchsparse imports stubbed
(those classes never touch them)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from u2mkd_tpu.models import fusion  # noqa: E402

_REF = "/root/reference"


def _load_ref_module(rel, stubs):
    path = os.path.join(_REF, rel)
    if not os.path.exists(path):
        pytest.skip("reference snapshot absent")
    src = open(path).read()
    for line, repl in stubs.items():
        src = src.replace(line, repl)
    ns = {}
    exec(compile(src, rel, "exec"), ns)  # reference torch/numpy code as oracle
    return ns


@pytest.fixture(scope="module")
def ref_fusion():
    return _load_ref_module(
        "core/models/fusion_blocks.py",
        {
            "from torchsparse import SparseTensor": "SparseTensor = None",
            "import torchsparse.nn as spnn": "spnn = None",
            "from third_party.csrc.wrapper import k_nearest_neighbor":
                "k_nearest_neighbor = None",
        },
    )


@pytest.fixture(scope="module")
def ref_utils():
    return _load_ref_module(
        "core/datasets/utils.py",
        {
            "from torchsparse import SparseTensor": "SparseTensor = None",
            "import torchsparse": "torchsparse = None",
            "from pyquaternion import Quaternion": "Quaternion = None",
            "import mlcrate as mlc": "mlc = None",
            "from visualize_utils import visualize_pcd":
                "visualize_pcd = None",
        },
    )


def test_feature_gather_matches_grid_sample(rng):
    h, w, c, p = 13, 21, 8, 300
    fmap = rng.randn(h, w, c).astype(np.float32)
    coords = (rng.rand(p, 2) * 2.6 - 1.3).astype(np.float32)  # incl. OOB
    got = np.asarray(fusion.feature_gather(jnp.asarray(fmap),
                                           jnp.asarray(coords)))
    t = torch.nn.functional.grid_sample(
        torch.from_numpy(fmap).permute(2, 0, 1)[None],
        torch.from_numpy(coords)[None, None],
        padding_mode="zeros", align_corners=True, mode="bilinear",
    )  # [1, C, 1, P]
    exp = t[0, :, 0].T.numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_point_to_grid_matches_reference(rng, ref_fusion):
    """fusion.point_to_grid vs the reference Point2Grid scatter-mean
    (fusion_blocks.py:217-238) for one batch of one camera."""
    h, w, c, p = 9, 15, 6, 400
    feats = rng.randn(p, c).astype(np.float32)
    coords = (rng.rand(p, 2) * 2.4 - 1.2).astype(np.float32)
    # the reference's masks always restrict to in-FOV points (|coord| < 1):
    # Point2Grid builds a sparse_coo_tensor straight from the uv indices and
    # segfaults on out-of-range ones
    mask = (rng.rand(p) > 0.3) & np.all(np.abs(coords) < 1.0, axis=1)
    got = np.asarray(fusion.point_to_grid(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask), (h, w)))

    class _F:  # Point2Grid reads rows by slicing and width via .F
        def __init__(self, t):
            self.F = t

        def __getitem__(self, sl):
            return self.F[sl]

    tf = torch.from_numpy(feats)
    ref = ref_fusion["Point2Grid"](
        _F(tf), [torch.from_numpy(coords)[None]],
        [torch.from_numpy(mask)[None]], (h, w),
    )  # [1, C, H, W]
    exp = ref[0].permute(1, 2, 0).numpy()
    # reference indexes only in-FOV points; pixels hit by masked-out points
    # are zero in both
    np.testing.assert_allclose(got, exp, atol=1e-5)


def _copy_linear(flax_params, name, tmod):
    flax_params[name]["kernel"] = jnp.asarray(
        tmod.weight.detach().numpy().T)
    if tmod.bias is not None:
        flax_params[name]["bias"] = jnp.asarray(tmod.bias.detach().numpy())


def _copy_conv1d(flax_params, name, tmod):
    flax_params[name]["kernel"] = jnp.asarray(
        tmod.weight.detach().numpy()[:, :, 0].T)
    if tmod.bias is not None:
        flax_params[name]["bias"] = jnp.asarray(tmod.bias.detach().numpy())


def _copy_conv2d(flax_params, name, tmod):
    # torch [out, in, 1, 1] -> flax [1, 1, in, out]
    flax_params[name]["kernel"] = jnp.asarray(
        tmod.weight.detach().numpy().transpose(2, 3, 1, 0))
    if tmod.bias is not None:
        flax_params[name]["bias"] = jnp.asarray(tmod.bias.detach().numpy())


def _copy_bn(flax_params, flax_stats, name, tmod):
    flax_params[name]["scale"] = jnp.asarray(tmod.weight.detach().numpy())
    flax_params[name]["bias"] = jnp.asarray(tmod.bias.detach().numpy())
    flax_stats[name]["mean"] = jnp.asarray(tmod.running_mean.numpy())
    flax_stats[name]["var"] = jnp.asarray(tmod.running_var.numpy())


def _randomize_bn(tmod, rng):
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(
            rng.rand(*tmod.weight.shape).astype(np.float32) + 0.5))
        tmod.bias.copy_(torch.from_numpy(
            rng.randn(*tmod.bias.shape).astype(np.float32) * 0.1))
        tmod.running_mean.copy_(torch.from_numpy(
            rng.randn(*tmod.running_mean.shape).astype(np.float32) * 0.2))
        tmod.running_var.copy_(torch.from_numpy(
            rng.rand(*tmod.running_var.shape).astype(np.float32) + 0.5))


def test_atten_fusion_conv_matches_reference(rng, ref_fusion):
    """AttenFusionConv vs Atten_Fusion_Conv (fusion_blocks.py:9-93), shared
    weights, eval mode."""
    ic, pc, out_ch, p = 16, 24, 24, 200
    tmod = ref_fusion["Atten_Fusion_Conv"](ic, pc, out_ch).eval()
    for bn in (tmod.ai_layer.fc1[0], tmod.ai_layer.conv1[1], tmod.bn1):
        _randomize_bn(bn, rng)
    img = rng.randn(p, ic).astype(np.float32)
    pts = rng.randn(p, pc).astype(np.float32)
    with torch.no_grad():
        exp = tmod(torch.from_numpy(pts), torch.from_numpy(img)).numpy()

    jmod = fusion.AttenFusionConv(out_ch=out_ch)
    mask = jnp.ones((1, p), bool)
    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(pts)[None],
                          jnp.asarray(img)[None], mask, False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    _copy_bn(params, stats, "ia_fc1_bn", tmod.ai_layer.fc1[0])
    _copy_linear(params, "ia_fc1", tmod.ai_layer.fc1[2])
    _copy_linear(params, "ia_fc2", tmod.ai_layer.fc2)
    _copy_linear(params, "ia_fc3", tmod.ai_layer.fc3)
    _copy_conv1d(params, "ia_conv1", tmod.ai_layer.conv1[0])
    _copy_bn(params, stats, "ia_conv1_bn", tmod.ai_layer.conv1[1])
    _copy_conv1d(params, "fuse_conv", tmod.conv1)
    _copy_bn(params, stats, "fuse_bn", tmod.bn1)
    got = np.asarray(jmod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts)[None], jnp.asarray(img)[None], mask, False))[0]
    np.testing.assert_allclose(got, exp, atol=2e-5)


def test_l2c_fusion_matches_reference(rng, ref_fusion):
    """L2CFusion vs the reference L2CFusion/L2CAILayer
    (fusion_blocks.py:96-153), shared weights, eval mode."""
    ic, pc, out_ch, h, w = 12, 20, 16, 7, 11
    tmod = ref_fusion["L2CFusion"](ic, pc, out_ch).eval()
    for bn in (tmod.l2c_ai_layer.conv1[1], tmod.bn1):
        _randomize_bn(bn, rng)
    img = rng.randn(1, ic, h, w).astype(np.float32)
    pts = rng.randn(1, pc, h, w).astype(np.float32)
    with torch.no_grad():
        exp_relu, exp_pre = tmod(torch.from_numpy(pts), torch.from_numpy(img))
    jmod = fusion.L2CFusion(out_ch=out_ch)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    pts_j = jnp.asarray(pts.transpose(0, 2, 3, 1))
    variables = jmod.init(jax.random.PRNGKey(0), pts_j, img_j, False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    _copy_conv2d(params, "ai_fc1", tmod.l2c_ai_layer.fc1)
    _copy_conv2d(params, "ai_fc2", tmod.l2c_ai_layer.fc2)
    _copy_conv2d(params, "ai_fc3", tmod.l2c_ai_layer.fc3)
    _copy_conv2d(params, "ai_conv1", tmod.l2c_ai_layer.conv1[0])
    _copy_bn(params, stats, "ai_conv1_bn", tmod.l2c_ai_layer.conv1[1])
    _copy_conv2d(params, "fuse_conv", tmod.conv1)
    _copy_bn(params, stats, "fuse_bn", tmod.bn1)
    got_relu, got_pre = jmod.apply(
        {"params": params, "batch_stats": stats}, pts_j, img_j, False)
    np.testing.assert_allclose(
        np.asarray(got_relu)[0], exp_relu[0].permute(1, 2, 0).numpy(),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_pre)[0], exp_pre[0].permute(1, 2, 0).numpy(),
        atol=2e-5)


def _rand_quat(rng):
    q = rng.randn(4)
    return q / np.linalg.norm(q)


def test_camera_projection_matches_reference_chain(rng, ref_utils):
    """The repo composes LiDAR->camera as one 4x4 (lc_semantic_nusc.py
    _cam_from_lidar) + project_to_image; the reference applies the 5-step
    rotate/translate chain through PCDTransformTool
    (lc_semantic_nusc_tsd_full.py:344-392). Same random calibration must
    give identical normalized pixel coords and FOV masks."""
    from u2mkd_tpu.data import geometry

    pts = (rng.randn(500, 3) * 20).astype(np.float64)
    q_cs_l, q_pose_l, q_pose_c, q_cs_c = (
        _rand_quat(rng) for _ in range(4))
    t_cs_l, t_pose_l, t_pose_c, t_cs_c = (
        rng.randn(3) * 5 for _ in range(4))
    intr = np.array([[560.0, 0, 800.0], [0, 560.0, 450.0], [0, 0, 1.0]])
    w_img, h_img = 1600, 900

    # reference chain
    tool = ref_utils["PCDTransformTool"](pts.copy())
    tool.rotate(geometry.quat_to_rot(q_cs_l))
    tool.translate(t_cs_l)
    tool.rotate(geometry.quat_to_rot(q_pose_l))
    tool.translate(t_pose_l)
    tool.translate(-t_pose_c)
    tool.rotate(geometry.quat_to_rot(q_pose_c).T)
    tool.translate(-t_cs_c)
    tool.rotate(geometry.quat_to_rot(q_cs_c).T)
    ref_mask = tool.pcd[2, :] > 1
    tool.pcd2image(intr)
    ref_uv = tool.pcd[:2, :].copy()
    ref_uv[0] = ref_uv[0] / (w_img - 1.0) * 2.0 - 1.0
    ref_uv[1] = ref_uv[1] / (h_img - 1.0) * 2.0 - 1.0
    ref_mask &= (ref_uv[0] > -1) & (ref_uv[0] < 1)
    ref_mask &= (ref_uv[1] > -1) & (ref_uv[1] < 1)

    # repo composition (mirrors LCSemanticNuscTSD._cam_from_lidar)
    from functools import reduce

    tm = reduce(np.dot, [
        geometry.transform_matrix(t_cs_c, q_cs_c, inverse=True),
        geometry.transform_matrix(t_pose_c, q_pose_c, inverse=True),
        geometry.transform_matrix(t_pose_l, q_pose_l),
        geometry.transform_matrix(t_cs_l, q_cs_l),
    ])
    xyz_cam = geometry.apply_transform(tm, pts)
    uv, depth = geometry.project_to_image(xyz_cam, intr)
    uv = uv / np.array([w_img - 1.0, h_img - 1.0]) * 2.0 - 1.0
    got_mask = (depth > 1.0) & np.all((uv > -1) & (uv < 1), axis=1)

    np.testing.assert_array_equal(got_mask, ref_mask)
    np.testing.assert_allclose(uv[got_mask], ref_uv.T[got_mask], atol=1e-9)
