"""Golden-oracle: whole-image-branch forward vs the reference's own code.

Execs the reference ``SwiftNetResNet`` (``core/models/image_branch/
swiftnet.py``, pure torch; only its build_blocks 2D helpers are inlined),
ports its randomly initialized full state_dict into our flax model via
``convert_weights.convert_swiftnet_full``, and asserts the encoder skip
features, the SPP output, and the full decoder forward agree numerically.
This pins down every image-branch subtlety at once: stride-1 stem + torch
maxpool padding, pre-activation skips, adaptive-avg-pool SPP grids,
align-corners upsampling, and the BN eval-mode running-stat math.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from u2mkd_tpu.models import convert_weights, swiftnet  # noqa: E402

_REF = "/root/reference"

_INLINE_HELPERS = '''
import torch.nn as nn
import torch.nn.functional as F
def conv3x3(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                     padding=1, bias=False)
def conv1x1(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                     bias=False)
upsample = lambda x, size: F.interpolate(x, size, mode="bilinear",
                                         align_corners=True)
'''


def _load_ref_swiftnet():
    path = os.path.join(_REF, "core", "models", "image_branch", "swiftnet.py")
    if not os.path.exists(path):
        pytest.skip("reference snapshot absent")
    src = open(path).read()
    src = src.replace(
        "from core.models.build_blocks import conv1x1, conv3x3, upsample",
        _INLINE_HELPERS,
    )
    ns = {"__name__": "ref_swiftnet"}
    exec(compile(src, path, "exec"), ns)  # reference torch code as oracle
    return ns


@pytest.mark.slow
def test_swiftnet_forward_matches_exec_reference(rng):
    ns = _load_ref_swiftnet()
    torch.manual_seed(0)
    ref = ns["SwiftNetRes18"](num_feature=(128, 128, 128))
    ref.eval()
    # random running stats so eval-mode BN is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.2)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    p_up, s_up = convert_weights.convert_swiftnet_full(sd)

    model = swiftnet.SwiftNetResNet(layers=(2, 2, 2, 2),
                                    num_features=(128, 128, 128))
    img = rng.rand(2, 64, 96, 3).astype(np.float32)  # NHWC
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), False)
    variables = {
        "params": convert_weights._deep_merge(dict(variables["params"]), p_up),
        "batch_stats": convert_weights._deep_merge(
            dict(variables["batch_stats"]), s_up),
    }
    # every init leaf must have been overwritten by a converted one
    n_conv = len(jax.tree_util.tree_leaves(p_up))
    n_ours = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n_conv == n_ours, (n_conv, n_ours)

    timg = torch.tensor(np.transpose(img, (0, 3, 1, 2)))
    with torch.no_grad():
        feats_ref = ref.forward_down(timg)
        out_ref = ref.forward_up(feats_ref)

    feats = model.apply(variables, jnp.asarray(img), False,
                        method=model.forward_down)
    for i, (got, want) in enumerate(zip(feats, feats_ref)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"stage {i}")

    out = model.apply(variables, jnp.asarray(img), False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref.numpy(),
        rtol=1e-4, atol=1e-4)
