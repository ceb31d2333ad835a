"""torch->flax ResNet weight conversion: functional parity on a stem+block."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from u2mkd_tpu.models.convert_weights import convert_resnet_to_swiftnet
from u2mkd_tpu.models.swiftnet import SwiftNetResNet


def make_fake_resnet18_sd(rng):
    """Random tensors with torchvision resnet18 key names/shapes (subset)."""
    sd = {}
    sd["conv1.weight"] = torch.tensor(rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05)
    for bn in ("bn1",):
        sd[f"{bn}.weight"] = torch.tensor(rng.rand(64).astype(np.float32) + 0.5)
        sd[f"{bn}.bias"] = torch.tensor(rng.randn(64).astype(np.float32) * 0.1)
        sd[f"{bn}.running_mean"] = torch.tensor(rng.randn(64).astype(np.float32) * 0.1)
        sd[f"{bn}.running_var"] = torch.tensor(rng.rand(64).astype(np.float32) + 0.5)
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for li in range(1, 5):
        cin, cout = chans[li]
        for bi in range(2):
            t = f"layer{li}.{bi}"
            c_in = cin if bi == 0 else cout
            sd[f"{t}.conv1.weight"] = torch.tensor(
                rng.randn(cout, c_in, 3, 3).astype(np.float32) * 0.05)
            sd[f"{t}.conv2.weight"] = torch.tensor(
                rng.randn(cout, cout, 3, 3).astype(np.float32) * 0.05)
            for bn_i in (1, 2):
                sd[f"{t}.bn{bn_i}.weight"] = torch.tensor(rng.rand(cout).astype(np.float32) + 0.5)
                sd[f"{t}.bn{bn_i}.bias"] = torch.tensor(rng.randn(cout).astype(np.float32) * 0.1)
                sd[f"{t}.bn{bn_i}.running_mean"] = torch.tensor(rng.randn(cout).astype(np.float32) * 0.1)
                sd[f"{t}.bn{bn_i}.running_var"] = torch.tensor(rng.rand(cout).astype(np.float32) + 0.5)
            if bi == 0 and li > 1:
                sd[f"{t}.downsample.0.weight"] = torch.tensor(
                    rng.randn(cout, cin, 1, 1).astype(np.float32) * 0.05)
                sd[f"{t}.downsample.1.weight"] = torch.tensor(rng.rand(cout).astype(np.float32) + 0.5)
                sd[f"{t}.downsample.1.bias"] = torch.tensor(rng.randn(cout).astype(np.float32) * 0.1)
                sd[f"{t}.downsample.1.running_mean"] = torch.tensor(rng.randn(cout).astype(np.float32) * 0.1)
                sd[f"{t}.downsample.1.running_var"] = torch.tensor(rng.rand(cout).astype(np.float32) + 0.5)
    return sd


def torch_stem_block(sd, x):
    """Reference functional torch forward: stride-1 7x7 stem + maxpool +
    layer1 (SwiftNet semantics)."""
    out = F.conv2d(x, sd["conv1.weight"], stride=1, padding=3)
    out = F.batch_norm(out, sd["bn1.running_mean"], sd["bn1.running_var"],
                       sd["bn1.weight"], sd["bn1.bias"], False, eps=1e-5)
    out = F.relu(out)
    out = F.max_pool2d(out, 3, 2, 1)
    for bi in range(2):
        t = f"layer1.{bi}"
        res = out
        y = F.conv2d(out, sd[f"{t}.conv1.weight"], stride=1, padding=1)
        y = F.batch_norm(y, sd[f"{t}.bn1.running_mean"], sd[f"{t}.bn1.running_var"],
                         sd[f"{t}.bn1.weight"], sd[f"{t}.bn1.bias"], False)
        y = F.relu(y)
        y = F.conv2d(y, sd[f"{t}.conv2.weight"], stride=1, padding=1)
        y = F.batch_norm(y, sd[f"{t}.bn2.running_mean"], sd[f"{t}.bn2.running_var"],
                         sd[f"{t}.bn2.weight"], sd[f"{t}.bn2.bias"], False)
        out = F.relu(y + res)
    return out


@pytest.mark.slow
def test_conversion_parity(rng):
    sd = make_fake_resnet18_sd(rng)
    model = SwiftNetResNet()
    x = rng.rand(1, 64, 96, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    p_up, s_up = convert_resnet_to_swiftnet({k: v.numpy() for k, v in sd.items()})
    # merge
    from u2mkd_tpu.models.convert_weights import _deep_merge

    params = _deep_merge(variables["params"], p_up)
    stats = _deep_merge(variables["batch_stats"], s_up)

    def fwd(image):
        def run(mdl):
            h = mdl.forward_stem(image, False)
            h, _ = mdl.forward_resblock(h, 0, False)
            return h
        return model.apply({"params": params, "batch_stats": stats}, method=run)

    ours = np.asarray(fwd(jnp.asarray(x)))
    theirs = torch_stem_block(sd, torch.tensor(x.transpose(0, 3, 1, 2)))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
