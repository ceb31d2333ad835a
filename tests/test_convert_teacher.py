"""Torch->JAX import of reference SPVCNN_SPFORMER teacher checkpoints
(VERDICT r4 missing #1 / next #6).

The reference-schema state_dict is built HERE from the reference's own
architecture formulas (``spvcnn_spformer.py:36-117``, ``build_blocks.py:
21-84``, ``spherical_transformer.py:112-180,286-332``) — independent of the
converter's mapping tables — then imported strictly and spot-checked
functionally against torch modules where torch can execute (Linear / BN1d /
LayerNorm), and structurally for the sparse-conv offset permutation.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from u2mkd_tpu.models import convert_weights as cw

CR = 0.25
HEAD_DIM = 4
NCLS = 5
IN_CH = 4
G_CUB = 8   # window/quant per axis -> cubic tables [2G-1, 3, h1, d]
G_SPH = 8   # sphere tables [2G, 3, h2, d]
CS = [int(CR * x) for x in [32, 32, 64, 128, 256, 256, 128, 96, 96]]
WS = 1.8


def _t(*shape, seed):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def make_reference_state_dict(seed=0):
    """Keys exactly as ``SPVCNN_SPFORMER().state_dict()`` would emit them
    (torchsparse conv param name is ``kernel``; BN/Linear are stock
    torch)."""
    sd = {}
    s = [seed]

    def rnd(*shape):
        s[0] += 1
        return _t(*shape, seed=s[0])

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rnd(c).abs() + 0.5
        sd[f"{prefix}.bias"] = rnd(c)
        sd[f"{prefix}.running_mean"] = rnd(c)
        sd[f"{prefix}.running_var"] = rnd(c).abs() + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(7)

    # stem: Sequential(conv, BN, ReLU, conv, BN, ReLU)
    sd["stem.0.kernel"] = rnd(27, IN_CH, CS[0])
    bn("stem.1", CS[0])
    sd["stem.3.kernel"] = rnd(27, CS[0], CS[0])
    bn("stem.4", CS[0])

    def res_block(prefix, inc, outc):
        sd[f"{prefix}.net.0.kernel"] = rnd(27, inc, outc)
        bn(f"{prefix}.net.1", outc)
        sd[f"{prefix}.net.3.kernel"] = rnd(27, outc, outc)
        bn(f"{prefix}.net.4", outc)
        if inc != outc:
            sd[f"{prefix}.downsample.0.kernel"] = rnd(inc, outc)  # ks=1: 2D
            bn(f"{prefix}.downsample.1", outc)

    for i in range(4):
        sd[f"vox_downs.{i}.0.net.0.kernel"] = rnd(8, CS[i], CS[i])
        bn(f"vox_downs.{i}.0.net.1", CS[i])
        res_block(f"vox_downs.{i}.1", CS[i], CS[i + 1])
        res_block(f"vox_downs.{i}.2", CS[i + 1], CS[i + 1])

    for i in range(4):
        c = CS[i + 1]
        h = c // HEAD_DIM
        h1 = h // 2
        h2 = h - h1
        t = f"transformer_blocks.{i}"
        sd[f"{t}.norm1.weight"] = rnd(c).abs() + 0.5
        sd[f"{t}.norm1.bias"] = rnd(c)
        sd[f"{t}.norm2.weight"] = rnd(c).abs() + 0.5
        sd[f"{t}.norm2.bias"] = rnd(c)
        sd[f"{t}.attn.qkv.weight"] = rnd(3 * c, c)
        sd[f"{t}.attn.qkv.bias"] = rnd(3 * c)
        sd[f"{t}.attn.proj.weight"] = rnd(c, c)
        sd[f"{t}.attn.proj.bias"] = rnd(c)
        for name in ("query", "key", "value"):
            sd[f"{t}.attn.relative_pos_{name}_table"] = rnd(
                2 * G_CUB - 1, 3, h1, HEAD_DIM)
            sd[f"{t}.attn.relative_pos_{name}_table_sphere"] = rnd(
                2 * G_SPH, 3, h2, HEAD_DIM)
        sd[f"{t}.mlp.fc1.weight"] = rnd(4 * c, c)
        sd[f"{t}.mlp.fc1.bias"] = rnd(4 * c)
        sd[f"{t}.mlp.fc2.weight"] = rnd(c, 4 * c)
        sd[f"{t}.mlp.fc2.bias"] = rnd(c)

    skips = [CS[3], CS[2], CS[1], CS[0]]
    for i in range(4):
        sd[f"vox_ups.{i}.0.net.0.kernel"] = rnd(8, CS[4 + i], CS[5 + i])
        bn(f"vox_ups.{i}.0.net.1", CS[5 + i])
        res_block(f"vox_ups.{i}.1.0", CS[5 + i] + skips[i], CS[5 + i])
        res_block(f"vox_ups.{i}.1.1", CS[5 + i], CS[5 + i])

    for i, (inc, outc) in enumerate(((CS[0], CS[4]), (CS[4], CS[6]),
                                     (CS[6], CS[8]))):
        sd[f"point_transforms.{i}.0.weight"] = rnd(outc, inc)
        sd[f"point_transforms.{i}.0.bias"] = rnd(outc)
        bn(f"point_transforms.{i}.1", outc)

    sd["classifier_vox.0.weight"] = rnd(NCLS, CS[8])
    sd["classifier_vox.0.bias"] = rnd(NCLS)
    return sd


def _toy_model():
    from u2mkd_tpu.models.spvcnn import SPVCNN

    return SPVCNN(
        num_classes=NCLS, cr=CR, sphereformer=True, head_dim=HEAD_DIM,
        window_size=(WS, WS, WS), quant_size=(WS / G_CUB,) * 3,
        window_size_sphere=(30.0, 30.0, 120.0),
        quant_size_sphere=(30.0 / G_SPH, 30.0 / G_SPH, 5.0),
    )


CAPS = (256, 128, 64, 32, 16)


def _init_variables(rng):
    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.models import plumbing as P

    model = _toy_model()
    raw = synthetic.make_batch(rng, 1, 256, voxel_size=0.3)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    pl = P.build_plumbing(batch["pcoords"], batch["xyz"], batch["pmask"],
                          CAPS)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["feats"], pl, False,
    )
    return model, vs, batch, pl


def test_kernel_perm_is_offset_exact():
    from u2mkd_tpu.ops.spconv import kernel_offsets

    for ks in (2, 3):
        perm = cw._ts_kernel_perm(ks)
        ts = cw._ts_offsets(ks)
        ours = kernel_offsets(ks)
        assert sorted(perm) == list(range(len(perm)))  # true permutation
        np.testing.assert_array_equal(ours, ts[perm])


@pytest.mark.slow
def test_teacher_import_strict_and_functional(rng):
    model, vs, batch, pl = _init_variables(rng)
    sd = make_reference_state_dict()
    # wrap the way a reference trainer checkpoint ships: {'model': module.*}
    wrapped = {"model": {f"module.{k}": v for k, v in sd.items()}}
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "max-iou-val-vox.pt")
        torch.save(wrapped, path)
        out = cw.load_teacher_pt(path, vs)

    # every leaf changed to the checkpoint's values: classifier exact
    w = np.asarray(out["params"]["classifier_vox"]["kernel"])
    np.testing.assert_allclose(
        w, sd["classifier_vox.0.weight"].numpy().T, rtol=1e-6)

    # functional parity where torch can execute: point_transforms.0 =
    # Linear + BN1d(eval) + ReLU vs our PointMLP with imported params
    lin = torch.nn.Linear(CS[0], CS[4])
    bn1 = torch.nn.BatchNorm1d(CS[4])
    with torch.no_grad():
        lin.weight.copy_(sd["point_transforms.0.0.weight"])
        lin.bias.copy_(sd["point_transforms.0.0.bias"])
        bn1.weight.copy_(sd["point_transforms.0.1.weight"])
        bn1.bias.copy_(sd["point_transforms.0.1.bias"])
        bn1.running_mean.copy_(sd["point_transforms.0.1.running_mean"])
        bn1.running_var.copy_(sd["point_transforms.0.1.running_var"])
    bn1.eval()
    x = torch.randn(17, CS[0], generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = torch.relu(bn1(lin(x))).numpy()

    from u2mkd_tpu.models.blocks import PointMLP

    got = PointMLP(CS[4]).apply(
        {"params": out["params"]["point_transform0"],
         "batch_stats": out["batch_stats"]["point_transform0"]},
        jnp.asarray(x.numpy())[None], jnp.ones((1, 17), bool), False,
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-4,
                               atol=2e-5)

    # qkv/norm1 parity on a dense vector: torch LayerNorm+Linear vs flax
    c = CS[1]
    ln = torch.nn.LayerNorm(c)
    qkv = torch.nn.Linear(c, 3 * c)
    with torch.no_grad():
        ln.weight.copy_(sd["transformer_blocks.0.norm1.weight"])
        ln.bias.copy_(sd["transformer_blocks.0.norm1.bias"])
        qkv.weight.copy_(sd["transformer_blocks.0.attn.qkv.weight"])
        qkv.bias.copy_(sd["transformer_blocks.0.attn.qkv.bias"])
    xx = torch.randn(9, c, generator=torch.Generator().manual_seed(4))
    want_q = qkv(ln(xx)).detach().numpy()
    import flax.linen as fnn

    sf = out["params"]["sphereformer1"]
    got_ln = fnn.LayerNorm().apply({"params": sf["norm1"]},
                                   jnp.asarray(xx.numpy()))
    got_q = fnn.Dense(3 * c).apply({"params": sf["attn"]["qkv"]}, got_ln)
    np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=2e-4,
                               atol=2e-4)

    # RPE tables copy verbatim
    np.testing.assert_array_equal(
        np.asarray(out["params"]["sphereformer2"]["attn"]["rel_v_sphere"]),
        sd["transformer_blocks.1.attn.relative_pos_value_table_sphere"].numpy())

    # the imported model runs and differs from the random init. Train-mode
    # forward: batch statistics normalize each layer, so the random
    # "checkpoint" can't blow up multiplicatively the way eval-mode with
    # random running stats does (that would be an artifact of the random
    # fixture, not of the import).
    def fwd(v):
        y, _ = model.apply(
            v, batch["feats"], pl, True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return np.asarray(y["x_vox"])

    y0, y1 = fwd(vs), fwd(out)
    assert np.isfinite(y1).all()
    assert not np.allclose(y0, y1)


def test_teacher_import_rejects_wrong_schema(rng, tmp_path):
    _, vs, _, _ = _init_variables(rng)
    torch.save({"conv1.weight": torch.zeros(64, 3, 7, 7)},
               tmp_path / "resnet.pt")
    with pytest.raises(ValueError, match="expected keys absent"):
        cw.load_teacher_pt(str(tmp_path / "resnet.pt"), vs)


def test_teacher_import_shape_mismatch_raises(rng, tmp_path):
    _, vs, _, _ = _init_variables(rng)
    sd = make_reference_state_dict()
    sd["classifier_vox.0.weight"] = torch.zeros(NCLS + 1, CS[8])  # wrong ncls
    torch.save(sd, tmp_path / "bad.pt")
    with pytest.raises(ValueError, match="shape mismatch"):
        cw.load_teacher_pt(str(tmp_path / "bad.pt"), vs)


@pytest.mark.slow
def test_teacher_import_into_tsd_scope(rng, tmp_path):
    """scope='model_t': the stage-2 entry path (reference
    ``nusc_trainers.py:190-199``) — teacher params land under model_t and
    the student subtree is untouched."""
    from u2mkd_tpu.models.tsd import TSDFull
    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.train import distill, optim

    s_caps = (192, 96, 48, 24, 12)
    model = TSDFull(
        num_classes=NCLS, cr=0.25, cr_t=CR, head_dim=HEAD_DIM,
        window_size=(WS, WS, WS), quant_size=(WS / G_CUB,) * 3,
        window_size_sphere=(30.0, 30.0, 120.0),
        quant_size_sphere=(30.0 / G_SPH, 30.0 / G_SPH, 5.0),
    )
    raw = synthetic.make_multimodal_batch(
        rng, 1, 192, 256, voxel_size=0.3, num_cams=2, im_hw=(32, 48))
    batch = jax.tree_util.tree_map(jnp.asarray, raw)
    tx = distill.make_frozen_teacher_optimizer(
        optim.make_optimizer("sgd", 0.01))
    st = distill.create_distill_state(
        model, tx, batch["student"], batch["teacher"], s_caps, CAPS,
        jax.random.PRNGKey(0))
    vs = {"params": st.params, "batch_stats": st.batch_stats}
    sd = make_reference_state_dict()
    torch.save({"model": sd}, tmp_path / "teacher.pt")
    out = cw.load_teacher_pt(str(tmp_path / "teacher.pt"), vs,
                             scope="model_t")
    np.testing.assert_allclose(
        np.asarray(out["params"]["model_t"]["classifier_vox"]["kernel"]),
        sd["classifier_vox.0.weight"].numpy().T, rtol=1e-6)
    # student untouched
    a = jax.tree_util.tree_leaves(vs["params"]["model_s"])[0]
    b = jax.tree_util.tree_leaves(out["params"]["model_s"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
