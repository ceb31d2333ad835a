"""Official SphereFormer U-Net (alt teacher) smoke test."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.sphereformer_unet import SphereFormerSemantic

CAPS = (256, 128, 64, 32, 16)


@pytest.mark.slow
def test_recursive_vox_xyz_oracle(rng):
    """Recursive mean-of-means coordinate tracking (reference
    ``unet_spherical_transformer.py:223-247``: scatter_mean of the finer
    level's xyz over the downsample kmap pairs) vs a numpy recursion over
    the same rulebooks — and it must DIFFER from the flat level-0 mean on
    non-uniform occupancy (the round-2 simplification it replaces)."""
    b, p = 2, 400
    xyz = (rng.rand(b, p, 3) * 10 - 5).astype(np.float32)
    pcoords = xyz / 0.25  # fine voxels -> skewed child counts per parent
    mask = np.ones((b, p), bool)
    pl = P.build_plumbing(jnp.asarray(pcoords), jnp.asarray(xyz),
                          jnp.asarray(mask), CAPS)
    rec = [np.asarray(x) for x in P.recursive_vox_xyz(pl)]

    for bi in range(b):
        prev = np.asarray(pl.vox_xyz[0][bi])
        for li in range(1, len(CAPS)):
            nbr = np.asarray(pl.levels[li].down_nbr8[bi])   # [8, V]
            lmask = np.asarray(pl.levels[li].grid.mask[bi])
            expect = np.zeros((CAPS[li], 3), np.float32)
            for v in range(CAPS[li]):
                if not lmask[v]:
                    continue
                rows = nbr[:, v]
                rows = rows[rows >= 0]
                expect[v] = prev[rows].mean(axis=0)
            np.testing.assert_allclose(rec[li][bi], expect,
                                       rtol=1e-5, atol=1e-5)
            prev = expect
        # differs from the flat mean beyond level 1 on skewed occupancy
        flat = np.asarray(pl.vox_xyz[2][bi])
        lmask2 = np.asarray(pl.levels[2].grid.mask[bi])
        assert not np.allclose(rec[2][bi][lmask2], flat[lmask2], atol=1e-4)


@pytest.mark.slow
def test_unet_forward(rng):
    b, p = 1, 250
    xyz = (rng.rand(b, p, 3) * 8 - 4).astype(np.float32)
    pcoords = xyz / 0.5
    feats = np.concatenate([xyz, rng.rand(b, p, 1).astype(np.float32)], -1)
    mask = np.ones((b, p), bool)
    pl = P.build_plumbing(jnp.asarray(pcoords), jnp.asarray(xyz),
                          jnp.asarray(mask), CAPS)
    model = SphereFormerSemantic(
        num_classes=5, n_planes=(8, 16, 32, 32, 32), head_dim=4,
        window_size=(1.0, 1.0, 1.0), quant_size=(1 / 8, 1 / 8, 1 / 8),
        window_size_sphere=(30.0, 30.0, 120.0),
        quant_size_sphere=(30 / 8, 30 / 8, 5.0),
    )
    var = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(feats), pl, False,
    )
    out = model.apply(var, jnp.asarray(feats), pl, False)
    x = np.asarray(out["x_vox"])
    assert x.shape == (1, 250, 5)
    assert np.isfinite(x).all()
    # recursion depth: 5 nested UBlocks with transformers at each level
    keys = set()
    jax.tree_util.tree_map_with_path(
        lambda path, _: keys.add("/".join(str(p.key) for p in path
                                          if hasattr(p, "key"))),
        var["params"],
    )
    assert any("unet/u/u/u/u/transformer_block" in k for k in keys)


@pytest.mark.slow
def test_unet_vgg_block_option(rng):
    """``block_type='vgg'``: the reference's ``UBlock(block=VGGBlock)``
    option (``unet_spherical_transformer.py:70-81,108``) — norm-relu-conv
    only. The forward runs, and the param tree has the VGG shape (single
    conv per block, no bn2/conv2/i_branch)."""
    b, p = 1, 250
    xyz = (rng.rand(b, p, 3) * 8 - 4).astype(np.float32)
    pcoords = xyz / 0.5
    feats = np.concatenate([xyz, rng.rand(b, p, 1).astype(np.float32)], -1)
    mask = np.ones((b, p), bool)
    pl = P.build_plumbing(jnp.asarray(pcoords), jnp.asarray(xyz),
                          jnp.asarray(mask), CAPS)
    model = SphereFormerSemantic(
        num_classes=5, n_planes=(8, 16, 32, 32, 32), head_dim=4,
        window_size=(1.0, 1.0, 1.0), quant_size=(1 / 8, 1 / 8, 1 / 8),
        window_size_sphere=(30.0, 30.0, 120.0),
        quant_size_sphere=(30 / 8, 30 / 8, 5.0),
        block_type="vgg",
    )
    var = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(feats), pl, False,
    )
    out = model.apply(var, jnp.asarray(feats), pl, False)
    x = np.asarray(out["x_vox"])
    assert x.shape == (1, 250, 5)
    assert np.isfinite(x).all()
    keys = set()
    jax.tree_util.tree_map_with_path(
        lambda path, _: keys.add("/".join(str(p.key) for p in path
                                          if hasattr(p, "key"))),
        var["params"],
    )
    assert any("unet/block0/conv1" in k for k in keys)
    assert not any("/block0/conv2" in k for k in keys)   # no second conv
    assert not any("/block0/i_branch" in k for k in keys)  # no residual 1x1
