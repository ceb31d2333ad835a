"""Official SphereFormer U-Net (alt teacher) smoke test."""

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.sphereformer_unet import SphereFormerSemantic

CAPS = (256, 128, 64, 32, 16)


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
