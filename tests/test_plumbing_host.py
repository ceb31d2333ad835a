"""Host-precomputed plumbing vs the in-jit JAX builder: model-output parity.

Voxel enumeration order differs (JAX: key-sorted; host: first-occurrence),
so parity is checked at the *per-point model output* level, which must be
order-invariant.
"""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.data import plumbing_host, synthetic
from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.spvcnn import SPVCNN

CAPS = (512, 512, 512, 512, 512)


def build_both(raw):
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    pl_jax = P.build_plumbing(batch["pcoords"], batch["xyz"], batch["pmask"], CAPS)
    per_sample = [
        plumbing_host.build_plumbing_arrays(
            raw["pcoords"][i], raw["xyz"][i], raw["pmask"][i], CAPS
        )
        for i in range(len(raw["pcoords"]))
    ]
    stacked = {
        k: [jnp.asarray(np.stack([s[k][li] for s in per_sample]))
            for li in range(len(CAPS))]
        for k in per_sample[0]
    }
    pl_host = P.from_precomputed(stacked, batch["pmask"])
    return batch, pl_jax, pl_host


def test_structure_parity(rng):
    raw = synthetic.make_batch(np.random.RandomState(1), 2, 400, voxel_size=0.3)
    batch, pl_jax, pl_host = build_both(raw)
    for li in range(len(CAPS)):
        # same number of active voxels per level
        np.testing.assert_array_equal(
            np.asarray(pl_jax.levels[li].grid.num),
            np.asarray(pl_host.levels[li].grid.num),
        )
        # same multiset of coordinates
        for b in range(2):
            cj = np.asarray(pl_jax.levels[li].grid.coords[b])[
                np.asarray(pl_jax.levels[li].grid.mask[b])]
            ch = np.asarray(pl_host.levels[li].grid.coords[b])[
                np.asarray(pl_host.levels[li].grid.mask[b])]
            key = lambda c: sorted(map(tuple, c))
            assert key(cj) == key(ch)
        # devox weights per point are order-independent quantities
        np.testing.assert_allclose(
            np.sort(np.asarray(pl_jax.devox_w[li]), axis=-1),
            np.sort(np.asarray(pl_host.devox_w[li]), axis=-1),
            atol=1e-5,
        )


@pytest.mark.slow
def test_model_output_parity(rng):
    raw = synthetic.make_batch(np.random.RandomState(2), 2, 400, voxel_size=0.3)
    batch, pl_jax, pl_host = build_both(raw)
    model = SPVCNN(num_classes=5, cr=0.25, sphereformer=True, head_dim=4,
                   window_size=(1.2, 1.2, 1.2), quant_size=(0.15, 0.15, 0.15),
                   window_size_sphere=(30.0, 30.0, 120.0),
                   quant_size_sphere=(3.75, 3.75, 5.0))
    var = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["feats"], pl_jax, False,
    )
    out_jax = np.asarray(model.apply(var, batch["feats"], pl_jax, False)["x_vox"])
    out_host = np.asarray(model.apply(var, batch["feats"], pl_host, False)["x_vox"])
    m = np.asarray(batch["pmask"])
    np.testing.assert_allclose(out_host[m], out_jax[m], atol=2e-3, rtol=1e-3)
