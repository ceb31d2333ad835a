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


@pytest.mark.slow
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


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), path
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(a, b, err_msg=path)


def test_batch_plumbing_thread_fanout_byte_identical(rng):
    """The host-parallel paths (per-sample thread pool in batch_plumbing,
    per-branch pool in batch_window_geometry) never trigger on this 1-core
    sandbox by default — force them and require byte-identical output vs
    the serial build (ordering must be deterministic under concurrency)."""
    from u2mkd_tpu.data import wgeom_host

    raw = synthetic.make_batch(np.random.RandomState(3), 4, 256,
                               voxel_size=0.3)
    caps = (256, 128, 64, 32, 16)
    wp = wgeom_host.level_window_params(
        (1.2, 1.2, 1.2), (30.0, 30.0, 120.0),
        (0.15, 0.15, 0.15), (3.75, 3.75, 5.0), (2.0, 1.5))
    params_serial = dict(levels=wp, tile=32, branch_workers=0)
    params_pool = dict(levels=wp, tile=32, branch_workers=8)

    serial = plumbing_host.batch_plumbing(
        raw["pcoords"], raw["xyz"], raw["pmask"], caps,
        wgeom_params=params_serial, n_shards=2, workers=1)
    pooled = plumbing_host.batch_plumbing(
        raw["pcoords"], raw["xyz"], raw["pmask"], caps,
        wgeom_params=params_pool, n_shards=2, workers=4)
    _tree_equal(serial, pooled)
