"""bf16 compute policy: finiteness + closeness to f32, and cleanup."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from u2mkd_tpu.data import synthetic
from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.spvcnn import SPVCNN
from u2mkd_tpu.ops import precision

CAPS = (128, 64, 32, 16, 8)


@pytest.fixture
def f32_guard():
    yield
    precision.set_compute_dtype("float32")


@pytest.mark.slow
def test_bf16_forward_close_to_f32(rng, f32_guard):
    raw = synthetic.make_batch(np.random.RandomState(5), 1, 150, voxel_size=0.5)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    pl = P.build_plumbing(batch["pcoords"], batch["xyz"], batch["pmask"], CAPS)
    model = SPVCNN(num_classes=5, cr=0.25, sphereformer=True, head_dim=4,
                   window_size=(1.5, 1.5, 1.5), quant_size=(1.5 / 8,) * 3,
                   window_size_sphere=(40.0, 40.0, 120.0),
                   quant_size_sphere=(5.0, 5.0, 5.0))
    var = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["feats"], pl, False,
    )
    out32 = np.asarray(model.apply(var, batch["feats"], pl, False)["x_vox"])

    precision.set_compute_dtype("bfloat16")
    out16 = np.asarray(model.apply(var, batch["feats"], pl, False)["x_vox"])
    precision.set_compute_dtype("float32")

    assert out16.dtype == np.float32  # outputs stay f32
    assert np.isfinite(out16).all()
    m = np.asarray(batch["pmask"])[0]
    # bf16 has ~3 decimal digits; logits should agree to ~1e-1 relative scale
    scale = np.abs(out32[0][m]).mean() + 1e-6
    err = np.abs(out16[0][m] - out32[0][m]).mean() / scale
    assert err < 0.1, err
