"""Pallas flash window attention (interpret mode) vs the dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.ops.pallas import wattn_kernel as pk

from test_wattn import make_attn_inputs, np_window_attention


def test_window_bounds(rng):
    hi = jnp.asarray(np.array([1, 1, 2, 2, 2, 5], np.uint32))
    lo = jnp.zeros(6, jnp.uint32)
    start, end = pk.window_bounds_from_sorted(hi, lo)
    np.testing.assert_array_equal(np.asarray(start), [0, 0, 2, 2, 2, 5])
    np.testing.assert_array_equal(np.asarray(end), [2, 2, 5, 5, 5, 6])


def test_flash_matches_oracle(rng):
    q, k, v, xyz, valid = make_attn_inputs(rng, vcap=200)
    ws = (1.5, 1.5, 1.5)
    got = np.asarray(
        pk.sparse_window_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), ws, tile=64, interpret=True,
        )
    )
    exp = np_window_attention(q, k, v, xyz, valid, ws)
    np.testing.assert_allclose(got[valid], exp[valid], atol=3e-5)
    assert np.all(got[~valid] == 0)


def test_flash_matches_banded_xla(rng):
    """Pallas (dynamic ranges) vs the XLA banded path on a skewed layout."""
    from u2mkd_tpu.ops import wattn

    q, k, v, _, valid = make_attn_inputs(rng, vcap=300)
    # one big window + many small ones (radial-window-like skew)
    xyz = np.zeros((300, 3), np.float32)
    xyz[:150] = 0.1  # all in one window
    xyz[150:] = (np.arange(150)[:, None] * [2.0, 0, 0] + 10).astype(np.float32)
    got = np.asarray(
        pk.sparse_window_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), (1.0, 1.0, 1.0), tile=64, interpret=True,
        )
    )
    ref = np.asarray(
        wattn.sparse_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
            jnp.asarray(valid), (1.0, 1.0, 1.0), band=3, tile=64,
        )
    )
    np.testing.assert_allclose(got[valid], ref[valid], atol=3e-5)
