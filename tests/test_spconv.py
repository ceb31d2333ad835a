"""Sparse conv parity vs a dense-convolution oracle.

Submanifold-style sparse conv with zeros at inactive sites equals a dense
conv evaluated at the active sites — so ``jax.lax.conv_general_dilated`` on a
scattered dense grid is an exact oracle (the reference uses an independent
CUDA wrapper library the same way, SURVEY.md §4).
"""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.core.structures import VoxelGrid
from u2mkd_tpu.ops import hashing, spconv, voxelize


def make_grid(rng, n=300, lo=0, hi=12, cap=512):
    coords = np.unique(rng.randint(lo, hi, (n, 3)).astype(np.int32), axis=0)
    v = len(coords)
    pad = cap - v
    mask = np.concatenate([np.ones(v, bool), np.zeros(pad, bool)])
    coords_p = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    hi_k, lo_k = hashing.pack_coords(jnp.asarray(coords_p), jnp.asarray(mask))
    # table must be key-sorted: sort
    hi_s, lo_s, cs0, cs1, cs2, ms = hashing.sort_by_key(
        hi_k, lo_k,
        jnp.asarray(coords_p[:, 0]), jnp.asarray(coords_p[:, 1]),
        jnp.asarray(coords_p[:, 2]), jnp.asarray(mask),
    )
    coords_s = jnp.stack([cs0, cs1, cs2], -1)
    return VoxelGrid(
        coords=jnp.where(ms[:, None], coords_s, 0), mask=ms,
        key_hi=hi_s, key_lo=lo_s, num=jnp.asarray(v, jnp.int32), stride=1,
    )


def dense_conv_oracle(grid, feats, weight, ks, stride=1):
    """Scatter to dense, lax conv, gather at active (coarse) sites."""
    size = 16
    cin = feats.shape[-1]
    dense = np.zeros((size, size, size, cin), np.float32)
    c = np.asarray(grid.coords)
    m = np.asarray(grid.mask)
    f = np.asarray(feats)
    dense[c[m, 0], c[m, 1], c[m, 2]] = f[m]
    x = jnp.asarray(dense)[None]  # [1, X, Y, Z, C]
    offs = spconv.kernel_offsets(ks)  # [K, 3]
    # build dense kernel [kx, ky, kz, cin, cout] from our offset-ordered weight
    k = ks
    w = np.zeros((k, k, k, cin, weight.shape[-1]), np.float32)
    base = 1 if ks == 3 else 0
    for ki, (dx, dy, dz) in enumerate(offs):
        w[dx + base, dy + base, dz + base] = np.asarray(weight)[ki]
    pad = "SAME" if ks == 3 else "VALID"
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(stride,) * 3, padding=pad,
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )[0]
    return np.asarray(out)


def test_stride1_ks3_matches_dense(rng):
    cap, cin, cout = 512, 8, 16
    grid = make_grid(rng, cap=cap)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    feats = jnp.where(grid.mask[:, None], feats, 0)
    weight = jnp.asarray(0.1 * rng.randn(27, cin, cout).astype(np.float32))
    nbr = spconv.build_nbr(grid, 3)
    out = np.asarray(jax.jit(spconv.sparse_conv)(feats, nbr, weight))
    dense = dense_conv_oracle(grid, feats, weight, 3)
    c, m = np.asarray(grid.coords), np.asarray(grid.mask)
    np.testing.assert_allclose(out[m], dense[c[m, 0], c[m, 1], c[m, 2]], atol=2e-4)


def test_stride1_ks1_is_linear(rng):
    cap, cin, cout = 256, 4, 6
    grid = make_grid(rng, n=100, cap=cap)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    weight = jnp.asarray(rng.randn(1, cin, cout).astype(np.float32))
    nbr = spconv.build_nbr(grid, 1)
    out = np.asarray(spconv.sparse_conv(feats, nbr, weight))
    exp = np.asarray(feats) @ np.asarray(weight)[0]
    m = np.asarray(grid.mask)
    np.testing.assert_allclose(out[m], exp[m], atol=1e-5)


def test_downsample_conv_matches_dense(rng):
    cap, cin, cout = 512, 8, 12
    grid = make_grid(rng, cap=cap)
    feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    feats = jnp.where(grid.mask[:, None], feats, 0)
    weight = jnp.asarray(0.1 * rng.randn(8, cin, cout).astype(np.float32))
    coarse, c2p, koff = spconv.downsample_grid(grid, 256)
    nbr8 = spconv.build_down_nbr8(coarse, grid)
    out = np.asarray(spconv.sparse_conv(feats, nbr8, weight))
    dense = dense_conv_oracle(grid, feats, weight, 2, stride=2)
    cc, cm = np.asarray(coarse.coords), np.asarray(coarse.mask)
    exp = dense[cc[cm, 0] // 2, cc[cm, 1] // 2, cc[cm, 2] // 2]
    np.testing.assert_allclose(out[cm], exp, atol=2e-4)


def test_downsample_grid_structure(rng):
    grid = make_grid(rng)
    coarse, c2p, koff = spconv.downsample_grid(grid, 256)
    c = np.asarray(grid.coords)
    m = np.asarray(grid.mask)
    cc = np.asarray(coarse.coords)
    c2p, koff = np.asarray(c2p), np.asarray(koff)
    # every active fine voxel's parent row holds its floored coords
    for i in np.where(m)[0][:100]:
        pr = c2p[i]
        assert pr >= 0
        np.testing.assert_array_equal(cc[pr], (c[i] // 2) * 2)
        # koff maps back to the delta
        offs = spconv.kernel_offsets(2)
        np.testing.assert_array_equal(offs[koff[i]], c[i] - (c[i] // 2) * 2)
    # coarse stride doubled
    assert coarse.stride == 2
    # expected unique count
    exp_uniq = np.unique((c[m] // 2) * 2, axis=0)
    assert int(coarse.num) == len(exp_uniq)


def test_transposed_conv_matches_dense(rng):
    cap, cin, cout = 512, 6, 10
    grid = make_grid(rng, cap=cap)
    coarse, c2p, koff = spconv.downsample_grid(grid, 256)
    cfeats = jnp.asarray(rng.randn(256, cin).astype(np.float32))
    cfeats = jnp.where(coarse.mask[:, None], cfeats, 0)
    weight = jnp.asarray(0.1 * rng.randn(8, cin, cout).astype(np.float32))
    out = np.asarray(spconv.sparse_conv_transposed_2x2(cfeats, c2p, koff, weight))
    # oracle: each fine voxel gets W[koff] @ parent feats
    c2p_np, koff_np = np.asarray(c2p), np.asarray(koff)
    m = np.asarray(grid.mask)
    w = np.asarray(weight)
    cf = np.asarray(cfeats)
    for i in np.where(m)[0][:100]:
        exp = cf[c2p_np[i]] @ w[koff_np[i]]
        np.testing.assert_allclose(out[i], exp, atol=1e-5)


@pytest.mark.slow
def test_build_levels_chain(rng):
    grid = make_grid(rng, n=400, hi=16, cap=1024)
    levels = spconv.build_levels(grid, (1024, 512, 256, 128, 64))
    assert len(levels) == 5
    strides = [lv.grid.stride for lv in levels]
    assert strides == [1, 2, 4, 8, 16]
    for li in range(4):
        assert levels[li].up_parent is not None
        assert levels[li + 1].down_nbr8 is not None
    assert levels[4].up_parent is None
    # active counts decrease
    nums = [int(lv.grid.num) for lv in levels]
    assert all(a >= b for a, b in zip(nums, nums[1:]))
    # jit-ability of the whole chain
    f = jax.jit(lambda g: spconv.build_levels(g, (1024, 512, 256, 128, 64)))
    levels2 = f(grid)
    np.testing.assert_array_equal(
        np.asarray(levels2[2].grid.coords), np.asarray(levels[2].grid.coords)
    )
