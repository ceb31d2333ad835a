"""Native pointcore bindings vs numpy fallbacks."""

import numpy as np
import pytest

from u2mkd_tpu.data import geometry, native


needs_native = pytest.mark.skipif(
    not native.available(), reason="libpointcore.so not built (make -C native)"
)


@needs_native
def test_dedup_matches_numpy(rng):
    voxel = rng.randint(0, 50, (20000, 3)).astype(np.int32)
    inds_n, inv_n = native.dedup_first(voxel)
    # independent numpy oracle (scan-order first occurrence)
    seen = {}
    inds_ref, inv_ref = [], np.zeros(len(voxel), np.int32)
    for i, row in enumerate(map(tuple, voxel)):
        if row not in seen:
            seen[row] = len(inds_ref)
            inds_ref.append(i)
        inv_ref[i] = seen[row]
    np.testing.assert_array_equal(inds_n, inds_ref)
    np.testing.assert_array_equal(inv_n, inv_ref)


@needs_native
def test_transform_matches_geometry(rng):
    tm = geometry.transform_matrix([1.0, -2.0, 0.5], [0.9238795, 0, 0, 0.3826834])
    xyz = rng.rand(5000, 3).astype(np.float32) * 40 - 20
    out = native.transform_points(tm, xyz)
    exp = geometry.apply_transform(tm, xyz.astype(np.float64))
    np.testing.assert_allclose(out, exp, atol=1e-4)


@needs_native
def test_remap_and_occupancy(rng):
    from u2mkd_tpu.data.semantic_nusc import _REMAP_LUT

    raw = rng.randint(0, 32, 10000).astype(np.uint8)
    out = native.remap_labels_lut(raw, _REMAP_LUT)
    np.testing.assert_array_equal(out, _REMAP_LUT[raw])

    xyz = rng.rand(10000, 3).astype(np.float32) * 10
    labels = rng.randint(0, 17, 10000).astype(np.int32)
    thing = np.zeros(17, bool)
    thing[1:11] = True
    mn = np.array([2, 2, 2], np.float32)
    mx = np.array([5, 5, 5], np.float32)
    n_th, n_ot = native.box_occupancy(xyz, labels, thing, mn, mx)
    inside = np.all((xyz > mn) & (xyz < mx), axis=1)
    exp_th = int(thing[labels[inside]].sum())
    assert n_th == exp_th
    assert n_ot == int(inside.sum()) - exp_th
