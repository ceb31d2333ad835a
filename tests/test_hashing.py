"""Parity tests for exact coordinate keys / unique / lookup vs numpy oracles.

Mirrors the reference's kernel-vs-oracle testing pattern
(third_party/SparseTransformer/test/, SURVEY.md §4) but as real assertions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from u2mkd_tpu.ops import hashing


def random_coords(rng, n, lo=-100, hi=100):
    return rng.randint(lo, hi, size=(n, 3)).astype(np.int32)


def test_pack_unpack_roundtrip(rng):
    c = random_coords(rng, 1000, -32768, 32767)
    valid = np.ones(1000, bool)
    hi, lo = hashing.pack_coords(jnp.asarray(c), jnp.asarray(valid))
    back = hashing.unpack_coords(hi, lo)
    np.testing.assert_array_equal(np.asarray(back), c)


def test_pack_orders_lexicographically(rng):
    c = random_coords(rng, 500)
    valid = np.ones(500, bool)
    hi, lo = map(np.asarray, hashing.pack_coords(jnp.asarray(c), jnp.asarray(valid)))
    keys = hi.astype(np.uint64) << 32 | lo.astype(np.uint64)
    order = np.argsort(keys, kind="stable")
    lex = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    np.testing.assert_array_equal(c[order], c[lex])


def test_unique_matches_numpy(rng):
    n, cap = 2000, 1800
    c = random_coords(rng, n, -8, 8)  # many duplicates
    valid = rng.rand(n) > 0.1
    hi, lo = hashing.pack_coords(jnp.asarray(c), jnp.asarray(valid))
    uhi, ulo, inverse, counts, num = jax.jit(
        lambda h, l: hashing.unique_keys(h, l, cap)
    )(hi, lo)
    uhi, ulo, inverse, counts, num = map(np.asarray, (uhi, ulo, inverse, counts, num))

    vc = c[valid]
    expected_unique = np.unique(vc.view([("x", "i4"), ("y", "i4"), ("z", "i4")]))
    assert num == len(expected_unique)
    got = np.asarray(hashing.unpack_coords(jnp.asarray(uhi[:num]), jnp.asarray(ulo[:num])))
    exp = np.stack([expected_unique["x"], expected_unique["y"], expected_unique["z"]], -1)
    np.testing.assert_array_equal(got, exp)

    # inverse: every valid point maps to its own coord's row
    for i in np.where(valid)[0][:200]:
        row = inverse[i]
        assert row < cap
        np.testing.assert_array_equal(got[row], c[i])
    # invalid points map to the drop bucket
    assert np.all(inverse[~valid] == cap)

    # counts
    exp_counts = np.zeros(num, np.int64)
    for i in np.where(valid)[0]:
        exp_counts[inverse[i]] += 1
    np.testing.assert_array_equal(counts[:num], exp_counts)
    assert np.all(counts[num:] == 0)


def test_unique_overflow_goes_to_drop_bucket(rng):
    n, cap = 300, 50  # more uniques than capacity
    c = np.arange(n)[:, None] * np.ones((1, 3))
    c = c.astype(np.int32)
    valid = np.ones(n, bool)
    hi, lo = hashing.pack_coords(jnp.asarray(c), jnp.asarray(valid))
    uhi, ulo, inverse, counts, num = hashing.unique_keys(hi, lo, cap)
    assert int(num) == cap
    inverse = np.asarray(inverse)
    assert np.sum(inverse == cap) == n - cap
    assert np.all(np.asarray(counts) >= 0)


def test_lookup_hits_and_misses(rng):
    cap = 512
    c = random_coords(rng, 400, -20, 20)
    valid = np.ones(400, bool)
    hi, lo = hashing.pack_coords(jnp.asarray(c), jnp.asarray(valid))
    uhi, ulo, inverse, counts, num = hashing.unique_keys(hi, lo, cap)

    # every original coord must be found at its inverse row
    res = hashing.lookup(hi, lo, uhi, ulo)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(inverse))

    # coords guaranteed absent
    qc = random_coords(rng, 100, 1000, 1100)
    qhi, qlo = hashing.pack_coords(jnp.asarray(qc), jnp.asarray(np.ones(100, bool)))
    res = hashing.lookup(qhi, qlo, uhi, ulo)
    assert np.all(np.asarray(res) == -1)

    # invalid queries miss
    qhi, qlo = hashing.pack_coords(jnp.asarray(c), jnp.asarray(np.zeros(400, bool)))
    res = hashing.lookup(qhi, qlo, uhi, ulo)
    assert np.all(np.asarray(res) == -1)


def test_lookup_coords_multi_dim(rng):
    cap = 256
    c = random_coords(rng, 100, -5, 5)
    hi, lo = hashing.pack_coords(jnp.asarray(c), jnp.asarray(np.ones(100, bool)))
    uhi, ulo, inverse, _, _ = hashing.unique_keys(hi, lo, cap)
    q = np.stack([c, c + 1000], axis=1)  # [100, 2, 3]: hit, miss
    res = np.asarray(
        hashing.lookup_coords(jnp.asarray(q), jnp.ones((100, 2), bool), uhi, ulo)
    )
    np.testing.assert_array_equal(res[:, 0], np.asarray(inverse))
    assert np.all(res[:, 1] == -1)
