"""Exec'd-reference oracles for the attention geometry helpers (VERDICT r2
next-step #6).

The strongest-form parity tests run the reference's OWN pure-torch code
(the pattern that caught the L2CFusion bias bug in round 2) instead of
hand-rewritten numpy oracles: ``exponential_split`` / ``cart2sphere`` from
``core/models/sphereformer/spherical_transformer.py:31-64`` and the
rel-position quantize chain inside ``sparse_self_attention``
(``sptr/modules.py:40-49``), exec'd with the CUDA imports stubbed, against
:mod:`u2mkd_tpu.ops.wattn` and the host geometry builder.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from u2mkd_tpu.data import wgeom_host  # noqa: E402
from u2mkd_tpu.ops import wattn  # noqa: E402

_REF = "/root/reference"


def _load_ref_module(rel, stubs):
    path = os.path.join(_REF, rel)
    if not os.path.exists(path):
        pytest.skip("reference snapshot absent")
    src = open(path).read()
    for line, repl in stubs.items():
        src = src.replace(line, repl)
    ns = {}
    exec(compile(src, rel, "exec"), ns)  # reference torch code as oracle
    return ns


@pytest.fixture(scope="module")
def ref_spherical():
    return _load_ref_module(
        "core/models/sphereformer/spherical_transformer.py",
        {
            "from timm.models.layers import DropPath, trunc_normal_":
                "DropPath = trunc_normal_ = None",
            "from third_party.SparseTransformer.sptr import to_3d_numpy, "
            "SparseTrTensor, sparse_self_attention, get_indices_params":
                "to_3d_numpy = SparseTrTensor = sparse_self_attention = "
                "get_indices_params = None",
        },
    )


@pytest.fixture(scope="module")
def ref_modules():
    return _load_ref_module(
        "third_party/SparseTransformer/sptr/modules.py",
        {
            "from timm.models.layers import DropPath, trunc_normal_":
                "DropPath = trunc_normal_ = None",
            "from . import SparseTrTensor": "SparseTrTensor = None",
            "from .functional import attention_step1, attention_step2, "
            "dot_prod_with_idx, dot_prod_with_idx_all, "
            "attention_step2_with_rel_pos_value":
                "attention_step1 = attention_step2 = dot_prod_with_idx = "
                "dot_prod_with_idx_all = attention_step2_with_rel_pos_value "
                "= None",
            "from .utils import to_3d_numpy, scatter_softmax_csr, "
            "get_indices_params":
                "to_3d_numpy = scatter_softmax_csr = get_indices_params "
                "= None",
            "from .position_embedding import PositionEmbeddingCoordsSine":
                "PositionEmbeddingCoordsSine = None",
            # the quantize chain moves tensors to CUDA inline; run it on CPU
            ".float().cuda()": ".float()",
        },
    )


def test_exponential_split_ref_parity(ref_spherical, rng):
    """Radial RPE bin function, bit-matched to the reference's own torch
    implementation over a wide range of r differences incl. boundaries."""
    a = 0.0125
    n = 4000
    r = np.concatenate([
        rng.uniform(0, 55.0, n).astype(np.float32),
        # exact bin boundaries: k*a multiples where the mapping switches
        (a * np.array([0, 1, 2, 3, 4, 6, 10, 14, 22, 30], np.float32)),
    ])
    m = len(r)
    i0 = rng.randint(0, m, 6000).astype(np.int64)
    i1 = rng.randint(0, m, 6000).astype(np.int64)

    xyz = torch.zeros(m, 3)
    xyz[:, 2] = torch.from_numpy(r)
    rpi = torch.zeros(len(i0), 3)
    ref = ref_spherical["exponential_split"](
        xyz, torch.from_numpy(i0), torch.from_numpy(i1), rpi.clone(), a=a
    )[:, 2].numpy()

    ours = np.asarray(
        wattn.exponential_split_index(jnp.asarray(r[i0] - r[i1]), a)
    )
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_cart2sphere_ref_parity(ref_spherical, rng):
    xyz = rng.uniform(-60, 60, (5000, 3)).astype(np.float32)
    ref = ref_spherical["cart2sphere"](torch.from_numpy(xyz)).numpy()
    ours = np.asarray(wattn.cart2sphere(jnp.asarray(xyz)))
    host = wgeom_host.cart2sphere(xyz)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(host, ref, rtol=1e-5, atol=1e-4)


class _Stop(Exception):
    pass


@pytest.mark.parametrize("radial", [False, True])
def test_rel_pos_quantize_ref_parity(ref_modules, ref_spherical, rng, radial):
    """The full contextual-RPE index chain of the reference's
    ``sparse_self_attention`` (quantize -> per-pair difference -> +G-1 ->
    optional exponential split + clamp, ``sptr/modules.py:40-49``) vs our
    per-element quantization composed per pair."""
    g = 24
    if radial:
        window = np.array([2.0, 2.0, 120.0], np.float32)
        quant = np.array([2.0 / g, 2.0 / g, 5.0], np.float32)
    else:
        window = np.array([0.6, 0.6, 0.6], np.float32)
        quant = window / g
    n = 800
    xyz = rng.uniform(0, 50.0, (n, 3)).astype(np.float32)
    if radial:
        xyz = wgeom_host.cart2sphere(
            rng.uniform(-40, 40, (n, 3)).astype(np.float32))
    i0 = rng.randint(0, n, 3000).astype(np.int64)
    i1 = rng.randint(0, n, 3000).astype(np.int64)

    captured = {}

    def fake_dot_prod(query, _i0, _i0o, key, _i1, _i1o, tq, tk, rpi, n_max):
        captured["rpi"] = rpi.clone()
        raise _Stop()

    ref_modules["dot_prod_with_idx_all"] = fake_dot_prod
    h, d = 2, 4
    t = torch.zeros(2 * g, 3, h, d)
    a = 0.0125
    split = (
        (lambda xyz_, a_, b_, c_: ref_spherical["exponential_split"](
            xyz_, a_, b_, c_, a=a))
        if radial else None
    )
    with pytest.raises(_Stop):
        ref_modules["sparse_self_attention"](
            torch.zeros(n, h, d), torch.zeros(n, h, d), torch.zeros(n, h, d),
            torch.from_numpy(xyz),
            torch.from_numpy(i0), None, 8, torch.from_numpy(i1), None,
            torch.arange(n),  # identity sort: xyz_ctg == xyz
            window, False, pe_type="contextual", rel_query=True, rel_key=True,
            rel_value=True, quant_size=quant, quant_grid_length=g,
            relative_pos_query_table=t, relative_pos_key_table=t,
            split_func=split,
        )
    ref_rpi = captured["rpi"].numpy().astype(np.int64)

    # ours: per-element quantize (device + host builders), composed per pair
    q_dev = np.asarray(wattn.quantize_in_window(
        jnp.asarray(xyz), jnp.ones(n, bool), window, quant, shift=False))
    q_host = wgeom_host.quantize_in_window(
        xyz, np.ones(n, bool), window, quant)
    np.testing.assert_array_equal(q_dev, q_host)

    ours = q_dev[i0] - q_dev[i1] + g - 1
    if radial:
        bins = np.asarray(wattn.exponential_split_index(
            jnp.asarray(xyz[i0, 2] - xyz[i1, 2]), a))
        ours[:, 2] = bins
        ours = np.clip(ours, 0, 2 * g - 1)
    np.testing.assert_array_equal(ours, ref_rpi)
