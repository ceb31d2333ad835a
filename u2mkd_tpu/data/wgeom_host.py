"""Host-side window geometry for the flash attention path.

Round-2 profiling (PERF.md) showed the teacher step runs ~4x slower than the
sum of its parts: the 8 in-program window sorts (4 levels x 2 branches) plus
the rank/segment/quantization index math around the attention custom calls
serialize the whole XLA program. All of that geometry is *feature
independent* — it depends only on the per-level voxel positions the host
plumbing already computes (``voxxyz``) — so, exactly like the conv rulebooks
(``native/pointcore.cpp:build_plumbing_host``), it is built here on the host
and shipped with the batch. This mirrors the reference's own design: sptr
computes window indices once per ``indice_key`` and caches them
(``/root/reference/core/models/sphereformer/spherical_transformer.py:
185-219``); ours just moves the precompute off the device entirely.

Per level and branch the device receives (see ``core.structures.WindowGeom``):
  order  [pad_to] int32  window-sorted gather order over the flattened
                         [B*V] batch (pad rows point at 0 and carry a
                         unique window rank so they attend nothing live),
  inv    [B*V]   int32   inverse permutation (unsort becomes a gather),
  rank   [pad_to] f32    dense window id in sorted order,
  quant  [pad_to,3] i32  per-axis quantized in-window coordinates (sorted),
  r      [pad_to] f32    raw range, sphere branch only (for the in-kernel
                         exponential split),
  kmin/kmax [pad_to/tile] i32  per-query-tile dynamic key ranges,
  occ    [1] int32       max window occupancy (free overflow counter).

Semantics are bit-matched to the in-jit builders they replace:
``wattn.window_keys`` / ``wattn.quantize_in_window`` / ``wattn.cart2sphere``
(reference ``sptr/utils.py:20-47``, ``sptr/modules.py:40-44``,
``spherical_transformer.py:31-36``) and the sort/rank/range setup of
``wattn_kernel._sorted_setup``.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_BIAS = np.int64(1) << 21


def cart2sphere(xyz: np.ndarray) -> np.ndarray:
    """float32 (x,y,z) -> (theta_deg, beta_deg, r); matches
    ``wattn.cart2sphere``."""
    xyz = xyz.astype(np.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    theta = (np.arctan2(y, x) + np.float32(math.pi)) * np.float32(180.0 / math.pi)
    beta = np.arctan2(np.sqrt(x * x + y * y), z) * np.float32(180.0 / math.pi)
    r = np.sqrt(x * x + y * y + z * z)
    return np.stack([theta, beta, r], axis=-1).astype(np.float32)


def _valid_min(xyz: np.ndarray, valid: np.ndarray) -> np.ndarray:
    big = np.where(valid[:, None], xyz, np.float32(np.inf))
    mn = big.min(axis=0)
    return np.where(np.isfinite(mn), mn, np.float32(0.0)).astype(np.float32)


def window_cells(xyz: np.ndarray, valid: np.ndarray, ws) -> np.ndarray:
    """floor((pos - min_valid) / ws) — ``wattn.window_keys`` (shift=False)."""
    ws = np.asarray(ws, np.float32)
    start = _valid_min(xyz, valid)
    return np.floor((xyz.astype(np.float32) - start) / ws).astype(np.int64)


def quantize_in_window(xyz: np.ndarray, valid: np.ndarray, ws, qs) -> np.ndarray:
    """floor(mod(xyz - min_valid, ws) / qs) — ``wattn.quantize_in_window``
    (shift=False)."""
    ws = np.asarray(ws, np.float32)
    qs = np.asarray(qs, np.float32)
    mn = _valid_min(xyz, valid)
    rel = np.mod(xyz.astype(np.float32) - mn, ws)
    return np.floor(rel / qs).astype(np.int32)


def level_window_params(window_size, window_size_sphere, quant_size,
                        quant_size_sphere, window_size_scale,
                        n_levels: int = 4,
                        heads: Optional[List] = None) -> List[Dict]:
    """Per-encoder-level (cubic, sphere) window/quant sizes, mirroring the
    doubling in SPVCNN's encoder (reference ``spvcnn_spformer.py:77-83``).
    Entry i corresponds to U-Net level i+1.

    ``heads``: optional per-level (h_cubic, h_sphere, head_dim) — when
    given, each level entry also carries the scoped-VMEM-safe per-branch
    kernel tiles (``wattn_kernel.branch_tile``). Wide-head deep levels are
    handled by the backward head-group split inside the kernel wrappers, so
    in practice these stay at the full 128 tile; the per-level plumbing
    remains as the host/kernel tile contract."""
    from u2mkd_tpu.ops.pallas.wattn_kernel import branch_tile

    ws = [float(w) for w in window_size]
    qs = [float(q) for q in quant_size]
    wss = [float(w) for w in window_size_sphere]
    qss = [float(q) for q in quant_size_sphere]
    wsc, wss_scale = float(window_size_scale[0]), float(window_size_scale[1])
    out = []
    for li in range(n_levels):
        entry = dict(ws=tuple(ws), qs=tuple(qs), wss=tuple(wss),
                     qss=tuple(qss))
        if heads is not None:
            h1, h2, d = heads[li]
            g_cub = int((ws[0] + 1e-4) / qs[0])
            g_sph = int((wss[0] + 1e-4) / qss[0])
            entry["tile_cubic"] = branch_tile(h1, d, g_cub, radial=False)
            entry["tile_sphere"] = branch_tile(h2, d, g_sph, radial=True)
        out.append(entry)
        ws = [w * wsc for w in ws]
        qs = [q * wsc for q in qs]
        wss = [wss[0] * wss_scale, wss[1] * wss_scale, wss[2]]
        qss = [qss[0] * wss_scale, qss[1] * wss_scale, qss[2]]
    return out


_BASE_LEVEL_CHANNELS = (32, 64, 128, 256)  # SPVCNN/MSP2IFM cs[1..4]


def heads_for_levels(cr: float, head_dim: int) -> List[Tuple[int, int, int]]:
    """Per-level (h_cubic, h_sphere, head_dim) for a SPVCNN-family encoder:
    num_heads = int(cr * cs[l]) // head_dim, split h1 = h//2 / h2 = h - h1
    (``models/sphereformer.py:67-68``). When a TSD config runs student and
    teacher through the same geometry, pass the *larger* cr — the tile that
    is VMEM-safe for more heads is safe (just narrower) for fewer."""
    out = []
    for c in _BASE_LEVEL_CHANNELS:
        h = max(2, int(cr * c) // head_dim)
        h1 = h // 2
        out.append((h1, h - h1, head_dim))
    return out


def params_from_cfg(cfg) -> Dict:
    """Window-geometry spec from a train config (window math per reference
    ``builder.py:533-620``); consumed by ``plumbing_host.batch_plumbing``."""
    from u2mkd_tpu.train.builder import window_geometry

    ws, wss, qs, qss = window_geometry(cfg)
    cr = max(float(cfg.model.get("cr", 1.0)),
             float(cfg.model.get("cr_t", 0.0)))
    heads = heads_for_levels(cr, int(cfg.model.get("head_dim", 16)))
    return dict(
        levels=level_window_params(
            ws, wss, qs, qss, tuple(cfg.model.window_size_scale), heads=heads
        ),
        tile=int(cfg.model.get("attn_tile", 128)),
        # fan the 8 per-branch geometry builds across host cores; defaults
        # to the machine's parallelism (capped at 8 jobs), 0/1 = serial
        branch_workers=int(cfg.get_path(
            "wgeom_workers", min(8, os.cpu_count() or 1))),
    )


def params_from_model(model) -> Dict:
    """Same spec derived from a model's attributes (bench/test helper)."""
    cr = max(float(getattr(model, "cr", 1.0)),
             float(getattr(model, "cr_t", 0.0)))
    heads = heads_for_levels(cr, int(getattr(model, "head_dim", 16)))
    return dict(
        levels=level_window_params(
            model.window_size, model.window_size_sphere, model.quant_size,
            model.quant_size_sphere, model.window_size_scale, heads=heads,
        ),
        tile=128,
        branch_workers=min(8, os.cpu_count() or 1),
    )


def _branch_geometry_native(coords: np.ndarray, valid: np.ndarray, ws, qs,
                            tile: int, radial: bool):
    """C fast path (``native/pointcore.cpp:build_wgeom_branch``); returns
    None when the library is unavailable. Bit-identical to the numpy
    implementation below (``tests/test_wgeom.py::test_native_branch_parity``
    asserts exact equality on every output)."""
    import ctypes

    from u2mkd_tpu.data import native

    lib = native._load()
    if lib is None or not hasattr(lib, "build_wgeom_branch"):
        return None
    b, v = valid.shape
    n = b * v
    pad_to = -(-n // tile) * tile
    c = np.ascontiguousarray(coords, np.float32)
    m = np.ascontiguousarray(valid, np.uint8)
    ws_ = np.ascontiguousarray(ws, np.float32)
    qs_ = np.ascontiguousarray(qs, np.float32)
    order = np.empty(pad_to, np.int32)
    inv = np.empty(n, np.int32)
    rank = np.empty(pad_to, np.float32)
    quant = np.empty((pad_to, 3), np.int32)
    kmin = np.empty(pad_to // tile, np.int32)
    kmax = np.empty(pad_to // tile, np.int32)
    occ = np.empty(1, np.int32)
    r = np.empty(pad_to, np.float32) if radial else None
    lib.build_wgeom_branch(
        c.ctypes.data, m.ctypes.data, ctypes.c_int64(b), ctypes.c_int64(v),
        ws_.ctypes.data, qs_.ctypes.data, ctypes.c_int64(tile),
        order.ctypes.data, inv.ctypes.data, rank.ctypes.data,
        quant.ctypes.data, kmin.ctypes.data, kmax.ctypes.data,
        occ.ctypes.data, r.ctypes.data if radial else None,
    )
    out = dict(order=order, inv=inv, rank=rank, quant=quant, kmin=kmin,
               kmax=kmax, occ=occ)
    if radial:
        out["r"] = r
    return out


def _branch_geometry(coords: np.ndarray, valid: np.ndarray, ws, qs,
                     tile: int, radial: bool,
                     use_native: bool = True) -> Dict[str, np.ndarray]:
    """Geometry for one attention branch over one [B, V] voxel batch."""
    if use_native:
        nat = _branch_geometry_native(coords, valid, ws, qs, tile, radial)
        if nat is not None:
            return nat
    b, v = valid.shape
    n = b * v
    cells = np.stack([window_cells(coords[i], valid[i], ws) for i in range(b)])
    quant = np.stack(
        [quantize_in_window(coords[i], valid[i], ws, qs) for i in range(b)]
    )
    flat_valid = valid.reshape(-1)
    c = cells.reshape(-1, 3)
    key = (((c[:, 0] + _BIAS) << 42)
           | (((c[:, 1] + _BIAS) & 0x1FFFFF) << 21)
           | ((c[:, 2] + _BIAS) & 0x1FFFFF))
    batch = np.repeat(np.arange(b, dtype=np.int64), v)
    primary = np.where(flat_valid, batch, np.int64(b))  # dead rows last
    order = np.lexsort((key, primary)).astype(np.int32)

    pad_to = -(-n // tile) * tile
    padn = pad_to - n
    key_s = np.concatenate([key[order], np.zeros(padn, np.int64)])
    prim_s = np.concatenate([primary[order], np.full(padn, b + 1, np.int64)])
    live = np.concatenate([flat_valid[order], np.zeros(padn, bool)])

    # run starts: dead/pad rows are each their own window
    same = live[1:] & live[:-1] & (key_s[1:] == key_s[:-1]) \
        & (prim_s[1:] == prim_s[:-1])
    new = np.concatenate([[True], ~same])
    rank = np.cumsum(new, dtype=np.int64) - 1
    idx = np.arange(pad_to, dtype=np.int64)
    start = np.maximum.accumulate(np.where(new, idx, 0))
    last = np.concatenate([new[1:], [True]])
    end = np.minimum.accumulate(
        np.where(last, idx + 1, pad_to)[::-1])[::-1]
    kmin = start[::tile].astype(np.int32)
    kmax = np.maximum(end[tile - 1::tile].astype(np.int32), kmin + 1)

    inv = np.empty(n, np.int32)
    inv[order] = np.arange(n, dtype=np.int32)
    order_p = np.concatenate([order, np.zeros(padn, np.int32)])
    quant_s = np.concatenate(
        [quant.reshape(-1, 3)[order], np.zeros((padn, 3), np.int32)]
    )
    if live.any():
        occ = np.bincount(rank[live]).max()
    else:
        occ = 0
    out = dict(order=order_p, inv=inv, rank=rank.astype(np.float32),
               quant=quant_s.astype(np.int32), kmin=kmin, kmax=kmax,
               occ=np.asarray([occ], np.int32))
    if radial:
        r = coords[..., 2].astype(np.float32).reshape(-1)[order]
        out["r"] = np.concatenate([r, np.zeros(padn, np.float32)])
    return out


def batch_window_geometry(voxxyz: Sequence[np.ndarray],
                          vmask: Sequence[np.ndarray],
                          params: Dict) -> Dict[str, list]:
    """Window geometry for encoder levels 1..4 of one batch.

    voxxyz/vmask: per-level [B, V_L, 3] / [B, V_L] stacked host-plumbing
    arrays (level 0 is unused — SphereFormer runs after each downsample).
    Returns {"cubic": [...], "sphere": [...]} with one geometry dict per
    level entry in ``params["levels"]``.
    """
    tile = int(params["tile"])
    jobs = []
    for li, p in enumerate(params["levels"], start=1):
        xyz = np.asarray(voxxyz[li], np.float32)
        mask = np.asarray(vmask[li]).astype(bool)
        # per-branch scoped-VMEM-safe tiles (deep levels with many heads
        # need narrower query tiles); the kernel derives its tile from the
        # geometry so host and device always agree
        t_cub = min(tile, int(p.get("tile_cubic", tile)))
        t_sph = min(tile, int(p.get("tile_sphere", tile)))
        jobs.append(("cubic", xyz, mask, p["ws"], p["qs"], t_cub, False))
        jobs.append(("sphere", cart2sphere(xyz), mask, p["wss"], p["qss"],
                     t_sph, True))

    def run(j):
        _, xyz, mask, ws, qs, t, radial = j
        return _branch_geometry(xyz, mask, ws, qs, t, radial=radial)

    # the 8 branch builds (2 branches x 4 levels) are independent; the
    # native C++ builder releases the GIL for the duration of the call, so
    # a thread pool scales them across host cores (VERDICT r3 next #3).
    # Serial on 1-worker hosts / tiny inputs where pool overhead dominates.
    workers = min(int(params.get("branch_workers", 0) or 0), len(jobs))
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            results = list(ex.map(run, jobs))
    else:
        results = [run(j) for j in jobs]
    out = {"cubic": [], "sphere": []}
    for j, r in zip(jobs, results):
        out[j[0]].append(r)
    return out
