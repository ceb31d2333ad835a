"""Host-side plumbing precomputation (ctypes glue for pointcore).

Builds, per sample, every index structure the jitted step needs (see
``models/plumbing.py``) on the host — the device then spends its time on
MXU math instead of latency-bound binary searches (~250ms/step at V=4k).
Construction overlaps with device compute through the data loader.

Falls back to pure numpy (same algorithm, python-loop-free where possible)
when the native library is absent.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Sequence

import numpy as np

from u2mkd_tpu.data import native
from u2mkd_tpu.ops import spconv as _spconv


_KEYS = ("coords", "vmask", "nums", "nbr27", "down8", "parent", "koff",
         "voxxyz", "p2v", "dvi", "dvw")

# Pallas rulebook-conv tiling (ops/pallas/spconv_kernel.py): voxel rows are
# Morton-(z-order-)sorted so each output tile's 27-neighborhood rows cluster
# into a handful of source tiles; the kernel then visits only the packed
# per-tile source-tile list. BMAX bounds the list width (measured nonempty
# source tiles per output tile: p50=8, max=23 at V=131072 — 64 is ~3x head
# room; the builder raises if a sample ever exceeds it).
CONV_TILE = 128
CONV_BMAX = 64


def _conv_tile(cap: int) -> int:
    return min(CONV_TILE, cap)


def _morton_code(coords: np.ndarray) -> np.ndarray:
    """Interleaved-bit z-order key [n] uint64 from int coords [n, 3]."""
    c = coords - coords.min(axis=0, keepdims=True)
    out = np.zeros(len(c), np.uint64)
    for b in range(16):
        for a in range(3):
            out |= ((c[:, a].astype(np.uint64) >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + a)
    return out


def _remap_vals(arr: np.ndarray, newpos: np.ndarray, n: int) -> np.ndarray:
    """Remap row-index VALUES through newpos, preserving anything outside
    [0, n) (-1 sentinels and capacity-drop indices)."""
    ok = (arr >= 0) & (arr < n)
    out = arr.copy()
    out[ok] = newpos[arr[ok]]
    return out


def _morton_permute_sample(buf: Dict[str, list], capacities) -> None:
    """In-place: re-order every level's voxel rows into Morton order and
    remap all row-valued index arrays consistently. Runs identically after
    the native and the numpy builders, so builder parity is unaffected."""
    nlev = len(capacities)
    perms, newposes, ns = [], [], []
    for li in range(nlev):
        n = int(buf["nums"][li][0])
        coords = buf["coords"][li][:n] // (1 << li)
        perm = np.argsort(_morton_code(coords), kind="stable")
        newpos = np.empty(n, np.int64)
        newpos[perm] = np.arange(n)
        perms.append(perm)
        newposes.append(newpos)
        ns.append(n)
    for li in range(nlev):
        perm, n = perms[li], ns[li]
        for key in ("coords", "voxxyz"):
            buf[key][li][:n] = buf[key][li][perm]
        # rows of THIS level permute; their values live in other tables
        nbr = buf["nbr27"][li]
        nbr[:, :n] = nbr[:, perm]
        nbr[:] = _remap_vals(nbr, newposes[li], n)
        if li >= 1:
            dn = buf["down8"][li]
            dn[:, :n] = dn[:, perm]
            dn[:] = _remap_vals(dn, newposes[li - 1], ns[li - 1])
        if li < nlev - 1:
            par = buf["parent"][li]
            par[:n] = par[perm]
            par[:] = _remap_vals(par, newposes[li + 1], ns[li + 1])
            kof = buf["koff"][li]
            kof[:n] = kof[perm]
        buf["p2v"][li][:] = _remap_vals(buf["p2v"][li], newposes[li], n)
        buf["dvi"][li][:] = _remap_vals(buf["dvi"][li], newposes[li], n)


def conv_plan_shapes(capacities, K: int = 27):
    """Static [nt, BMAX] / [nt] / [nt, K, 2] shapes per level for the conv
    tiling arrays (jlist / jcnt / kranges)."""
    shapes = []
    for cap in capacities:
        t = _conv_tile(cap)
        nt = cap // t
        shapes.append(((nt, CONV_BMAX), (nt,), (nt, K, 2)))
    return shapes


def _conv_ranges_sample(nbr: np.ndarray, cap: int, jl: np.ndarray,
                        jn: np.ndarray, kr: np.ndarray) -> None:
    """Fill the pallas conv tiling arrays for one level's [K, cap] rulebook.

    jl [nt, BMAX]: packed source-tile indices per output tile (sentinel nt)
    jn [nt]:       count of packed source tiles
    kr [nt, K, 2]: per-kernel-offset [lo, hi) source-tile range (hi=0 empty)
    """
    K = nbr.shape[0]
    t = _conv_tile(cap)
    nt = cap // t
    jl[:] = nt
    jn[:] = 0
    valid = (nbr >= 0) & (nbr < cap)
    src_tile = np.where(valid, nbr // t, 0).reshape(K, nt, t)  # [K, nt, t]
    vld = valid.reshape(K, nt, t)
    # per-(i, k) [lo, hi) ranges (vectorized min/max over the tile rows)
    lo = np.where(vld, src_tile, nt).min(axis=2).T        # [nt, K]
    hi = (np.where(vld, src_tile, -1).max(axis=2).T + 1)  # [nt, K]
    kr[:, :, 0] = np.where(hi > 0, lo, 0)
    kr[:, :, 1] = np.maximum(hi, 0)
    # packed nonempty source-tile list per output tile: presence matrix ->
    # row-sorted nonzeros
    pres = np.zeros((nt, nt), bool)
    ii = np.broadcast_to(np.arange(nt)[None, :, None], src_tile.shape)
    pres[ii[vld], src_tile[vld]] = True
    rows, cols = np.nonzero(pres)
    counts = np.bincount(rows, minlength=nt)
    if counts.max(initial=0) > CONV_BMAX:
        raise RuntimeError(
            f"conv tiling: {counts.max()} source tiles for one output tile "
            f"> CONV_BMAX={CONV_BMAX} — Morton banding assumption violated"
        )
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    jl[rows, np.arange(len(rows)) - offs[rows]] = cols
    jn[:] = counts


def _alloc_sample(p: int, capacities: Sequence[int],
                  lead: tuple = ()) -> Dict[str, list]:
    """Plumbing output buffers, one array per (key, level), with an optional
    leading batch axis so per-sample builds can write straight into the
    batch-major tensors the jitted step consumes (no stack/copy)."""
    cps = conv_plan_shapes(capacities)
    return dict(
        coords=[np.zeros(lead + (c, 3), np.int32) for c in capacities],
        vmask=[np.zeros(lead + (c,), np.uint8) for c in capacities],
        nums=[np.zeros(lead + (1,), np.int32) for _ in capacities],
        nbr27=[np.zeros(lead + (27, c), np.int32) for c in capacities],
        down8=[np.zeros(lead + (8, c), np.int32) for c in capacities],
        parent=[np.zeros(lead + (c,), np.int32) for c in capacities],
        koff=[np.zeros(lead + (c,), np.int32) for c in capacities],
        voxxyz=[np.zeros(lead + (c, 3), np.float32) for c in capacities],
        p2v=[np.zeros(lead + (p,), np.int32) for _ in capacities],
        dvi=[np.zeros(lead + (p, 8), np.int32) for _ in capacities],
        dvw=[np.zeros(lead + (p, 8), np.float32) for _ in capacities],
        # pallas rulebook-conv tiling (filled host-side after the build)
        cr27jl=[np.zeros(lead + s[0], np.int32) for s in cps],
        cr27jn=[np.zeros(lead + s[1], np.int32) for s in cps],
        cr27kr=[np.zeros(lead + s[2], np.int32) for s in cps],
    )


def build_plumbing_arrays(pcoords: np.ndarray, pxyz: np.ndarray,
                          pmask: np.ndarray, capacities: Sequence[int],
                          into: Dict[str, list] = None) -> Dict[str, list]:
    """Per-sample host plumbing. Returns dict of per-level array lists.

    ``into`` (optional) supplies the output buffers — per-level C-contiguous
    views into batch-major arrays (``_alloc_sample(..., lead=(B,))[k][li][i]``)
    — so ``batch_plumbing`` never stacks: at P=131k the np.stack copies cost
    ~45ms/sample (~100MB of index arrays re-copied once per sample, growing
    with B; PERF.md round 4).
    """
    lib = native._load()
    if lib is None or not hasattr(lib, "build_plumbing_host"):
        out = _numpy_build(pcoords, pxyz, pmask, capacities)
        buf = into if into is not None else _alloc_sample(len(pcoords),
                                                          capacities)
        for k in _KEYS:
            for dst, src in zip(buf[k], out[k]):
                np.copyto(dst, src)
        _finalize_sample(buf, capacities)
        return buf
    n_levels = len(capacities)
    p = len(pcoords)
    caps = np.asarray(capacities, np.int64)
    pc = np.ascontiguousarray(pcoords, np.float32)
    px = np.ascontiguousarray(pxyz, np.float32)
    pm = np.ascontiguousarray(pmask, np.uint8)

    buf = into if into is not None else _alloc_sample(p, capacities)
    for k in _KEYS:
        for a in buf[k]:
            assert a.flags.c_contiguous, (k, a.shape)
    (coords, vmask, nums, nbr27, down8, parent, koff, voxxyz, p2v, dvi,
     dvw) = (buf[k] for k in _KEYS)

    def ptrs(arrs, ct):
        t = ctypes.POINTER(ct) * len(arrs)
        return t(*[a.ctypes.data_as(ctypes.POINTER(ct)) for a in arrs])

    lib.build_plumbing_host(
        pc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(p),
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(n_levels),
        ptrs(coords, ctypes.c_int32), ptrs(vmask, ctypes.c_uint8),
        ptrs(nums, ctypes.c_int32), ptrs(nbr27, ctypes.c_int32),
        ptrs(down8, ctypes.c_int32), ptrs(parent, ctypes.c_int32),
        ptrs(koff, ctypes.c_int32), ptrs(voxxyz, ctypes.c_float),
        ptrs(p2v, ctypes.c_int32), ptrs(dvi, ctypes.c_int32),
        ptrs(dvw, ctypes.c_float),
    )
    _finalize_sample(buf, capacities)
    return buf


def _finalize_sample(buf: Dict[str, list], capacities) -> None:
    """Post-build host pass: Morton row order + pallas conv tiling arrays."""
    _morton_permute_sample(buf, capacities)
    for li, cap in enumerate(capacities):
        _conv_ranges_sample(
            buf["nbr27"][li], cap, buf["cr27jl"][li], buf["cr27jn"][li],
            buf["cr27kr"][li],
        )


def batch_plumbing(pcoords: np.ndarray, pxyz: np.ndarray, pmask: np.ndarray,
                   capacities: Sequence[int], wgeom_params: Dict = None,
                   n_shards: int = 1, workers: int = None) -> Dict[str, list]:
    """Build + stack plumbing for a whole [B, P, ...] batch.

    ``wgeom_params`` (from ``wgeom_host.params_from_cfg/params_from_model``)
    additionally precomputes the per-level/per-branch window geometry for the
    flash attention path. ``n_shards`` must equal the number of data-parallel
    shards the batch will be split into (the geometry flattens each shard's
    sub-batch into one window-sorted sequence; arrays get a leading [S] axis
    so they shard over the data mesh axis like every other batch leaf).
    """
    b = len(pcoords)
    # batch-major output buffers up front; each per-sample build writes
    # straight into its [i] slice (C-contiguous view), so no np.stack copy
    # ever happens (~45ms and ~100MB of re-copying per sample at P=131k)
    out = _alloc_sample(pcoords.shape[1], capacities, lead=(b,))

    def _build(i):
        build_plumbing_arrays(
            pcoords[i], pxyz[i], pmask[i], capacities,
            into={k: [lv[i] for lv in out[k]] for k in out})

    # per-sample builds are independent; the native builder releases the
    # GIL, so a thread pool spreads a B>1 (data-parallel) batch across
    # host cores. Serial when B==1 or on 1-core hosts (pool overhead).
    import os as _os

    if workers is None:
        workers = _os.cpu_count() or 1
    workers = min(b, workers)
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_build, range(b)))
    else:
        for i in range(b):
            _build(i)
    if wgeom_params is not None:
        from u2mkd_tpu.data import wgeom_host

        assert b % n_shards == 0, (b, n_shards)
        bs = b // n_shards

        def shard_geom(s):
            sl = slice(s * bs, (s + 1) * bs)
            return wgeom_host.batch_window_geometry(
                [x[sl] for x in out["voxxyz"]],
                [m[sl] for m in out["vmask"]],
                wgeom_params,
            )

        # shards are independent too, but batch_window_geometry already
        # fans its 8 branch builds across cores — nesting pools on top
        # just adds contention, so shards stay serial here
        shard_geoms = [shard_geom(s) for s in range(n_shards)]
        out["wgeom"] = {
            branch: [
                {k: np.stack([sg[branch][li][k] for sg in shard_geoms])
                 for k in shard_geoms[0][branch][li]}
                for li in range(len(shard_geoms[0][branch]))
            ]
            for branch in shard_geoms[0]
        }
    return out


def _numpy_build(pcoords, pxyz, pmask, capacities):
    """numpy fallback (dict-based; slower, identical semantics)."""
    n_levels = len(capacities)
    p = len(pcoords)
    off3 = _spconv.kernel_offsets(3)
    off2 = _spconv.kernel_offsets(2)
    out = dict(coords=[], vmask=[], nums=[], nbr27=[], down8=[], parent=[],
               koff=[], voxxyz=[], p2v=[], dvi=[], dvw=[])
    maps: List[dict] = []
    level_coords: List[np.ndarray] = []
    # level 0
    ic = np.floor(pcoords).astype(np.int32)
    m0: dict = {}
    rows = np.full(p, -1, np.int32)
    for i in np.where(pmask)[0]:
        key = tuple(ic[i])
        if key not in m0:
            if len(m0) >= capacities[0]:
                continue
            m0[key] = len(m0)
        rows[i] = m0[key]
    maps.append(m0)
    c0 = np.zeros((capacities[0], 3), np.int32)
    for key, r in m0.items():
        c0[r] = key
    level_coords.append(c0)
    p2v0 = rows
    # coarser levels
    parents, koffs = [], []
    for li in range(1, n_levels):
        s2 = 1 << li
        sf = 1 << (li - 1)
        mL: dict = {}
        cL = np.zeros((capacities[li], 3), np.int32)
        par = np.full(capacities[li - 1], -1, np.int32)
        kof = np.zeros(capacities[li - 1], np.int32)
        lut = {tuple(o): k for k, o in enumerate(off2)}
        for v in range(len(maps[li - 1])):
            fc = level_coords[li - 1][v]
            pc = (np.floor_divide(fc, s2)) * s2
            key = tuple(pc)
            if key not in mL:
                if len(mL) >= capacities[li]:
                    continue
                mL[key] = len(mL)
                cL[mL[key]] = pc
            par[v] = mL[key]
            kof[v] = lut[tuple((fc - pc) // sf)]
        maps.append(mL)
        level_coords.append(cL)
        parents.append(par)
        koffs.append(kof)
    parents.append(np.full(capacities[-1], -1, np.int32))
    koffs.append(np.zeros(capacities[-1], np.int32))

    # mean xyz
    voxxyz = []
    sum0 = np.zeros((capacities[0], 3))
    cnt0 = np.zeros(capacities[0])
    ok = pmask & (p2v0 >= 0)
    np.add.at(sum0, p2v0[ok], pxyz[ok])
    np.add.at(cnt0, p2v0[ok], 1)
    mean0 = sum0 / np.maximum(cnt0, 1)[:, None]
    voxxyz.append(mean0.astype(np.float32))
    for li in range(1, n_levels):
        s2 = 1 << li
        sL = np.zeros((capacities[li], 3))
        cN = np.zeros(capacities[li])
        for v in range(len(maps[0])):
            pc = tuple((np.floor_divide(level_coords[0][v], s2)) * s2)
            r = maps[li].get(pc, -1)
            if r >= 0:
                sL[r] += mean0[v]
                cN[r] += 1
        voxxyz.append((sL / np.maximum(cN, 1)[:, None]).astype(np.float32))

    for li in range(n_levels):
        s = 1 << li
        mL = maps[li]
        cL = level_coords[li]
        nL = len(mL)
        vm = np.zeros(capacities[li], np.uint8)
        vm[:nL] = 1
        nbr = np.full((27, capacities[li]), -1, np.int32)
        for v in range(nL):
            for k in range(27):
                nbr[k, v] = mL.get(tuple(cL[v] + off3[k] * s), -1)
        dn = np.full((8, capacities[li]), -1, np.int32)
        if li >= 1:
            mF = maps[li - 1]
            sf = 1 << (li - 1)
            for v in range(nL):
                for k in range(8):
                    dn[k, v] = mF.get(tuple(cL[v] + off2[k] * sf), -1)
        # point queries
        pv = np.full(p, -1, np.int32)
        di = np.full((p, 8), -1, np.int32)
        dw = np.zeros((p, 8), np.float32)
        base = (np.floor(pcoords / s) * s).astype(np.int32)
        frac = pcoords / s - np.floor(pcoords / s)
        for i in np.where(pmask)[0]:
            pv[i] = mL.get(tuple(base[i]), -1)
            wsum = 0.0
            for k in range(8):
                q = tuple(base[i] + off2[k] * s)
                r = mL.get(q, -1)
                w = np.prod(np.where(off2[k] > 0, frac[i], 1 - frac[i]))
                di[i, k] = r
                dw[i, k] = w if r >= 0 else 0.0
                wsum += dw[i, k]
            dw[i] /= wsum + 1e-8
        out["coords"].append(cL)
        out["vmask"].append(vm)
        out["nums"].append(np.asarray([nL], np.int32))
        out["nbr27"].append(nbr)
        out["down8"].append(dn)
        out["parent"].append(parents[li])
        out["koff"].append(koffs[li])
        out["voxxyz"].append(voxxyz[li])
        out["p2v"].append(pv if li > 0 else p2v0)
        out["dvi"].append(di)
        out["dvw"].append(dw)
    return out
