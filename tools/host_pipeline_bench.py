"""Host-pipeline scaling microbenchmark (VERDICT r3 next #3).

Measures the loader's host stages in isolation — synthetic scan gen +
full plumbing (conv rulebooks + window geometry) — through the production
`maybe_pipelined` pipeline at several worker counts, threads vs processes.

On a many-core production host the per-batch stages parallelize across
workers; this sandbox has ONE physical core, so the expected result here is
a FLAT curve (no speedup, bounded pool/pickle overhead) — the point is to
prove the architecture moves work off the consumer thread without
regression, and to publish the per-batch host cost that the device step
must be overlapped against (RESULTS.md).

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python tools/host_pipeline_bench.py \
            [--points=65536] [--batches=6] [--workers=1,2,4]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _arg(name, default, cast):
    for a in sys.argv:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from u2mkd_tpu.data import synthetic, wgeom_host
    from u2mkd_tpu.data.loaders import PlumbingStage
    from u2mkd_tpu.data.prefetch import maybe_pipelined
    from __graft_entry__ import _teacher_model

    P = _arg("points", 65536, int)
    n_batches = _arg("batches", 6, int)
    worker_counts = [int(w) for w in
                     _arg("workers", "1,2,4", str).split(",")]
    caps = (P, P // 2, P // 4, P // 8, P // 16)
    voxel = 0.1
    model = _teacher_model(num_classes=17, cr=1.0, voxel_size=voxel,
                           pallas_attention=True, pallas_cubic=True)
    wp = wgeom_host.params_from_model(model)
    stage = PlumbingStage(caps, wp)

    def batches():
        for i in range(n_batches):
            yield synthetic.make_batch(np.random.RandomState(i), 1, P,
                                       voxel_size=voxel)

    # inline per-batch cost (the number workers must amortize)
    b0 = next(batches())
    t0 = time.time()
    stage(dict(b0))
    inline_ms = (time.time() - t0) * 1e3

    rows = {}
    for use_proc in (False, True):
        for w in worker_counts:
            t0 = time.time()
            n = 0
            for _ in maybe_pipelined(stage, batches(), w, enabled=True,
                                     use_processes=use_proc):
                n += 1
            dt = (time.time() - t0) / n
            key = f"{'proc' if use_proc else 'thread'}_w{w}"
            rows[key] = round(dt * 1e3, 1)
    print(json.dumps({
        "metric": "host_pipeline_ms_per_batch",
        "P": P, "batches": n_batches, "host_cores": os.cpu_count(),
        "inline_ms": round(inline_ms, 1),
        "pipelined_ms": rows,
        "note": "1-core hosts: expect flat (architecture proof, not a "
                "speedup demo); production hosts scale ~1/workers until "
                "memory bandwidth",
    }))


if __name__ == "__main__":
    main()
