"""Benchmark suite: production-scale throughput table on the local device.

Default (no args): runs the full row table — each row in its OWN subprocess
(the sandbox tunnel's execution regime is a permanent per-process state,
see below, so rows must not share a process) — writes the full table into
``RESULTS.md`` + ``BENCH_LOCAL.json``, and prints a COMPACT one-line JSON
summary as the FINAL stdout line (VERDICT r4 weak #3: the driver artifact
keeps only the last ~4 KB of stdout, so the parseable line must be small
and last, and the full evidence must land in tracked files).

Timing regimes (round-5 correction; VERDICT r4 weak #4):
The axon tunnel runs in one of two per-process regimes:
  pipelined  before any device-to-host read, dispatch is asynchronous AND
             ``block_until_ready`` on queued work returns WITHOUT waiting
             (measured: a 4096^3 bf16 matmul "completes" at 2630 TF/s on a
             197 TF/s chip). Rounds 1-4 timed all rows here ("fetch-free"
             protocol) — those step times are dispatch-rate numbers, which
             is why eval rows reported mfu_floor > 1.
  sync       after ONE scalar D2H read the process permanently serializes:
             ``block_until_ready`` becomes a true barrier (verified: a
             single-dispatch 100-chained-matmul program times at 142 TF/s
             = 72% MFU, physically sane). The same regime adds per-step
             tunnel staging overhead for donated state, so sync time is an
             UPPER bound on true chip step time.
Both regimes agree on ONE measurement: a SINGLE in-flight dispatch is
waited for correctly everywhere (the known-FLOPs probe: one dispatch of a
100-chained-matmul program times at 142 TF/s fetch-free = physically
sane). Round-5 headline protocol ("chained") exploits that: compile a
one-dispatch k-step chain of the train step (k is a TRACED loop bound —
one compile serves every k) and time dispatches at two chain lengths; the
SLOPE (t_big - t_small)/(k_big - k_small) is the true per-step chip time
with the per-dispatch tunnel overhead cancelled exactly. MFU from the
slope must satisfy mfu_floor <= 1 — enforced, a violating row FAILS
rather than ships (VERDICT r4 next #4). ``--regime=sync`` keeps the
upper-bound protocol (one D2H flip, per-step barrier: step time includes
per-dispatch staging) and ``--regime=pipelined`` keeps the r1-r4
dispatch-rate protocol for continuity with BENCH_BASELINE.json; true step
time satisfies pipelined <= chained <= sync, which the teacher_8k twin
rows document empirically.

Row modes (also usable directly):
  --row=NAME            one table row, prints the row JSON
  --student / --e2e / --infer / (default teacher)   legacy single-row modes
  --points= --batch= --cap0= --cr= --voxel= --tpoints= --cams= ...
  --regime=pipelined    old fetch-free protocol (continuity only; MFU
                        fields suppressed — unreliable in this regime)

MFU reporting (VERDICT r3 weak #1): three numbers per device row —
  mfu_floor  XLA cost-analysis FLOPs only (pallas custom calls invisible),
  mfu        TRUE: XLA FLOPs + USEFUL pallas pair FLOPs (Σc² live window
             pairs — the reference's own precompute_all pair count),
  mfu_bound  XLA FLOPs + pallas trip-count FLOPs (counts padded tiles).
The ``mfu`` field is the honest headline; floor/bound bracket it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# pinned measurement protocol (VERDICT r3 weak #2: cross-run variance on the
# tunnel is large; the protocol ships inside the BENCH artifact itself)
PROTOCOL = {"windows": 3, "iters": "adaptive (10 / 5 / 3 by step size)",
            "estimator": "min-of-windows slope", "regime": "chained",
            "note": "chained regime: one-dispatch k-step chain of the "
                    "step (k a traced loop bound, one compile), timed at "
                    "two chain lengths; the slope is the true per-step "
                    "chip time with per-dispatch tunnel overhead "
                    "cancelled (a single in-flight dispatch is waited "
                    "for correctly in both tunnel regimes — known-FLOPs "
                    "probe, PERF.md round 5). --regime=sync keeps the "
                    "per-step-barrier upper bound; --regime=pipelined "
                    "keeps the r1-r4 dispatch-rate protocol for "
                    "continuity. true step: pipelined <= chained <= sync."}

# The full table (VERDICT r3 next #2): full-capacity teacher (headline),
# paper-width cr_t=2.0 teacher at 0.05 m geometry, continuity row at 8k,
# inference, production-scale student TSD (train 3-cam + eval 6-cam), and
# the loader-fed end-to-end row at full capacity (next #3).
ROWS = {
    "teacher_full": ["--points=131072", "--cap0=131072", "--batch=1"],
    "teacher_crt2_full": ["--points=131072", "--cap0=131072", "--batch=1",
                          "--cr=2.0", "--voxel=0.05"],
    "teacher_8k": ["--points=8192", "--batch=2"],
    # r1-r4-protocol twin of teacher_8k: same program, fetch-free regime —
    # the ONLY row comparable to the recorded BENCH_BASELINE.json value
    "teacher_8k_pipelined": ["--points=8192", "--batch=2",
                             "--regime=pipelined"],
    # per-step-barrier twin: upper-bounds true step time (includes the
    # per-dispatch tunnel staging the chained slope cancels); documents
    # pipelined <= chained <= sync empirically
    "teacher_8k_sync": ["--points=8192", "--batch=2", "--regime=sync"],
    "infer_full": ["--infer", "--points=131072", "--cap0=131072",
                   "--batch=1"],
    "infer_8k": ["--infer", "--points=8192", "--batch=2"],
    # --split: the FUSED stage-2 program (student bwd + cr_t=2.0 multisweep
    # teacher + 3-cam image branch in one jit) exceeds the sandbox's remote
    # TPU compile helper at every production scale (HTTP 500; bisect in
    # COVERAGE.md round-5 notes). The two-program split step is
    # mathematically identical under stop_gradient (parity test
    # tests/test_tsd.py::test_split_steps_match_fused).
    "student_tsd": ["--student", "--points=32768", "--tpoints=131072",
                    "--batch=1", "--cams=3", "--split"],
    "student_tsd_eval6": ["--student-eval", "--points=32768",
                          "--tpoints=131072", "--batch=1", "--cams=6"],
    "e2e_full": ["--e2e", "--points=131072", "--batch=1", "--batches=10",
                 "--workers=4"],
}
ROW_ORDER = ["teacher_full", "teacher_8k", "teacher_8k_pipelined",
             "teacher_8k_sync", "teacher_crt2_full", "infer_full",
             "infer_8k", "student_tsd", "student_tsd_eval6", "e2e_full"]
HEADLINE = "teacher_full"


def _arg(name, default=None, cast=str):
    for a in sys.argv:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


# per-chip bf16 peak FLOP/s by jax device_kind prefix (longest match wins)
PEAK_BF16 = {
    "tpu v5 lite": 197e12,   # v5e
    "tpu v5e": 197e12,
    "tpu v5p": 459e12,
    "tpu v5": 459e12,
    "tpu v4": 275e12,
    "tpu v6 lite": 918e12,   # Trillium
    "tpu v6e": 918e12,
}


def device_peak_flops():
    """(peak FLOP/s, device_kind) for the local accelerator, or (None, kind)
    when the generation is unknown — MFU is then not reported rather than
    silently wrong (ADVICE r2)."""
    import jax

    kind = jax.devices()[0].device_kind
    kl = kind.lower()
    best = None
    for prefix, peak in PEAK_BF16.items():
        if kl.startswith(prefix) and (best is None or len(prefix) > best[0]):
            best = (len(prefix), peak)
    return (best[1] if best else None), kind


def xla_cost_flops(jitted, args):
    """Nominal HLO FLOPs of the compiled program (pallas custom calls are
    NOT included), or None when cost analysis is unavailable."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def mfu_triple(jitted, args, step_seconds, platform, model=None, pl=None,
               train=True, xla_override=None, contribs=None):
    """(mfu_floor, mfu_true, mfu_bound, device_kind) — see module
    docstring. All None on CPU/unknown chips or when cost analysis fails.
    ``xla_override``: precomputed XLA FLOPs (the split step sums two
    programs). ``contribs``: list of (model, plumbing, train) pallas
    attention contributions (the TSD rows sum student + teacher)."""
    peak, kind = (None, "cpu") if platform == "cpu" else device_peak_flops()
    if peak is None:
        return None, None, None, kind
    xla = xla_override if xla_override is not None \
        else xla_cost_flops(jitted, args)
    if xla is None:
        return None, None, None, kind
    if contribs is None:
        contribs = [(model, pl, train)] if model is not None else []
    useful = bound = 0.0
    for m, p, tr in contribs:
        if m is None or p is None or p.get("wgeom") is None:
            continue
        from u2mkd_tpu.utils.flops import (
            flash_attention_flops, flash_attention_useful_flops,
        )

        useful += flash_attention_useful_flops(m, p, train=tr)
        bound += flash_attention_flops(m, p, train=tr)
    denom = step_seconds * peak
    return xla / denom, (xla + useful) / denom, (xla + bound) / denom, kind


def _regime() -> str:
    r = _arg("regime")
    return r if r in ("pipelined", "sync") else "chained"


def _mfu_fields(floor, true, bound, kind):
    if true is None or _regime() == "pipelined":
        # pipelined times are dispatch-rate numbers -> MFU from them is
        # meaningless; suppress instead of shipping impossible figures
        return {}
    if floor > 1.0 + 1e-6:
        # Enforced invariant (VERDICT r4 next #4): the XLA cost-analysis
        # FLOPs are exact (verified against a known matmul, ratio 1.000),
        # so floor > 1 can only mean the measured time is not a true
        # barrier -> the row must fail loudly, never ship.
        raise RuntimeError(
            f"mfu_floor={floor:.3f} > 1 is physically impossible: the "
            f"timing regime is not synchronous (sync flip missing or "
            f"ineffective); refusing to report this row"
        )
    return {"mfu": round(true, 4), "mfu_floor": round(floor, 4),
            "mfu_bound": round(bound, 4), "mfu_peak_of": kind}


def _sync_flip(x) -> float:
    """Enter the tunnel's synchronous regime with ONE scalar D2H read
    (permanent for this process). Returns the flip cost in seconds. Cheap
    (~1 s) when at most one step is outstanding — call right after the
    compile/warmup step. No-op under --regime=pipelined."""
    if _regime() == "pipelined":
        return 0.0
    import jax

    t0 = time.time()
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    return time.time() - t0


def _zeros_like_shape(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), tree
    )


def _chain_train(fn):
    """jit of ``(state, batch, rng, k) -> (state, aux)``: k steps of the
    (unjitted) step ``fn`` in ONE dispatch. ``k`` is a traced loop bound —
    the while loop has a dynamic trip count, so one compile serves every
    chain length. The program contains exactly ONE copy of the step (the
    init carry's aux comes from ``eval_shape``), so (a) its compile cost
    equals the plain step's and (b) ``cost_analysis()['flops']`` equals
    ONE step's flops exactly (XLA counts a dynamic-trip-count while body
    once — verified against a known matmul)."""
    import jax

    def chained(state, batch, rng, k):
        def body(i, carry):
            st, _ = carry
            return fn(st, batch, jax.random.fold_in(rng, i))

        aux0 = _zeros_like_shape(
            jax.eval_shape(fn, state, batch, rng)[1]
        )
        return jax.lax.fori_loop(0, k, body, (state, aux0))

    return jax.jit(chained)


def _chain_eval(fn, apply_eps, probe):
    """jit of ``(state, batch, k) -> out``: k evals of ``fn`` in ONE
    dispatch. The eval step has no state threading, so each iteration
    feeds a runtime-computed epsilon (``probe(prev_out) * 1e-30``, exactly
    neutral numerically) back into the input via ``apply_eps`` — a data
    dependence XLA cannot hoist, preventing loop-invariant code motion
    from collapsing the chain to one eval. Like ``_chain_train``, the
    program holds ONE copy of the eval (init from ``eval_shape``):
    compile cost and cost-analysis flops equal the plain step's."""
    import jax
    import jax.numpy as jnp

    def chained(state, batch, k):
        def body(i, carry):
            eps, _ = carry
            out = fn(state, apply_eps(batch, eps))
            return (probe(out).astype(jnp.float32) * 1e-30, out)

        out0 = _zeros_like_shape(jax.eval_shape(fn, state, batch))
        _, out = jax.lax.fori_loop(
            0, k, body, (jnp.float32(0.0), out0)
        )
        return out

    return jax.jit(chained)


def _time_chained(run_k, quick, est_step):
    """Slope timing: min-of-windows at two chain lengths; the slope
    (t_big - t_small)/(k_big - k_small) is the per-step device time with
    the per-dispatch tunnel overhead cancelled. Returns
    (dt_per_step, (k_small, k_big), overhead_seconds)."""
    est_step = max(est_step, 1e-4)
    k_small = 3
    # target ~1.5 s of device time across the k delta so per-dispatch
    # jitter is <1% of the measured slope
    k_big = k_small + max(7, min(400, int(round(1.5 / est_step))))
    if quick:
        k_big = min(k_big, k_small + 12)
    windows = 1 if quick else PROTOCOL["windows"]
    t_small = t_big = float("inf")
    for _ in range(windows):
        t0 = time.time()
        run_k(k_small)
        t_small = min(t_small, time.time() - t0)
        t0 = time.time()
        run_k(k_big)
        t_big = min(t_big, time.time() - t0)
    dt = max((t_big - t_small) / (k_big - k_small), 1e-9)
    overhead = max(t_small - k_small * dt, 0.0)
    return dt, (k_small, k_big), overhead


def _pick_iters(est_seconds: float, quick: bool) -> int:
    if quick:
        return 3
    if est_seconds < 0.3:
        return 10
    if est_seconds < 2.0:
        return 5
    return 3


def _timing_windows(run_once, quick=False, est=0.0):
    """min-of-k protocol; returns (seconds/iter, iters-per-window).

    In the sync regime (default) ``run_once``'s trailing
    ``block_until_ready`` is a true barrier, so wall/iters is honest. In
    --regime=pipelined this reproduces the r1-r4 fetch-free protocol."""
    iters = _pick_iters(est, quick)
    windows = 1 if quick else PROTOCOL["windows"]
    dt = float("inf")
    for _ in range(windows):
        t0 = time.time()
        run_once(iters)
        dt = min(dt, (time.time() - t0) / iters)
    return dt, iters


def bench_teacher(num_points, batch_size, cap0=None, cr=1.0, voxel=0.1,
                  infer=False, quick=False, remat=False, pallas=True,
                  pallas_cubic=True, host_plumbing=True):
    """Teacher step row (train fwd+bwd+SGD, or jitted eval when infer)."""
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.train import optim, state as train_state
    from __graft_entry__ import _teacher_model

    platform = jax.devices()[0].platform
    cap0 = cap0 or num_points
    caps = (cap0, cap0 // 2, cap0 // 4, cap0 // 8, cap0 // 16)
    model = _teacher_model(num_classes=17, cr=cr, voxel_size=voxel,
                           pallas_attention=pallas, pallas_cubic=pallas_cubic)
    rng = np.random.RandomState(0)
    raw = synthetic.make_batch(rng, batch_size, num_points, voxel_size=voxel)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    host_ms, pl = 0.0, None
    if host_plumbing:
        from u2mkd_tpu.data import plumbing_host, wgeom_host

        wp = wgeom_host.params_from_model(model) if model.pallas_attention \
            else None
        t0 = time.time()
        pl = plumbing_host.batch_plumbing(
            raw["pcoords"], raw["xyz"], raw["pmask"], caps, wgeom_params=wp)
        host_ms = (time.time() - t0) * 1e3
        batch["plumbing"] = jax.tree_util.tree_map(jnp.asarray, pl)

    tx = optim.make_optimizer("sgd_spformer", 0.02)
    st = train_state.create_train_state(model, tx, batch, caps,
                                        jax.random.PRNGKey(0))
    dispatch_ms = None
    if infer:
        raw_eval = train_state.make_eval_step(model, caps, 17)
        if _regime() == "chained":
            # ONE compile: the loop-only chained program (same size and
            # cost-analysis flops as the plain step — see _chain_eval)
            def apply_eps(b, eps):
                b = dict(b)
                b["feats"] = b["feats"] + eps.astype(b["feats"].dtype)
                return b

            chain = _chain_eval(raw_eval, apply_eps,
                                lambda o: o["pred"][0, 0])
            t0 = time.time()
            cout = chain(st, batch, 3)
            jax.block_until_ready(cout["pred"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(cout["pred"])
            t0 = time.time()
            cout = chain(st, batch, 3)
            jax.block_until_ready(cout["pred"])
            est = (time.time() - t0) / 3

            def run_k(k):
                o = chain(st, batch, k)
                jax.block_until_ready(o["pred"])

            dt, ks, ovh = _time_chained(run_k, quick, est)
            iters, dispatch_ms = ks[1], ovh * 1e3
            fl, tr, bd, kind = mfu_triple(
                None, None, dt, platform, model=model, pl=pl, train=False,
                xla_override=xla_cost_flops(chain, (st, batch, 3)))
        else:
            fn = jax.jit(raw_eval)
            t0 = time.time()
            out = fn(st, batch)
            jax.block_until_ready(out["pred"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(out["pred"])
            t0 = time.time()
            out = fn(st, batch)
            jax.block_until_ready(out["pred"])
            est = time.time() - t0

            def run(iters):
                out = None
                for _ in range(iters):
                    out = fn(st, batch)
                jax.block_until_ready(out["pred"])

            dt, iters = _timing_windows(run, quick, est)
            fl, tr, bd, kind = mfu_triple(fn, (st, batch), dt, platform,
                                          model=model, pl=pl, train=False)
        loss = None
    else:
        raw_step = train_state.make_train_step(model, tx, caps, remat=remat)
        if _regime() == "chained":
            chain = _chain_train(raw_step)
            t0 = time.time()
            _, aux = chain(st, batch, jax.random.PRNGKey(1), 3)
            jax.block_until_ready(aux["loss"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(aux["loss"])
            t0 = time.time()
            _, aux = chain(st, batch, jax.random.PRNGKey(1), 3)
            jax.block_until_ready(aux["loss"])
            est = (time.time() - t0) / 3

            def run_k(k):
                _, a = chain(st, batch, jax.random.PRNGKey(2), k)
                jax.block_until_ready(a["loss"])

            dt, ks, ovh = _time_chained(run_k, quick, est)
            iters, dispatch_ms = ks[1], ovh * 1e3
            loss = float(aux["loss"])
            fl, tr, bd, kind = mfu_triple(
                None, None, dt, platform, model=model, pl=pl, train=True,
                xla_override=xla_cost_flops(
                    chain, (st, batch, jax.random.PRNGKey(1), 3)))
        else:
            fn = jax.jit(raw_step)
            t0 = time.time()
            st1, out = fn(st, batch, jax.random.PRNGKey(1))
            jax.block_until_ready(out["loss"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(out["loss"])
            state = {"st": st1, "out": out}
            t0 = time.time()
            state["st"], state["out"] = fn(state["st"], batch,
                                           jax.random.PRNGKey(1))
            jax.block_until_ready(state["out"]["loss"])
            est = time.time() - t0

            def run(iters):
                for i in range(iters):
                    state["st"], state["out"] = fn(state["st"], batch,
                                                   jax.random.PRNGKey(2 + i))
                jax.block_until_ready(state["out"]["loss"])

            dt, iters = _timing_windows(run, quick, est)
            loss = float(state["out"]["loss"])  # cheap in the sync regime
            fl, tr, bd, kind = mfu_triple(
                fn, (st, batch, jax.random.PRNGKey(1)), dt, platform,
                model=model, pl=pl, train=True)
    row = {
        "name": ("infer" if infer else "teacher") + f"_{num_points}",
        "scans_per_sec": round(batch_size / dt, 3),
        "step_ms": round(dt * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "sync_flip_s": round(flip_s, 1),
        "iters": iters,
        "regime": _regime(),
        "host_plumb_ms": round(host_ms, 1),
        "config": {"P": num_points, "B": batch_size, "cap0": cap0, "cr": cr,
                   "voxel": voxel, "platform": platform,
                   "mode": "infer" if infer else "train",
                   "precision": "bf16" if platform != "cpu" else "f32"},
        **({"dispatch_ms": round(dispatch_ms, 2)}
           if dispatch_ms is not None else {}),
        **({"loss": round(loss, 4)} if loss is not None else {}),
        **_mfu_fields(fl, tr, bd, kind),
    }
    return row


def bench_student(num_points, batch_size, t_points=None, num_cams=3,
                  im_hw=(360, 640), pallas=True, remat=False,
                  eval_step=False, quick=False, split=False):
    """Stage-2 TSD row: full distillation train step (student LiDAR+cams +
    frozen cr_t=2.0 multisweep teacher + 5 losses), or the student eval
    step (eval_step=True; 6 cams = the reference's val protocol)."""
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import plumbing_host, synthetic
    from u2mkd_tpu.models.tsd import TSDFull
    from u2mkd_tpu.train import distill, optim

    platform = jax.devices()[0].platform
    s_p = num_points
    t_p = t_points or num_points * 2
    s_caps = (s_p, s_p // 2, s_p // 4, s_p // 8, s_p // 16)
    t_caps = (t_p, t_p // 2, t_p // 4, t_p // 8, t_p // 16)
    rng = np.random.RandomState(0)
    raw = synthetic.make_multimodal_batch(
        rng, batch_size, s_p, t_p, voxel_size=0.1, num_cams=num_cams,
        im_hw=im_hw,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, raw)
    model = TSDFull(num_classes=17, cr=1.0, cr_t=2.0,
                    window_size=(0.6, 0.6, 0.6),
                    quant_size=(0.6 / 24,) * 3,
                    pallas_attention=pallas)
    t0 = time.time()
    wp = None
    if pallas:
        from u2mkd_tpu.data import wgeom_host

        wp = wgeom_host.params_from_model(model)
    pls = {}
    # host_ms = the recurring per-batch host cost of this mode. Student-only
    # eval never runs the teacher, so its (dominant, Pt=131k) plumbing is
    # NOT part of the timed cost (VERDICT r4 next #5) — it is still built
    # below, untimed, because state init runs the full wrapper once.
    feeds = (("student", s_caps),) if eval_step else \
        (("student", s_caps), ("teacher", t_caps))
    for key, caps in feeds:
        pls[key] = plumbing_host.batch_plumbing(
            raw[key]["pcoords"], raw[key]["xyz"], raw[key]["pmask"], caps,
            wgeom_params=wp,
        )
        batch[key]["plumbing"] = jax.tree_util.tree_map(jnp.asarray,
                                                        pls[key])
    host_ms = (time.time() - t0) * 1e3
    if eval_step:
        # init-only scaffolding, excluded from the per-batch host cost
        batch["teacher"]["plumbing"] = jax.tree_util.tree_map(
            jnp.asarray, plumbing_host.batch_plumbing(
                raw["teacher"]["pcoords"], raw["teacher"]["xyz"],
                raw["teacher"]["pmask"], t_caps, wgeom_params=wp))
    tx = distill.make_frozen_teacher_optimizer(
        optim.make_optimizer("sgd_spformer", 0.02)
    )
    st = distill.create_distill_state(
        model, tx, batch["student"], batch["teacher"], s_caps, t_caps,
        jax.random.PRNGKey(0),
    )
    dispatch_ms = None
    if eval_step:
        raw_eval = distill.make_distill_eval_step(model, s_caps, t_caps,
                                                  17, 0)
        s_contribs = [(model.make_student(), pls.get("student"), False)]
        if _regime() == "chained":
            def apply_eps(b, eps):
                b = dict(b)
                sb = dict(b["student"])
                sb["feats"] = sb["feats"] + eps.astype(sb["feats"].dtype)
                b["student"] = sb
                return b

            def probe(o):
                import jax as _j

                return _j.tree_util.tree_leaves(o["counts_vox"])[0].reshape(-1)[0]

            chain = _chain_eval(raw_eval, apply_eps, probe)
            t0 = time.time()
            cout = chain(st, batch, 3)
            jax.block_until_ready(cout["counts_vox"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(cout["counts_vox"])
            t0 = time.time()
            cout = chain(st, batch, 3)
            jax.block_until_ready(cout["counts_vox"])
            est = (time.time() - t0) / 3

            def run_k(k):
                o = chain(st, batch, k)
                jax.block_until_ready(o["counts_vox"])

            dt, ks, ovh = _time_chained(run_k, quick, est)
            iters, dispatch_ms = ks[1], ovh * 1e3
            fl, tr, bd, kind = mfu_triple(
                None, None, dt, platform, contribs=s_contribs,
                xla_override=xla_cost_flops(chain, (st, batch, 3)))
        else:
            fn = jax.jit(raw_eval)
            t0 = time.time()
            out = fn(st, batch)
            jax.block_until_ready(out["counts_vox"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(out["counts_vox"])
            t0 = time.time()
            out = fn(st, batch)
            jax.block_until_ready(out["counts_vox"])
            est = time.time() - t0

            def run(iters):
                out = None
                for _ in range(iters):
                    out = fn(st, batch)
                jax.block_until_ready(out["counts_vox"])

            dt, iters = _timing_windows(run, quick, est)
            fl, tr, bd, kind = mfu_triple(fn, (st, batch), dt, platform,
                                          contribs=s_contribs)
        loss = None
    else:
        contribs = [(model.make_student(), pls.get("student"), True),
                    (model.make_teacher(), pls.get("teacher"), False)]
        raw = None
        if split:
            fn = distill.make_distill_split_steps(model, tx, s_caps, t_caps,
                                                  remat=remat)
        else:
            raw = distill.make_distill_train_step(model, tx, s_caps, t_caps,
                                                  remat=remat)
        if _regime() == "chained":
            if split:
                # two programs -> two chains; per-step time is the sum of
                # the two slopes (a real train loop runs both every step)
                def apply_eps_t(b, eps):
                    b = dict(b)
                    tb = dict(b["teacher"])
                    tb["feats"] = tb["feats"] + eps.astype(tb["feats"].dtype)
                    b["teacher"] = tb
                    return b

                t_chain = _chain_eval(
                    fn.teacher_fn, apply_eps_t,
                    lambda o: o["x_vox_t2s"].reshape(-1)[0])

                def s_chained(state0, b, t2s, rng, k):
                    def body(i, carry):
                        st2, _ = carry
                        return fn.student_fn(st2, b, t2s,
                                             jax.random.fold_in(rng, i))

                    aux0 = _zeros_like_shape(jax.eval_shape(
                        fn.student_fn, state0, b, t2s, rng)[1])
                    return jax.lax.fori_loop(0, k, body, (state0, aux0))

                s_chain = jax.jit(s_chained)
                t0 = time.time()
                t2s_out = t_chain(st, batch, 3)
                jax.block_until_ready(t2s_out["x_vox_t2s"])
                _, aux = s_chain(st, batch, t2s_out, jax.random.PRNGKey(1), 3)
                jax.block_until_ready(aux["loss"])
                compile_s = time.time() - t0
                flip_s = _sync_flip(aux["loss"])
                t0 = time.time()
                tout = t_chain(st, batch, 3)
                jax.block_until_ready(tout["x_vox_t2s"])
                est_t = (time.time() - t0) / 3
                t0 = time.time()
                _, aux = s_chain(st, batch, t2s_out, jax.random.PRNGKey(1), 3)
                jax.block_until_ready(aux["loss"])
                est_s = (time.time() - t0) / 3

                def run_t(k):
                    o = t_chain(st, batch, k)
                    jax.block_until_ready(o["x_vox_t2s"])

                def run_s(k):
                    _, a = s_chain(st, batch, t2s_out,
                                   jax.random.PRNGKey(2), k)
                    jax.block_until_ready(a["loss"])

                dt_t, ks_t, ovh_t = _time_chained(run_t, quick, est_t)
                dt_s, ks_s, ovh_s = _time_chained(run_s, quick, est_s)
                dt = dt_t + dt_s
                iters = max(ks_t[1], ks_s[1])
                dispatch_ms = (ovh_t + ovh_s) * 1e3
                xla = sum(
                    xla_cost_flops(f, a) or 0.0
                    for f, a in (
                        (t_chain, (st, batch, 3)),
                        (s_chain,
                         (st, batch, t2s_out, jax.random.PRNGKey(1), 3))))
                fl, tr, bd, kind = mfu_triple(None, None, dt, platform,
                                              xla_override=xla or None,
                                              contribs=contribs)
            else:
                chain = _chain_train(raw)
                t0 = time.time()
                _, aux = chain(st, batch, jax.random.PRNGKey(1), 3)
                jax.block_until_ready(aux["loss"])
                compile_s = time.time() - t0
                flip_s = _sync_flip(aux["loss"])
                t0 = time.time()
                _, aux = chain(st, batch, jax.random.PRNGKey(1), 3)
                jax.block_until_ready(aux["loss"])
                est = (time.time() - t0) / 3

                def run_k(k):
                    _, a = chain(st, batch, jax.random.PRNGKey(2), k)
                    jax.block_until_ready(a["loss"])

                dt, ks, ovh = _time_chained(run_k, quick, est)
                iters, dispatch_ms = ks[1], ovh * 1e3
                fl, tr, bd, kind = mfu_triple(
                    None, None, dt, platform, contribs=contribs,
                    xla_override=xla_cost_flops(
                        chain, (st, batch, jax.random.PRNGKey(1), 3)))
            loss = float(aux["loss"])
        else:
            if not split:
                fn = jax.jit(raw)
            t0 = time.time()
            st1, aux = fn(st, batch, jax.random.PRNGKey(1))
            jax.block_until_ready(aux["loss"])
            compile_s = time.time() - t0
            flip_s = _sync_flip(aux["loss"])
            state = {"st": st1, "aux": aux}
            t0 = time.time()
            state["st"], state["aux"] = fn(state["st"], batch,
                                           jax.random.PRNGKey(1))
            jax.block_until_ready(state["aux"]["loss"])
            est = time.time() - t0

            def run(iters):
                for i in range(iters):
                    state["st"], state["aux"] = fn(state["st"], batch,
                                                   jax.random.PRNGKey(2 + i))
                jax.block_until_ready(state["aux"]["loss"])

            dt, iters = _timing_windows(run, quick, est)
            loss = float(state["aux"]["loss"])
            if split:
                t2s_out = fn.teacher_fn(st, batch)
                xla = sum(
                    xla_cost_flops(f, a) or 0.0
                    for f, a in (
                        (fn.teacher_fn, (st, batch)),
                        (fn.student_fn,
                         (st, batch, t2s_out, jax.random.PRNGKey(1)))))
                fl, tr, bd, kind = mfu_triple(None, None, dt, platform,
                                              xla_override=xla or None,
                                              contribs=contribs)
            else:
                fl, tr, bd, kind = mfu_triple(
                    fn, (st, batch, jax.random.PRNGKey(1)), dt, platform,
                    contribs=contribs)
    row = {
        "name": "student_tsd" + ("_eval" if eval_step else ""),
        "scans_per_sec": round(batch_size / dt, 3),
        "step_ms": round(dt * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "sync_flip_s": round(flip_s, 1),
        "iters": iters,
        "regime": _regime(),
        "host_plumb_ms": round(host_ms, 1),
        "config": {"Ps": s_p, "Pt": t_p, "B": batch_size, "cams": num_cams,
                   "im": list(im_hw), "cr": 1.0, "cr_t": 2.0,
                   "platform": platform,
                   "mode": "eval" if eval_step else "train",
                   **({"split": True} if split else {}),
                   "precision": "bf16" if platform != "cpu" else "f32"},
        **({"dispatch_ms": round(dispatch_ms, 2)}
           if dispatch_ms is not None else {}),
        **({"loss": round(loss, 4)} if loss is not None else {}),
        **_mfu_fields(fl, tr, bd, kind),
    }
    return row


def bench_e2e(num_points, batch_size, n_batches=10, workers=4, cap0=None):
    """Sustained END-TO-END teacher training throughput: fresh synthetic
    scans -> worker-pooled host plumbing + window geometry -> device train
    step, exactly the production loader pipeline. Includes the host cost
    and measures how well prefetch overlap hides it (VERDICT r3 next #3).
    NOTE: this sandbox has ONE physical host core, so host stages serialize
    here; the per-stage host breakdown is reported so the many-core
    projection is checkable."""
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import plumbing_host, synthetic, wgeom_host
    from u2mkd_tpu.data.prefetch import pipelined_map
    from u2mkd_tpu.train import optim, state as train_state
    from __graft_entry__ import _teacher_model

    platform = jax.devices()[0].platform
    cap0 = cap0 or num_points
    caps = (cap0, cap0 // 2, cap0 // 4, cap0 // 8, cap0 // 16)
    voxel_size = 0.1
    model = _teacher_model(num_classes=17, cr=1.0, voxel_size=voxel_size,
                           pallas_attention=True, pallas_cubic=True)
    wp = wgeom_host.params_from_model(model)

    host_stage_ms = {"synth": 0.0, "plumb": 0.0, "n": 0}

    def add_plumbing(raw):
        t0 = time.time()
        raw["plumbing"] = plumbing_host.batch_plumbing(
            raw["pcoords"], raw["xyz"], raw["pmask"], caps, wgeom_params=wp)
        host_stage_ms["plumb"] += (time.time() - t0) * 1e3
        host_stage_ms["n"] += 1
        return raw

    def batches(n, seed0):
        for i in range(n):
            t0 = time.time()
            rng = np.random.RandomState(seed0 + i)
            b = synthetic.make_batch(rng, batch_size, num_points,
                                     voxel_size=voxel_size)
            host_stage_ms["synth"] += (time.time() - t0) * 1e3
            yield b

    tx = optim.make_optimizer("sgd_spformer", 0.02)
    warm = jax.tree_util.tree_map(jnp.asarray,
                                  add_plumbing(next(batches(1, 999))))
    st = train_state.create_train_state(model, tx, warm, caps,
                                        jax.random.PRNGKey(0))
    step = jax.jit(train_state.make_train_step(model, tx, caps))
    t0 = time.time()
    st, out = step(st, warm, jax.random.PRNGKey(1))
    jax.block_until_ready(out["loss"])
    compile_s = time.time() - t0
    flip_s = _sync_flip(out["loss"])

    host_stage_ms.update(synth=0.0, plumb=0.0, n=0)
    t0 = time.time()
    i = 0
    for raw in pipelined_map(add_plumbing, batches(n_batches, 0), workers):
        batch = jax.tree_util.tree_map(jnp.asarray, raw)
        st, out = step(st, batch, jax.random.PRNGKey(2 + i))
        i += 1
    jax.block_until_ready(out["loss"])
    dt = (time.time() - t0) / n_batches
    n = max(host_stage_ms["n"], 1)
    return {
        "name": "teacher_e2e",
        "scans_per_sec": round(batch_size / dt, 3),
        "step_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "sync_flip_s": round(flip_s, 1),
        "regime": _regime(),
        "host_breakdown_ms": {
            "synthetic_gen": round(host_stage_ms["synth"] / n, 1),
            "plumbing_wgeom": round(host_stage_ms["plumb"] / n, 1),
        },
        "config": {"P": num_points, "B": batch_size, "cap0": cap0,
                   "batches": n_batches, "workers": workers,
                   "host_cores": os.cpu_count(), "platform": platform,
                   "mode": "train_e2e",
                   "precision": "bf16" if platform != "cpu" else "f32"},
        "loss": round(float(out["loss"]), 4),
    }


def _row_metric() -> str:
    if "--student-eval" in sys.argv:
        return "student_tsd_eval_scans_per_sec"
    if "--student" in sys.argv:
        return "student_tsd_train_scans_per_sec"
    if "--e2e" in sys.argv:
        return "teacher_train_e2e_scans_per_sec"
    if "--infer" in sys.argv:
        return "teacher_infer_scans_per_sec"
    return "teacher_train_scans_per_sec"


def _init_watchdog(seconds: int):
    """Emit the one JSON line and exit if jax backend init never returns.

    When the remote TPU tunnel is down, backend init (even under
    JAX_PLATFORMS=cpu with the tunnel plugin registered) can block forever
    in the plugin's relay retry loop; without this the driver records a
    hang instead of a result. A daemon THREAD (not SIGALRM — the main
    thread is blocked inside a C call, so a Python signal handler would
    never run) prints the line and hard-exits; cancelled via the returned
    Event as soon as devices enumerate."""
    import threading

    done = threading.Event()

    def fire():
        if done.wait(seconds):
            return
        print(json.dumps({
            "metric": _row_metric(),
            "value": 0.0,
            "unit": f"scans/sec (FAILED: jax backend init exceeded "
                    f"{seconds}s — TPU tunnel down?)",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(1)

    threading.Thread(target=fire, daemon=True).start()
    return done


def run_single_row():
    """One row in this process (called with --row=NAME or legacy flags)."""
    _watchdog_done = _init_watchdog(
        int(os.environ.get("U2MKD_BENCH_INIT_TIMEOUT", "900")))
    import jax

    jax.devices()
    _watchdog_done.set()

    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache()

    platform = jax.devices()[0].platform
    if platform != "cpu" and "--f32" not in sys.argv:
        from u2mkd_tpu.ops.precision import set_compute_dtype

        set_compute_dtype("bfloat16")

    quick = "--quick" in sys.argv
    if "--student" in sys.argv or "--student-eval" in sys.argv:
        sp = _arg("points", 2048 if quick else 4096, int)
        im = _arg("im", None)  # e.g. --im=360x640
        im_hw = tuple(int(v) for v in im.split("x")) if im else (360, 640)
        row = bench_student(
            sp, _arg("batch", 1, int), t_points=_arg("tpoints", None, int),
            num_cams=_arg("cams", 3, int), im_hw=im_hw,
            pallas="--no-pallas" not in sys.argv,
            remat="--remat" in sys.argv,
            eval_step="--student-eval" in sys.argv, quick=quick,
            split="--split" in sys.argv,
        )
    elif "--e2e" in sys.argv:
        row = bench_e2e(
            _arg("points", 2048 if quick else 8192, int),
            _arg("batch", 2, int),
            n_batches=_arg("batches", 8 if quick else 10, int),
            workers=_arg("workers", 4, int), cap0=_arg("cap0", None, int),
        )
    else:
        row = bench_teacher(
            _arg("points", 4096 if quick else 8192, int),
            _arg("batch", 2, int), cap0=_arg("cap0", None, int),
            cr=_arg("cr", 1.0, float), voxel=_arg("voxel", 0.1, float),
            infer="--infer" in sys.argv, quick=quick,
            remat="--remat" in sys.argv,
            pallas="--no-pallas" not in sys.argv,
            pallas_cubic="--no-pallas-cubic" not in sys.argv,
        )
    return row


def _legacy_line(row):
    """Single-row invocations keep the one-line contract."""
    cfgs = ", ".join(f"{k}={v}" for k, v in row["config"].items())
    vs = 1.0
    baseline_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if (row["config"].get("P") == 8192 and row["config"]["mode"] == "train"
            and os.path.exists(baseline_path)):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = row["scans_per_sec"] / base["value"]
    print(json.dumps({
        "metric": _row_metric(),
        "value": row["scans_per_sec"],
        "unit": f"scans/sec ({cfgs}, step={row['step_ms']}ms, "
                f"compile={row['compile_s']}s"
                + (f", mfu={row['mfu'] * 100:.1f}% true "
                   f"[{row['mfu_floor'] * 100:.1f}% floor, "
                   f"{row['mfu_bound'] * 100:.1f}% bound]"
                   if "mfu" in row else "")
                + ")",
        "vs_baseline": round(vs, 3),
        "row": row,
        "protocol": PROTOCOL,
    }))


def run_table():
    """Default mode: every ROWS entry in its own subprocess; ONE JSON line
    with the full table, headline = full-capacity teacher row."""
    budget = float(os.environ.get("U2MKD_BENCH_BUDGET", "2700"))
    # The row timeout is a last-resort hang guard, NOT a budget control:
    # killing a row mid-remote-compile orphans the compile and WEDGES the
    # tunnel's compile helper for ~1.5 h (every later row then queues
    # behind the orphan — observed live in round 5). So the timeout is
    # generous, never shrunk by remaining budget, and a row that does hit
    # it aborts the whole table (the service must be presumed wedged).
    row_timeout = float(os.environ.get("U2MKD_BENCH_ROW_TIMEOUT", "3300"))
    only = os.environ.get("U2MKD_BENCH_ROWS")
    order = [r for r in ROW_ORDER if not only or r in only.split(",")]
    t_start = time.time()
    rows = []
    wedged = False
    for name in order:
        elapsed = time.time() - t_start
        if wedged:
            rows.append({"name": name, "skipped": "aborted: an earlier row "
                         "timed out (compile helper presumed wedged)"})
            continue
        if elapsed > budget and rows:
            rows.append({"name": name, "skipped": f"budget ({budget:.0f}s) "
                         f"exhausted after {elapsed:.0f}s"})
            continue
        cmd = [sys.executable, os.path.abspath(__file__),
               f"--row={name}"] + ROWS[name]
        try:
            res = subprocess.run(
                cmd, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True, timeout=row_timeout,
            )
            line = [l for l in res.stdout.splitlines()
                    if l.startswith("{")]
            if res.returncode == 0 and line:
                parsed = json.loads(line[-1])
                # subprocess prints the legacy wrapper; the table carries
                # the inner row (the wrapper's value/unit are redundant)
                row = parsed.get("row", parsed)
                row["name"] = name
                rows.append(row)
            else:
                rows.append({"name": name,
                             "failed": res.stdout[-500:] or "no output"})
        except subprocess.TimeoutExpired:
            rows.append({"name": name,
                         "failed": f"row timeout ({row_timeout:.0f}s)"})
            wedged = True
        except Exception as e:  # noqa: BLE001 — record, keep benching
            rows.append({"name": name, "failed": f"{type(e).__name__}: {e}"})

    def by_name(name):
        return next((r for r in rows if r.get("name") == name
                     and "scans_per_sec" in r), None)

    # headline = full-capacity teacher; degrade to the 8k row (and note it)
    # rather than reporting 0 if the big row failed/was skipped
    head = by_name(HEADLINE)
    k8 = by_name("teacher_8k")
    k8p = by_name("teacher_8k_pipelined")
    degraded = False
    if head is None and k8 is not None:
        head, degraded = k8, True
    # vs_baseline: regime-consistent — the pipelined 8k twin against the
    # round-1 recorded (pipelined-regime) baseline value
    vs = 0.0
    baseline_path = os.path.join(REPO, "BENCH_BASELINE.json")
    base = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
    if k8p and base.get("value"):
        vs = k8p["scans_per_sec"] / base["value"]
    vs_sync = None
    if k8 and base.get("value_sync"):
        vs_sync = round(k8["scans_per_sec"] / base["value_sync"], 3)
    if head:
        scale = ("P=8192 x B=2 (FALLBACK: full-capacity row unavailable)"
                 if degraded else "P=131072 FULL multisweep capacity, B=1")
        unit = (f"scans/sec (teacher train, {scale}, bf16, chained slope "
                f"protocol, step={head['step_ms']}ms"
                + (f", mfu={head['mfu'] * 100:.1f}% true "
                   f"[{head['mfu_floor'] * 100:.1f}%..."
                   f"{head['mfu_bound'] * 100:.1f}%]" if "mfu" in head
                   else "")
                + "; vs_baseline = pipelined 8k twin over the round-1 "
                  "recorded pipelined 8k run; full table in RESULTS.md + "
                  "BENCH_LOCAL.json)")
        value = head["scans_per_sec"]
        mfu = head.get("mfu")
    else:
        unit = "scans/sec (FAILED: headline row missing; see rows)"
        value, mfu = 0.0, None
    full = {
        "metric": "teacher_train_full_capacity_scans_per_sec",
        "value": value,
        "unit": unit,
        "vs_baseline": round(vs, 3),
        **({"vs_baseline_sync": vs_sync} if vs_sync is not None else {}),
        **({"mfu": mfu} if mfu is not None else {}),
        "rows": rows,
        "protocol": PROTOCOL,
    }
    # full evidence -> tracked files (VERDICT r4 weak #3 / next #3)
    try:
        with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
            json.dump(full, f, indent=1)
        _write_results_md(rows, full)
    except Exception as e:  # noqa: BLE001 — evidence write must not kill the line
        print(f"[bench] RESULTS.md/BENCH_LOCAL.json write failed: {e}",
              file=sys.stderr)
    # compact per-row summary as the FINAL stdout line (< 4 KB so the
    # driver's tail capture parses it and every row's outcome survives)
    print(json.dumps({
        "metric": full["metric"],
        "value": value,
        "unit": unit[:200],
        "vs_baseline": round(vs, 3),
        **({"vs_baseline_sync": vs_sync} if vs_sync is not None else {}),
        "rows": [_compact_row(r) for r in rows],
        "protocol": {"regime": PROTOCOL["regime"],
                     "estimator": PROTOCOL["estimator"]},
    }))


def _compact_row(r):
    if "scans_per_sec" not in r:
        key = "failed" if "failed" in r else "skipped"
        return {"name": r.get("name"), key: str(r.get(key))[-120:]}
    out = {"name": r.get("name"), "v": r["scans_per_sec"],
           "ms": r.get("step_ms")}
    if "mfu" in r:
        out["mfu"] = r["mfu"]
    if r.get("regime") in ("pipelined", "sync"):
        out["regime"] = r["regime"]
    if "host_plumb_ms" in r and r["host_plumb_ms"] > 100:
        out["host_ms"] = r["host_plumb_ms"]
    return out


def _markdown_table(rows):
    lines = [
        "| row | scans/s | step ms | compile s | host ms | MFU true "
        "[floor..bound] | loss | notes |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        name = r.get("name", "?")
        if "scans_per_sec" not in r:
            why = str(r.get("failed", r.get("skipped", "?")))[-140:]
            why = why.replace("|", "/").replace("\n", " ")
            lines.append(f"| {name} | — | — | — | — | — | — | {why} |")
            continue
        mfu = (f"{r['mfu']*100:.1f}% [{r['mfu_floor']*100:.1f}.."
               f"{r['mfu_bound']*100:.1f}]" if "mfu" in r else "—")
        host = r.get("host_plumb_ms")
        if host is None and "host_breakdown_ms" in r:
            host = sum(r["host_breakdown_ms"].values())
        notes = []
        if r.get("regime") == "pipelined":
            notes.append("pipelined regime (r1-r4 continuity)")
        elif r.get("regime") == "sync":
            notes.append("sync regime (per-step barrier upper bound)")
        if "dispatch_ms" in r:
            notes.append(f"dispatch={r['dispatch_ms']}ms")
        if "iters" in r:
            notes.append(f"iters={r['iters']}")
        lines.append(
            f"| {name} | {r['scans_per_sec']} | {r.get('step_ms', '—')} | "
            f"{r.get('compile_s', '—')} | "
            f"{host if host is not None else '—'} | {mfu} | "
            f"{r.get('loss', '—')} | {', '.join(notes) or '—'} |"
        )
    return "\n".join(lines)


RESULTS_BEGIN = "<!-- BENCH_TABLE_BEGIN (written by bench.py) -->"
RESULTS_END = "<!-- BENCH_TABLE_END -->"


def _write_results_md(rows, full):
    """Write the measured table into RESULTS.md between the marker pair
    (idempotent; creates the section before '## Historical' if absent)."""
    import datetime

    path = os.path.join(REPO, "RESULTS.md")
    if not os.path.exists(path):
        return
    with open(path) as f:
        txt = f.read()
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    block = (
        f"{RESULTS_BEGIN}\n"
        f"Measured {stamp} by `python bench.py` (single v5e chip, chained "
        f"slope protocol unless noted; full JSON: `BENCH_LOCAL.json`). "
        f"Headline: "
        f"**{full['value']} scans/s** — {full['unit'][:160]}\n\n"
        + _markdown_table(rows) + f"\n{RESULTS_END}"
    )
    if RESULTS_BEGIN in txt and RESULTS_END in txt:
        pre = txt.split(RESULTS_BEGIN)[0]
        post = txt.split(RESULTS_END, 1)[1]
        txt = pre + block + post
    else:
        anchor = "## Historical headline progression"
        section = f"## Latest measured table\n\n{block}\n\n"
        if anchor in txt:
            txt = txt.replace(anchor, section + anchor, 1)
        else:
            txt = txt + "\n" + section
    with open(path, "w") as f:
        f.write(txt)


def main():
    single = ("--row" in " ".join(sys.argv) or "--student" in sys.argv
              or "--student-eval" in sys.argv or "--e2e" in sys.argv
              or "--infer" in sys.argv or "--quick" in sys.argv
              or "--points" in " ".join(sys.argv))
    if single:
        row = run_single_row()
        _legacy_line(row)
    else:
        run_table()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit the one JSON line the driver expects
        print(json.dumps({
            "metric": _row_metric(),
            "value": 0.0,
            "unit": f"scans/sec (FAILED: {type(e).__name__}: {str(e)[:200]})",
            "vs_baseline": 0.0,
        }))
        raise SystemExit(1)
