"""Component-level timing: where does the train step spend its time?

Times, on the current default device, with HOST plumbing (the production
configuration since round 3 — PERF.md "Host-side window geometry"):

  (a) host plumbing build (numpy/C++, runs in the prefetch loader),
  (b) conv-only SPVCNN train step,
  (c) full teacher (conv + SphereFormer flash) train step,
  (d) per-level per-branch flash-kernel fwd+bwd on the REAL geometry of
      the same batch — the attention budget table (VERDICT r2 #7).

Prints one JSON line. ``--points=N`` scales the batch.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main_student():
    """Ablation of the stage-2 TSD distillation step: where do the ~9ms go?

    Times, on the current device with host plumbing/geometry:
      (a) full distill train step (student fwd+bwd + frozen teacher fwd +
          all 5 losses + SGD) — the bench.py --student row,
      (b) the same step with the teacher ablated (run_teacher=False,
          KD terms dropped) — student-side cost,
      (c) frozen teacher forward alone (eval mode, multisweep cloud),
      (d) student fwd+bwd via the camera-free ``lidar_only`` path —
          splits the image-branch + fusion cost out of (b).
    """
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import plumbing_host, synthetic, wgeom_host
    from u2mkd_tpu.models.tsd import TSDFull
    from u2mkd_tpu.ops import losses
    from u2mkd_tpu.ops.precision import set_compute_dtype
    from u2mkd_tpu.train import distill, optim
    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache()
    platform = jax.devices()[0].platform
    if platform != "cpu":
        set_compute_dtype("bfloat16")
    s_p, bsz = 4096, 1
    for a in sys.argv:
        if a.startswith("--points="):
            s_p = int(a.split("=")[1])
    t_p = s_p * 2
    s_caps = tuple(s_p // (1 << i) for i in range(5))
    t_caps = tuple(t_p // (1 << i) for i in range(5))
    rng = np.random.RandomState(0)
    raw = synthetic.make_multimodal_batch(
        rng, bsz, s_p, t_p, voxel_size=0.1, num_cams=3, im_hw=(360, 640))
    batch = jax.tree_util.tree_map(jnp.asarray, raw)
    model = TSDFull(num_classes=17, cr=1.0, cr_t=2.0,
                    window_size=(0.6, 0.6, 0.6),
                    quant_size=(0.6 / 24,) * 3, pallas_attention=True)
    wp = wgeom_host.params_from_model(model)
    for key, caps in (("student", s_caps), ("teacher", t_caps)):
        pl = plumbing_host.batch_plumbing(
            raw[key]["pcoords"], raw[key]["xyz"], raw[key]["pmask"], caps,
            wgeom_params=wp)
        batch[key]["plumbing"] = jax.tree_util.tree_map(jnp.asarray, pl)
    tx = distill.make_frozen_teacher_optimizer(
        optim.make_optimizer("sgd_spformer", 0.02))
    st = distill.create_distill_state(
        model, tx, batch["student"], batch["teacher"], s_caps, t_caps,
        jax.random.PRNGKey(0))
    res = {}

    # (a) full distill step
    step = jax.jit(distill.make_distill_train_step(model, tx, s_caps, t_caps))
    res["full_distill_step_ms"] = timeit(
        lambda s, bt: step(s, bt, jax.random.PRNGKey(1))[1]["loss"], st, batch
    ) * 1e3

    variables = {"params": st.params, "batch_stats": st.batch_stats}
    sb, tb = batch["student"], batch["teacher"]
    from u2mkd_tpu.train.state import get_plumbing
    spl = get_plumbing(sb, s_caps)
    tpl = get_plumbing(tb, t_caps)
    labels = sb["labels"].reshape(-1)
    valid = (sb["pmask"] & (sb["labels"] != 0)).reshape(-1)

    # (b) student-only fwd+bwd (no teacher, CE/Lovász + learner MSE only)
    def stu_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": st.batch_stats},
            sb, spl, tb, tpl, True, run_teacher=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0]["stu"]
        flat = out["x_vox"].reshape(-1, out["x_vox"].shape[-1])
        return losses.lovasz_ce(flat, labels, valid) + sum(out["mse_loss"])

    gb = jax.jit(jax.grad(stu_loss))
    res["student_fwd_bwd_ms"] = timeit(
        lambda: jax.tree_util.tree_leaves(gb(st.params))[0]) * 1e3

    # (c) frozen teacher forward (eval)
    def t_fwd(params):
        return model.apply(
            {"params": params, "batch_stats": st.batch_stats},
            tb["feats"], tpl, False,
            method=lambda m, f, p, t: m.model_t(f, p, t))["x_vox"]

    tf = jax.jit(t_fwd)
    res["teacher_fwd_ms"] = timeit(lambda: tf(st.params)) * 1e3

    # (d) camera-free student fwd+bwd (lidar_only learner path)
    def stu_lidar_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": st.batch_stats},
            sb, spl, True, method=TSDFull.lidar_only,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0]
        flat = out["x_vox"].reshape(-1, out["x_vox"].shape[-1])
        return losses.lovasz_ce(flat, labels, valid)

    gl = jax.jit(jax.grad(stu_lidar_loss))
    res["student_lidar_only_fwd_bwd_ms"] = timeit(
        lambda: jax.tree_util.tree_leaves(gl(st.params))[0]) * 1e3

    res["image_fusion_cost_ms"] = round(
        res["student_fwd_bwd_ms"] - res["student_lidar_only_fwd_bwd_ms"], 3)
    res["kd_glue_cost_ms"] = round(
        res["full_distill_step_ms"] - res["student_fwd_bwd_ms"]
        - res["teacher_fwd_ms"], 3)
    res["platform"] = platform
    res["s_points"], res["t_points"], res["batch"] = s_p, t_p, bsz
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


def main():
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.core.structures import WindowGeom
    from u2mkd_tpu.data import plumbing_host, synthetic, wgeom_host
    from u2mkd_tpu.models.spvcnn import SPVCNN
    from u2mkd_tpu.ops.pallas import wattn_kernel as pk
    from u2mkd_tpu.ops.precision import set_compute_dtype
    from u2mkd_tpu.train import optim, state as train_state
    from u2mkd_tpu.utils import flops as Fl
    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
    from __graft_entry__ import _teacher_model

    setup_compilation_cache()
    platform = jax.devices()[0].platform
    if platform != "cpu":
        set_compute_dtype("bfloat16")
    num_points = 4096
    for a in sys.argv:
        if a.startswith("--points="):
            num_points = int(a.split("=")[1])
    b = 2
    caps = (num_points, num_points // 2, num_points // 4, num_points // 8,
            num_points // 16)
    rng = np.random.RandomState(0)
    raw = synthetic.make_batch(rng, b, num_points, voxel_size=0.1)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model = _teacher_model(num_classes=17, cr=1.0, voxel_size=0.1,
                           pallas_attention=True, pallas_cubic=True)
    res = {}

    # (a) host plumbing (incl. window geometry)
    wp = wgeom_host.params_from_model(model)
    t0 = time.time()
    pl = plumbing_host.batch_plumbing(raw["pcoords"], raw["xyz"],
                                     raw["pmask"], caps, wgeom_params=wp)
    res["host_plumbing_ms"] = (time.time() - t0) * 1e3
    batch["plumbing"] = jax.tree_util.tree_map(jnp.asarray, pl)

    # (b) conv-only train step
    conv_model = SPVCNN(num_classes=17, cr=1.0)
    tx = optim.make_optimizer("sgd", 0.02)
    st = train_state.create_train_state(conv_model, tx, batch, caps,
                                        jax.random.PRNGKey(0))
    step = jax.jit(train_state.make_train_step(conv_model, tx, caps))
    res["conv_unet_step_ms"] = timeit(
        lambda s, bt: step(s, bt, jax.random.PRNGKey(1))[1]["loss"], st, batch
    ) * 1e3

    # (c) full teacher train step (flash + host wgeom)
    tx2 = optim.make_optimizer("sgd_spformer", 0.02)
    st2 = train_state.create_train_state(model, tx2, batch, caps,
                                         jax.random.PRNGKey(0))
    step2 = jax.jit(train_state.make_train_step(model, tx2, caps))
    res["teacher_step_ms"] = timeit(
        lambda s, bt: step2(s, bt, jax.random.PRNGKey(1))[1]["loss"], st2, batch
    ) * 1e3
    res["attention_share_ms"] = round(
        res["teacher_step_ms"] - res["conv_unet_step_ms"], 3)

    # (d) per-level per-branch kernel budget on the real geometry
    specs = Fl.level_attn_specs(model)
    key = jax.random.PRNGKey(0)
    budget = {}
    kernel_sum = 0.0
    for li, (h1, h2, d, g_cub, g_sph) in enumerate(specs):
        vcap = caps[li + 1]
        for branch, hh, g, radial, a in (
            ("cubic", h1, g_cub, False, 0.0),
            ("sphere", h2, g_sph, True, float(model.sphere_a)),
        ):
            gd = pl["wgeom"][branch][li]
            geom = WindowGeom(**{k: jnp.asarray(v)[0] for k, v in gd.items()})
            l2 = 2 * g if radial else 2 * g - 1
            key, *ks = jax.random.split(key, 5)
            q, k, v = (jax.random.normal(kk, (b, vcap, hh, d), jnp.float32)
                       for kk in ks[:3])
            tq = jax.random.normal(ks[3], (l2, 3, hh, d), jnp.float32)
            valid = jnp.asarray(pl["vmask"][li + 1])

            def run(qq, kk_, vv, tqq):
                out = pk.flash_pregeom_batched(
                    qq, kk_, vv, valid, geom, tqq, tqq, tqq,
                    grid_len=g, a=a)
                return jnp.sum(out * out)

            f = jax.jit(jax.grad(run, argnums=(0, 1, 2, 3)))
            ms = timeit(lambda: f(q, k, v, tq)) * 1e3
            budget[f"L{li + 1}_{branch}_ms"] = round(ms, 3)
            kernel_sum += ms
    res["kernel_budget"] = budget
    res["kernel_sum_ms"] = round(kernel_sum, 3)
    res["flash_gflops_per_step"] = round(
        Fl.flash_attention_flops(model, pl, train=True) / 1e9, 2)
    res["platform"] = platform
    res["num_points"] = num_points
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    if "--student" in sys.argv:
        main_student()
    else:
        main()
