"""TSD distillation train/eval steps.

One jitted step runs student + frozen teacher forward and the full loss
stack (reference ``NuScenesLCTSDFullTrainer._run_step``,
``core/nusc_trainers.py:255-365``):

  loss = LovaszCE(x_vox) + LovaszCE(x_pix | FOV) + w_kl * KL(stu || teacher)
       + sum(per-stage learner MSE) + w_feat * MSE(adapted stage-4 feats)

The reference's python per-sample teacher->student remapping loops
(``:288-324``: inverse_map -> keyframe filter -> inds gather) are
precomposed by the data pipeline into one gather index array ``t2s``
([B, Ps] student point -> teacher point row) and folded into the step as a
single take-along-axis (SURVEY §7).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from u2mkd_tpu.ops import losses
from u2mkd_tpu.train import metrics
from u2mkd_tpu.train.state import TrainState


def make_frozen_teacher_optimizer(tx: optax.GradientTransformation):
    """Zero updates for the ``model_t`` subtree (frozen teacher,
    reference ``requires_grad_(False)``)."""

    def label_fn(params):
        def key_of(path0):
            # flax param trees key with DictKey; exact match only (a
            # substring test would also freeze e.g. 'model_t_adapter')
            return getattr(path0, "key", str(path0))

        return jax.tree_util.tree_map_with_path(
            lambda path, _: "freeze" if key_of(path[0]) == "model_t"
            else "train",
            params,
        )

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_fn
    )


def create_distill_state(model, tx, student_batch, teacher_batch,
                         s_caps, t_caps, rng) -> TrainState:
    from u2mkd_tpu.train.state import get_plumbing

    @jax.jit
    def init_fn(sb, tb, rng):
        # honor host-precomputed plumbing like the train/eval steps do
        # (create_train_state pattern) — the in-jit build is ~70% of the
        # step's device work and a large compile footprint, pointless at
        # init when the loader already shipped the arrays
        spl = get_plumbing(sb, s_caps)
        tpl = get_plumbing(tb, t_caps)
        return model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            sb, spl, tb, tpl, True,
        )

    def drop_sharded_wgeom(b):
        # init runs unsharded; dp-sharded geometry would trip the
        # shard-count assertion and the attn params don't depend on it
        if "plumbing" in b and "wgeom" in b["plumbing"]:
            wg = b["plumbing"]["wgeom"]
            if next(iter(wg.values()))[0]["order"].shape[0] != 1:
                b = dict(b)
                b["plumbing"] = {
                    k: v for k, v in b["plumbing"].items() if k != "wgeom"
                }
        return b

    variables = init_fn(drop_sharded_wgeom(student_batch),
                        drop_sharded_wgeom(teacher_batch), rng)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}), opt_state=tx.init(params),
    )


def _distill_losses(stu, x_vox_t2s, feat_t2s, labels, fov, label_valid,
                    t2s_valid, w_kl, w_feat, mse_norm_feat):
    """The five-term TSD loss (reference ``nusc_trainers.py:331-358``) from
    a student forward dict + teacher outputs already gathered to student
    point order. Shared by the fused and split train steps."""
    flat = lambda x: x.reshape(-1, x.shape[-1])
    fl = labels.reshape(-1)

    ce_vox = losses.lovasz_ce(flat(stu["x_vox"]), fl, label_valid.reshape(-1))
    ce_pix = losses.lovasz_ce(
        flat(stu["x_pix"]), fl, (label_valid & fov).reshape(-1)
    )
    kl = losses.kl_div_batchmean(
        flat(stu["x_vox"]), flat(x_vox_t2s), t2s_valid.reshape(-1)
    )
    feat_s = stu["pts_feats"]
    if mse_norm_feat:
        def minmax(x):
            mx = jnp.max(x, -1, keepdims=True)
            mn = jnp.min(x, -1, keepdims=True)
            return (x - mn) / jnp.maximum(mx - mn, 1e-12)
        feat_s, feat_t2s = minmax(feat_s), minmax(feat_t2s)
    feat = losses.masked_mse(
        flat(feat_s), flat(feat_t2s), t2s_valid.reshape(-1)
    )
    mse_sum = sum(stu["mse_loss"])
    loss = ce_vox + ce_pix + w_kl * kl + mse_sum + w_feat * feat
    aux = {
        "loss": loss, "ce_vox": ce_vox, "ce_pix": ce_pix, "kl": kl,
        "feat": feat, "mse": mse_sum,
    }
    return loss, aux


def make_distill_train_step(
    model,
    tx: optax.GradientTransformation,
    s_caps: Tuple[int, ...],
    t_caps: Tuple[int, ...],
    w_kl: float = 1.0,
    w_feat: float = 1.0,
    ignore_label: int = 0,
    mse_norm_feat: bool = False,
    axis_name: Optional[str] = None,
    remat: bool = False,
    overflow_checks: bool = False,
) -> Callable:
    """Student distillation step. ``remat=True`` recomputes the forward in
    the backward pass (the student step is the larger program: student +
    multisweep cr_t=2.0 teacher in one jit — SURVEY §7 hard-part 5);
    ``overflow_checks=True`` adds capacity/occupancy counters for BOTH
    plumbing sets to the aux dict, mirroring the teacher step."""

    def step_fn(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        from u2mkd_tpu.train.state import get_plumbing

        sb, tb = batch["student"], batch["teacher"]
        spl = get_plumbing(sb, s_caps)
        tpl = get_plumbing(tb, t_caps)
        labels = sb["labels"]
        pmask = sb["pmask"]
        fov = sb["fov_mask"] & pmask
        label_valid = pmask & (labels != ignore_label)
        t2s = batch["t2s"]  # [B, Ps] teacher point row per student point
        t2s_valid = pmask & (t2s >= 0)

        def fwd(params):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                sb, spl, tb, tpl, True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
                mutable=["batch_stats"],
            )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            out, mut = fwd(params)
            # teacher outputs are already stop_gradient'ed inside TSDFull
            # (models/tsd.py) — no backward runs through the frozen teacher
            stu, tch = out["stu"], out["t"]
            # teacher logits/features remapped to student point order
            gather = lambda a: jnp.take_along_axis(
                a, jnp.clip(t2s, 0)[..., None], axis=1
            )
            loss, aux = _distill_losses(
                stu, gather(tch["x_vox"]), gather(tch["pts_feats"]),
                labels, fov, label_valid, t2s_valid,
                w_kl, w_feat, mse_norm_feat,
            )
            return loss, (mut["batch_stats"], aux)

        (loss, (bs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if overflow_checks:
            from u2mkd_tpu.train import overflow

            # TSDFull carries the shared window/pallas attrs of both submodels
            for tag, pl in (("s", spl), ("t", tpl)):
                stats = overflow.stats_for_model(model, pl)
                if axis_name is not None:
                    stats = jax.tree_util.tree_map(
                        lambda x: jax.lax.pmax(x, axis_name), stats
                    )
                for k, v in stats.items():
                    aux[f"{k}_{tag}"] = v
            aux["overflow/violations"] = (
                aux.pop("overflow/violations_s") + aux.pop("overflow/violations_t")
            )
        return (
            TrainState(step=state.step + 1, params=params, batch_stats=bs,
                       opt_state=opt_state),
            aux,
        )

    return step_fn


def make_distill_split_steps(
    model,
    tx: optax.GradientTransformation,
    s_caps: Tuple[int, ...],
    t_caps: Tuple[int, ...],
    w_kl: float = 1.0,
    w_feat: float = 1.0,
    ignore_label: int = 0,
    mse_norm_feat: bool = False,
    remat: bool = False,
) -> Callable:
    """Two-program TSD train step: the frozen teacher forward (+ the
    t2s gather down to student point order) compiles as its OWN jit, and
    the student forward/backward as another. Mathematically identical to
    ``make_distill_train_step`` — the teacher is under ``stop_gradient``
    either way, so no gradient crosses the program boundary; the teacher's
    gathered outputs flow device-to-device between the two executables.

    Why it exists: the fused program (student bwd at Ps=32k + cr_t=2.0
    multisweep teacher at Pt=131k + 3-camera image branch) exceeds what the
    sandbox's remote TPU compile helper accepts (HTTP 500, VERDICT r4 weak
    #2); each half compiles fine. On production backends the fused step
    remains the default (one launch, XLA can overlap); this is the
    compile-limited fallback and also what a pipelined two-stage serving
    deployment would run. Single-device (the DP wrapper shard_maps the
    fused step; split-DP would shard each half the same way if needed)."""

    teacher = model.make_teacher()

    @jax.jit
    def teacher_fn(state: TrainState, batch: Dict) -> Dict:
        from u2mkd_tpu.train.state import get_plumbing

        tb = batch["teacher"]
        tpl = get_plumbing(tb, t_caps)
        t_out = teacher.apply(
            {"params": state.params["model_t"],
             "batch_stats": state.batch_stats["model_t"]},
            tb["feats"], tpl, False,
        )
        t2s = batch["t2s"]
        gather = lambda a: jnp.take_along_axis(
            a, jnp.clip(t2s, 0)[..., None], axis=1
        )
        return {
            "x_vox_t2s": jax.lax.stop_gradient(gather(t_out["x_vox"])),
            "feat_t2s": jax.lax.stop_gradient(gather(t_out["pts_feats"])),
        }

    @jax.jit
    def student_fn(state: TrainState, batch: Dict, t2s_out: Dict,
                   rng) -> Tuple[TrainState, Dict]:
        from u2mkd_tpu.train.state import get_plumbing

        sb = batch["student"]
        spl = get_plumbing(sb, s_caps)
        labels = sb["labels"]
        pmask = sb["pmask"]
        fov = sb["fov_mask"] & pmask
        label_valid = pmask & (labels != ignore_label)
        t2s_valid = pmask & (batch["t2s"] >= 0)

        def fwd(params):
            # run_teacher=False: the wrapper touches only model_s
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                sb, spl, None, None, True, False,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
                mutable=["batch_stats"],
            )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            out, mut = fwd(params)
            loss, aux = _distill_losses(
                out["stu"], t2s_out["x_vox_t2s"], t2s_out["feat_t2s"],
                labels, fov, label_valid, t2s_valid,
                w_kl, w_feat, mse_norm_feat,
            )
            return loss, (mut["batch_stats"], aux)

        (loss, (bs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # the student program never touches model_t -> its batch_stats
        # subtree is absent from the mutated collection; preserve it
        bs = {**state.batch_stats, **bs}
        return (
            TrainState(step=state.step + 1, params=params, batch_stats=bs,
                       opt_state=opt_state),
            aux,
        )

    def step(state: TrainState, batch: Dict, rng):
        return student_fn(state, batch, teacher_fn(state, batch), rng)

    step.teacher_fn = teacher_fn
    step.student_fn = student_fn
    return step


def make_distill_eval_step(
    model,
    s_caps: Tuple[int, ...],
    t_caps: Tuple[int, ...],
    num_classes: int,
    ignore_label: int = 0,
    axis_name: Optional[str] = None,
    run_teacher: bool = False,
) -> Callable:
    """Eval: student vox + pix heads -> predictions and IoU counters
    (pix scored only on FOV points, reference
    ``train_lc_nusc_tsd_full.py:106-121``)."""

    def eval_fn(state: TrainState, batch: Dict) -> Dict:
        from u2mkd_tpu.train.state import get_plumbing

        sb, tb = batch["student"], batch.get("teacher")
        spl = get_plumbing(sb, s_caps)
        # student-only eval never touches the teacher: skip its plumbing
        # entirely (host builders no longer pay the Pt=131k cost either —
        # loaders.make_distill_loaders val stage, VERDICT r4 next #5)
        tpl = get_plumbing(tb, t_caps) if run_teacher else None
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            sb, spl, tb, tpl, False, run_teacher,
        )
        stu = out["stu"]
        pred_vox = jnp.argmax(stu["x_vox"], axis=-1)
        pred_pix = jnp.argmax(stu["x_pix"], axis=-1)
        valid = sb["pmask"]
        fov = valid & sb["fov_mask"]
        counts_vox = metrics.iou_counts(
            pred_vox.reshape(-1), sb["labels"].reshape(-1), valid.reshape(-1),
            num_classes, ignore_label,
        )
        counts_pix = metrics.iou_counts(
            pred_pix.reshape(-1), sb["labels"].reshape(-1), fov.reshape(-1),
            num_classes, ignore_label,
        )
        res = {"pred_vox": pred_vox, "pred_pix": pred_pix,
               "counts_vox": counts_vox, "counts_pix": counts_pix,
               "logits": stu["x_vox"], "logits_pix": stu["x_pix"]}
        if run_teacher:
            # teacher-IoU monitoring on its own multisweep cloud
            # (reference debug.debug_val, train_lc_nusc_tsd_full.py:96-121)
            pred_t = jnp.argmax(out["t"]["x_vox"], axis=-1)
            t_valid = tb["pmask"] & tb["keyframe_mask"]
            res["counts_teacher"] = metrics.iou_counts(
                pred_t.reshape(-1), tb["labels"].reshape(-1),
                t_valid.reshape(-1), num_classes, ignore_label,
            )
        if axis_name is not None:
            for k in ("counts_vox", "counts_pix", "counts_teacher"):
                if k in res:
                    res[k] = jax.lax.psum(res[k], axis_name)
        return res

    return eval_fn
