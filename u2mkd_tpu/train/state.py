"""Train state + jitted step factories for the uni-modal (teacher) recipe.

One jitted step = plumbing build + forward + loss + grad + optimizer update
(+ psum over the data-parallel mesh axis when ``axis_name`` is set),
replacing the reference's trainer ``_run_step`` + DDP allreduce
(``core/spformer_trainer.py:58-94``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.ops import losses
from u2mkd_tpu.train import metrics


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: dict
    batch_stats: dict
    opt_state: optax.OptState


def create_train_state(model, tx, sample_batch, capacities, rng) -> TrainState:
    # everything under one jit: eager init would dispatch thousands of
    # individual ops (catastrophic on remote-device backends)
    @jax.jit
    def init_fn(batch, rng):
        pl = get_plumbing(batch, capacities)
        return model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            batch["feats"], pl, True,
        )

    keys = ["pcoords", "xyz", "pmask", "feats"]
    if "plumbing" in sample_batch:
        keys.append("plumbing")
    sample = {
        k: jax.tree_util.tree_map(jnp.asarray, sample_batch[k]) for k in keys
    }
    if "plumbing" in sample and "wgeom" in sample["plumbing"]:
        wg = sample["plumbing"]["wgeom"]
        if next(iter(wg.values()))[0]["order"].shape[0] != 1:
            # geometry was sharded for the DP mesh; init runs unsharded and
            # the attention params don't depend on the geometry path
            sample = dict(sample)
            sample["plumbing"] = {
                k: v for k, v in sample["plumbing"].items() if k != "wgeom"
            }
    variables = init_fn(sample, rng)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def get_plumbing(batch: Dict, capacities) -> "P.UNetPlumbing":
    """In-jit plumbing build, or assembly from host-precomputed arrays when
    the batch carries them (see ``data/plumbing_host.py`` — moves ~70% of
    the step's device time to overlapped host work)."""
    if "plumbing" in batch:
        return P.from_precomputed(batch["plumbing"], batch["pmask"])
    return P.build_plumbing(
        batch["pcoords"], batch["xyz"], batch["pmask"], capacities
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    capacities: Tuple[int, ...],
    ignore_label: int = 0,
    axis_name: Optional[str] = None,
    remat: bool = False,
    overflow_checks: bool = False,
) -> Callable:
    """Teacher step: Lovász+CE on keyframe-masked points
    (reference ``spformer_trainer.py:78-94``).

    ``overflow_checks=True`` adds per-batch capacity/occupancy counters to
    the aux dict (see :mod:`u2mkd_tpu.train.overflow`).

    ``remat=True`` recomputes the forward in the backward pass
    (``jax.checkpoint``): ~1.3x step cost but much smaller peak memory and
    compile footprint — needed beyond ~32k total points on the sandbox's
    remote TPU compiler."""

    def step_fn(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        pl = get_plumbing(batch, capacities)
        valid = (
            batch["pmask"]
            & batch["keyframe_mask"]
            & (batch["labels"] != ignore_label)
        )

        def fwd(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["feats"], pl, True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
                mutable=["batch_stats"],
            )
            return out["x_vox"], mut["batch_stats"]

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            logits, bs = fwd(params)
            flat_logits = logits.reshape(-1, logits.shape[-1])
            flat_labels = batch["labels"].reshape(-1)
            flat_valid = valid.reshape(-1)
            loss = losses.lovasz_ce(flat_logits, flat_labels, flat_valid)
            return loss, (bs, logits)

        (loss, (bs, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=bs,
            opt_state=opt_state,
        )
        aux = {"loss": loss}
        if overflow_checks:
            from u2mkd_tpu.train import overflow

            stats = overflow.stats_for_model(model, pl)
            if axis_name is not None:
                stats = jax.tree_util.tree_map(
                    lambda x: jax.lax.pmax(x, axis_name), stats
                )
            aux.update(stats)
        return new_state, aux

    return step_fn


def make_eval_step(
    model,
    capacities: Tuple[int, ...],
    num_classes: int,
    ignore_label: int = 0,
    axis_name: Optional[str] = None,
) -> Callable:
    """Eval step: argmax predictions + IoU counters (devoxelization back to
    raw points happens in the host pipeline via inverse maps, reference
    ``spformer_trainer.py:96-115``)."""

    def eval_fn(state: TrainState, batch: Dict) -> Dict:
        pl = get_plumbing(batch, capacities)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["feats"], pl, False,
        )
        pred = jnp.argmax(out["x_vox"], axis=-1)
        valid = batch["pmask"] & batch["keyframe_mask"]
        counts = metrics.iou_counts(
            pred.reshape(-1), batch["labels"].reshape(-1), valid.reshape(-1),
            num_classes, ignore_label,
        )
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
        return {"pred": pred, "counts": counts, "logits": out["x_vox"]}

    return eval_fn
