"""Standalone evaluation CLI with optional multi-vote TTA.

Equivalent of the reference's ``NuScenes_Evaluator`` path
(``core/nusc_trainers.py:441-550``): load a checkpoint, run the val split,
devoxelize predictions to raw points, print the per-class IoU table.

Handles both stages: a teacher config evaluates the uni-modal model; a
``spvcnn_swiftnet18_spformer_tsd_full`` config evaluates the cross-modal
student exactly like the reference evaluator (which feeds images +
projections and scores the devoxelized ``x_vox`` head,
``nusc_trainers.py:493-550``; only the student runs at inference).

Usage:
  python evaluate.py configs/synthetic/train/spformer_tiny.yaml \
      --checkpoint runs/teacher/checkpoints/max-iou-val-vox \
      [--num-vote 1] [--cpu] [k.e.y=value ...]
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--num-vote", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("opts", nargs="*")
    # intermixed: overrides may appear before or after flag arguments
    args = parser.parse_intermixed_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import orbax.checkpoint as ocp

    from u2mkd_tpu.train import builder, evaluator, loop, state as train_state
    from u2mkd_tpu.utils import config as config_lib
    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache()
    cfg = config_lib.load(args.config)
    config_lib.update_dotted(cfg, args.opts)

    if cfg.model.name == "spvcnn_swiftnet18_spformer_tsd_full":
        return _student_eval(args, cfg)

    model = builder.make_model(cfg)
    tx = builder.make_optimizer_and_schedule(cfg)
    caps = tuple(cfg.capacities)
    if cfg.dataset.name == "synthetic":
        # n_shards=1 for the same reason as the real-data branch below
        _, val_loader = builder.make_synthetic_loaders(cfg, n_shards=1)
    else:
        from u2mkd_tpu.data import loaders

        # num_vote > 1 turns on per-pass val augmentation so each vote sums
        # logits over a genuinely different view (reference
        # nusc_trainers.py:441-550); vote 1 keeps the clean val pipeline.
        # n_shards=1: this CLI runs a plain (un-shard_map'd) jit eval step,
        # so the window geometry must be single-shard even on multi-device
        # hosts where the training CLIs would pick dp sharding
        _, val_loader = loaders.make_loaders(cfg, tta_val=args.num_vote > 1,
                                             n_shards=1)

    # draw ONE batch for state init, then close the iterator so its
    # prefetch worker stops instead of racing vote 0 over the shared
    # dataset RandomState
    _it = iter(val_loader())
    sample = next(_it)
    if hasattr(_it, "close"):
        _it.close()
    st = train_state.create_train_state(
        model, tx, sample, caps, jax.random.PRNGKey(0)
    )
    st = ocp.StandardCheckpointer().restore(
        args.checkpoint, target=jax.device_get(st)
    )
    print(f"loaded {args.checkpoint}")

    ev = jax.jit(
        train_state.make_eval_step(model, caps, cfg.data.num_classes,
                                   cfg.data.ignore_label)
    )
    res = evaluator.evaluate_tta(
        ev, st, val_loader, cfg.data.num_classes, cfg.data.ignore_label,
        num_vote=args.num_vote,
    )
    print(loop.format_iou_table(res["per_class"], res["miou"]))
    print(f"mIoU: {res['miou'] * 100:.2f}")


def tsd_student_view(batch):
    """Flat scoring view of a nested TSD batch for ``evaluate_tta``: the
    student feed's mask/labels plus the per-sample student infos (reference
    scores the student's devoxelized vox head, ``nusc_trainers.py:517-536``)."""
    stu = batch["student"]
    infos = batch.get("infos")
    return {
        "pmask": stu["pmask"],
        "labels": stu["labels"],
        "keyframe_mask": stu.get("keyframe_mask"),
        "infos": [i["student"] for i in infos] if infos else None,
    }


def _student_eval(args, cfg):
    """Stage-2 student evaluation (reference ``NuScenes_Evaluator``): load
    the full TSD checkpoint, run only the student forward, devoxelize the
    vox head to raw points, optional vote-summed TTA."""
    import jax
    import orbax.checkpoint as ocp

    from u2mkd_tpu.train import builder, distill, evaluator, loop
    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache()
    model = builder.make_model(cfg)
    base_tx = builder.make_optimizer_and_schedule(cfg)
    tx = distill.make_frozen_teacher_optimizer(base_tx)
    s_caps = tuple(cfg.get_path("student_capacities") or cfg.capacities)
    t_caps = tuple(cfg.get_path("teacher_capacities") or cfg.capacities)

    if cfg.dataset.name == "synthetic":
        _, val_loader = builder.make_synthetic_distill_loaders(cfg)
    else:
        from u2mkd_tpu.data import loaders

        # n_shards=1: plain jit eval step (see teacher branch note above)
        _, val_loader = loaders.make_distill_loaders(
            cfg, tta_val=args.num_vote > 1, n_shards=1
        )

    _it = iter(val_loader())
    sample = next(_it)
    if hasattr(_it, "close"):
        _it.close()
    tb = sample["teacher"]
    if "plumbing" not in tb:
        # the val loader skips the (unused) teacher plumbing since round 5
        # (loaders.make_distill_loaders) — state init still runs the full
        # wrapper once, so build it here for this one sample
        import numpy as np

        from u2mkd_tpu.data import loaders as _ld, plumbing_host

        tb = dict(tb)
        tb["plumbing"] = jax.tree_util.tree_map(
            jax.numpy.asarray, plumbing_host.batch_plumbing(
                np.asarray(tb["pcoords"]), np.asarray(tb["xyz"]),
                np.asarray(tb["pmask"]), t_caps,
                wgeom_params=_ld._wgeom_params(cfg), n_shards=1))
    st = distill.create_distill_state(
        model, tx, sample["student"], tb, s_caps, t_caps,
        jax.random.PRNGKey(0),
    )
    st = ocp.StandardCheckpointer().restore(
        args.checkpoint, target=jax.device_get(st)
    )
    print(f"loaded {args.checkpoint}")

    ev = jax.jit(
        distill.make_distill_eval_step(
            model, s_caps, t_caps, cfg.data.num_classes,
            cfg.criterion.ignore_index,
        )
    )
    res = evaluator.evaluate_tta(
        ev, st, val_loader, cfg.data.num_classes, cfg.criterion.ignore_index,
        num_vote=args.num_vote, logits_key="logits",
        sample_view=tsd_student_view,
    )
    print(loop.format_iou_table(res["per_class"], res["miou"]))
    print(f"mIoU: {res['miou'] * 100:.2f}")


if __name__ == "__main__":
    main()
