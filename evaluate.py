"""Standalone evaluation CLI with optional multi-vote TTA.

Equivalent of the reference's ``NuScenes_Evaluator`` path
(``core/nusc_trainers.py:441-550``): load a checkpoint, run the val split,
devoxelize predictions to raw points, print the per-class IoU table.

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
    args = parser.parse_args()

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


if __name__ == "__main__":
    main()
