"""Stage-1 teacher training CLI.

Equivalent of reference ``train_spformer.py``: loads a recursive YAML config
with dotted overrides, builds the teacher model/optimizer/loaders, and runs
the epoch loop with MeanIoU eval + latest/best checkpoints. Data parallelism
comes from the jax device mesh instead of an MPI launcher:
every visible device becomes a data shard automatically.

Usage:
  python train_spformer.py configs/synthetic/train/spformer_tiny.yaml \
      --run-dir /tmp/run [--weight-path ckpt] [k.e.y=value ...]
"""

from __future__ import annotations

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--run-dir", required=True)
    parser.add_argument("--weight-path", default=None,
                        help="checkpoint dir to resume from")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host run: jax.distributed.initialize "
                             "(auto-discovery on TPU pods; set --coordinator/"
                             "--num-processes/--process-id elsewhere), global "
                             "device mesh, per-process data shards")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("opts", nargs="*", help="dotted config overrides")
    # intermixed: overrides may appear before or after flag arguments
    args = parser.parse_intermixed_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.parallel import mesh as pmesh
    from u2mkd_tpu.train import builder, loop, state as train_state
    from u2mkd_tpu.utils import config as config_lib
    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache()
    cfg = config_lib.load(args.config)
    config_lib.update_dotted(cfg, args.opts)

    if args.multihost:
        pmesh.initialize_distributed(args.coordinator, args.num_processes,
                                     args.process_id)
        config_lib.update_dotted(cfg, ["train.multihost=true"])
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}")

    n_dev = jax.device_count()
    use_dp = pmesh.use_data_parallel(cfg)
    axis = pmesh.DATA_AXIS if use_dp else None
    print(f"devices: {n_dev} ({'data-parallel' if use_dp else 'single'})")

    model = builder.make_model(cfg, axis_name=axis)
    model_init = builder.make_model(cfg, axis_name=None)
    tx = builder.make_optimizer_and_schedule(cfg, world_size=n_dev if use_dp else 1)
    caps = tuple(cfg.capacities)

    if cfg.dataset.name == "synthetic":
        train_loader, val_loader = builder.make_synthetic_loaders(
            cfg, seed=cfg.train.seed % (2**31)
        )
    else:
        from u2mkd_tpu.data import loaders

        train_loader, val_loader = loaders.make_loaders(cfg)

    sample = next(iter(train_loader()))
    st = train_state.create_train_state(
        model_init, tx, sample, caps,
        jax.random.PRNGKey(cfg.train.seed % (2**31)),
    )
    if args.weight_path:
        import orbax.checkpoint as ocp

        st = ocp.StandardCheckpointer().restore(
            args.weight_path, target=jax.device_get(st)
        )
        print(f"resumed from {args.weight_path}")

    ignore = cfg.data.ignore_label
    ovf = bool(cfg.get_path("train.overflow_checks", True))
    if use_dp:
        mesh = pmesh.make_global_mesh() if args.multihost else pmesh.make_mesh()
        step = pmesh.data_parallel_step(
            train_state.make_train_step(model, tx, caps, ignore, axis,
                                        overflow_checks=ovf), mesh
        )
        ev = pmesh.data_parallel_eval(
            train_state.make_eval_step(model, caps, cfg.data.num_classes,
                                       ignore, axis), mesh
        )
    else:
        step = jax.jit(train_state.make_train_step(model, tx, caps, ignore,
                                                   overflow_checks=ovf))
        ev = jax.jit(
            train_state.make_eval_step(model, caps, cfg.data.num_classes, ignore)
        )

    trainer = loop.Trainer(
        run_dir=args.run_dir, state=st, train_step=step, eval_step=ev,
        train_loader=train_loader, val_loader=val_loader,
        num_epochs=cfg.num_epochs, num_classes=cfg.data.num_classes,
        seed=cfg.train.seed % (2**31), ignore_label=ignore,
        epoch_to_save=cfg.get_path("epoch_to_save", 0),
        strict_capacity=bool(cfg.get_path("train.strict_capacity", False)),
    )
    trainer.train()


if __name__ == "__main__":
    main()
