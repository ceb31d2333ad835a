"""Stage-2 cross-modal student training CLI (TSD distillation).

Equivalent of reference ``train_lc_nusc_tsd_full.py``: paired
student/teacher batches, frozen teacher restored from the stage-1
checkpoint, full distillation loss stack, vox + pix MeanIoU eval.

Usage:
  python train_lc_nusc_tsd_full.py configs/synthetic/train/tsd_tiny.yaml \
      --run-dir /tmp/run [model.teacher_pretrain=path] [k.e.y=value ...]
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--run-dir", required=True)
    parser.add_argument("--weight-path", default=None)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host run: jax.distributed.initialize, "
                             "global device mesh, per-process data shards "
                             "(stage-2 scale-out mirrors stage 1, reference "
                             "train_lc_nusc_tsd_full.py:83-84)")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("opts", nargs="*")
    # intermixed: dotted k.e.y=value overrides may appear before or after
    # flag arguments (plain parse_args rejects a second positional group)
    args = parser.parse_intermixed_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from u2mkd_tpu.parallel import mesh as pmesh
    from u2mkd_tpu.train import builder, distill, loop
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

    model = builder.make_model(cfg, axis_name=axis)
    model_init = builder.make_model(cfg, axis_name=None)
    base_tx = builder.make_optimizer_and_schedule(
        cfg, world_size=n_dev if use_dp else 1
    )
    tx = distill.make_frozen_teacher_optimizer(base_tx)
    s_caps = tuple(cfg.get_path("student_capacities") or cfg.capacities)
    t_caps = tuple(cfg.get_path("teacher_capacities") or cfg.capacities)

    if cfg.dataset.name == "synthetic":
        train_loader, val_loader = builder.make_synthetic_distill_loaders(cfg)
    else:
        from u2mkd_tpu.data import loaders

        train_loader, val_loader = loaders.make_distill_loaders(cfg)

    sample = next(iter(train_loader()))
    st = distill.create_distill_state(
        model_init, tx, sample["student"], sample["teacher"], s_caps, t_caps,
        jax.random.PRNGKey(cfg.train.seed % (2**31)),
    )

    # ImageNet init for the SwiftNet backbone (reference swiftnet.py:338-343)
    imagenet = cfg.get_path("model.imagenet_pretrain")
    if imagenet:
        from u2mkd_tpu.models.convert_weights import load_imagenet_pretrain

        merged = load_imagenet_pretrain(
            imagenet,
            {"params": st.params["model_s"],
             "batch_stats": st.batch_stats.get("model_s", {})},
        )
        params = dict(st.params)
        params["model_s"] = merged["params"]
        stats = dict(st.batch_stats)
        stats["model_s"] = merged["batch_stats"]
        st = st.replace(params=params, batch_stats=stats)
        print(f"loaded ImageNet backbone from {imagenet}")

    # three restore modes (reference nusc_trainers.py:173-201)
    if args.weight_path:  # full resume
        import orbax.checkpoint as ocp

        st = ocp.StandardCheckpointer().restore(
            args.weight_path, target=jax.device_get(st)
        )
        print(f"resumed from {args.weight_path}")
    else:
        from u2mkd_tpu.train import checkpoints as ckpt_lib

        pretrain = cfg.get_path("model.pretrain_weight")
        if pretrain:  # backbone pretrain sans classifier (+ BN buffers)
            st = st.replace(
                params=ckpt_lib.load_pretrain_params(pretrain, st.params),
                batch_stats=ckpt_lib.load_pretrain_batch_stats(
                    pretrain, st.batch_stats
                ),
            )
            print(f"loaded pretrain (no classifier) from {pretrain}")
        teacher = cfg.get_path("model.teacher_pretrain")
        if teacher:  # teacher-only (orbax dir, or reference torch .pt file)
            t_params, t_stats = ckpt_lib.load_teacher_any(
                teacher, st.params, st.batch_stats
            )
            st = st.replace(params=t_params, batch_stats=t_stats)
            print(f"loaded frozen teacher from {teacher}")

    ignore = cfg.criterion.ignore_index
    ncls = cfg.data.num_classes
    kw = dict(
        w_kl=cfg.criterion.get("w_kl", 1.0),
        w_feat=cfg.criterion.get("w_feat", 1.0), ignore_label=ignore,
        mse_norm_feat=cfg.criterion.get("mse_norm_feat", False),
    )
    debug_val = bool(cfg.get_path("debug.debug_val", False))
    extra_counts = ("counts_pix",) + (("counts_teacher",) if debug_val else ())
    ovf = bool(cfg.get_path("train.overflow_checks", True))
    remat = bool(cfg.get_path("train.remat", False))
    if use_dp:
        mesh = (pmesh.make_global_mesh() if args.multihost
                else pmesh.make_mesh())
        step = pmesh.data_parallel_step(
            distill.make_distill_train_step(model, tx, s_caps, t_caps,
                                            axis_name=axis, remat=remat,
                                            overflow_checks=ovf, **kw), mesh
        )
        ev = pmesh.data_parallel_distill_eval(
            distill.make_distill_eval_step(model, s_caps, t_caps, ncls,
                                           ignore, axis_name=axis,
                                           run_teacher=debug_val),
            mesh, run_teacher=debug_val,
        )
    elif bool(cfg.get_path("train.split_step", False)):
        # two-program fallback for compile-size-limited backends (teacher
        # fwd jit + student train jit, mathematically identical — see
        # distill.make_distill_split_steps). Single-device only.
        step = distill.make_distill_split_steps(
            model, tx, s_caps, t_caps, remat=remat, **kw
        )
        ev = jax.jit(
            distill.make_distill_eval_step(model, s_caps, t_caps, ncls,
                                           ignore, run_teacher=debug_val)
        )
    else:
        step = jax.jit(
            distill.make_distill_train_step(model, tx, s_caps, t_caps,
                                            remat=remat, overflow_checks=ovf,
                                            **kw)
        )
        ev = jax.jit(
            distill.make_distill_eval_step(model, s_caps, t_caps, ncls,
                                           ignore, run_teacher=debug_val)
        )

    trainer = loop.Trainer(
        run_dir=args.run_dir, state=st, train_step=step, eval_step=ev,
        train_loader=train_loader, val_loader=val_loader,
        num_epochs=cfg.num_epochs, num_classes=ncls,
        seed=cfg.train.seed % (2**31), ignore_label=ignore,
        eval_counts_key="counts_vox", extra_count_keys=extra_counts,
        epoch_to_save=cfg.get_path("epoch_to_save", 0),
        # raw-cloud eval parity with the reference (nusc_trainers.py:368-390):
        # devoxelize vox logits to all raw points and pix logits to raw FOV
        # points before scoring. Falls back to padded-voxel scoring when the
        # batch carries no info (synthetic loaders).
        eval_raw_points=bool(cfg.get_path("eval.raw_points", True)),
        raw_specs=[
            loop.RawSpec("counts_vox", "logits", "student", None),
            loop.RawSpec("counts_pix", "logits_pix", "student", "fov_full"),
        ],
        strict_capacity=bool(cfg.get_path("train.strict_capacity", False)),
    )
    trainer.train()


if __name__ == "__main__":
    main()
