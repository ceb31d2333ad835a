"""Config -> model / optimizer / dataset factories.

Equivalent of the reference ``core/builder.py`` (make_model at
``builder.py:533-620``: window_size = voxel_size * patch_size * window_cfg,
quant = window / quant_size_scale; make_optimizer at ``builder.py:662-719``;
make_scheduler at ``builder.py:722-747``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from u2mkd_tpu.train import optim, schedulers
from u2mkd_tpu.utils.config import Config


def window_geometry(cfg: Config):
    voxel_size = cfg.dataset.voxel_size
    vs = [voxel_size] * 3 if not isinstance(voxel_size, list) else voxel_size
    patch = np.asarray([v * cfg.model.patch_size for v in vs], np.float32)
    window_size = tuple(float(x) for x in patch * cfg.model.window_size)
    wss = tuple(float(x) for x in cfg.model.window_size_sphere)
    scale = cfg.model.quant_size_scale
    quant = tuple(w / scale for w in window_size)
    quant_sphere = tuple(w / scale for w in wss)
    return window_size, wss, quant, quant_sphere


def make_model(cfg: Config, axis_name: Optional[str] = None):
    prec = cfg.get_path("precision", "float32")
    if prec != "float32":
        from u2mkd_tpu.ops.precision import set_compute_dtype

        set_compute_dtype(prec)
    name = cfg.model.name
    ws, wss, qs, qss = window_geometry(cfg)
    common = dict(
        num_classes=cfg.data.num_classes,
        window_size=ws, window_size_sphere=wss,
        quant_size=qs, quant_size_sphere=qss,
        window_size_scale=tuple(cfg.model.window_size_scale),
        drop_path_rate=cfg.model.drop_path_rate,
        sphere_a=cfg.model.a,
        head_dim=cfg.model.get("head_dim", 16),
        pallas_attention=cfg.model.get("pallas_attention", False),
        pallas_cubic=cfg.model.get("pallas_cubic", True),
        axis_name=axis_name,
    )
    if name == "spvcnn":
        from u2mkd_tpu.models.spvcnn import SPVCNN

        return SPVCNN(
            num_classes=cfg.data.num_classes, cr=cfg.model.cr,
            in_channel=cfg.model.in_channel, axis_name=axis_name,
        )
    if name == "spvcnn_spformer":
        from u2mkd_tpu.models.spvcnn import SPVCNN

        return SPVCNN(
            cr=cfg.model.cr, in_channel=cfg.model.in_channel,
            sphereformer=True, **common,
        )
    if name == "spvcnn_swiftnet18_spformer_tsd_full":
        from u2mkd_tpu.models.tsd import TSDFull

        return TSDFull(
            cr=cfg.model.cr, cr_t=cfg.model.cr_t,
            in_channel=cfg.model.in_channel,
            in_channel_t=cfg.model.get("in_channel_t", 4),
            run_pix_decoder=cfg.get_path("eval.run_pix_decoder", True),
            **common,
        )
    raise NotImplementedError(name)


def make_optimizer_and_schedule(cfg: Config, world_size: int = 1):
    o = cfg.optimizer
    name = cfg.scheduler.name
    if name == "cosine_warmup":
        sched = schedulers.cosine_schedule_with_warmup(
            cfg.num_epochs, cfg.batch_size, cfg.data.training_size, world_size
        )
    elif name == "poly":
        # max_iter is a SAMPLE count, not an optimizer-step count — that is
        # the reference's own construction (builder.py:740-743 passes
        # num_epochs * training_size to a per-step PolyLR), reproduced
        # verbatim for parity; with per-step updates the poly decay is
        # therefore very shallow, exactly as in the reference
        sched = schedulers.poly_lr(
            cfg.num_epochs * cfg.data.training_size,
            cfg.scheduler.get("power", 0.9),
        )
    elif name == "none":
        sched = lambda s: 1.0
    else:
        raise NotImplementedError(name)

    lr = lambda step: o.lr * sched(step)
    tx = optim.make_optimizer(
        o.name, lr, weight_decay=o.weight_decay,
        momentum=o.get("momentum", 0.9), nesterov=o.get("nesterov", True),
        transformer_lr_scale=o.get("transformer_lr_scale", 0.1),
    )
    return tx


def make_synthetic_loaders(cfg: Config, seed: int = 0,
                           n_shards: int = None):
    """Synthetic train/val loader callables (batch dicts of jnp arrays).

    Mirrors the real loaders' production pipeline: host plumbing (+ window
    geometry for pallas models) built on a thread pool
    (``prefetch.pipelined_map``) so device steps overlap the 150-360 ms/batch
    host build (PERF.md round 3). ``n_shards`` has ``make_loaders``
    semantics: geometry shard-count override for consumers running a plain
    un-shard_map'd jit step (``evaluate.py``); default matches the
    training CLIs' ``dp_shard_count`` decision."""
    import jax.numpy as jnp

    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.data.loaders import _wgeom_params, dp_shard_count

    b = cfg.batch_size
    p = cfg.dataset.num_points
    n_train = cfg.data.training_size // b
    n_val = max(2, n_train // 4)
    use_host = bool(cfg.get_path("host_plumbing", True))
    caps = tuple(cfg.capacities) if use_host else None
    workers = int(cfg.get_path("workers", 4))
    wparams = _wgeom_params(cfg) if use_host else None
    if n_shards is None:
        n_shards = dp_shard_count(cfg)

    def add_plumbing(x):
        if caps is not None:
            from u2mkd_tpu.data import plumbing_host

            x["plumbing"] = plumbing_host.batch_plumbing(
                x["pcoords"], x["xyz"], x["pmask"], caps,
                wgeom_params=wparams, n_shards=n_shards,
            )
        return x

    def to_dev(x):
        import jax

        return jax.tree_util.tree_map(jnp.asarray, x)

    def _loader(rng_seed, n):
        rng = np.random.RandomState(rng_seed)
        raw = (synthetic.make_batch(rng, b, p, cfg.dataset.voxel_size)
               for _ in range(n))
        from u2mkd_tpu.data.prefetch import maybe_pipelined

        for x in maybe_pipelined(add_plumbing, raw, workers,
                                 enabled=caps is not None):
            yield to_dev(x)

    def train_loader():
        return _loader(seed, n_train)

    def val_loader():
        return _loader(seed + 1, n_val)

    return train_loader, val_loader


def make_synthetic_distill_loaders(cfg: Config):
    """Synthetic paired student/teacher loader callables for the TSD
    stage (used by ``train_lc_nusc_tsd_full.py`` and ``evaluate.py`` when
    ``dataset.name == synthetic``). Plumbing/window geometry is built
    in-jit by the distill steps' ``get_plumbing`` fallback."""
    import jax

    from u2mkd_tpu.data import synthetic

    b = cfg.batch_size
    p = cfg.dataset.num_points
    tp = cfg.dataset.teacher_points
    n_train = cfg.data.training_size // b
    n_val = max(2, n_train // 4)
    seed = cfg.train.seed % (2**31)

    def gen(seed_off, n):
        def it():
            rng = np.random.RandomState(seed + seed_off)
            for _ in range(n):
                raw = synthetic.make_multimodal_batch(
                    rng, b, p, tp, cfg.dataset.voxel_size,
                    num_cams=cfg.dataset.num_cams,
                    im_hw=tuple(cfg.dataset.image_size),
                )
                yield jax.tree_util.tree_map(jax.numpy.asarray, raw)

        return it

    return gen(0, n_train), gen(1, n_val)
