"""Dataset -> batched loader glue for the training CLIs.

Replaces the reference's torch DataLoader + DistributedSampler stack
(``train_spformer.py:63-75``): plain Python iteration with per-epoch
shuffling and host-side collation into padded numpy batches. Device
sharding happens in the jitted step (shard_map), so there is no per-rank
sampler — the whole batch is built once and split across the mesh.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np


def _maybe_inst_augmenter(cfg, dataset_kind: str):
    d = cfg.dataset
    if not d.get("inst_aug"):
        return None
    from u2mkd_tpu.data.instaug import InstAugmentation

    if dataset_kind == "nusc":
        from u2mkd_tpu.data.semantic_nusc import CLASS_NAMES_17

        return InstAugmentation(
            instance_pkl_path=d.inst_pkl_path,
            thing_list=list(range(1, 11)), ground_list=[11, 12, 13],
            pair_list=[[11]] * 6 + [[11, 12, 13], [11, 12, 13], [11], [11]],
            add_num=d.inst_add_num, num_classes=cfg.data.num_classes,
            class_name=["barrier", "bicycle", "bus", "car",
                        "construction_vehicle", "motorcycle", "pedestrian",
                        "traffic_cone", "trailer", "truck"],
            class_weight=[0, 60272, 2561, 8091, 156414, 6908, 3036, 35011,
                          13188, 14186, 41250],
            class_min_num=[10, 10, 100, 100, 100, 10, 10, 10, 100, 100],
            feat_dim=4, feat_dim_s=5,
        )
    else:  # kitti
        from u2mkd_tpu.data.semantic_kitti import (
            KITTI_CLASS_NAME, KITTI_GROUND_LIST, KITTI_PAIR_LIST,
            KITTI_THING_LIST,
        )

        return InstAugmentation(
            instance_pkl_path=d.inst_pkl_path, thing_list=KITTI_THING_LIST,
            ground_list=KITTI_GROUND_LIST, pair_list=KITTI_PAIR_LIST,
            add_num=d.inst_add_num, num_classes=cfg.data.num_classes,
            class_name=KITTI_CLASS_NAME,
            class_weight=[0, 115689, 2979, 2315, 2402, 5988, 4545, 916, 479],
            class_min_num=[300, 50, 50, 300, 300, 25, 25, 25],
            feat_dim=4, feat_dim_s=4,
        )


class PlumbingStage:
    """Picklable plumbing stage for process-pool loader workers
    (``prefetch.process_pipelined_map`` — VERDICT r3 next #3). Builds conv
    rulebooks + window geometry for one (or, for TSD, both) padded feeds;
    state is plain config data, so forked workers reconstruct it cheaply."""

    def __init__(self, caps, wgeom_params=None, n_shards=1,
                 tsd_caps=None, concurrent_feeds=True):
        self.caps = caps                 # uni-modal: one cap tuple
        self.tsd_caps = tsd_caps         # TSD: {"student": caps, "teacher": caps}
        self.wgeom_params = wgeom_params
        self.n_shards = n_shards
        self.concurrent_feeds = concurrent_feeds

    def _one(self, sub, caps):
        from u2mkd_tpu.data import plumbing_host

        return plumbing_host.batch_plumbing(
            sub["pcoords"], sub["xyz"], sub["pmask"], caps,
            wgeom_params=self.wgeom_params, n_shards=self.n_shards,
        )

    def __call__(self, batch):
        if self.tsd_caps is None:
            batch["plumbing"] = self._one(batch, self.caps)
            return batch
        items = list(self.tsd_caps.items())
        if self.concurrent_feeds and len(items) > 1:
            # the student/teacher builds are independent; overlap them
            # (the C++ builders release the GIL)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(items)) as ex:
                futs = {k: ex.submit(self._one, batch[k], c)
                        for k, c in items}
            for k, f in futs.items():
                batch[k]["plumbing"] = f.result()
        else:
            for k, c in items:
                batch[k]["plumbing"] = self._one(batch[k], c)
        return batch


def _epoch_iter(ds, batch_size, collate_fn, shuffle, rng, to_device,
                plumbing_caps=None, process_shard=False, wgeom_params=None,
                n_shards=1, workers=0, worker_processes=False):
    order = np.arange(len(ds))
    if shuffle:
        rng.shuffle(order)
    if process_shard:
        # multi-host: every process draws the SAME shuffled order (seeded
        # rng) and keeps a disjoint per-process slice, truncated to a common
        # length so every process runs the same number of lockstep steps -
        # the reference's DistributedSampler semantics
        # (train_spformer.py:63-68)
        import jax

        per = len(order) // jax.process_count()
        order = order[jax.process_index()::jax.process_count()][:per]
    n_batches = len(order) // batch_size

    def raw_batches():
        # serial: dataset augmentation shares one RandomState per dataset
        for bi in range(n_batches):
            idxs = order[bi * batch_size:(bi + 1) * batch_size]
            yield collate_fn([ds[int(i)] for i in idxs])

    # pure numpy/C++ — safe and profitable to run on a thread (or, with
    # worker_processes, process) pool
    add_plumbing = PlumbingStage(plumbing_caps, wgeom_params, n_shards) \
        if plumbing_caps is not None else (lambda b: b)

    from u2mkd_tpu.data.prefetch import maybe_pipelined

    for batch in maybe_pipelined(add_plumbing, raw_batches(), workers,
                                 enabled=plumbing_caps is not None,
                                 use_processes=worker_processes):
        yield to_device(batch)


def dp_shard_count(cfg) -> int:
    """Number of LOCAL data-parallel shards a loader batch will be split
    into — delegates to the CLIs' shared DP predicate
    (``parallel.mesh.use_data_parallel``) so loader and step cannot
    disagree on the wgeom shard layout."""
    import jax

    from u2mkd_tpu.parallel.mesh import use_data_parallel

    return jax.local_device_count() if use_data_parallel(cfg) else 1


def _wgeom_params(cfg):
    """Host window-geometry spec when the flash-attention path will consume
    it (pallas_attention spformer models with host plumbing on)."""
    if not cfg.model.get("pallas_attention", False):
        return None
    if "spformer" not in cfg.model.name:
        return None
    from u2mkd_tpu.data import wgeom_host

    return wgeom_host.params_from_cfg(cfg)


def make_loaders(cfg, seed: int = 0, tta_val: bool = False,
                 n_shards: int = None):
    """Uni-modal loaders (semantic_nusc / semantic_kitti).

    ``tta_val=True`` builds the val dataset with per-pass augmentation so
    each vote of a multi-vote evaluation sees a freshly augmented copy with
    a fixed sample order (reference ``nusc_trainers.py:441-550``).

    ``n_shards`` overrides the data-parallel shard count the window
    geometry is laid out for (default: ``dp_shard_count(cfg)``, matching
    the training CLIs' shard_map decision). Consumers that run a plain
    un-shard_map'd jit step on a multi-device host — ``evaluate.py`` —
    must pass ``n_shards=1`` or the step rejects the geometry."""
    import jax.numpy as jnp

    name = cfg.dataset.name
    d = cfg.dataset
    cap = int(cfg.capacities[0])
    if name == "semantic_nusc":
        from u2mkd_tpu.data.semantic_nusc import SemanticNusc, collate

        def build(split):
            return SemanticNusc(
                d.root, d.voxel_size, cap, d.get("version", "v1.0-trainval"),
                split, num_sweeps=d.multisweeps.num_sweeps,
                only_past=d.multisweeps.only_past, flip_aug=d.flip_aug,
                rotate_aug=d.rotate_aug, translate_std=d.get("translate_std"),
                inst_augmenter=_maybe_inst_augmenter(cfg, "nusc")
                if split == "train" else None,
                seed=seed,
                allow_unofficial_split=d.get("allow_unofficial_split", False),
                tta=tta_val and split == "val",
            )
        collate_fn = collate
    elif name == "semantic_kitti":
        from u2mkd_tpu.data.semantic_kitti import SemanticKITTI
        from u2mkd_tpu.data.semantic_nusc import collate

        def build(split):
            return SemanticKITTI(
                d.root, d.voxel_size, cap, split,
                num_sweeps=d.multisweeps.num_sweeps, flip_aug=d.flip_aug,
                rotate_aug=d.rotate_aug, translate_std=d.get("translate_std"),
                inst_augmenter=_maybe_inst_augmenter(cfg, "kitti")
                if split == "train" else None,
                seed=seed,
                tta=tta_val and split == "val",
            )
        collate_fn = collate
    elif name == "semantic_waymo":
        from u2mkd_tpu.data.waymo import WaymoSeg
        from u2mkd_tpu.data.semantic_nusc import collate

        if d.get("inst_aug"):
            # the reference never shipped Waymo InstAugmentation parameters
            # (its waymo dataset variants are commented out, builder.py:140-157)
            raise NotImplementedError(
                "dataset.inst_aug has no reference parameterization for "
                "Waymo; build a DB with prepare_inst_database.py waymo and "
                "wire class weights explicitly before enabling it"
            )

        def build(split):
            return WaymoSeg(
                d.root, d.voxel_size, cap, split, flip_aug=d.flip_aug,
                rotate_aug=d.rotate_aug, translate_std=d.get("translate_std"),
                seed=seed,
                val_fraction=d.get("val_fraction", 0.15),
                tta=tta_val and split == "val",
            )
        collate_fn = collate
    else:
        raise NotImplementedError(name)

    train_ds, val_ds = build("train"), build("val")
    rng = np.random.RandomState(seed)
    pcaps = tuple(cfg.capacities) if cfg.get_path("host_plumbing", True) else None
    multihost = bool(cfg.get_path("train.multihost", False))

    if multihost:
        from u2mkd_tpu.parallel import mesh as pmesh

        gmesh = pmesh.make_global_mesh()

        def to_device(batch):
            return pmesh.shard_host_batch(batch, gmesh)
    else:
        from u2mkd_tpu.parallel.mesh import to_local_device as to_device

    from u2mkd_tpu.data.prefetch import prefetched_loader

    wparams = _wgeom_params(cfg) if pcaps is not None else None
    if n_shards is None:
        n_shards = dp_shard_count(cfg)
    workers = int(cfg.get_path("workers", 4))
    # process-pool plumbing workers escape the GIL for the numpy stages
    # (threads already cover the GIL-releasing C++ builders); costs one
    # pickle round-trip per batch — see prefetch.process_pipelined_map
    wproc = bool(cfg.get_path("worker_processes", False))

    def train_loader():
        return _epoch_iter(train_ds, cfg.batch_size, collate_fn, True, rng,
                           to_device, pcaps, process_shard=multihost,
                           wgeom_params=wparams, n_shards=n_shards,
                           workers=workers, worker_processes=wproc)

    def val_loader():
        return _epoch_iter(val_ds, cfg.batch_size, collate_fn, False, rng,
                           to_device, pcaps, process_shard=multihost,
                           wgeom_params=wparams, n_shards=n_shards,
                           workers=workers, worker_processes=wproc)

    depth = int(cfg.get_path("prefetch_depth", 2))
    return prefetched_loader(train_loader, depth), prefetched_loader(val_loader, depth)


def make_distill_loaders(cfg, seed: int = 0, tta_val: bool = False,
                         n_shards: int = None):
    """Paired student/teacher loaders (lc_semantic_nusc_tsd_full).

    ``tta_val`` / ``n_shards`` follow ``make_loaders`` semantics: per-pass
    val augmentation for multi-vote TTA, and a shard-count override for
    consumers running an un-shard_map'd eval step (``evaluate.py``)."""
    import jax

    from u2mkd_tpu.data.lc_semantic_nusc import LCSemanticNuscTSD, collate_tsd

    d = cfg.dataset
    s_cap = int((cfg.get_path("student_capacities") or cfg.capacities)[0])
    t_cap = int((cfg.get_path("teacher_capacities") or cfg.capacities)[0])

    def build(split):
        return LCSemanticNuscTSD(
            d.root, d.voxel_size, s_cap, t_cap,
            d.get("version", "v1.0-trainval"), split,
            num_sweeps=d.multisweeps.num_sweeps,
            only_past=d.multisweeps.only_past,
            im_drop=d.im_drop, im_cr=d.im_cr,
            inst_augmenter=_maybe_inst_augmenter(cfg, "nusc")
            if split == "train" else None,
            seed=seed,
            allow_unofficial_split=d.get("allow_unofficial_split", False),
            tta=tta_val and split == "val",
            label_drop_p=d.get("label_drop_p", 0.0) if split == "train"
            else 0.0,
            label_drop_classes=d.get("label_drop_classes", ())
            if split == "train" else (),
        )

    train_ds, val_ds = build("train"), build("val")
    rng = np.random.RandomState(seed)
    s_caps = tuple(cfg.get_path("student_capacities") or cfg.capacities)
    t_caps = tuple(cfg.get_path("teacher_capacities") or cfg.capacities)
    use_host = cfg.get_path("host_plumbing", True)

    wparams = _wgeom_params(cfg) if use_host else None
    if n_shards is None:
        n_shards = dp_shard_count(cfg)
    multihost = bool(cfg.get_path("train.multihost", False))

    # student/teacher plumbing builds run concurrently inside the stage
    # (independent feeds; the C++ builders release the GIL)
    add_plumbing = PlumbingStage(
        None, wparams, n_shards,
        tsd_caps={"student": s_caps, "teacher": t_caps},
    ) if use_host else (lambda b: b)

    if multihost:
        # stage-2 scale-out mirrors stage 1 (reference trains the student
        # under the same DDP wrap, train_lc_nusc_tsd_full.py:83-84)
        from u2mkd_tpu.parallel import mesh as pmesh

        gmesh = pmesh.make_global_mesh()

        def to_device(batch):
            return pmesh.shard_host_batch(batch, gmesh)
    else:
        from u2mkd_tpu.parallel.mesh import to_local_device as to_device

    from u2mkd_tpu.data.prefetch import maybe_pipelined, prefetched_loader

    workers = int(cfg.get_path("workers", 4))
    wproc = bool(cfg.get_path("worker_processes", False))

    # val host cost (VERDICT r4 next #5): the student-only eval step never
    # runs the teacher (reference gates teacher-val behind debug.debug_val,
    # train_lc_nusc_tsd_full.py:96-121), so building the multisweep
    # teacher's plumbing — the bulk of the per-batch host cost at Pt=131k —
    # is skipped for the val loader unless debug_val (or TTA eval, whose
    # consumers pass their own flag) asks for it.
    val_needs_teacher = bool(cfg.get_path("debug.debug_val", False))
    val_plumbing = add_plumbing if (val_needs_teacher or not use_host) else \
        PlumbingStage(None, wparams, n_shards,
                      tsd_caps={"student": s_caps})

    def _loader(ds, shuffle, stage):
        raw = _epoch_iter(ds, cfg.batch_size, collate_tsd, shuffle, rng,
                          lambda x: x, process_shard=multihost)
        for b in maybe_pipelined(stage, raw, workers,
                                 enabled=use_host, use_processes=wproc):
            yield to_device(b)

    def train_loader():
        return _loader(train_ds, True, add_plumbing)

    def val_loader():
        return _loader(val_ds, False, val_plumbing)

    depth = int(cfg.get_path("prefetch_depth", 2))
    return prefetched_loader(train_loader, depth), prefetched_loader(val_loader, depth)
