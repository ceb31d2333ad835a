"""Device mesh + shard_map data parallelism.

TPU-native replacement for the reference's distributed substrate
(torchpack MPI launch + DDP/NCCL, SURVEY §2.10): one jitted program,
batch sharded over a 1-D ``data`` mesh axis, gradients / BN statistics /
metric counters reduced with ``psum``/``pmean`` over ICI inside the step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization — the TPU-native replacement for the
    reference's ``torchpack dist-run`` MPI launch (``README.md:89``,
    SURVEY §2.10). On TPU pods with no arguments, jax auto-discovers the
    coordinator from the runtime environment; on CPU/GPU clusters pass the
    coordinator address + process grid explicitly. No-op when jax.distributed
    is already initialized or when single-process with no coordinator."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run outside a pod environment
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def use_data_parallel(cfg) -> bool:
    """THE data-parallel decision: shard the step over the device mesh when
    more than one device is visible and the global batch divides evenly.
    Single source of truth — the training/eval CLIs (step construction,
    axis_name, world-scaled schedule) and the loaders' window-geometry
    shard layout (``loaders.dp_shard_count``) must agree, or the shipped
    wgeom leading shard dim won't match what the step expects."""
    return jax.device_count() > 1 and cfg.batch_size % jax.device_count() == 0


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over ALL devices across every process: DP collectives ride
    ICI within a host/pod slice and DCN across hosts, inserted by XLA."""
    return Mesh(np.asarray(jax.devices()), (axis,))


# batch keys that stay process-local: python lists of per-sample metadata
# (ragged info dicts, string tokens) that the jitted step never sees
HOST_LOCAL_KEYS = ("infos", "lidar_tokens")


def device_batch(batch):
    """The jit-safe view of a loader batch: top-level host-local metadata
    (``infos`` ragged dicts, ``lidar_tokens`` strings — present in every
    real-dataset batch) is dropped; everything else passes through. Every
    call into a jitted/shard_map'd step must go through this — string or
    ragged leaves otherwise raise a TypeError at trace time (and would
    force per-batch recompiles even if they traced)."""
    if isinstance(batch, dict):
        return {k: v for k, v in batch.items() if k not in HOST_LOCAL_KEYS}
    return batch


def to_local_device(batch):
    """Single-host batch upload: ``jnp.asarray`` every numpy leaf EXCEPT
    the ``HOST_LOCAL_KEYS`` subtrees, which stay host-side numpy/python.
    The infos carry full raw-cloud arrays (inds/inverse_map/labels_full)
    consumed only by host-side raw-point scoring — uploading them would be
    pure wasted H2D/D2H traffic on every batch (the multihost
    ``shard_host_batch`` already keeps them process-local)."""
    import jax.numpy as jnp

    def walk(x):
        if isinstance(x, dict):
            return {
                k: v if k in HOST_LOCAL_KEYS else walk(v) for k, v in x.items()
            }
        if isinstance(x, (list, tuple)):
            return type(x)(walk(v) for v in x)
        return jnp.asarray(x) if isinstance(x, np.ndarray) else x

    return walk(batch)


def shard_host_batch(batch, mesh: Mesh):
    """Per-process local batch -> globally sharded jax.Arrays.

    Each process feeds only its shard (its loaders see 1/num_processes of
    the data, like the reference's DistributedSampler,
    ``train_spformer.py:63-68``); ``make_array_from_process_local_data``
    assembles the logical global batch without any cross-host copy.
    Non-array leaves (``infos`` ragged dicts, ``lidar_tokens`` strings)
    remain process-local — host-side consumers (raw-point eval) handle them
    per process and reduce counters across processes."""
    sharding = NamedSharding(mesh, PS(DATA_AXIS))

    def walk(x):
        if isinstance(x, dict):
            return {
                k: v if k in HOST_LOCAL_KEYS else walk(v) for k, v in x.items()
            }
        if isinstance(x, (list, tuple)):
            return type(x)(walk(v) for v in x)
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return walk(batch)


def local_data(x) -> np.ndarray:
    """This process's contiguous block of a batch-sharded global array (its
    own loader's samples, in order). Falls back to a plain device_get for
    fully addressable arrays."""
    if not hasattr(x, "addressable_shards") or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    shards = sorted(
        x.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def local_batch_indices(n: int, seed_order: np.ndarray) -> np.ndarray:
    """This process's slice of a (shuffled) global index order."""
    return seed_order[jax.process_index()::jax.process_count()]


def shard_batch_spec(batch):
    """PartitionSpec tree: shard every batch array on its leading axis."""
    return jax.tree_util.tree_map(lambda _: PS(DATA_AXIS), batch)


def data_parallel_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a (state, batch, rng) -> (state, metrics) step with shard_map:
    state replicated, batch sharded on the data axis, step_fn must psum/pmean
    internally (pass axis_name=DATA_AXIS when building it)."""

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(PS(), PS(DATA_AXIS), PS()),
        out_specs=(PS(), PS()),
        check_rep=False,
    )
    return jax.jit(fn)


def data_parallel_eval(eval_fn: Callable, mesh: Mesh) -> Callable:
    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(PS(), PS(DATA_AXIS)),
        out_specs={"pred": PS(DATA_AXIS), "counts": PS(), "logits": PS(DATA_AXIS)},
        check_rep=False,
    )
    return jax.jit(fn)


def data_parallel_distill_eval(eval_fn: Callable, mesh: Mesh,
                               run_teacher: bool = False) -> Callable:
    """shard_map wrapper for the stage-2 eval step: psum'd counters
    replicated, per-point outputs sharded on the data axis."""
    from jax.experimental.shard_map import shard_map

    out_specs = {
        "pred_vox": PS(DATA_AXIS), "pred_pix": PS(DATA_AXIS),
        "counts_vox": PS(), "counts_pix": PS(),
        "logits": PS(DATA_AXIS), "logits_pix": PS(DATA_AXIS),
    }
    if run_teacher:
        out_specs["counts_teacher"] = PS()
    fn = shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(PS(), PS(DATA_AXIS)),
        out_specs=out_specs,
        check_rep=False,
    )
    return jax.jit(fn)
