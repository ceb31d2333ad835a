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


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


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
