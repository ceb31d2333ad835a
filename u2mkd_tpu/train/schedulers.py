"""LR schedules (reference ``core/schedulers.py`` and ``builder.py:722-747``)."""

from __future__ import annotations

import math


def cosine_schedule_with_warmup(num_epochs: int, batch_size: int,
                                dataset_size: int, world_size: int = 1):
    """Per-step multiplier: linear warmup (1000/world iters, none single
    device) then cosine to zero over the full run. World-scaled batch
    semantics match reference ``core/schedulers.py:10-37``."""
    eff_batch = batch_size * world_size
    warmup_iters = 0 if world_size == 1 else 1000 // world_size
    iter_per_epoch = (dataset_size + eff_batch - 1) // eff_batch
    total = num_epochs * iter_per_epoch

    def schedule(step):
        import jax.numpy as jnp

        warm = (step + 1) / max(warmup_iters, 1)
        cos = 0.5 * (1 + jnp.cos(math.pi * (step - warmup_iters) / total))
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule


def poly_lr(max_iter: int, power: float = 0.9):
    """DeepLab poly schedule (reference ``PolyLR``)."""

    def schedule(step):
        return (1.0 - step / (max_iter + 1)) ** power

    return schedule
