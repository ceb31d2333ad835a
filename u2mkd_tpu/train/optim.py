"""Optimizers with transformer-block LR scaling (reference
``core/builder.py:662-719``).

The reference's ``*_spformer`` variants give parameters whose name contains
``transformer_block`` a scaled LR (0.1x for SGD, ``transformer_lr_scale`` for
AdamW). Our equivalent masks parameters whose path contains ``sphereformer``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def _transformer_mask(params):
    def is_tf(path):
        return any("sphereformer" in str(p) for p in path)

    return jax.tree_util.tree_map_with_path(lambda path, _: is_tf(path), params)


def make_optimizer(
    name: str,
    lr: float | Callable,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    nesterov: bool = True,
    transformer_lr_scale: float = 0.1,
) -> optax.GradientTransformation:
    """name in {sgd, sgd_spformer, adam, adamw, adamw_spformer}.

    Torch-SGD semantics: grad += wd * param before momentum; LR applied last.
    """
    if name in ("sgd", "sgd_spformer"):
        core = [
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=nesterov),
        ]
    elif name == "adam":
        # torch Adam couples weight decay into the gradient (L2), so decay
        # must be applied before the Adam moment update
        core = [optax.add_decayed_weights(weight_decay), optax.scale_by_adam()]
    elif name in ("adamw", "adamw_spformer"):
        core = [optax.scale_by_adam(), optax.add_decayed_weights(weight_decay)]
    else:
        raise NotImplementedError(name)

    chain = core + [
        optax.scale_by_learning_rate(lr),
    ]
    tx = optax.chain(*chain)
    if name.endswith("_spformer"):
        tx = optax.chain(
            tx,
            optax.masked(optax.scale(transformer_lr_scale), _transformer_mask),
        )
    return tx
