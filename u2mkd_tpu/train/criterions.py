"""Criterion factories (API parity with reference ``core/builder.py:626-659``
and the criterion modules in ``core/criterions.py``).

The jitted steps call the mask-based functions in
:mod:`u2mkd_tpu.ops.losses` directly; these factories provide the
reference's named-criterion surface for users composing their own loops.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from u2mkd_tpu.ops import losses


def _valid_of(ignore):
    """Ignore-mask composition shared by every criterion factory: labels at
    ``ignore`` are dropped, AND-ed with any caller mask."""

    def valid_of(labels, valid):
        v = labels != ignore
        return v if valid is None else (v & valid)

    return valid_of


def make_criterion(cfg) -> Callable:
    """name in {cross_entropy, lovasz}: (logits [N,C], labels [N], valid [N])
    -> scalar."""
    name = cfg.criterion.name
    ignore = cfg.criterion.get("ignore_index", 0)
    valid_of = _valid_of(ignore)

    if name == "cross_entropy":
        def crit(logits, labels, valid=None):
            return losses.cross_entropy(logits, labels, valid_of(labels, valid))
        return crit
    if name == "lovasz":
        def crit(logits, labels, valid=None):
            return losses.lovasz_ce(logits, labels, valid_of(labels, valid))
        return crit
    raise NotImplementedError(name)


def make_criterion_dict(cfg) -> Dict[str, Callable]:
    """List-config form: returns {'ce','lovasz','kl','mse'} callables
    (reference ``make_criterion_dict``, dict keys per ``nusc_trainers``
    usage)."""
    ignore = cfg.criterion.get("ignore_index", 0)
    valid_of = _valid_of(ignore)

    def lovasz(logits, labels, valid=None):
        return losses.lovasz_ce(logits, labels, valid_of(labels, valid))

    def ce(logits, labels, valid=None):
        return losses.cross_entropy(logits, labels, valid_of(labels, valid))

    def kl(student_logits, teacher_logits, valid=None):
        v = jnp.ones(student_logits.shape[:-1], bool) if valid is None else valid
        return losses.kl_div_batchmean(student_logits, teacher_logits, v)

    def mse(a, b, valid=None):
        v = jnp.ones(a.shape[:-1], bool) if valid is None else valid
        return losses.masked_mse(a, b, v)

    return {"ce": ce, "lovasz": lovasz, "kl": kl, "mse": mse}
