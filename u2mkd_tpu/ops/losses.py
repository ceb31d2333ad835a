"""Segmentation losses: masked Lovász-softmax, cross-entropy, KL distillation.

TPU-native equivalents of the reference criterion stack
(``core/criterions.py:40-229``): everything is fixed-shape and mask-driven
(the reference filters by ``labels != ignore`` with boolean indexing; we keep
padding in place and weight it out).

Lovász is the interesting one for TPU: per-class sorted errors x Lovász
gradient. We batch all C per-class problems into ONE [C, N] descending sort
(a single XLA sort), push invalid entries to the tail with -1 error where
they provably contribute zero, and do the cumsum-based gradient vectorized
over classes. 'present'-class averaging becomes a masked mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lovasz_softmax(logits: jax.Array, labels: jax.Array, valid: jax.Array) -> jax.Array:
    """Multi-class Lovász-softmax loss over valid entries.

    Matches ``lovasz_softmax_flat`` with ``classes='present'``
    (reference ``core/criterions.py:73-101``): probs = softmax(logits);
    for each class present in the valid labels, sort |1{y=c} - p_c| descending
    and take its dot product with the Lovász gradient of the sorted foreground
    indicator; average over present classes.

    logits: [N, C] float; labels: [N] int; valid: [N] bool.
    """
    n, c = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    fg = (labels[:, None] == jnp.arange(c)[None, :]) & valid[:, None]  # [N, C]
    fg = fg.astype(probs.dtype)
    errors = jnp.abs(fg - probs.astype(probs.dtype))  # [N, C]
    # invalid entries: error -1 sorts to the tail of a descending sort and,
    # with fg=0 there, contributes 0 to the dot product; entries after them
    # don't exist, so the cumsum perturbation is harmless.
    errors = jnp.where(valid[:, None], errors, -1.0)
    errors_t = errors.T  # [C, N]
    fg_t = fg.T
    order = jnp.argsort(-errors_t, axis=-1)
    errors_sorted = jnp.take_along_axis(errors_t, order, axis=-1)
    fg_sorted = jnp.take_along_axis(fg_t, order, axis=-1)
    # clamp the sentinel errors back to 0 so they cannot contribute
    errors_sorted = jnp.maximum(errors_sorted, 0.0)
    gts = jnp.sum(fg_sorted, axis=-1, keepdims=True)  # [C, 1]
    intersection = gts - jnp.cumsum(fg_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=-1
    )
    losses = jnp.sum(errors_sorted * grad, axis=-1)  # [C]
    present = gts[:, 0] > 0
    denom = jnp.maximum(jnp.sum(present), 1)
    return jnp.sum(jnp.where(present, losses, 0.0)) / denom


def cross_entropy(logits: jax.Array, labels: jax.Array, valid: jax.Array,
                  class_weight: jax.Array | None = None) -> jax.Array:
    """Mean CE over valid entries (torch ``CrossEntropyLoss(ignore_index)``
    semantics incl. weight-normalized mean)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    if class_weight is not None:
        w = class_weight[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def lovasz_ce(logits: jax.Array, labels: jax.Array, valid: jax.Array,
              class_weight: jax.Array | None = None) -> jax.Array:
    """``MixLovaszCrossEntropy`` (reference ``core/criterions.py:159-174``)."""
    return lovasz_softmax(logits, labels, valid) + cross_entropy(
        logits, labels, valid, class_weight
    )


def kl_div_batchmean(student_logits: jax.Array, teacher_logits: jax.Array,
                     valid: jax.Array) -> jax.Array:
    """KL(softmax(teacher) || softmax(student)) with torch KLDivLoss
    ``reduction='batchmean'`` semantics over the valid rows: sum of pointwise
    KL divided by the number of rows (reference ``nusc_trainers.py:334``,
    teacher logits are detached by the caller)."""
    logp = jax.nn.log_softmax(student_logits, axis=-1)
    q = jax.nn.softmax(teacher_logits, axis=-1)
    logq = jax.nn.log_softmax(teacher_logits, axis=-1)
    pointwise = jnp.sum(q * (logq - logp), axis=-1)
    pointwise = jnp.where(valid, pointwise, 0.0)
    return jnp.sum(pointwise) / jnp.maximum(jnp.sum(valid), 1)


def masked_mse(a: jax.Array, b: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean squared error over valid rows (torch ``mse_loss`` mean over all
    elements of the selected rows)."""
    d = (a - b) ** 2
    d = jnp.where(valid[:, None], d, 0.0)
    return jnp.sum(d) / jnp.maximum(jnp.sum(valid) * a.shape[-1], 1)
