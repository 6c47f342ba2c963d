"""Losses and metrics.

Parity targets:
* SmoothCrossEntropyLoss — one-hot label smoothing with pad masking,
  mean over non-pad tokens (reference MusicTransformer/criterion.py:28-67),
* CategoricalAccuracy — argmax match over non-pad tokens
  (reference metrics.py:40-52),
* MetricsSet — dict-of-metrics applier (reference metrics.py:63-75).

All functions are pure and jit-safe; computation is f32 regardless of the
model's compute dtype.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def smooth_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    vocab_size: int,
    label_smoothing: float = 0.1,
    ignore_index: int | None = None,
) -> jnp.ndarray:
    """Label-smoothed CE, mean over non-ignored targets.

    logits: [..., V]; targets: [...] int. Matches criterion.py:43-64:
    q' = (1-eps) * onehot + eps/V, rows for ignored targets zeroed, sum of
    per-token CE divided by the count of non-ignored tokens.
    """
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # gather form of -(q * log_probs).sum(-1) with
    # q = (1-eps) * onehot(t) + eps/V: never materializes the [N, V]
    # one-hot/q arrays (at a 32k vocab they dominate the loss's HBM
    # traffic). in_range reproduces one_hot's all-zero row for
    # out-of-range targets; ignored rows are dropped from both terms.
    tgt = jnp.clip(targets, 0, vocab_size - 1)[..., None]
    tgt_lp = jnp.take_along_axis(log_probs, tgt, axis=-1)[..., 0]
    in_range = ((targets >= 0) & (targets < vocab_size)).astype(
        jnp.float32)
    ce = -((1.0 - label_smoothing) * tgt_lp * in_range
           + (label_smoothing / vocab_size) * log_probs.sum(axis=-1))
    if ignore_index is not None:
        keep = (targets != ignore_index).astype(jnp.float32)
        ce = ce * keep
        denom = jnp.maximum(keep.sum(), 1.0)
    else:
        denom = jnp.float32(targets.size)
    return ce.sum() / denom


def token_accuracy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int | None = None,
) -> jnp.ndarray:
    """Argmax accuracy over non-ignored tokens (metrics.py:40-52)."""
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == targets).astype(jnp.float32)
    if ignore_index is not None:
        keep = (targets != ignore_index).astype(jnp.float32)
        return (hit * keep).sum() / jnp.maximum(keep.sum(), 1.0)
    return hit.mean()


def CategoricalAccuracy(ignore_index: int | None = None):
    return lambda logits, targets: token_accuracy(logits, targets,
                                                  ignore_index)


class MetricsSet:
    """Compose named metric fns: apply them all to (logits, targets)
    (reference metrics.py:63-75)."""

    def __init__(self, metrics: Dict[str, Callable]):
        self.metrics = dict(metrics)

    def __call__(self, logits, targets) -> Dict[str, jnp.ndarray]:
        return {name: fn(logits, targets)
                for name, fn in self.metrics.items()}


def popmag_masked_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       mask: jnp.ndarray):
    """Masked 3-head CE for PoPMAG (reference PoPMAG_RNN/train.py:252-256,
    minus its double-softmax bug — see models/popmag.py docstring).

    logits: [..., 3, mx_dim] f32; labels: [..., 3] int per-head ids;
    mask: [..., 3] {0,1}. Returns (loss, accuracy) over masked slots.
    """
    mx = logits.shape[-1]
    labels = labels.astype(jnp.int32)
    # defensively exclude malformed label ids (outside [0, mx)) instead of
    # letting an out-of-bounds gather poison the loss
    in_range = (labels >= 0) & (labels < mx)
    labels = jnp.clip(labels, 0, mx - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None],
                               axis=-1)[..., 0]
    m = mask.astype(jnp.float32) * in_range.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    loss = (nll * m).sum() / denom
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    return loss, (correct * m).sum() / denom


def logits_bucketting(logits: jnp.ndarray) -> jnp.ndarray:
    """Flat argmax token ids for histogram/diversity inspection
    (reference metrics.py:55-60 LogitsBucketting)."""
    return jnp.argmax(logits, axis=-1).reshape(-1).astype(jnp.int32)
