"""Loss functions — the reference's nn loss-module family, functionally.

Mirrors python/oneflow/nn/modules loss surface (CrossEntropyLoss, NLLLoss,
MSELoss, L1Loss, BCEWithLogits, SmoothL1) with reduction semantics
("none" | "mean" | "sum") and optional ignore_index, as pure functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "none":
        return x
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(f"unknown reduction {reduction!r}")


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    reduction: str = "mean",
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Sparse softmax cross-entropy over the last axis (class logits)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.where(labels < 0, 0, labels) if ignore_index is None else jnp.where(
        labels == ignore_index, 0, labels
    )
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if ignore_index is not None:
        mask = (labels != ignore_index).astype(nll.dtype)
        nll = nll * mask
        if reduction == "mean":
            return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)
    return _reduce(nll, reduction)


def nll_loss(logp: jnp.ndarray, labels: jnp.ndarray, reduction: str = "mean"):
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(nll, reduction)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean"):
    return _reduce((pred - target) ** 2, reduction)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean"):
    return _reduce(jnp.abs(pred - target), reduction)


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0,
    reduction: str = "mean",
):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, reduction)


def bce_with_logits(
    logits: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean"
):
    # log-sum-exp stabilized: max(x,0) - x*t + log(1 + exp(-|x|))
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return _reduce(loss, reduction)
