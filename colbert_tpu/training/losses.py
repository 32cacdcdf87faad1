"""Training losses.

The only loss the reference actually trains with is ``BiEncoderNllLoss``
(``colbert/training/losses.py:29-47``): log-softmax over the in-batch score
matrix + NLL at the positive column, mean-reduced.  ``listnet_loss`` and
``kl_loss`` (``losses.py:7-17``) are kept as distillation utilities; the
rest of the reference's loss zoo is dead code (SURVEY §2) and not rebuilt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def biencoder_nll_loss(scores: jax.Array, positive_idx: jax.Array) -> jax.Array:
    """scores: (Q, D) similarity matrix (already temperature-scaled);
    positive_idx: (Q,) int — column of the positive doc per query."""
    logprobs = jax.nn.log_softmax(scores, axis=1)
    return -jnp.take_along_axis(logprobs, positive_idx[:, None], axis=1).mean()


def listnet_loss(y_pred: jax.Array, y_true: jax.Array, eps: float = 1e-10) -> jax.Array:
    p_true = jax.nn.softmax(y_true, axis=-1)
    p_pred = jax.nn.softmax(y_pred, axis=-1) + eps
    return jnp.mean(-jnp.sum(p_true * jnp.log(p_pred), axis=-1))


def kl_loss(y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    q = jax.nn.softmax(y_true, axis=-1)
    logq = jax.nn.log_softmax(y_true, axis=-1)
    return jnp.sum(q * (logq - logp)) / y_pred.shape[0]


def positive_ranks(scores: jax.Array, group_size: int, num_pos: int) -> jax.Array:
    """Per-query mean sorted rank of the positive docs (lower is better);
    the per-row form of the reference's ``get_mrr`` proxy
    (``colbert_model.py:21-28``).

    Row i's positives are columns [i*group_size, i*group_size + num_pos).
    """
    nq, nd = scores.shape
    order = jnp.argsort(-scores, axis=-1)  # descending
    col = jnp.arange(nq)[:, None] * group_size
    is_pos = (order >= col) & (order < col + num_pos)
    ranks = jnp.broadcast_to(jnp.arange(nd)[None, :], scores.shape)
    return jnp.where(is_pos, ranks, 0).sum(axis=-1) / num_pos


def reciprocal_ranks(scores: jax.Array, group_size: int, num_pos: int) -> jax.Array:
    """Per-query reciprocal rank of the first positive."""
    nq, nd = scores.shape
    order = jnp.argsort(-scores, axis=-1)
    col = jnp.arange(nq)[:, None] * group_size
    is_pos = (order >= col) & (order < col + num_pos)
    first = jnp.argmax(is_pos, axis=-1)  # rank of first positive
    return 1.0 / (first + 1.0)


def mean_positive_rank(scores: jax.Array, group_size: int, num_pos: int) -> jax.Array:
    """Batch mean of :func:`positive_ranks` (the reference's training-time
    eval proxy)."""
    return positive_ranks(scores, group_size, num_pos).mean()


def reciprocal_rank_of_first_positive(scores: jax.Array, group_size: int, num_pos: int) -> jax.Array:
    """True MRR over the in-batch eval groups (a better-behaved proxy than
    the reference's mean-rank; both are reported)."""
    return reciprocal_ranks(scores, group_size, num_pos).mean()
