"""Pooling / span helpers.

Functional parity with the reference's ``model_utils``
(``colbert/modeling/model_utils.py:5-43``): ``batch_index_select``,
``span_mean`` (prefix-sum span averaging), ``max_pool_by_mask``,
``avg_pool_by_mask`` — as pure jittable functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_index_select(t: jax.Array, idx: jax.Array) -> jax.Array:
    """t (B, L, ...) , idx (B, K) -> (B, K, ...): per-row gather."""
    return jnp.take_along_axis(t, idx.reshape(*idx.shape, *([1] * (t.ndim - 2))), axis=1)


def span_mean(hidden: jax.Array, spans: jax.Array) -> jax.Array:
    """Average token vectors over word spans via prefix sums.

    hidden (B, L, H); spans (B, S, 2) int [start, end) -> (B, S, H).
    Empty spans (end <= start) return zeros.  Prefix-sum formulation keeps
    it one gather + subtract instead of a masked matmul per span.
    """
    csum = jnp.cumsum(hidden, axis=1)
    csum = jnp.pad(csum, ((0, 0), (1, 0), (0, 0)))  # csum[:, i] = sum of first i
    start, end = spans[..., 0], spans[..., 1]
    tot = batch_index_select(csum, end) - batch_index_select(csum, start)
    n = jnp.maximum(end - start, 1)[..., None].astype(hidden.dtype)
    return jnp.where((end > start)[..., None], tot / n, 0.0)


def max_pool_by_mask(t: jax.Array, mask: jax.Array) -> jax.Array:
    """t (B, L, H), mask (B, L) -> (B, H): max over unmasked positions."""
    neg = jnp.finfo(t.dtype).min
    return jnp.where(mask[..., None] > 0, t, neg).max(axis=1)


def avg_pool_by_mask(t: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask[..., None].astype(t.dtype)
    return (t * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
