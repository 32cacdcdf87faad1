"""Top-k utilities, including the cross-chip merge.

The reference merges nothing across GPUs at query time (its faiss index is
replicated/sharded behind one process, ``colbert_ranker.py:145-157``); the
TPU design shards the corpus across chips and merges per-shard top-k over
ICI — the BASELINE.json north star.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk(scores: jax.Array, k: int, *, approx: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Top-k along the last axis. ``approx=True`` uses TPU-optimized
    ``approx_max_k`` (recall ~0.95 default) for large candidate sets."""
    if approx:
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)


def topk_merge_gathered(
    scores: jax.Array, ids: jax.Array, k: int, axis_name: str
) -> Tuple[jax.Array, jax.Array]:
    """Inside shard_map/pmap: all-gather per-shard top-k (ids must already be
    global) along ``axis_name`` and reduce to global top-k.

    scores/ids: (..., k_local) per shard -> (..., k) replicated.
    """
    all_scores = jax.lax.all_gather(scores, axis_name, axis=-1, tiled=True)
    all_ids = jax.lax.all_gather(ids, axis_name, axis=-1, tiled=True)
    s, i = jax.lax.top_k(all_scores, k)
    return s, jnp.take_along_axis(all_ids, i, axis=-1)
