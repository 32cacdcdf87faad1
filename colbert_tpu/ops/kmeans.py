"""K-means on TPU: Lloyd iterations as chunked matmul + argmin.

TPU-native replacement for faiss's CPU/GPU clustering
(reference: ``colbert/indexing/faiss_index.py:30-43``,
``faiss_index_gpu.py:61-79``), used for the IVF coarse quantizer and (in
batched form, see :mod:`colbert_tpu.ops.pq`) PQ codebook training.

Design: one jitted program runs all iterations via ``lax.scan``; each
iteration streams the points in fixed-size chunks (static shapes), computes
``argmin_c ||x - c||^2`` from the MXU matmul ``x @ c^T`` (the ``||x||^2``
term is constant per point and dropped), and accumulates per-cluster sums
and counts with a one-hot matmul — also on the MXU — instead of a scatter.
Empty clusters keep their previous centroid (faiss does random
reassignment; with sampled training data the difference is noise).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pad_points(points: jax.Array, chunk: int) -> Tuple[jax.Array, jax.Array]:
    n = points.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    valid = jnp.arange(n_pad) < n
    if n_pad != n:
        points = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    return points, valid


def assign_clusters(points: jax.Array, centroids: jax.Array, chunk: int = 16384) -> jax.Array:
    """argmin_c ||x-c||^2 per point, chunked.  points (N,d), centroids (K,d) -> (N,) int32."""
    n = points.shape[0]
    points_p, _ = _pad_points(points, chunk)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)  # (K,)

    def body(chunk_pts):
        # bf16 operands, fp32 accumulate: 4x the f32 MXU rate; distance
        # argmins tolerate bf16 (ties flip, both assignments are valid)
        dots = jnp.dot(chunk_pts.astype(jnp.bfloat16), centroids.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=-1).astype(jnp.int32)

    out = jax.lax.map(body, points_p.reshape(-1, chunk, points.shape[1]))
    return out.reshape(-1)[:n]


def nearest_centroids(points: jax.Array, centroids: jax.Array, kc: int, chunk: int = 16384) -> jax.Array:
    """Top-``kc`` nearest centroid ids per point (best first), chunked —
    the device half of balanced assignment (host greedy fill is in
    ``colbert_tpu.native.balanced_assign``)."""
    n = points.shape[0]
    points_p, _ = _pad_points(points, chunk)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)

    def body(chunk_pts):
        dots = jnp.dot(chunk_pts.astype(jnp.bfloat16), centroids.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(2.0 * dots - c_sq[None, :], kc)
        return idx.astype(jnp.int32)

    out = jax.lax.map(body, points_p.reshape(-1, chunk, points.shape[1]))
    return out.reshape(-1, kc)[:n]


def kmeans_plusplus_init(points: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """k-means++ (D^2) seeding, fully jittable.

    faiss uses random init with restarts; D^2 seeding avoids the
    duplicated-seed local optima in one pass (important since we run a
    single clustering job, not faiss's ``nredo``).
    """
    n, d = points.shape
    points = points.astype(jnp.float32)
    key, k0 = jax.random.split(key)
    first = points[jax.random.randint(k0, (), 0, n)]

    def step(carry, subkey):
        min_d2, last = carry
        d2 = jnp.sum((points - last[None, :]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        probs = min_d2 / jnp.maximum(min_d2.sum(), 1e-30)
        idx = jax.random.categorical(subkey, jnp.log(jnp.maximum(probs, 1e-30)))
        nxt = points[idx]
        return (min_d2, nxt), nxt

    (_, _), rest = jax.lax.scan(step, (jnp.full((n,), jnp.inf), first), jax.random.split(key, k - 1))
    return jnp.concatenate([first[None], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("k", "iters", "chunk", "init"))
def kmeans(
    points: jax.Array,
    k: int,
    *,
    iters: int = 20,
    key: Optional[jax.Array] = None,
    chunk: int = 16384,
    init: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd k-means.  Returns (centroids (k,d) fp32, assignment (N,) int32).

    ``init``: "kmeans++" (D^2 seeding — k SEQUENTIAL scan steps, minutes at
    k=4096), "random" (distinct random points, what faiss uses), or "auto"
    (k-means++ below 1024 clusters where seeding quality matters most,
    random above where Lloyd iterations wash the seeding out and the
    sequential scan would dominate build time)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n, d = points.shape
    points = points.astype(jnp.float32)
    points_p, valid = _pad_points(points, chunk)
    n_chunks = points_p.shape[0] // chunk
    pts = points_p.reshape(n_chunks, chunk, d)
    vmask = valid.reshape(n_chunks, chunk)

    if init == "auto":
        init = "kmeans++" if k <= 1024 else "random"
    if init == "random":
        idx = jax.random.choice(key, n, shape=(k,), replace=n < k)
        centroids0 = points[idx]
    else:
        centroids0 = kmeans_plusplus_init(points, k, key)

    def lloyd_iter(centroids, _):
        c_sq = jnp.sum(centroids**2, axis=-1)

        def chunk_body(carry, inp):
            sums, counts = carry
            x, m = inp
            dots = jnp.dot(x.astype(jnp.bfloat16), centroids.T.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            a = jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=-1)
            onehot = jax.nn.one_hot(a, k, dtype=jnp.bfloat16) * m[:, None].astype(jnp.bfloat16)
            sums = sums + jnp.dot(onehot.T, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            # f32 accumulation: a bf16 reduce loses integer precision >256
            counts = counts + onehot.sum(axis=0, dtype=jnp.float32)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_body,
            (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
            (pts, vmask.astype(jnp.float32)),
        )
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where((counts > 0)[:, None], new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(lloyd_iter, centroids0, None, length=iters)
    return centroids, assign_clusters(points, centroids, chunk=chunk)
