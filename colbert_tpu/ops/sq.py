"""Scalar-quantized candidate codec: learned projection + int8 ("SQ").

A TPU-first alternative to PQ for IVF candidate generation, at the same
index memory (``sq_dim`` bytes/vector vs PQ's ``m * nbits/8``; 64 B at both
defaults).  Motivation (measured on v5e, see bench history): PQ's ADC is a
table *gather* — fundamentally VPU/gather-unit work the TPU is bad at
(297ms / 32 tokens) and even the one-hot MXU rewrite only reaches ~39ms —
while an int8 projected dot product is a pure MXU matmul over contiguous
rows (87ms for ALL 512 tokens, 16x better than one-hot PQ).  Quality-wise
PQ keeps more of the 768-dim geometry; SQ keeps exact geometry of a
PCA-optimal ``sq_dim``-dim subspace.  Both are only used to *select*
candidates — final ranking is always exact MaxSim over fp16 embeddings —
so the recall@depth difference is what matters; both are supported and
benchmarked, selected via ``IndexConfig.codec``.

Pipeline: ``sq_train`` fits a PCA rotation (top ``sq_dim`` eigenvectors of
the sample covariance, on-device eigh) and per-dim int8 scales;
``sq_encode`` stores rows as int8; queries are projected + descaled so
``int8 row . query_proj`` approximates the original inner product.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_dim",))
def sq_train(points: jax.Array, out_dim: int) -> Tuple[jax.Array, jax.Array]:
    """Fit projection + scales.  points (N, d) -> (proj (d, out_dim), scales (out_dim,))."""
    x = points.astype(jnp.float32)
    mean = x.mean(axis=0)  # retrieval uses raw IP; keep mean for info only
    cov = jnp.einsum("nd,ne->de", x, x, preferred_element_type=jnp.float32) / x.shape[0]
    # eigh returns ascending eigenvalues; take the top out_dim eigenvectors
    _, vecs = jnp.linalg.eigh(cov)
    proj = vecs[:, ::-1][:, :out_dim]  # (d, out_dim)
    z = jnp.dot(x, proj, preferred_element_type=jnp.float32)
    # robust per-dim scale: 127 / max|z| (max over sample; clip at encode)
    scales = 127.0 / jnp.maximum(jnp.abs(z).max(axis=0), 1e-6)
    del mean
    return proj, scales


def sq_encode(points: jax.Array, proj: jax.Array, scales: jax.Array, chunk: int = 65536) -> jax.Array:
    """(N, d) -> int8 codes (N, out_dim)."""
    n = points.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    x = points.astype(jnp.float32)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    def body(xc):
        z = jnp.dot(xc, proj, preferred_element_type=jnp.float32) * scales
        return jnp.clip(jnp.round(z), -127, 127).astype(jnp.int8)

    out = jax.lax.map(body, x.reshape(-1, chunk, x.shape[1]))
    return out.reshape(n_pad, -1)[:n]


def sq_query(q: jax.Array, proj: jax.Array, scales: jax.Array) -> jax.Array:
    """Project + descale queries so ``codes8 . sq_query(q)`` ~= ``<x, q>``."""
    return (jnp.dot(q.astype(jnp.float32), proj, preferred_element_type=jnp.float32) / scales)


def sq_score(qs: jax.Array, codes8: jax.Array) -> jax.Array:
    """qs (B, out_dim) fp32, codes8 (C, out_dim) int8 -> (B, C) fp32 (MXU)."""
    return jax.lax.dot_general(
        qs.astype(jnp.bfloat16), codes8.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
