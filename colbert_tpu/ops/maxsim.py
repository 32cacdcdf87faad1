"""MaxSim late-interaction scoring.

Semantics match the reference exactly (``colbert/modeling/BaseModel.py:39-46``):

    D = D * d_mask[..., None]; Q = Q * q_mask[..., None]
    sim[q, d, m, n] = <Q[q, m], D[d, n]>
    score[q, d]     = sum_m  max_n  sim[q, d, m, n]

i.e. masked positions are *zeroed before* the max (NOT set to -inf), so a
document whose valid similarities are all negative scores 0 from masked
slots — we reproduce that bit-for-bit because trained models bake it in.

Two implementations:

* :func:`maxsim_xla` — pure ``jnp`` einsum; differentiable; what the training
  step uses.  XLA maps the contraction onto the MXU; the ``(q, d, m, n)``
  intermediate is materialized in HBM.
* :func:`maxsim_pallas` — fused Pallas TPU kernel that tiles (q, d), runs the
  ``(TQ*m, h) x (h, TD*n)`` tile matmul on the MXU and folds the
  max-over-n / sum-over-m epilogue in VMEM, never writing the ``(m, n)``
  similarity tensor to HBM.  ~(m*n/1) fewer HBM bytes on the output side;
  used on the serving hot path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_masks(Q, D, q_mask, d_mask):
    if q_mask is not None:
        Q = Q * q_mask[..., None].astype(Q.dtype)
    if d_mask is not None:
        D = D * d_mask[..., None].astype(D.dtype)
    return Q, D


@functools.partial(jax.jit, static_argnames=())
def maxsim_xla(
    Q: jax.Array,
    D: jax.Array,
    q_mask: Optional[jax.Array] = None,
    d_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """All-pairs MaxSim.  Q: (nq, m, h), D: (nd, n, h) -> (nq, nd) fp32."""
    Q, D = _apply_masks(Q, D, q_mask, d_mask)
    sim = jnp.einsum("qmh,dnh->qdmn", Q, D, preferred_element_type=jnp.float32)
    return sim.max(axis=-1).sum(axis=-1)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _maxsim_kernel(q_ref, d_ref, o_ref, *, tq, td, m, n):
    # q_ref: (tq*m, h), d_ref: (n, td, h) tiles in VMEM, masks pre-multiplied.
    # The max over doc rows runs as an unrolled loop over the doc-row index
    # (a (tq*m, td*n) -> (tq, m, td, n) reshape would split the LANE dim,
    # which Mosaic cannot shape-cast); masked rows are zero vectors, so
    # sim=0 participates in the max exactly like the reference.
    q = q_ref[:]
    acc = None
    for nn in range(n):
        s = jax.lax.dot_general(
            q, d_ref[nn],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tq*m, td)
        acc = s if acc is None else jnp.maximum(acc, s)
    # sum over query views: leading-dim split is a legal relayout
    o_ref[:] = acc.reshape(tq, m, td).sum(axis=1)  # (tq, td)


def maxsim_pallas(
    Q: jax.Array,
    D: jax.Array,
    q_mask: Optional[jax.Array] = None,
    d_mask: Optional[jax.Array] = None,
    *,
    block_q: int = 0,
    block_d: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused MaxSim.  Same contract as :func:`maxsim_xla`.

    Requires static m, n, h.  Pads nq/nd up to tile multiples; the pad rows
    are masked to zero so they score 0 and are sliced off.
    """
    nq, m, h = Q.shape
    nd, n, _ = D.shape
    Q, D = _apply_masks(Q, D, q_mask, d_mask)

    # TPU block constraint: the OUTPUT tile's last dim must be a multiple of
    # 128 (or the full array dim), and the second-to-last a multiple of 8 —
    # so tile (8 queries x 128 docs); small corpora become one doc tile.
    tq = block_q or 8
    td = block_d or (128 if nd > 128 else _ceil_to(nd, 8))
    nq_p = _ceil_to(nq, tq)
    nd_p = _ceil_to(nd, td)
    if nq_p != nq:
        Q = jnp.pad(Q, ((0, nq_p - nq), (0, 0), (0, 0)))
    if nd_p != nd:
        D = jnp.pad(D, ((0, nd_p - nd), (0, 0), (0, 0)))

    qf = Q.reshape(nq_p * m, h)
    df = jnp.transpose(D, (1, 0, 2))  # (n, nd_p, h): doc-row-major tiles

    grid = (nq_p // tq, nd_p // td)
    out = pl.pallas_call(
        functools.partial(_maxsim_kernel, tq=tq, td=td, m=m, n=n),
        out_shape=jax.ShapeDtypeStruct((nq_p, nd_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq * m, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, td, h), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, td), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_p * m * nd_p * n * h,
            bytes_accessed=(nq_p * m * h + nd_p * n * h) * Q.dtype.itemsize + nq_p * nd_p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qf, df)
    return out[:nq, :nd]


def maxsim_qd(
    Q: jax.Array,
    D: jax.Array,
    q_mask: Optional[jax.Array] = None,
    d_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-query candidate MaxSim: Q (B, m, h), D (B, C, n, h) -> (B, C).

    The serving re-rank shape: each query has its own candidate set (the
    reference loops queries one at a time, ``dense_server_client.py:44-48``;
    here the whole batch is one einsum)."""
    if q_mask is not None:
        Q = Q * q_mask[..., None].astype(Q.dtype)
    if d_mask is not None:
        D = D * d_mask[..., None].astype(D.dtype)
    sim = jnp.einsum("bmh,bcnh->bcmn", Q, D, preferred_element_type=jnp.float32)
    return sim.max(axis=-1).sum(axis=-1)


def maxsim(
    Q: jax.Array,
    D: jax.Array,
    q_mask: Optional[jax.Array] = None,
    d_mask: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatcher: Pallas on TPU backends, XLA elsewhere / under autodiff."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    # the doc tile is 128 docs x n rows; long ragged docs would blow VMEM
    if use_pallas and D.shape[0] > 128 and 128 * D.shape[1] * D.shape[2] * 2 > (16 << 20):
        use_pallas = False
    if use_pallas:
        return maxsim_pallas(Q, D, q_mask, d_mask)
    return maxsim_xla(Q, D, q_mask, d_mask)
