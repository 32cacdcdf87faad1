"""Pallas fused re-rank: candidate gather + exact MaxSim in one kernel.

The XLA re-rank gathers candidate doc blocks (``max_cand`` docs x ``dv``
rows x ``dim``) into HBM transients before the MaxSim einsum — measured
~63 ms of the 131 ms serve batch at the bench operating point.  This kernel
streams each candidate's contiguous doc block (multiview: exactly ``dv``
rows, 24 KB at dv=16/dim=768/bf16) straight into VMEM with per-candidate
async DMAs and folds the MaxSim epilogue (max over doc rows, sum over query
views) into the same tile, so candidate embeddings never land in an HBM
intermediate.

Uniform-doclen (multiview) corpora only — the XLA path remains for ragged
docs.  Gated by ``ServeConfig.rerank_kernel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cand_ref, valid_ref, qt_ref, emb_ref, out_ref, buf_ref, sem_ref, *, tc, dv, dim):
    def dma(c):
        pid = jnp.maximum(cand_ref[0, 0, 0, c], 0)
        return pltpu.make_async_copy(
            emb_ref.at[pl.ds(pl.multiple_of(pid * dv, dv), dv), :],
            buf_ref.at[pl.ds(pl.multiple_of(c * dv, dv), dv), :],
            sem_ref.at[c],
        )

    # predicated DMA: padded (-1) candidate slots move no bytes — the
    # ragged bucketed rerank routes each candidate to exactly one bucket
    # kernel, so the per-bucket calls stay at the ideal DMA volume
    def issue(c, _):
        pl.when(cand_ref[0, 0, 0, c] >= 0)(lambda: dma(c).start())
        return 0

    jax.lax.fori_loop(0, tc, issue, 0)

    def wait(c, _):
        pl.when(cand_ref[0, 0, 0, c] >= 0)(lambda: dma(c).wait())
        return 0

    jax.lax.fori_loop(0, tc, wait, 0)

    qt = qt_ref[0].astype(jnp.float32)                     # (dim, qv)
    rows = buf_ref[:].astype(jnp.float32)                  # (tc*dv, dim)
    sim = jax.lax.dot_general(
        rows, qt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (tc*dv, qv)
    qv = qt.shape[1]
    sim = sim.reshape(tc, dv, qv)                          # major-dim split: free
    scores = jnp.max(sim, axis=1).sum(axis=1)              # (tc,)
    # SMEM supports scalar loads only; the vector mask arrives via VMEM
    valid = valid_ref[0, 0, :, 0] > 0
    out_ref[0, 0, :, 0] = jnp.where(valid, scores, -jnp.inf)


def _kernel_packed(cand_ref, valid_ref, qt_ref, emb_ref, out_ref, buf_ref, sem_ref,
                   *, tc, dv, nk):
    rows_per_doc = nk * dv

    def dma(c):
        pid = jnp.maximum(cand_ref[0, 0, 0, c], 0)
        return pltpu.make_async_copy(
            emb_ref.at[pl.ds(pl.multiple_of(pid * rows_per_doc, rows_per_doc), rows_per_doc), :],
            buf_ref.at[c],
            sem_ref.at[c],
        )

    def issue(c, _):
        pl.when(cand_ref[0, 0, 0, c] >= 0)(lambda: dma(c).start())
        return 0

    jax.lax.fori_loop(0, tc, issue, 0)

    def wait(c, _):
        pl.when(cand_ref[0, 0, 0, c] >= 0)(lambda: dma(c).wait())
        return 0

    jax.lax.fori_loop(0, tc, wait, 0)

    # int8 -> f32 directly (int8 -> bf16 miscompiles in Mosaic)
    b32 = buf_ref[:].astype(jnp.float32)               # (tc, nk*dv, 128)
    qt = qt_ref[0].astype(jnp.float32)                 # (dim, qv)
    qv = qt.shape[1]
    sim = jnp.zeros((tc * dv, qv), jnp.float32)
    for k in range(nk):
        part = b32[:, k * dv : (k + 1) * dv, :].reshape(tc * dv, 128)
        sim = sim + jax.lax.dot_general(
            part, qt[k * 128 : (k + 1) * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    sim = sim.reshape(tc, dv, qv)
    scores = jnp.max(sim, axis=1).sum(axis=1)          # (tc,)
    valid = valid_ref[0, 0, :, 0] > 0
    out_ref[0, 0, :, 0] = jnp.where(valid, scores, -jnp.inf)


def pack_int8_table(emb_int8, dv: int):
    """Permute an int8 doc-major table for :func:`maxsim_rerank_uniform_packed`.

    int8 DMA source offsets must be 32-row aligned, but a doc block is only
    ``dv`` rows — so the table is stored with each doc's (dv, dim) block
    laid out as (nk, dv, 128) 128-lane chunks: a doc then occupies
    ``nk*dv`` 128-wide rows starting at a multiple of ``nk*dv`` (which must
    be a multiple of 32).  numpy or jax array in, same type out."""
    n_rows, dim = emb_int8.shape
    if dim % 128 != 0:
        raise ValueError(f"dim must be a multiple of 128, got {dim}")
    nk = dim // 128
    if (nk * dv) % 32 != 0:
        raise ValueError(f"nk*dv ({nk * dv}) must be a multiple of 32 for aligned DMA")
    num_docs = n_rows // dv
    return (
        emb_int8.reshape(num_docs, dv, nk, 128)
        .transpose(0, 2, 1, 3)
        .reshape(num_docs * nk * dv, 128)
    )


@functools.partial(jax.jit, static_argnames=("dv", "nk", "tc", "interpret"))
def maxsim_rerank_uniform_packed(
    cand: jax.Array,        # (B, C) candidate pids, -1 padded
    Qm: jax.Array,          # (B, qv, dim) masked query reps, int8-descale FOLDED IN
    emb_packed: jax.Array,  # (num_docs*nk*dv, 128) int8, see pack_int8_table
    *,
    dv: int,
    nk: int,
    tc: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused gather+MaxSim over an int8 lane-packed table: exact MaxSim up to
    int8 quantization.  Same contract as :func:`maxsim_rerank_uniform`;
    half the rerank DMA bytes and 4x the HBM capacity of the bf16 table.
    Callers fold the per-dim dequantization scale into ``Qm``
    (``Qm / scale``), so the kernel is a plain int8 dot."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    B, C = cand.shape
    qv, dim = Qm.shape[1], Qm.shape[2]
    assert dim == nk * 128
    if C % tc != 0:
        raise ValueError(f"C ({C}) must divide the candidate tile ({tc})")
    n_tiles = C // tc
    qt = jnp.transpose(Qm, (0, 2, 1)).astype(jnp.float32)  # (B, dim, qv)
    cand4 = cand.reshape(B, n_tiles, 1, tc)
    valid4 = (cand >= 0).astype(jnp.int32).reshape(B, n_tiles, tc, 1)

    out = pl.pallas_call(
        functools.partial(_kernel_packed, tc=tc, dv=dv, nk=nk),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tc, 1), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tc), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tc, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim, qv), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed table stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, tc, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tc, nk * dv, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((tc,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(tc * dv * dim * (1 + 4) + dim * qv * 4) * 2 + (1 << 22),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * dv * dim * qv,
            bytes_accessed=B * C * dv * dim + B * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cand4, valid4, qt, emb_packed)
    return out.reshape(B, C)


def stride_buckets(doclens, n_buckets: int = 4, row_multiple: int = 16):
    """Stride schedule at doclen percentiles (the reference's bucket trick:
    strides at percentiles 25/50/75 + max, ``colbert_ranker.py:36-41``),
    rounded UP to the TPU DMA row alignment and deduplicated ascending.

    ``row_multiple``: 16 keeps bf16 doc-block DMA offsets sublane-aligned;
    int8 lane-packed tables need ``(nk * stride) % 32 == 0`` — pass 32 (or
    16 when nk is even)."""
    import numpy as np

    doclens = np.asarray(doclens)
    qs = np.percentile(doclens, np.linspace(0, 100, n_buckets + 1)[1:], method="higher")
    out = []
    for s in qs:
        s = int(-(-int(max(s, 1)) // row_multiple) * row_multiple)
        if not out or s > out[-1]:
            out.append(s)
    return out


def build_ragged_buckets(emb, doclens, strides):
    """Scatter a ragged doc-major embedding table into per-stride
    ZERO-padded doc-major tables (one per bucket).

    Zero rows contribute a 0 to the per-query-token max — exactly the
    reference's mask-zeroing MaxSim semantics (``BaseModel.py:39-46``) — so
    the fused uniform kernel scores bucketed ragged docs EXACTLY, with no
    doclen mask.  Returns ``(tables, bucket_of_pid, slot_of_pid)`` where
    ``tables[b]`` is ``(n_b * strides[b], dim)`` in ``emb``'s dtype and doc
    ``p`` lives at rows ``slot_of_pid[p] * strides[b]`` of
    ``tables[bucket_of_pid[p]]``."""
    import numpy as np

    doclens = np.asarray(doclens, np.int64)
    strides = np.asarray(strides, np.int64)
    offs = np.concatenate([[0], np.cumsum(doclens)])
    if doclens.size and int(doclens.max()) > int(strides[-1]):
        raise ValueError("max doclen exceeds the largest stride")
    bucket_of = np.searchsorted(strides, doclens, side="left").astype(np.int32)
    slot_of = np.zeros(len(doclens), np.int32)
    tables = []
    for b, s in enumerate(strides.tolist()):
        pids = np.nonzero(bucket_of == b)[0]
        slot_of[pids] = np.arange(len(pids), dtype=np.int32)
        tbl = np.zeros((max(len(pids), 1) * s, emb.shape[1]), emb.dtype)
        if len(pids):
            lens = doclens[pids]
            starts = np.cumsum(lens) - lens
            within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
            src = np.repeat(offs[pids], lens) + within
            dst = np.repeat(np.arange(len(pids), dtype=np.int64) * s, lens) + within
            tbl[dst] = np.asarray(emb)[src]
        tables.append(tbl)
    return tables, bucket_of, slot_of


def quantize_emb_table(emb: "object", chunk: int = 1 << 18):
    """Per-dim symmetric int8 quantization of an embedding table.

    Returns (int8 table (N, dim), scale (dim,) fp32) with
    ``emb ≈ int8 / scale``.  Chunked so GB-scale tables never materialize a
    second fp32 copy.  Replaces the reference's fp16 CPU-resident flat table
    (``colbert/ranking/colbert_ranker.py:61-73``) at 4x the per-HBM-byte
    corpus capacity."""
    import numpy as np

    from colbert_tpu.native.lib import f16_absmax_into, f16_quantize_i8_into

    n, dim = emb.shape
    amax = np.zeros(dim, np.float32)
    for lo in range(0, n, chunk):
        c = np.asarray(emb[lo : lo + chunk])
        # hardware-f16 native pass (identical rint/clip semantics): the
        # fp32-detour numpy path took minutes on 10-35 GB tables and once
        # timed out a bench step (VERDICT r4 item 8)
        if not f16_absmax_into(c, amax):
            np.maximum(amax, np.abs(c.astype(np.float32)).max(axis=0), out=amax)
    scale = (127.0 / np.maximum(amax, 1e-6)).astype(np.float32)
    out = np.empty((n, dim), np.int8)
    for lo in range(0, n, chunk):
        c = np.asarray(emb[lo : lo + chunk])
        if not f16_quantize_i8_into(c, scale, out[lo : lo + chunk]):
            x = c.astype(np.float32) * scale
            out[lo : lo + chunk] = np.clip(np.rint(x), -127, 127).astype(np.int8)
    return out, scale


@functools.partial(jax.jit, static_argnames=("dv", "tc", "interpret"))
def maxsim_rerank_uniform(
    cand: jax.Array,       # (B, C) candidate pids, -1 padded
    Qm: jax.Array,         # (B, qv, dim) masked query reps (zeros at masked views)
    emb_table: jax.Array,  # (num_docs*dv, dim) doc-major token embeddings
    *,
    dv: int,
    tc: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact MaxSim scores (B, C) fp32; -inf at invalid candidates."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    B, C = cand.shape
    qv, dim = Qm.shape[1], Qm.shape[2]
    if C % tc != 0:
        raise ValueError(f"C ({C}) must divide the candidate tile ({tc})")
    n_tiles = C // tc
    qt = jnp.transpose(Qm, (0, 2, 1)).astype(jnp.bfloat16)  # (B, dim, qv)
    cand4 = cand.reshape(B, n_tiles, 1, tc)
    valid4 = (cand >= 0).astype(jnp.int32).reshape(B, n_tiles, tc, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, tc=tc, dv=dv, dim=dim),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tc, 1), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tc), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tc, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim, qv), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # embeddings stay in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, tc, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tc * dv, dim), jnp.int8 if emb_table.dtype == jnp.int8 else jnp.bfloat16),
            pltpu.SemaphoreType.DMA((tc,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(tc * dv * dim * 2 + dim * qv * 4 + tc * 4) * 3 + (1 << 21),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * dv * dim * qv,
            bytes_accessed=B * C * dv * dim * 2 + B * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cand4, valid4, qt, emb_table.astype(jnp.bfloat16))
    return out.reshape(B, C)
