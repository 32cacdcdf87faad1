"""Exact brute-force MaxSim serving scan — the flat (no-ANN) retrieval mode.

The round-2/3 stage attribution showed the ANN pipeline's residual cost is
GATHER overhead, not compute or bandwidth: the probe pair-mapping and the
per-candidate rerank DMAs both run at ~86 ns/row regardless of row size,
i.e. ~12 M rows/s, while the MXU does 197 bf16 TFLOP/s and HBM streams
~800 GB/s.  At that ratio, *scoring every document* with one streaming
matmul is faster than *selectively gathering* a few thousand candidates
whenever the embedding table is HBM-resident:

    score-everything (20k docs x 16 rows x 128 dim, batch 144):
        94 GFLOP  ~0.5 ms MXU  +  82 MB table stream  ~0.1 ms
    vs the ANN funnel's ~135 ms of probe/dedup/gather/rerank stages.

This module scans the doc-major table in blocks: each grid step streams a
``(rows_blk, h)`` tile, scores it against ALL query tokens in one MXU
matmul, folds max-over-doc-rows in VMEM (legal leading-dim sublane split),
and reduces sum-over-query-views with a one-hot matmul — the TPU-idiomatic
"reshape": lane-dim regrouping the VPU cannot shape-cast is exact and ~free
on the MXU.  The (rows, tokens) similarity transient never exists in HBM.

Recall is 1.0 by construction (exact MaxSim; int8 tables are exact up to
the table quantization the ANN rerank shares).  Replaces, at HBM-resident
corpus scale, the reference's whole IVF serve path
(``colbert/ranking/colbert_ranker.py:183-229``); the IVF/PQ machinery
remains the beyond-HBM and host-table story.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_rows_block(dv: int, itemsize: int, target_rows: int = 1024) -> int:
    """Rows per grid step: whole docs only, the doc count per step a
    multiple of 8 (the OUTPUT block's sublane constraint) and the row count
    a multiple of the dtype's sublane tile (32 int8 / 16 bf16 / 8 f32)."""
    sub = {1: 32, 2: 16, 4: 8}[itemsize]
    docs_unit = 8
    while (docs_unit * dv) % sub:
        docs_unit += 8
    unit = docs_unit * dv
    return max(unit, (target_rows // unit) * unit)


def _flat_kernel(qT_ref, oh_ref, tbl_ref, out_ref, *, dv, docs_blk, t_pad):
    rows = tbl_ref[:]
    if rows.dtype == jnp.int8:
        # int8 -> bf16 via f32 (direct int8->bf16 MXU feed miscompiles, see
        # CLAUDE.md); the values are integers in [-127, 127]: exact in bf16?
        # no — bf16 has 8 mantissa bits, ints up to 256 are exact.
        rows = rows.astype(jnp.float32).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        rows, qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (rows_blk, t_pad)
    s = s.reshape(docs_blk, dv, t_pad).max(axis=1)      # (docs_blk, t_pad)
    # sum over query views: one-hot (t_pad, b_pad) matmul — masked/pad tokens
    # have a zero column and contribute nothing
    out_ref[:] = jax.lax.dot_general(
        s, oh_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (docs_blk, b_pad)


@functools.partial(
    jax.jit, static_argnames=("dv", "rows_blk", "interpret")
)
def flat_maxsim_scan(
    Qm: jax.Array,       # (B, m, h) mask-zeroed query reps
    table: jax.Array,    # (N_pad, h) doc-major rows, zero-padded; bf16 or int8
    *,
    dv: int,             # rows per document (uniform / zero-padded)
    rows_blk: int = 0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Score EVERY document against every query: returns (docs_pad, B) fp32
    exact MaxSim.  ``table`` rows beyond a doc's length and rows of pad docs
    must be zero (they then score 0 before the max — the reference's
    mask-zeroing semantics, ``BaseModel.py:39-46``)."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    B, m, h = Qm.shape
    n_rows, h_t = table.shape
    if h_t != h:
        raise ValueError(f"table dim {h_t} != query dim {h}")
    if rows_blk == 0:
        rows_blk = pick_rows_block(
            dv, table.dtype.itemsize, target_rows=min(1024, n_rows)
        )
        if n_rows % rows_blk:
            # legal fallback: the minimal unit always divides tables built
            # by build_flat_table with the same (dv, dtype)
            unit = pick_rows_block(dv, table.dtype.itemsize, target_rows=1)
            if n_rows % unit == 0:
                rows_blk = unit
    if rows_blk % dv:
        raise ValueError(f"rows_blk {rows_blk} must be a multiple of dv {dv}")
    docs_blk = rows_blk // dv
    if n_rows % rows_blk:
        raise ValueError(
            f"table rows {n_rows} must be padded to a multiple of rows_blk "
            f"{rows_blk} (pad with zero rows: they score 0)"
        )

    T = B * m
    t_pad = _ceil_to(T, LANES)
    b_pad = _ceil_to(B, LANES)
    qT = jnp.zeros((h, t_pad), jnp.bfloat16).at[:, :T].set(
        Qm.reshape(T, h).T.astype(jnp.bfloat16)
    )
    # one-hot sum-over-views matrix: token t = b*m + v belongs to query b
    tok = jnp.arange(t_pad)
    oh = ((tok[:, None] // m) == jnp.arange(b_pad)[None, :]) & (tok[:, None] < T)
    oh = oh.astype(jnp.float32)

    grid = (n_rows // rows_blk,)
    out = pl.pallas_call(
        functools.partial(_flat_kernel, dv=dv, docs_blk=docs_blk, t_pad=t_pad),
        out_shape=jax.ShapeDtypeStruct((n_rows // dv, b_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, b_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (docs_blk, b_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * h * t_pad + 2 * (n_rows // dv) * t_pad * b_pad,
            bytes_accessed=n_rows * h * table.dtype.itemsize
            + (n_rows // dv) * b_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qT, oh, table)
    return out[:, :B]


def _flat_kernel_fused(qT_ref, oh_ref, tbl_ref, out_ref, gmax_ref, *,
                       dv, docs_blk, t_pad, num_docs, score_dtype):
    """Scan kernel + per-grid-step group max: the selection stage then only
    reads the winning groups' scores (see :func:`flat_scan_topk`).  Pad docs
    (>= num_docs) are masked to -inf HERE, so no full-matrix masking pass —
    the copies that OOM'd the first 1M-doc run — ever exists."""
    rows = tbl_ref[:]
    if rows.dtype == jnp.int8:
        rows = rows.astype(jnp.float32).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        rows, qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s.reshape(docs_blk, dv, t_pad).max(axis=1)
    o = jax.lax.dot_general(
        s, oh_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (docs_blk, b_pad)
    # round FIRST, then mask and group-max over the ROUNDED scores: both
    # selection stages rank the same values, keeping the group-coverage
    # argument exact for the stored dtype
    o = o.astype(score_dtype)
    doc0 = pl.program_id(0) * docs_blk
    doc_ix = doc0 + jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
    o = jnp.where(doc_ix < num_docs, o, jnp.asarray(-jnp.inf, o.dtype))
    out_ref[:] = o
    gmax_ref[:] = o.astype(jnp.float32).max(axis=0)[None, None, :]


@functools.partial(
    jax.jit,
    static_argnames=("dv", "num_docs", "topk", "rows_blk", "interpret", "score_dtype"),
)
def flat_scan_topk(
    Qm: jax.Array,       # (B, m, h) mask-zeroed query reps
    table: jax.Array,    # (N_pad, h) doc-major rows, zero-padded; bf16 or int8
    *,
    dv: int,
    num_docs: int,
    topk: int,
    rows_blk: int = 0,
    interpret: Optional[bool] = None,
    score_dtype: str = "bfloat16",
) -> Tuple[jax.Array, jax.Array]:
    """Fused flat serve: scan + exact two-stage top-k.

    Stage 1 (in-kernel): per-grid-step group maxima over the stored scores.
    Stage 2: per query, top-k groups by max, then top-k over ONLY those
    groups' ``docs_blk`` scores.  Exact for the stored score dtype: if a
    top-k doc's group were outside the top-k groups, k other groups would
    each hold a doc scoring above it — contradiction.  Replaces
    :func:`flat_topk`'s full-matrix segment merges (~0.6 GB of score/merge
    working set at 1M docs — the per-chip envelope cap, VERDICT r4 weak #4;
    the reference's analogue is the full-depth sort of its per-query scores,
    ``colbert_ranker.py:123-130``).

    Returns ``(scores (B, k) fp32, pids (B, k) int32)``.
    """
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    B, m, h = Qm.shape
    n_rows, h_t = table.shape
    if h_t != h:
        raise ValueError(f"table dim {h_t} != query dim {h}")
    if rows_blk == 0:
        rows_blk = pick_rows_block(
            dv, table.dtype.itemsize, target_rows=min(1024, n_rows)
        )
        if n_rows % rows_blk:
            unit = pick_rows_block(dv, table.dtype.itemsize, target_rows=1)
            if n_rows % unit == 0:
                rows_blk = unit
    if rows_blk % dv:
        raise ValueError(f"rows_blk {rows_blk} must be a multiple of dv {dv}")
    docs_blk = rows_blk // dv
    if n_rows % rows_blk:
        raise ValueError(
            f"table rows {n_rows} must be padded to a multiple of rows_blk {rows_blk}"
        )
    docs_pad = n_rows // dv
    n_steps = n_rows // rows_blk

    T = B * m
    t_pad = _ceil_to(T, LANES)
    b_pad = _ceil_to(B, LANES)
    qT = jnp.zeros((h, t_pad), jnp.bfloat16).at[:, :T].set(
        Qm.reshape(T, h).T.astype(jnp.bfloat16)
    )
    tok = jnp.arange(t_pad)
    oh = ((tok[:, None] // m) == jnp.arange(b_pad)[None, :]) & (tok[:, None] < T)
    oh = oh.astype(jnp.float32)

    sdt = jnp.bfloat16 if score_dtype == "bfloat16" else jnp.float32
    scores, gmax = pl.pallas_call(
        functools.partial(
            _flat_kernel_fused, dv=dv, docs_blk=docs_blk, t_pad=t_pad,
            num_docs=num_docs, score_dtype=sdt,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((docs_pad, b_pad), sdt),
            # (n_steps, 1, b_pad) with (1, 1, b_pad) blocks: the last two
            # block dims equal the array dims (Mosaic's sublane rule)
            jax.ShapeDtypeStruct((n_steps, 1, b_pad), jnp.float32),
        ),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((h, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, b_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((docs_blk, b_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * h * t_pad + 2 * docs_pad * t_pad * b_pad,
            bytes_accessed=n_rows * h * table.dtype.itemsize
            + docs_pad * b_pad * sdt.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qT, oh, table)

    # stage 2: top groups per query, then top-k over only their scores
    k = min(topk, num_docs, docs_pad)
    # k groups always cover the top-k docs (each covered group holds >=1 of
    # them), even if all k docs share one group
    kg = min(k, n_steps)
    g = gmax[:, 0, :].T                                 # (b_pad, n_steps)
    _, gi = jax.lax.top_k(g[:B], kg)                    # (B, kg)
    idx = gi[..., None] * docs_blk + jnp.arange(docs_blk, dtype=jnp.int32)
    idx = idx.reshape(B, kg * docs_blk)                 # (B, J) doc ids
    I = jnp.pad(idx.T, ((0, 0), (0, b_pad - B)))        # (J, b_pad)
    sub = jnp.take_along_axis(scores, I, axis=0)        # (J, b_pad)
    vals = sub[:, :B].T.astype(jnp.float32)             # (B, J)
    ts, sel = jax.lax.top_k(vals, k)
    tp = jnp.take_along_axis(idx, sel, axis=1)
    tp = jnp.where(jnp.isfinite(ts), tp, -1)
    return ts, tp.astype(jnp.int32)


def flat_maxsim_scan_xla(
    Qm: jax.Array,
    table: jax.Array,
    *,
    dv: int,
    rows_chunk: int = 1 << 15,
) -> jax.Array:
    """XLA reference/fallback of :func:`flat_maxsim_scan` (CPU tests, and the
    differentiable path).  Chunked so the (rows, tokens) transient stays
    bounded."""
    B, m, h = Qm.shape
    n_rows = table.shape[0]
    qT = Qm.reshape(B * m, h).T.astype(jnp.float32)
    rows_chunk = min(rows_chunk, n_rows)
    rows_chunk = max(dv, (rows_chunk // dv) * dv)
    n_chunks = -(-n_rows // rows_chunk)
    pad = n_chunks * rows_chunk - n_rows
    tbl = jnp.pad(table, ((0, pad), (0, 0))) if pad else table

    def chunk(tc):
        s = tc.astype(jnp.float32) @ qT                 # (rc, B*m)
        s = s.reshape(-1, dv, B, m).max(axis=1)         # (docs_c, B, m)
        return s.sum(axis=-1)                           # (docs_c, B)

    out = jax.lax.map(chunk, tbl.reshape(n_chunks, rows_chunk, h))
    return out.reshape(-1, B)[: n_rows // dv + (1 if n_rows % dv else 0)]


def flat_topk(
    scores_db: jax.Array,   # (docs_pad, B) fp32
    num_docs: int,
    topk: int,
    *,
    segment: int = 1 << 17,
) -> Tuple[jax.Array, jax.Array]:
    """Exact per-query top-k over the doc axis, segmented so the transposed
    transient stays small: global top-k ⊆ union of per-segment top-k.

    The pad-doc mask is applied PER SEGMENT inside the loop — a global
    ``where``/``pad`` of the (docs_pad, B) fp32 score matrix would
    materialize two extra copies (~1 GB each at 1M docs x 256 lanes), which
    is exactly what pushed the 1M-doc int8 table over a v5e's HBM."""
    docs_pad, B = scores_db.shape
    k = min(topk, num_docs)
    if docs_pad <= segment:
        valid = jnp.arange(docs_pad) < num_docs
        s = jnp.where(valid[:, None], scores_db, -jnp.inf)
        ts, ti = jax.lax.top_k(s.T, k)                  # (B, k)
        return ts, ti.astype(jnp.int32)

    def merge(carry, blk, start):
        ts0, ti0 = carry                                # (B, k) running
        rows = start + jnp.arange(blk.shape[0])
        blk = jnp.where((rows < num_docs)[:, None], blk, -jnp.inf)
        ts1, ti1 = jax.lax.top_k(blk.T, min(k, blk.shape[0]))
        ti1 = ti1 + start
        cs = jnp.concatenate([ts0, ts1], axis=1)
        ci = jnp.concatenate([ti0, ti1], axis=1)
        ts2, sel = jax.lax.top_k(cs, k)
        return ts2, jnp.take_along_axis(ci, sel, axis=1)

    n_full = docs_pad // segment
    tail = docs_pad - n_full * segment

    def seg(i, carry):
        blk = jax.lax.dynamic_slice(scores_db, (i * segment, 0), (segment, B))
        return merge(carry, blk, i * segment)

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
    )
    ts, ti = jax.lax.fori_loop(0, n_full, seg, init)
    if tail:
        # static tail slice: no full-matrix pad, no overlapping windows
        ts, ti = merge((ts, ti), scores_db[n_full * segment :], n_full * segment)
    return ts, ti.astype(jnp.int32)


def build_flat_table(
    emb: "object",           # (N, h) np.ndarray-like CSR embeddings
    doclens: "object",       # (num_docs,) int
    *,
    dv: Optional[int] = None,
    dtype: str = "bfloat16",
    rows_blk: Optional[int] = None,
) -> Tuple["object", Optional["object"], int]:
    """Host-side: doc-major zero-padded table for :func:`flat_maxsim_scan`.

    Uniform corpora (multiview) reshape for free; ragged corpora are padded
    to ``dv = max(doclens)`` rows per doc (zero rows score 0: exact).
    ``dtype="raw"`` keeps ``emb``'s dtype unquantized (sharded serving
    quantizes ONCE globally so scores merge across shards).
    Returns (table (docs_pad*dv, h) np, inv_scale or None, dv)."""
    import numpy as np

    doclens = np.asarray(doclens, np.int64)
    num_docs = len(doclens)
    h = emb.shape[1]
    if dv is None:
        dv = int(doclens.max()) if num_docs else 1
    if (doclens > dv).any():
        raise ValueError(f"doclens exceed dv={dv}")
    uniform = bool(num_docs) and bool((doclens == dv).all())

    inv_scale = None
    if dtype == "int8":
        from colbert_tpu.ops.rerank_pallas import quantize_emb_table

        src, scale = quantize_emb_table(emb)
        np_dtype = np.int8
        inv_scale = (1.0 / scale).astype(np.float32)
    elif dtype == "raw":
        src = emb
        np_dtype = np.asarray(emb[:1]).dtype
    elif dtype == "bfloat16":
        import ml_dtypes

        # native bf16 rows: half the host RAM and no fp32 detour (at 500k
        # multiview docs the fp32 intermediate was 24.6 GB and minutes of
        # single-core conversion); fp16->bf16 rounds identically via fp32
        src = emb
        np_dtype = ml_dtypes.bfloat16
    else:
        src = emb
        np_dtype = np.float32

    rb = rows_blk or pick_rows_block(dv, 1 if np_dtype == np.int8 else 2)
    docs_pad = _ceil_to(max(num_docs, 1) * dv, rb) // dv
    table = np.zeros((docs_pad * dv, h), np_dtype)
    if uniform:
        n_rows = num_docs * dv
        done = False
        if dtype == "bfloat16":
            # chunked hardware-f16 native conversion (identical RNE
            # rounding); ml_dtypes' elementwise cast is minutes at 12 GB
            from colbert_tpu.native.lib import f16_to_bf16_into

            ch = 1 << 18
            done = True
            for lo in range(0, n_rows, ch):
                c = np.asarray(src[lo : min(lo + ch, n_rows)])
                if c.dtype != np.float16 or not f16_to_bf16_into(
                    c, table[lo : lo + c.shape[0]].view(np.uint16)
                ):
                    done = False
                    break
        if not done:
            table[: n_rows] = np.asarray(src[: n_rows], np_dtype)
    else:
        offs = np.concatenate([[0], np.cumsum(doclens)])
        for d in range(num_docs):
            ln = int(doclens[d])
            table[d * dv : d * dv + ln] = np.asarray(src[offs[d] : offs[d] + ln], np_dtype)
    return table, inv_scale, dv
