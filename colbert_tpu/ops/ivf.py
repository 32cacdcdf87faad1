"""IVF (inverted-file) probe + ADC scan, static-shape XLA.

TPU-native replacement for faiss's IVF-PQ search
(``colbert/ranking/colbert_ranker.py:183-210``) and its GPU ``add`` path
(``faiss_index_gpu.py:81-141``).

Layout: instead of pointer-chasing inverted lists, embeddings are stored
*flat, sorted by coarse-list id* (a CSR layout):

    codes_sorted : (N, m) uint8     PQ codes, rows grouped by list
    row_emb_id   : (N,)   int32     original embedding id per sorted row
    offsets      : (K+1,) int32     list l occupies rows [offsets[l], offsets[l+1])

Probing gathers ``cap`` rows per probed list with a static shape
(``offsets[l] + arange(cap)``, masked by the true list length); rows beyond
the list's end belong to neighboring lists and are masked out.  There is no
padding in storage — only in the transient gather.

The scan itself is: coarse top-nprobe via MXU matmul, ADC scoring of the
gathered codes via per-token LUT gathers, then one top-``depth`` per token.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops.pq import adc_lut, adc_score_onehot


def sort_by_list(assignments: np.ndarray, num_lists: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side CSR packing: stable-sort rows by list id.

    Returns (perm (N,), offsets (K+1,)).  Equivalent of faiss's
    ``add``-time list building (``faiss_index_gpu.py:101-141``) without the
    GPU-shard/flush machinery — the arrays are just written sharded to disk.
    """
    perm = np.argsort(assignments, kind="stable").astype(np.int64)
    counts = np.bincount(assignments, minlength=num_lists)
    offsets = np.zeros(num_lists + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return perm, offsets


def _probe_topk(scores, depth, approx: bool):
    """Candidate top-k: approx_max_k is TPU-optimized (~2x) and recall-safe
    here because candidates feed an EXACT MaxSim re-rank."""
    if approx:
        return jax.lax.approx_max_k(scores, depth)
    return jax.lax.top_k(scores, depth)


def _resolve_adc_method(method: str) -> str:
    if method != "auto":
        return method
    return "gather" if jax.default_backend() in ("cpu", "gpu") else "onehot"


@functools.partial(
    jax.jit, static_argnames=("nprobe", "cap", "depth", "token_chunk", "adc_method", "approx_topk")
)
def ivf_probe_adc(
    q_tokens: jax.Array,          # (T, d) query token embeddings
    coarse_centroids: jax.Array,  # (K, d)
    codebooks: jax.Array,         # (m, ksub, dsub)
    codes_sorted: jax.Array,      # (N, m) uint8
    offsets: jax.Array,           # (K+1,) int32
    *,
    nprobe: int,
    cap: int,
    depth: int,
    token_chunk: int = 32,
    adc_method: str = "auto",
    approx_topk: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """For each query token: probe top-``nprobe`` lists, ADC-score up to
    ``cap`` rows per list, return top-``depth`` (scores, sorted-row ids).

    ``adc_method``: "gather" (element gather; CPU-friendly) or "onehot"
    (one-hot + MXU matmul; ~8x faster on TPU, processes one token per step
    to bound the transient one-hot).  "auto" picks by backend.

    Returns (scores (T, depth) fp32, rows (T, depth) int32); masked slots
    have score -inf and row -1.
    """
    adc_method = _resolve_adc_method(adc_method)
    if adc_method == "onehot":
        token_chunk = 1
    T, d = q_tokens.shape
    K = coarse_centroids.shape[0]
    lut_all = adc_lut(q_tokens, codebooks)  # (T, m, ksub)

    T_pad = ((T + token_chunk - 1) // token_chunk) * token_chunk
    q_pad = jnp.pad(q_tokens, ((0, T_pad - T), (0, 0)))
    lut_pad = jnp.pad(lut_all, ((0, T_pad - T), (0, 0), (0, 0)))

    lengths = offsets[1:] - offsets[:-1]  # (K,)

    def chunk_body(inp):
        q, lut = inp  # (tc, d), (tc, m, ksub)
        coarse = jnp.dot(q, coarse_centroids.T, preferred_element_type=jnp.float32)
        _, lists = jax.lax.top_k(coarse, nprobe)  # (tc, nprobe)
        base = offsets[lists]                      # (tc, nprobe)
        ln = lengths[lists]                        # (tc, nprobe)
        idx = base[..., None] + jnp.arange(cap)[None, None, :]      # (tc, nprobe, cap)
        valid = jnp.arange(cap)[None, None, :] < ln[..., None]
        idx = jnp.clip(idx, 0, codes_sorted.shape[0] - 1)
        codes = codes_sorted[idx.reshape(idx.shape[0], -1)]         # (tc, nprobe*cap, m)
        if adc_method == "onehot":
            scores = adc_score_onehot(lut, codes[0])                 # (1, nprobe*cap)
        else:
            # ADC: lut[t, j, codes[t, c, j]] summed over j
            gathered = jnp.take_along_axis(
                lut[:, None, :, :], codes.astype(jnp.int32)[:, :, :, None], axis=3
            )[..., 0]                                                # (tc, nprobe*cap, m)
            scores = gathered.sum(axis=-1)
        scores = jnp.where(valid.reshape(valid.shape[0], -1), scores, -jnp.inf)
        s, i = _probe_topk(scores, depth, approx_topk)                # (tc, depth)
        rows = jnp.take_along_axis(idx.reshape(idx.shape[0], -1), i, axis=1)
        rows = jnp.where(jnp.isfinite(s), rows, -1)
        return s, rows.astype(jnp.int32)

    scores, rows = jax.lax.map(
        chunk_body,
        (q_pad.reshape(-1, token_chunk, d), lut_pad.reshape(-1, token_chunk, *lut_all.shape[1:])),
    )
    return scores.reshape(T_pad, depth)[:T], rows.reshape(T_pad, depth)[:T]


@functools.partial(
    jax.jit, static_argnames=("nprobe", "cap", "depth", "token_chunk", "use_pallas", "approx_topk")
)
def ivf_probe_sq(
    q_tokens: jax.Array,          # (T, d) query token embeddings
    coarse_centroids: jax.Array,  # (K, d)
    proj: jax.Array,              # (d, sq_dim)
    scales: jax.Array,            # (sq_dim,)
    codes8_sorted: jax.Array,     # (N, sq_dim) int8, CSR-sorted by list
    offsets: jax.Array,           # (K+1,) int32
    *,
    nprobe: int,
    cap: int,
    depth: int,
    token_chunk: int = 32,
    use_pallas: bool | None = None,
    approx_topk: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """SQ-codec IVF scan: same contract as :func:`ivf_probe_adc`, but
    candidate scoring is an int8 MXU matmul (see :mod:`colbert_tpu.ops.sq`)
    instead of a PQ table lookup — the TPU-native fast path.

    On TPU backends (``use_pallas`` auto-True) the list scan runs in the
    DMA-streaming Pallas kernel (:mod:`colbert_tpu.ops.sq_probe_pallas`);
    XLA's generic row-gather formulation is kept for CPU and as a
    correctness oracle.
    """
    from colbert_tpu.ops.sq import sq_query

    if use_pallas is None:
        import os

        forced = os.environ.get("COLBERT_TPU_SQ_PROBE", "")
        if forced in ("pallas", "gather"):
            use_pallas = forced == "pallas"
        else:
            use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas:
        # +31: DMA starts are aligned DOWN to the 32-row int8 sublane tile,
        # so a window may need up to 31 extra rows; then lane-align to 128.
        cap = ((cap + 31 + 127) // 128) * 128
        # (measured: raising token_chunk to amortize kernel launches HURTS —
        # 320 vs 258 ms/batch144 — the larger score transients lose more
        # than the launch overhead saves; keep the 32-token chunks)

    T, d = q_tokens.shape
    qs_all = sq_query(q_tokens, proj, scales)  # (T, sq_dim)

    T_pad = ((T + token_chunk - 1) // token_chunk) * token_chunk
    q_pad = jnp.pad(q_tokens, ((0, T_pad - T), (0, 0)))
    qs_pad = jnp.pad(qs_all, ((0, T_pad - T), (0, 0)))
    lengths = offsets[1:] - offsets[:-1]

    if use_pallas:
        from colbert_tpu.ops.sq_probe_pallas import pad_codes_for_scan, sq_list_scan

        codes_padded = pad_codes_for_scan(codes8_sorted, cap)

    def chunk_body(inp):
        q, qs = inp  # (tc, d), (tc, sq_dim)
        coarse = jnp.dot(q, coarse_centroids.T, preferred_element_type=jnp.float32)
        _, lists = jax.lax.top_k(coarse, nprobe)
        base = offsets[lists]
        ln = lengths[lists]
        if use_pallas:
            aligned = (base // 32) * 32
            delta = base - aligned
            base = aligned  # row mapping below follows the aligned window
            scores = sq_list_scan(aligned, delta, delta + ln, qs, codes_padded, cap=cap)
        else:
            idx_full = base[..., None] + jnp.arange(cap)[None, None, :]
            valid = jnp.arange(cap)[None, None, :] < ln[..., None]
            idx_c = jnp.clip(idx_full, 0, codes8_sorted.shape[0] - 1)
            rows = codes8_sorted[idx_c.reshape(idx_c.shape[0], -1)]  # (tc, R, sq_dim) int8
            scores = jnp.einsum(
                "trd,td->tr", rows.astype(jnp.bfloat16), qs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            scores = jnp.where(valid.reshape(valid.shape[0], -1), scores, -jnp.inf)
        s, i = _probe_topk(scores, depth, approx_topk)
        idx = base[..., None] + jnp.arange(cap)[None, None, :]
        rr = jnp.take_along_axis(idx.reshape(idx.shape[0], -1), i, axis=1)
        rr = jnp.where(jnp.isfinite(s), jnp.minimum(rr, codes8_sorted.shape[0] - 1), -1)
        return s, rr.astype(jnp.int32)

    scores, rows = jax.lax.map(
        chunk_body, (q_pad.reshape(-1, token_chunk, d), qs_pad.reshape(-1, token_chunk, qs_all.shape[1]))
    )
    return scores.reshape(T_pad, depth)[:T], rows.reshape(T_pad, depth)[:T]


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "depth", "maxb", "tpl", "r", "approx_topk", "interpret", "stop",
        "hot_cap", "groups",
    ),
)
def ivf_probe_sq_batched(
    q_tokens: jax.Array,          # (T, d) query token embeddings
    coarse_centroids: jax.Array,  # (K, d)
    proj: jax.Array,              # (d, sq_dim)
    scales: jax.Array,            # (sq_dim,)
    codes8_sorted: jax.Array,     # (N, sq_dim) int8, CSR-sorted by list
    offsets: jax.Array,           # (K+1,) int32
    *,
    nprobe: int,
    depth: int,
    maxb: int,                    # ceil((max_list_len + 31) / 128)
    tpl: int = 128,
    r: int = 2,
    approx_topk: bool = False,
    interpret: bool | None = None,
    stop: str | None = None,
    hot_cap: int = 64,
    groups: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """List-major batched SQ probe: same contract as :func:`ivf_probe_sq`,
    but each probed list is scanned ONCE for the whole token batch instead of
    once per token (see :mod:`colbert_tpu.ops.sq_probe_batched`).  The
    candidate set per token is the top-``depth`` over per-(token, probed
    list) top-``r`` rows, rather than the global top-``depth`` over all
    probed rows — ``r`` trades a little recall for a ~50x smaller top-k.
    ``maxb`` bounds a list's 128-row block count (from max list length) and
    only affects code padding.

    Probe popularity is heavily skewed (at the bench operating point the
    hottest list is probed by 92% of the batch's tokens), so the
    ``hot_cap`` most-probed lists bypass the slot schedule entirely and are
    scanned DENSELY against all tokens (:func:`sq_hot_list_scan`)."""
    from colbert_tpu.ops.sq import sq_query
    from colbert_tpu.ops.sq_probe_batched import (
        build_slot_schedule_dense,
        probe_batched_postprocess,
        sq_batch_list_scan,
        sq_hot_list_scan,
    )
    from colbert_tpu.ops.sq_probe_pallas import pad_codes_for_scan

    T, d = q_tokens.shape
    K = coarse_centroids.shape[0]
    sq_dim = codes8_sorted.shape[1]
    pack = 128 // sq_dim
    hot_cap = min(hot_cap, K)

    coarse = jnp.dot(q_tokens, coarse_centroids.T, preferred_element_type=jnp.float32)
    # EXACT coarse top-k: the dense schedule thresholds membership at
    # vals[:, -1], and approx_max_k's loose tail value inflates member sets
    # (many tokens over threshold per list), overflowing the groups*tpl slot
    # capacity — measured recall@100 0.98 -> 0.78.  The exact top_k here is
    # a couple ms; approx stays on the final per-token top-depth.
    vals, lists = jax.lax.top_k(coarse, nprobe)  # (T, nprobe)
    thr = vals[:, -1]
    member = coarse >= thr[:, None]

    # hot-list selection: lists whose member count exceeds the slot capacity
    mc = member.sum(axis=0)                      # (K,)
    if hot_cap > 0:
        hot_vals, hot_raw = jax.lax.top_k(mc, hot_cap)
        hot_ids = jnp.where(hot_vals > groups * tpl, hot_raw, -1)
        hot_pos = jnp.full((K,), -1, jnp.int32).at[
            jnp.where(hot_ids >= 0, hot_ids, K)
        ].set(jnp.arange(hot_cap, dtype=jnp.int32), mode="drop")
        list_mask = hot_pos < 0                  # slots handle the cold tail
    else:
        hot_ids = None
        hot_pos = jnp.full((K,), -1, jnp.int32)
        list_mask = None

    def dummy(a, b):  # timing-bisection outputs with real data dependencies
        s = jnp.resize(a.astype(jnp.float32).reshape(-1), (T * depth,)).reshape(T, depth)
        rr = jnp.resize(b.astype(jnp.int32).reshape(-1), (T * depth,)).reshape(T, depth)
        return s, rr

    if stop == "coarse":
        return dummy(coarse[:, :nprobe], lists)
    sched, pair_valid = build_slot_schedule_dense(
        coarse, thr, lists, offsets, tpl=tpl, pack=pack, groups=groups,
        list_mask=list_mask,
    )
    # slots the kernel skips (empty lists / no members) leave their output
    # UNWRITTEN — those pairs must never gather it
    pair_valid = pair_valid & (sched.meta[:, 0, 1][sched.slot_of_pair] > 0)
    if stop == "sched":
        return dummy(sched.slot_of_pair, sched.pos_of_pair + sched.qidx.reshape(-1)[:1])
    t_pad = ((T + 127) // 128) * 128
    qs = sq_query(q_tokens, proj, scales)     # (T, sq_dim)
    qsT = jnp.pad(qs, ((0, t_pad - T), (0, 0))).T
    codes_padded = pad_codes_for_scan(codes8_sorted, maxb * 128)
    out_s, out_r = sq_batch_list_scan(
        sched.qidx, sched.meta, qsT, codes_padded, tpl=tpl, r=r,
        interpret=interpret,
    )
    if stop == "kernel":
        return dummy(out_s, out_r)
    scores, rows = probe_batched_postprocess(
        sched, out_s, out_r, T, nprobe, depth, approx_topk, stop=stop,
        pair_valid=pair_valid,
        hot=None if hot_cap == 0 else (
            hot_pos,
            *sq_hot_list_scan(
                hot_ids, offsets, qsT, codes_padded,
                hot_cap=hot_cap, maxb=maxb, r=r, interpret=interpret,
            ),
        ),
        lists=lists,
    )
    # clamp: padded tail rows can never win (scores -inf outside [lo, hi)),
    # but keep row ids in-range for downstream gathers
    rows = jnp.where(rows >= 0, jnp.minimum(rows, codes8_sorted.shape[0] - 1), -1)
    return scores, rows


def dedup_pids_by_approx_maxsim(
    pids: jax.Array,       # (n,) candidate pid per (token, depth-slot), -1 invalid
    token_ids: jax.Array,  # (n,) query-token index of each slot
    scores: jax.Array,     # (n,) codec score of each slot (-inf invalid)
    num_tokens: int,
    max_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """Select candidate docs by APPROXIMATE MAXSIM over the sampled rows:
    per doc, sum over query tokens of the best row score that token found
    for the doc.  A far better candidate ranking than the best-single-row
    max (:func:`dedup_pids_by_score`) — the WARP/PLAID-style insight — so
    the exact re-rank can run over fewer candidates at equal recall.

    Static-shape device algorithm: one sort by the composite key
    ``pid * num_tokens + token``, a segment-max per (pid, token) run, then a
    segment-sum per pid run (runs stay pid-sorted), then top-``max_out``.
    """
    n = pids.shape[0]
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(pids >= 0, pids * num_tokens + token_ids, big)
    # one sort carrying only the score payload; pid/token come back out of
    # the packed key arithmetically (cheaper than argsort + two gathers)
    sk, ss = jax.lax.sort((key, scores), num_keys=1)
    sp = jnp.where(sk != big, sk // num_tokens, -1)

    # segmented scans instead of segment_max/sum: scatters serialize on TPU,
    # associative scans vectorize.
    def seg_op(make_combine):
        def combine(a, b):
            aval, areset = a
            bval, breset = b
            return jnp.where(breset, bval, make_combine(aval, bval)), areset | breset

        return combine

    run_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_max, _ = jax.lax.associative_scan(seg_op(jnp.maximum), (ss, run_first))
    run_last = jnp.concatenate([run_first[1:], jnp.ones((1,), bool)])

    # per-pid sum of per-(pid, token) maxima: only run-last slots contribute
    pid_first = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    contrib = jnp.where(run_last & (sp >= 0) & jnp.isfinite(run_max), run_max, 0.0)
    doc_sum, _ = jax.lax.associative_scan(seg_op(jnp.add), (contrib, pid_first))
    pid_last = jnp.concatenate([pid_first[1:], jnp.ones((1,), bool)])
    doc_score = jnp.where(pid_last & (sp >= 0), doc_sum, -jnp.inf)

    k = min(max_out, n)
    top_s, top_i = jax.lax.top_k(doc_score, k)
    out_pids = jnp.where(jnp.isfinite(top_s), sp[top_i], -1).astype(jnp.int32)
    if k < max_out:
        out_pids = jnp.pad(out_pids, (0, max_out - k), constant_values=-1)
        top_s = jnp.pad(top_s, (0, max_out - k), constant_values=-jnp.inf)
    return out_pids, top_s


def dedup_pids_by_approx_maxsim_packed(
    pids: jax.Array,       # (n,) candidate pid per (token, depth-slot), -1 invalid
    token_ids: jax.Array,  # (n,) query-token index of each slot
    scores: jax.Array,     # (n,) codec score of each slot (-inf invalid)
    num_tokens: int,
    max_out: int,
    num_docs: int,
    approx_sel: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fast-path :func:`dedup_pids_by_approx_maxsim`: same candidate-selection
    semantics, built for the TPU sort unit.

    Two changes, both recall-safe because the output feeds an EXACT MaxSim
    re-rank (only WHICH pids pass matters, not their order or exact scores):

    * the ``(pid, token)`` key and the score are packed into ONE int32
      (key in the high bits, the score quantized per query into the low
      bits) — a single-operand sort moves half the bytes of the
      ``(key, payload)`` sort, and the per-(pid, token) run max is simply
      the run's LAST element (low bits sort ascending within a run);
    * the final budget selection uses ``approx_max_k`` (the ~2x TPU top-k)
      instead of an exact ``top_k(max_out of n)`` — at ``max_out = n/2``
      the exact form is nearly a second full sort.

    Requires ``ceil(log2(num_docs * num_tokens)) + 6 <= 31``; callers fall
    back to the exact form otherwise (see :func:`dedup_dispatch`).
    """
    n = pids.shape[0]
    kt_bits = max(1, int(np.ceil(np.log2(max(2, num_docs * num_tokens)))))
    sbits = min(12, 31 - kt_bits)
    if sbits < 6:
        raise ValueError("pid*token key too wide to pack; use the exact dedup")
    levels = (1 << sbits) - 1

    valid = (pids >= 0) & jnp.isfinite(scores)
    lo = jnp.min(jnp.where(valid, scores, jnp.inf))
    hi = jnp.max(jnp.where(valid, scores, -jnp.inf))
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(hi > lo, hi, lo + 1.0)
    step = (hi - lo) / levels
    q = jnp.clip(jnp.round((scores - lo) / step), 0, levels).astype(jnp.int32)
    kt = pids * num_tokens + token_ids                      # (n,) < 2^kt_bits
    big = jnp.iinfo(jnp.int32).max
    packed = jnp.where(valid, (kt << sbits) | q, big)

    sp = jax.lax.sort(packed)                                # single-operand sort
    rk = jnp.where(sp != big, sp >> sbits, -1)               # (pid, token) run id
    run_last = jnp.concatenate([rk[1:] != rk[:-1], jnp.ones((1,), bool)])
    # run max = last element's low bits (ascending within a run)
    run_max = lo + (sp & levels).astype(jnp.float32) * step

    spid = jnp.where(rk >= 0, rk // num_tokens, -1)
    pid_first = jnp.concatenate([jnp.ones((1,), bool), spid[1:] != spid[:-1]])

    def combine(a, b):
        aval, areset = a
        bval, breset = b
        return jnp.where(breset, bval, aval + bval), areset | breset

    contrib = jnp.where(run_last & (spid >= 0), run_max, 0.0)
    doc_sum, _ = jax.lax.associative_scan(combine, (contrib, pid_first))
    pid_last = jnp.concatenate([pid_first[1:], jnp.ones((1,), bool)])
    doc_score = jnp.where(pid_last & (spid >= 0), doc_sum, -jnp.inf)

    k = min(max_out, n)
    if approx_sel and jax.default_backend() not in ("cpu",):
        top_s, top_i = jax.lax.approx_max_k(doc_score, k)
    else:
        top_s, top_i = jax.lax.top_k(doc_score, k)
    out_pids = jnp.where(jnp.isfinite(top_s), spid[top_i], -1).astype(jnp.int32)
    if k < max_out:
        out_pids = jnp.pad(out_pids, (0, max_out - k), constant_values=-1)
        top_s = jnp.pad(top_s, (0, max_out - k), constant_values=-jnp.inf)
    return out_pids, top_s


def dedup_pids_by_score(
    pids: jax.Array, scores: jax.Array, max_out: int
) -> Tuple[jax.Array, jax.Array]:
    """Deduplicate candidate pids, keeping each pid's best ADC score, and
    return the top-``max_out`` unique pids by that score.

    Device-side replacement for the reference's CPU ``Pool(16)`` per-query
    uniq (``colbert_ranker.py:212-229``).  Inputs may contain -1 (invalid).
    Output pids padded with -1.
    """
    n = pids.shape[0]
    sp, ss = jax.lax.sort((pids, scores), num_keys=1)
    first = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    seg = jnp.cumsum(first) - 1  # segment index per row
    seg_best = jax.ops.segment_max(ss, seg, num_segments=n)          # (n,) -inf beyond
    seg_pid = jax.ops.segment_max(
        jnp.where(first, sp, jnp.iinfo(jnp.int32).min), seg, num_segments=n
    )
    seg_valid = (seg_pid >= 0) & jnp.isfinite(seg_best)
    seg_score = jnp.where(seg_valid, seg_best, -jnp.inf)
    k = min(max_out, n)
    top_s, top_i = jax.lax.top_k(seg_score, k)
    out_pids = jnp.where(jnp.isfinite(top_s), seg_pid[top_i], -1).astype(jnp.int32)
    if k < max_out:
        out_pids = jnp.pad(out_pids, (0, max_out - k), constant_values=-1)
        top_s = jnp.pad(top_s, (0, max_out - k), constant_values=-jnp.inf)
    return out_pids, top_s
