"""List-major batched SQ probe: scan each probed IVF list ONCE per batch.

The token-major list scan (:mod:`colbert_tpu.ops.sq_probe_pallas`) issues one
DMA per (query-token, probed-list) pair — ~295k tiny copies at the bench
operating point (2304 tokens x nprobe=128).  Measured stage attribution shows
that probe's 98 ms is ~90% per-DMA/per-window overhead: the bytes moved
(~10 GB of re-reads) come from scanning each list once PER TOKEN even though
the whole codes array is only ~20 MB, and a list is probed by ~72 tokens of
the same batch on average.

This module inverts the loop — the TPU-idiomatic formulation:

1. XLA builds a *slot schedule*: all (token, list) probe pairs are sorted by
   list id and grouped into slots of up to ``TPL`` tokens sharing one list
   (a hot list probed by >TPL tokens gets multiple slots).
2. A Pallas kernel runs one grid step per slot: it builds the slot's query
   pack ``(TPL, sq_dim)`` with an in-VMEM one-hot matmul (no HBM gather),
   then streams the list's 128-row blocks once with double-buffered DMAs,
   scoring each block against ALL the slot's tokens in one fat MXU matmul
   ``(rows, sq_dim) x (sq_dim, TPL)`` and reducing to the per-(token, block)
   top-``R`` rows in-kernel — so the score transient never exists in HBM.
3. XLA maps the per-slot results back to (token, probed-list) order and takes
   each token's top-``depth`` over ``nprobe * max_blocks * R`` entries
   (vs. ``nprobe * cap`` raw scores before: ~50x smaller top-k input).

Equal recall knob: ``R`` rows kept per (token, 128-row block).  The exact
per-token scan keeps the global top-``depth`` over all probed rows; keeping
top-R per block is lossy only when >R of a token's top-depth rows land in the
same block — with multiview docs spread over lists this is rare (measured in
tests/bench).

Replaces: faiss's IVF scan loop (``colbert/ranking/colbert_ranker.py:183-210``)
— which also re-scans lists per query-token via ``index.search`` — with a
batch-amortized single pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 128  # CSR rows scanned per DMA block


class SlotSchedule(NamedTuple):
    qidx: jax.Array        # (S, TPL) int32 token id per slot position, -1 empty
    meta: jax.Array        # (S, 1, 8) int32 [start_packed, nblocks, lo, hi, aligned_row, valid, 0, 0]
    slot_of_pair: jax.Array  # (P,) int32 slot of pair i (t-major order)
    pos_of_pair: jax.Array   # (P,) int32 position within slot


def slot_capacity(num_pairs: int, num_lists: int, tpl: int) -> int:
    """Static upper bound on slots: every list needs at most
    ``count // TPL + 1`` slots, and there are at most min(K, P) non-empty
    lists."""
    return num_pairs // tpl + min(num_lists, num_pairs) + 1


def build_slot_schedule(
    lists: jax.Array,      # (T, nprobe) int32 probed list ids per token
    offsets: jax.Array,    # (K+1,) int32 CSR offsets
    *,
    tpl: int,
    s_cap: int,
    pack: int,
) -> SlotSchedule:
    """Group (token, list) probe pairs into per-list slots (jit-friendly).

    Built ENTIRELY from sorts, associative scans, searchsorted, and gathers —
    no scatter and no ``segment_sum``, which serialize on TPU (measured: the
    scatter formulation cost ~10x the kernel it was feeding).
    """
    T, nprobe = lists.shape
    K = offsets.shape[0] - 1
    if K * T >= 2**31:
        raise ValueError(f"packed (list, token) keys overflow int32: K={K} T={T}")
    P = T * nprobe
    l = lists.reshape(-1)
    t = jnp.repeat(jnp.arange(T, dtype=jnp.int32), nprobe)

    # ONE value-sort of packed (list, token) keys; each pair's sorted
    # position is recovered with an exact-match binary search below (cheaper
    # than two payload-carrying argsorts)
    key = l * T + t
    ks = jnp.sort(key)
    ls = ks // T
    ts = ks % T

    iota = jnp.arange(P, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), ls[1:] != ls[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, iota, -1))      # (P,)
    rank = iota - seg_start
    # segment length at every pair: position of the segment's last element
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    seg_end = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(last, iota, P))))
    count = seg_end - seg_start + 1
    nslots_seg = (count + tpl - 1) // tpl                       # same value across a segment
    # slots before this segment: prefix sum of nslots over segment FIRSTs
    contrib = jnp.where(first, nslots_seg, 0)
    base_seg = jnp.cumsum(contrib) - nslots_seg * first.astype(jnp.int32)
    base_seg = jax.lax.cummax(jnp.where(first, base_seg, -1))   # broadcast to the segment
    slot_sorted = base_seg + rank // tpl
    pos_sorted = rank % tpl
    slot_sorted = jnp.minimum(slot_sorted, s_cap - 1)  # safety clamp (s_cap is a true bound)

    # slot -> its first sorted-pair index, via binary search (slot_sorted is
    # non-decreasing); empty tail slots get start = P
    slot_ids = jnp.arange(s_cap, dtype=jnp.int32)
    start = jnp.searchsorted(slot_sorted, slot_ids, side="left").astype(jnp.int32)
    jraw = start[:, None] + jnp.arange(tpl, dtype=jnp.int32)[None, :]
    j = jnp.minimum(jraw, P - 1)
    occupied = (slot_sorted[j] == slot_ids[:, None]) & (jraw < P)
    qidx = jnp.where(occupied, ts[j], -1)                       # (s_cap, tpl)
    j0 = jnp.minimum(start, P - 1)
    slot_valid = ((slot_sorted[j0] == slot_ids) & (start < P)).astype(jnp.int32)
    slot_list = jnp.where(slot_valid > 0, ls[j0], 0)

    off_lo = offsets[slot_list]
    off_hi = offsets[jnp.minimum(slot_list + 1, offsets.shape[0] - 1)]
    aligned = (off_lo // 32) * 32      # DMA sublane alignment (int8: 32 rows)
    win = jnp.where(slot_valid > 0, off_hi - aligned, 0)
    nblocks = (win + BLOCK_ROWS - 1) // BLOCK_ROWS
    meta = jnp.stack(
        [aligned // pack, nblocks, off_lo - aligned, off_hi - aligned,
         aligned, slot_valid, jnp.zeros_like(aligned), jnp.zeros_like(aligned)],
        axis=-1,
    )[:, None, :]

    # pair i's slot/pos in t-major order: exact-match binary search of its
    # packed key (keys are unique: top_k lists are distinct per token)
    i_sorted = jnp.searchsorted(ks, key, side="left").astype(jnp.int32)
    slot_of_pair = slot_sorted[i_sorted]
    pos_of_pair = pos_sorted[i_sorted]
    return SlotSchedule(qidx, meta, slot_of_pair, pos_of_pair)


def build_slot_schedule_dense(
    coarse: jax.Array,   # (T, K) fp32 coarse scores
    thr: jax.Array,      # (T,) per-token probe threshold (nprobe-th best score)
    lists: jax.Array,    # (T, nprobe) the probed list ids (for the pair map)
    offsets: jax.Array,  # (K+1,) int32
    *,
    tpl: int,
    pack: int,
) -> Tuple[SlotSchedule, jax.Array]:
    """Sort-free slot schedule: one slot PER LIST, members selected straight
    from the coarse-score matrix.

    The sort-based builder costs ~65 ms at the serving operating point (a
    295k-pair sort + scans); this replaces it with one ``top_k`` over the
    transposed membership matrix (~the same cost as the coarse probe top-k)
    plus a cumsum:

    * member(t, l) = coarse[t, l] >= thr[t]
    * slot l's token pack = the ``tpl`` SMALLEST member token ids (top_k of
      ``-t``), so a pair's position is the member-count prefix
      ``cumsum(member, axis=0) - 1`` — no sort anywhere.
    * a list probed by more than ``tpl`` tokens truncates the excess pairs
      (returned mask ``pair_valid``); with tpl=128 and ~72 mean tokens/list
      this loses <1% of pairs, each of which retains its other nprobe-1
      lists.

    Returns (schedule, pair_valid (P,) bool).
    """
    T, K = coarse.shape
    member = coarse >= thr[:, None]                               # (T, K)
    tok_val = jnp.where(member, -jnp.arange(T, dtype=jnp.float32)[:, None], -jnp.inf)
    k_eff = min(tpl, T)
    vals, idx = jax.lax.top_k(tok_val.T, k_eff)                   # (K, k_eff)
    qidx = jnp.where(jnp.isinf(vals), -1, idx).astype(jnp.int32)
    if k_eff < tpl:
        qidx = jnp.pad(qidx, ((0, 0), (0, tpl - k_eff)), constant_values=-1)
    slot_valid = (qidx[:, 0] >= 0).astype(jnp.int32)

    off_lo = offsets[:-1]
    off_hi = offsets[1:]
    aligned = (off_lo // 32) * 32
    win = jnp.where(slot_valid > 0, off_hi - aligned, 0)
    nblocks = (win + BLOCK_ROWS - 1) // BLOCK_ROWS
    meta = jnp.stack(
        [aligned // pack, nblocks, off_lo - aligned, off_hi - aligned,
         aligned, slot_valid, jnp.zeros_like(aligned), jnp.zeros_like(aligned)],
        axis=-1,
    )[:, None, :]

    # pair (t, j) -> slot lists[t,j], pos = member-rank of t in that list
    pos_mat = jnp.cumsum(member.astype(jnp.int32), axis=0)        # (T, K)
    l_flat = lists.reshape(-1)
    t_flat = jnp.repeat(jnp.arange(T, dtype=jnp.int32), lists.shape[1])
    pos_of_pair = pos_mat.reshape(-1)[t_flat * K + l_flat] - 1
    pair_valid = pos_of_pair < tpl
    pos_of_pair = jnp.minimum(pos_of_pair, tpl - 1)
    return SlotSchedule(qidx, meta, l_flat, pos_of_pair), pair_valid


def _kernel(qidx_ref, meta_ref, qsT_ref, codes2_ref, out_s_ref, out_r_ref,
            buf_ref, sem_ref, *, tpl, r, pack, t_pad):
    sq_dim = LANES // pack
    rows_p = BLOCK_ROWS // pack  # packed rows per block

    start_packed = meta_ref[0, 0, 0]
    nblocks = meta_ref[0, 0, 1]
    lo = meta_ref[0, 0, 2]
    hi = meta_ref[0, 0, 3]
    aligned_row = meta_ref[0, 0, 4]

    def dma(slot, b):
        start = pl.multiple_of(start_packed + b * rows_p, 32 // pack)
        return pltpu.make_async_copy(
            codes2_ref.at[pl.ds(start, rows_p), :],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(nblocks > 0)
    def _():
        dma(0, 0).start()

    # ---- query pack: one-hot (TPL, T) matmul — all in VMEM, no HBM gather.
    # bf16 operands: the (tpl, T)x(T, sq_dim) contraction is the kernel's
    # biggest matmul and bf16 runs 4x the f32 MXU rate; the one-hot is exact
    # in bf16 and qs rounding only perturbs candidate scores
    qid = qidx_ref[0]                                   # (tpl, 1) int32
    token_iota = jax.lax.broadcasted_iota(jnp.int32, (tpl, t_pad), 1)
    oh = (qid == token_iota).astype(jnp.bfloat16)       # (tpl, t_pad)
    # qpackT (sq_dim, tpl): qsT (sq_dim, t_pad) contracted with oh over tokens
    qpackT = jax.lax.dot_general(
        qsT_ref[:], oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zeros_band = jnp.zeros((sq_dim, tpl), jnp.float32)
    # bands[c]: (LANES, tpl) with qpackT on lane rows [c*sq_dim, (c+1)*sq_dim)
    bands = [
        jnp.concatenate(
            [zeros_band] * c + [qpackT] + [zeros_band] * (pack - 1 - c), axis=0
        )
        for c in range(pack)
    ]

    big = jnp.int32(1 << 30)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_p, tpl), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (r, tpl), 0)

    def body(b, state):
        state_s, state_r = state                        # (r, tpl) running top-r
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nblocks)
        def _():
            dma(jax.lax.rem(b + 1, 2), b + 1).start()

        dma(slot, b).wait()
        rowsP = buf_ref[slot].astype(jnp.float32)       # (rows_p, LANES)
        planes = []
        for c in range(pack):
            s = jax.lax.dot_general(
                rowsP, bands[c],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # (rows_p, tpl): window row pack*p + c
            ridx = b * BLOCK_ROWS + pack * p_iota + c
            s = jnp.where((ridx >= lo) & (ridx < hi), s, -jnp.inf)
            planes.append(s)

        # merge (running top-r ∪ this block's rows) -> new top-r, per token.
        # r extract-max passes; the state rides along as one more "plane".
        # Exactly ONE entry is consumed per pass (masked by its row id, not
        # by score), so duplicate scores are all kept.
        top_s, top_r = [], []
        for _ in range(r):
            ms = [jnp.max(p, axis=0, keepdims=True) for p in planes]
            m_blk = functools.reduce(jnp.maximum, ms)               # (1, tpl)
            m_st = jnp.max(state_s, axis=0, keepdims=True)
            m = jnp.maximum(m_blk, m_st)
            # winner: the min window-row among block ties; state only if no
            # block row matches m
            cand = [
                jnp.where(planes[c] == m, pack * p_iota + c, big)
                for c in range(pack)
            ]
            rid = functools.reduce(
                jnp.minimum, [jnp.min(cv, axis=0, keepdims=True) for cv in cand]
            )                                                       # (1, tpl)
            from_blk = rid < big
            gr_blk = aligned_row + b * BLOCK_ROWS + rid
            idx_st = jnp.min(
                jnp.where(state_s == m, r_iota, big), axis=0, keepdims=True
            )                                                       # (1, tpl)
            gr_st = jnp.min(
                jnp.where(r_iota == idx_st, state_r, big), axis=0, keepdims=True
            )
            gr = jnp.where(from_blk, gr_blk, gr_st)
            gr = jnp.where(jnp.isfinite(m), gr, -1)
            # consume exactly the selected entry
            planes = [
                jnp.where(
                    from_blk & ((pack * p_iota + c) == rid), -jnp.inf, planes[c]
                )
                for c in range(pack)
            ]
            state_s = jnp.where((~from_blk) & (r_iota == idx_st), -jnp.inf, state_s)
            top_s.append(m)
            top_r.append(gr)
        return jnp.concatenate(top_s, axis=0), jnp.concatenate(top_r, axis=0)

    init = (jnp.full((r, tpl), -jnp.inf, jnp.float32), jnp.full((r, tpl), -1, jnp.int32))
    final_s, final_r = jax.lax.fori_loop(0, nblocks, body, init)
    out_s_ref[0, :, :] = final_s
    out_r_ref[0, :, :] = final_r


@functools.partial(jax.jit, static_argnames=("tpl", "r", "interpret"))
def sq_batch_list_scan(
    qidx: jax.Array,     # (S, TPL) int32
    meta: jax.Array,     # (S, 1, 8) int32
    qsT: jax.Array,      # (sq_dim, T_pad) fp32 transposed projected queries
    codes8: jax.Array,   # (N_pad, sq_dim) int8 CSR codes (padded, see pad_codes_for_scan)
    *,
    tpl: int,
    r: int,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-slot list scan with a running top-``r`` per token maintained
    across the list's blocks in-kernel.  Returns (scores (S, r, TPL) fp32,
    rows (S, r, TPL) int32 global CSR row ids); -inf / -1 at empty entries.
    """
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    S = qidx.shape[0]
    sq_dim = codes8.shape[1]
    if LANES % sq_dim != 0:
        raise ValueError(f"sq_dim must divide {LANES}, got {sq_dim}")
    pack = LANES // sq_dim
    t_pad = qsT.shape[1]
    n_pad = codes8.shape[0]
    if n_pad % pack != 0:
        raise ValueError("padded codes rows must divide the packing factor")
    codes2 = codes8.reshape(n_pad // pack, LANES)

    qsT = qsT.astype(jnp.bfloat16)
    out_s, out_r = pl.pallas_call(
        functools.partial(_kernel, tpl=tpl, r=r, pack=pack, t_pad=t_pad),
        out_shape=(
            jax.ShapeDtypeStruct((S, r, tpl), jnp.float32),
            jax.ShapeDtypeStruct((S, r, tpl), jnp.int32),
        ),
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, tpl, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((sq_dim, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # codes stay in HBM; manual DMA
        ],
        out_specs=(
            pl.BlockSpec((1, r, tpl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, tpl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_ROWS // pack, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * (tpl * t_pad * sq_dim + 2 * BLOCK_ROWS * sq_dim * tpl),
            bytes_accessed=S * (2 * BLOCK_ROWS * sq_dim + tpl * 4 + r * tpl * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qidx[:, :, None], meta, qsT, codes2)
    return out_s, out_r


def probe_batched_postprocess(
    sched: SlotSchedule,
    out_s: jax.Array,     # (S, r, TPL)
    out_r: jax.Array,
    T: int,
    nprobe: int,
    depth: int,
    approx: bool,
    pair_valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Map per-slot results back to tokens and take per-token top-depth."""
    S, r, tpl = out_s.shape
    # flatten the (slot, pos) axes so one row-gather recovers each pair's entries
    flat_s = jnp.transpose(out_s, (0, 2, 1)).reshape(S * tpl, r)
    flat_r = jnp.transpose(out_r, (0, 2, 1)).reshape(S * tpl, r)
    idx = sched.slot_of_pair * tpl + sched.pos_of_pair             # (P,)
    ps = flat_s[idx]
    pr = flat_r[idx]
    if pair_valid is not None:
        ps = jnp.where(pair_valid[:, None], ps, -jnp.inf)
        pr = jnp.where(pair_valid[:, None], pr, -1)
    ps = ps.reshape(T, nprobe * r)
    pr = pr.reshape(T, nprobe * r)

    if ps.shape[1] <= depth:
        # nothing to select — pass everything through (e.g. nprobe*r == depth)
        pad = depth - ps.shape[1]
        s = jnp.pad(ps, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        rows = jnp.pad(pr, ((0, 0), (0, pad)), constant_values=-1)
        return s, rows.astype(jnp.int32)
    k = depth
    if approx and not jax.default_backend() in ("cpu",):
        s, i = jax.lax.approx_max_k(ps, k)
    else:
        s, i = jax.lax.top_k(ps, k)
    rows = jnp.take_along_axis(pr, i, axis=1)
    rows = jnp.where(jnp.isfinite(s), rows, -1)
    return s, rows.astype(jnp.int32)
