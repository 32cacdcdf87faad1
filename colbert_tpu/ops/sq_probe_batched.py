"""List-major batched SQ probe: scan each probed IVF list ONCE per batch.

The token-major list scan (:mod:`colbert_tpu.ops.sq_probe_pallas`) issues one
DMA per (query-token, probed-list) pair — ~295k tiny copies at the bench
operating point (2304 tokens x nprobe=128).  Measured stage attribution shows
that probe's 98 ms is ~90% per-DMA/per-window overhead: the bytes moved
(~10 GB of re-reads) come from scanning each list once PER TOKEN even though
the whole codes array is only ~20 MB, and a list is probed by ~72 tokens of
the same batch on average.

This module inverts the loop — the TPU-idiomatic formulation:

1. XLA builds a *slot schedule*: (token, list) probe pairs are grouped into
   slots of up to ``TPL`` tokens sharing one list (a hot list probed by more
   tokens spans multiple slot groups).  Two builders exist:
   :func:`build_slot_schedule_dense` (the default: sort-free, one ``top_k``
   over the transposed membership matrix + a cumsum, ~2 ms at the serving
   operating point) and the original sort-based :func:`build_slot_schedule`
   (kept as the oracle for tests; its one value-sort + scans measured
   ~35-65 ms in-pipeline).
2. A Pallas kernel runs one grid step per slot: it builds the slot's query
   pack ``(TPL, sq_dim)`` with an in-VMEM one-hot matmul (no HBM gather),
   then streams the list's 128-row blocks once with double-buffered DMAs,
   scoring each block against ALL the slot's tokens in one fat MXU matmul
   ``(rows, sq_dim) x (sq_dim, TPL)`` and maintaining a running
   per-(token, list) top-``R`` across blocks in-kernel — the raw score
   transient never exists in HBM.
3. XLA maps the per-slot results back to (token, probed-list) order and takes
   each token's top-``depth`` over ``nprobe * R`` entries
   (vs. ``nprobe * cap`` raw scores before: ~50x smaller top-k input).

Equal recall knob: ``R`` rows kept per (token, probed list).  Measured at the
bench operating point (R=8, nprobe=128, depth=512): recall@100 0.989 vs the
token-major exact scan's 0.983 — per-list top-R DIVERSIFIES candidates
relative to the global top-depth's hot-list bias.

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
    groups: int = 8,
    list_mask: jax.Array | None = None,   # (K,) bool: lists handled here
) -> Tuple[SlotSchedule, jax.Array]:
    """Sort-free slot schedule: ``groups`` slots per list, members selected
    straight from the coarse-score matrix.

    The sort-based builder costs ~65 ms at the serving operating point (a
    295k-pair sort + scans); this replaces it with ONE ``top_k`` over the
    transposed membership matrix plus a cumsum:

    * member(t, l) = coarse[t, l] >= thr[t]
    * the ``groups * tpl`` SMALLEST member token ids per list (one top_k of
      ``-t`` with k = groups*tpl) are split into ``groups`` slots of
      ``tpl``; because selection is by ascending token id, slot g holds
      exactly the members with rank in [g*tpl, (g+1)*tpl) — so a pair's
      (slot, pos) comes from the member-count prefix
      ``cumsum(member, axis=0) - 1``.  No sort anywhere.
    * probe popularity is heavily SKEWED (a hot list can be probed by
      hundreds of the batch's tokens — and hot lists are precisely the ones
      tokens rank highest), so single-slot truncation at tpl=128 collapses
      recall (measured 0.98 -> 0.13); groups=8 covers up to 1024 members
      per list and empty overflow slots cost one guarded grid step.

    Returns (schedule with slot id = g*K + l, pair_valid (P,) bool).
    """
    T, K = coarse.shape
    member = coarse >= thr[:, None]                               # (T, K)
    if list_mask is not None:
        member = member & list_mask[None, :]
    tok_val = jnp.where(member, -jnp.arange(T, dtype=jnp.float32)[:, None], -jnp.inf)
    k_eff = min(groups * tpl, T)
    vals, idx = jax.lax.top_k(tok_val.T, k_eff)                   # (K, k_eff)
    qidx = jnp.where(jnp.isinf(vals), -1, idx).astype(jnp.int32)
    if k_eff < groups * tpl:
        qidx = jnp.pad(qidx, ((0, 0), (0, groups * tpl - k_eff)), constant_values=-1)
    # (K, groups, tpl) -> slot-major (groups*K, tpl), slot id = g*K + l
    qidx = jnp.transpose(qidx.reshape(K, groups, tpl), (1, 0, 2)).reshape(groups * K, tpl)
    slot_valid = (qidx[:, 0] >= 0).astype(jnp.int32)

    off_lo = jnp.tile(offsets[:-1], groups)
    off_hi = jnp.tile(offsets[1:], groups)
    aligned = (off_lo // 32) * 32
    win = jnp.where(slot_valid > 0, off_hi - aligned, 0)
    nblocks = (win + BLOCK_ROWS - 1) // BLOCK_ROWS
    meta = jnp.stack(
        [aligned // pack, nblocks, off_lo - aligned, off_hi - aligned,
         aligned, slot_valid, jnp.zeros_like(aligned), jnp.zeros_like(aligned)],
        axis=-1,
    )[:, None, :]

    # pair (t, j): rank of t among the list's members (by ascending token id)
    pos_mat = jnp.cumsum(member.astype(jnp.int32), axis=0)        # (T, K)
    l_flat = lists.reshape(-1)
    t_flat = jnp.repeat(jnp.arange(T, dtype=jnp.int32), lists.shape[1])
    flat_idx = t_flat * K + l_flat
    rank = pos_mat.reshape(-1)[flat_idx] - 1
    # a pair that is somehow NOT a member (e.g. approximate list selection
    # below the threshold) would alias another token's slot position
    pair_valid = (rank < groups * tpl) & member.reshape(-1)[flat_idx]
    rank = jnp.minimum(rank, groups * tpl - 1)
    slot_of_pair = (rank // tpl) * K + l_flat
    pos_of_pair = rank % tpl
    return SlotSchedule(qidx, meta, slot_of_pair, pos_of_pair), pair_valid


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

    # empty (overflow) slots cost just this guarded grid step; their output
    # is never gathered (pairs only map to slots holding their member)
    @pl.when(nblocks > 0)
    def _run():
        dma(0, 0).start()

        # ---- query pack: one-hot (TPL, T) matmul — all in VMEM, no HBM
        # gather.  bf16 operands: the (tpl, T)x(T, sq_dim) contraction is
        # the kernel's biggest matmul and bf16 runs 4x the f32 MXU rate; the
        # one-hot is exact in bf16 and qs rounding only perturbs candidate
        # scores
        # qidx rides in as (1, 1, tpl): lanes carry TPL.  The previous
        # (1, tpl, 1) layout lane-padded 1 -> 128 (the CLAUDE.md landmine) —
        # an S-slot schedule at K=16384 materialized an 8 GB HLO temp for
        # 64 MB of real data and OOM'd the 500k-doc serve compile.
        qid = qidx_ref[0]                                   # (1, tpl) int32
        token_iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tpl), 0)
        ohT = (qid == token_iota).astype(jnp.bfloat16)      # (t_pad, tpl)
        # qpackT (sq_dim, tpl): qsT contracted with ohT over tokens
        qpackT = jax.lax.dot_general(
            qsT_ref[:], ohT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        zeros_band = jnp.zeros((sq_dim, tpl), jnp.float32)
        # bands[c]: (LANES, tpl), qpackT on lane rows [c*sq_dim, (c+1)*sq_dim)
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


def _hot_kernel(meta_ref, bands_ref, codes2_ref, out_s_ref, out_r_ref,
                buf_ref, sem_ref, *, r, pack, t_pad):
    """Dense scan of one 128-row block of a HOT list against ALL tokens."""
    sq_dim = LANES // pack
    rows_p = BLOCK_ROWS // pack
    b = pl.program_id(0)
    start_packed = meta_ref[b * 8 + 1]
    lo = meta_ref[b * 8 + 2]
    hi = meta_ref[b * 8 + 3]
    base_row = meta_ref[b * 8 + 4]
    is_first = meta_ref[b * 8 + 5]

    # unconditional DMA: dummy blocks ([lo, hi) empty) read in-bounds padding
    # and mask to -inf, so the merge is a no-op for them
    copy = pltpu.make_async_copy(
        codes2_ref.at[pl.ds(pl.multiple_of(start_packed, 32 // pack), rows_p), :],
        buf_ref,
        sem_ref,
    )
    copy.start()

    state_s = jnp.where(is_first > 0, jnp.full((r, t_pad), -jnp.inf, jnp.float32), out_s_ref[0])
    state_r = jnp.where(is_first > 0, jnp.full((r, t_pad), -1, jnp.int32), out_r_ref[0])

    big = jnp.int32(1 << 30)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_p, t_pad), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (r, t_pad), 0)

    copy.wait()
    rowsP = buf_ref[:].astype(jnp.float32)          # (rows_p, LANES)
    planes = []
    for c in range(pack):
        s = jax.lax.dot_general(
            rowsP, bands_ref[:, c * t_pad : (c + 1) * t_pad],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (rows_p, t_pad)
        ridx = pack * p_iota + c
        planes.append(jnp.where((ridx >= lo) & (ridx < hi), s, -jnp.inf))
    top_s, top_r = [], []
    for _ in range(r):
        ms = [jnp.max(p, axis=0, keepdims=True) for p in planes]
        m_blk = functools.reduce(jnp.maximum, ms)
        m_st = jnp.max(state_s, axis=0, keepdims=True)
        m = jnp.maximum(m_blk, m_st)
        cand = [jnp.where(planes[c] == m, pack * p_iota + c, big) for c in range(pack)]
        rid = functools.reduce(
            jnp.minimum, [jnp.min(cv, axis=0, keepdims=True) for cv in cand]
        )
        from_blk = rid < big
        gr_blk = base_row + rid
        idx_st = jnp.min(jnp.where(state_s == m, r_iota, big), axis=0, keepdims=True)
        gr_st = jnp.min(jnp.where(r_iota == idx_st, state_r, big), axis=0, keepdims=True)
        gr = jnp.where(from_blk, gr_blk, gr_st)
        gr = jnp.where(jnp.isfinite(m), gr, -1)
        planes = [
            jnp.where(from_blk & ((pack * p_iota + c) == rid), -jnp.inf, planes[c])
            for c in range(pack)
        ]
        state_s = jnp.where((~from_blk) & (r_iota == idx_st), -jnp.inf, state_s)
        top_s.append(m)
        top_r.append(gr)
    out_s_ref[0] = jnp.concatenate(top_s, axis=0)
    out_r_ref[0] = jnp.concatenate(top_r, axis=0)


@functools.partial(jax.jit, static_argnames=("hot_cap", "maxb", "r", "interpret"))
def sq_hot_list_scan(
    hot_ids: jax.Array,   # (hot_cap,) int32 list ids (-1 padded)
    offsets: jax.Array,   # (K+1,) int32
    qsT: jax.Array,       # (sq_dim, T_pad) fp32
    codes8: jax.Array,    # (N_pad, sq_dim) int8 CSR codes (padded)
    *,
    hot_cap: int,
    maxb: int,
    r: int,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Score every row of the ``hot_cap`` hottest lists against ALL tokens.

    A popularity-hot list (probed by most of the batch) defeats the slot
    schedule's per-list token capacity; scanning it densely costs one fat
    ``(rows, sq_dim) x (sq_dim, pack*T)`` matmul per 128-row block — cheaper
    than any packing.  Tokens that did not probe a hot list simply never
    gather its entries.  Returns (scores (hot_cap, r, T_pad) fp32,
    rows (hot_cap, r, T_pad) int32 CSR rows)."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    sq_dim = codes8.shape[1]
    pack = LANES // sq_dim
    t_pad = qsT.shape[1]
    n_pad = codes8.shape[0]
    codes2 = codes8.reshape(n_pad // pack, LANES)
    rows_p = BLOCK_ROWS // pack

    # per-(hot, block) scalar meta, hot-major so output revisiting works
    safe = jnp.maximum(hot_ids, 0)
    off_lo = jnp.where(hot_ids >= 0, offsets[safe], 0)
    off_hi = jnp.where(hot_ids >= 0, offsets[jnp.minimum(safe + 1, offsets.shape[0] - 1)], 0)
    aligned = (off_lo // 32) * 32
    h_idx = jnp.repeat(jnp.arange(hot_cap, dtype=jnp.int32), maxb)
    b_idx = jnp.tile(jnp.arange(maxb, dtype=jnp.int32), hot_cap)
    al = aligned[h_idx]
    lo = jnp.clip(off_lo[h_idx] - al - b_idx * BLOCK_ROWS, 0, BLOCK_ROWS)
    hi = jnp.clip(off_hi[h_idx] - al - b_idx * BLOCK_ROWS, 0, BLOCK_ROWS)
    meta = jnp.stack([
        h_idx,
        al // pack + b_idx * rows_p,
        lo, hi,
        al + b_idx * BLOCK_ROWS,
        (b_idx == 0).astype(jnp.int32),
        jnp.zeros_like(h_idx), jnp.zeros_like(h_idx),
    ], axis=1).reshape(-1)

    # block-diagonal bands: bands[c*sq_dim+d, c*t_pad+t] = qsT[d, t]
    zeros = jnp.zeros((sq_dim, t_pad), jnp.float32)
    bands = jnp.concatenate(
        [jnp.concatenate([zeros] * c + [qsT.astype(jnp.float32)] + [zeros] * (pack - 1 - c), axis=1)
         for c in range(pack)], axis=0
    )                                                   # (LANES, pack*t_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hot_cap * maxb,),
        in_specs=[
            pl.BlockSpec((LANES, pack * t_pad), lambda b, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, r, t_pad), lambda b, m: (m[b * 8], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, t_pad), lambda b, m: (m[b * 8], 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_p, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_s, out_r = pl.pallas_call(
        functools.partial(_hot_kernel, r=r, pack=pack, t_pad=t_pad),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((hot_cap, r, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((hot_cap, r, t_pad), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, bands, codes2)
    return out_s, out_r


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
            # (1, 1, tpl): lanes carry TPL — a (1, tpl, 1) block lane-pads
            # its size-1 minor dim 128x (8 GB at K=16384 slot counts)
            pl.BlockSpec((1, 1, tpl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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
    )(qidx[:, None, :], meta, qsT, codes2)
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
    hot: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
    lists: jax.Array | None = None,
    stop: str | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Map per-slot (and hot-list) results back to tokens, then per-token
    top-depth.  ``hot`` = (hot_pos (K,), hot_s (H, r, T_pad), hot_r) from
    :func:`sq_hot_list_scan`.

    The pair mapping is ONE row-gather: scores (bitcast int32) and row ids
    are concatenated column-wise into a single ``(rows, 2r)`` source, the
    hot-list results are appended row-wise, and hot/valid selection is done
    on the *index* vector before the gather.  Narrow row-gathers are
    dominated by per-row overhead on TPU, so fusing the four gathers
    (slot/hot x scores/rows) into one measured 22.4 -> ~6 ms at the serving
    operating point (batch 144, nprobe 128, r 8)."""
    S, r, tpl = out_s.shape
    # flatten the (slot, pos) axes so one row-gather recovers each pair's entries
    src = jnp.concatenate([
        jax.lax.bitcast_convert_type(
            jnp.transpose(out_s, (0, 2, 1)), jnp.int32).reshape(S * tpl, r),
        jnp.transpose(out_r, (0, 2, 1)).reshape(S * tpl, r),
    ], axis=1)                                                     # (S*tpl, 2r)
    idx = sched.slot_of_pair * tpl + sched.pos_of_pair             # (P,)
    valid = pair_valid if pair_valid is not None else jnp.ones(idx.shape, bool)
    if hot is not None:
        hot_pos, hot_s, hot_r = hot
        H, _, t_pad = hot_s.shape
        hot_src = jnp.concatenate([
            jax.lax.bitcast_convert_type(
                jnp.transpose(hot_s, (0, 2, 1)), jnp.int32).reshape(H * t_pad, r),
            jnp.transpose(hot_r, (0, 2, 1)).reshape(H * t_pad, r),
        ], axis=1)
        l_flat = lists.reshape(-1)
        t_flat = jnp.repeat(jnp.arange(T, dtype=jnp.int32), nprobe)
        hp = hot_pos[l_flat]                                       # (P,)
        is_hot = hp >= 0
        idx = jnp.where(is_hot, S * tpl + jnp.maximum(hp, 0) * t_pad + t_flat, idx)
        valid = valid | is_hot
        src = jnp.concatenate([src, hot_src], axis=0)
    pc = src[idx]                                                  # ONE gather (P, 2r)
    ps = jax.lax.bitcast_convert_type(pc[:, :r], jnp.float32)
    pr = pc[:, r:]
    ps = jnp.where(valid[:, None], ps, -jnp.inf)
    pr = jnp.where(valid[:, None], pr, -1)
    ps = ps.reshape(T, nprobe * r)
    pr = pr.reshape(T, nprobe * r)
    if stop == "gather":  # timing bisection: pair gathers + hot blend only
        k = min(depth, ps.shape[1])
        return ps[:, :k], pr[:, :k].astype(jnp.int32)

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
