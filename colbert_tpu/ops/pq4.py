"""PQ4 fast-scan: 4-bit product quantization with an MXU one-hot ADC.

The reference's codec is IVF-PQ m=64/nbits=8 (``faiss_index.py:25``): ADC is
a 256-entry table lookup per subspace — gather-unit work a TPU runs ~100x
below memory speed (round-1: 22.9 QPS vs 551 for the int8 SQ codec at equal
bytes).  faiss's own answer on SIMD CPUs is *fast-scan* (IndexIVFPQFastScan,
m=2x, nbits=4: LUTs fit in registers for in-register shuffles).  The TPU
translation of that idea maps the lookup onto the MXU:

    score[row, t] = sum_j lut_t[j, nib(row, j)]
                  = onehot(nibbles(row)) . vec(lut_t)

so scoring a 128-row code block against EVERY query token is a single
``(rows, m/2*16) x (m/2*16, T)`` one-hot matmul per nibble plane — the LUT
"gather" rides the systolic array.  At m=128/ksub=16 a code row is 64 B,
the same index memory as the reference's m=64/nbits=8.

The scan is DENSE over the code blocks (every block scored against every
token — ~0.2 TFLOP at the 20k-doc bench point) with IVF probe masking
applied in-kernel: each block keeps a running per-(token, block's-list)
top-``r`` merged across the list's blocks via output-block revisiting
(PrefetchScalarGridSpec: the out block index is the block's list id, so
consecutive blocks of one list accumulate in VMEM and flush once).  Cost
grows with corpus size x tokens, so this codec is the right choice up to
~100k docs/chip; beyond that the SQ codec's slot-scheduled sparse scan
(:mod:`colbert_tpu.ops.sq_probe_batched`) scales better.

Lists are re-padded to 128-row multiples at load time (blocks never span
lists); pad rows are masked by the per-block valid count.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from colbert_tpu.ops.pq import adc_lut, pq_encode, pq_train

LANES = 128
BLOCK_ROWS = 128
KSUB = 16


def pq4_train(points: jax.Array, m: int, *, iters: int = 25, key=None, chunk: int = 16384) -> jax.Array:
    """Codebooks (m, 16, d/m) — just PQ training at nbits=4."""
    return pq_train(points, m, KSUB, iters=iters, key=key, chunk=chunk)


def pq4_encode_packed(points: jax.Array, codebooks: jax.Array, chunk: int = 16384) -> np.ndarray:
    """Encode + nibble-pack: (N, d) -> int8 (N, m/2); byte jj holds
    nib[2jj] | nib[2jj+1] << 4."""
    codes = np.asarray(pq_encode(points, codebooks, chunk=chunk))  # (N, m) uint8 in [0,16)
    lo = codes[:, 0::2].astype(np.uint8)
    hi = codes[:, 1::2].astype(np.uint8)
    return (lo | (hi << 4)).view(np.int8)


def pq4_unpack(packed: np.ndarray) -> np.ndarray:
    """(N, m/2) int8 -> (N, m) uint8 nibbles (tests / decode)."""
    b = packed.view(np.uint8)
    out = np.empty((b.shape[0], b.shape[1] * 2), np.uint8)
    out[:, 0::2] = b & 15
    out[:, 1::2] = b >> 4
    return out


class Pq4Blocks(NamedTuple):
    codes2: np.ndarray      # (n_blocks*BLOCK_ROWS/pack, LANES) int8 lane-packed padded codes
    block_list: np.ndarray  # (n_blocks,) int32 owning list
    block_hi: np.ndarray    # (n_blocks,) int32 valid rows in block
    block_first: np.ndarray # (n_blocks,) int32 1 = first block of its list
    row_of_padded: np.ndarray  # (n_blocks*BLOCK_ROWS,) int32 original CSR row or -1
    num_lists: int


def build_pq4_blocks(codes_packed: np.ndarray, offsets: np.ndarray) -> Pq4Blocks:
    """Re-pad the CSR so every list is a whole number of 128-row blocks."""
    K = offsets.shape[0] - 1
    bpr = codes_packed.shape[1]          # bytes per row (m/2)
    pack = LANES // bpr
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    nblocks = np.maximum(0, (lens + BLOCK_ROWS - 1) // BLOCK_ROWS)
    total_blocks = int(nblocks.sum())
    padded = np.zeros((max(1, total_blocks) * BLOCK_ROWS, bpr), np.int8)
    row_of = np.full(max(1, total_blocks) * BLOCK_ROWS, -1, np.int32)
    block_list = np.zeros(max(1, total_blocks), np.int32)
    block_hi = np.zeros(max(1, total_blocks), np.int32)
    block_first = np.zeros(max(1, total_blocks), np.int32)
    b = 0
    w = 0
    for l in range(K):
        ln = int(lens[l])
        if ln == 0:
            continue
        padded[w : w + ln] = codes_packed[offsets[l] : offsets[l + 1]]
        row_of[w : w + ln] = np.arange(offsets[l], offsets[l + 1], dtype=np.int32)
        for k in range(int(nblocks[l])):
            block_list[b] = l
            block_hi[b] = min(BLOCK_ROWS, ln - k * BLOCK_ROWS)
            block_first[b] = 1 if k == 0 else 0
            b += 1
        w += int(nblocks[l]) * BLOCK_ROWS
    codes2 = padded.reshape(-1, pack, bpr).reshape(-1, LANES)
    return Pq4Blocks(codes2, block_list, block_hi, block_first, row_of, K)


def pq4_meta(blocks: Pq4Blocks) -> np.ndarray:
    """FLAT per-block scalar-prefetch values
    [list, valid_rows, is_first, padded_base] * n_blocks.  1-D: a 2-D
    (n, 4) SMEM array lane-pads 4 -> 128 and overflows the 1 MB SMEM."""
    n = blocks.block_list.shape[0]
    return np.stack(
        [blocks.block_list, blocks.block_hi, blocks.block_first,
         np.arange(n, dtype=np.int32) * BLOCK_ROWS],
        axis=1,
    ).astype(np.int32).reshape(-1)


def _kernel(meta_ref, member_ref, buf_ref, expand_ref, vpat_ref, le_ref, lo_ref,
            out_s_ref, out_r_ref, *, r, pack, bpr, t_pad):
    rows_p = BLOCK_ROWS // pack
    hi = meta_ref[1]
    is_first = meta_ref[2]

    b32 = buf_ref[:].astype(jnp.int32)                  # (rows_p, LANES)
    nlo = (b32 & 15).astype(jnp.float32)
    nhi = ((b32 >> 4) & 15).astype(jnp.float32)
    # int8 vector compares miscompile in Mosaic ("target does not support
    # this comparison"); widen first
    mem = member_ref[0].astype(jnp.int32) > 0           # (1, t_pad)

    vpat = vpat_ref[:]                                  # (1, bpr*KSUB) iota%16
    big = jnp.int32(1 << 30)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_p, t_pad), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (r, t_pad), 0)

    planes = []
    for c in range(pack):
        sl = nlo[:, c * bpr : (c + 1) * bpr]
        sh = nhi[:, c * bpr : (c + 1) * bpr]
        acc = None
        for nib, lut_ref in ((sl, le_ref), (sh, lo_ref)):
            ex = jax.lax.dot_general(
                nib, expand_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # (rows_p, bpr*KSUB)
            oh = (ex == vpat).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                oh, lut_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # (rows_p, t_pad)
            acc = s if acc is None else acc + s
        ridx = pack * p_iota + c
        valid = (ridx < hi) & mem                       # broadcast (1, t_pad)
        planes.append(jnp.where(valid, acc, -jnp.inf))

    state_s = jnp.where(is_first > 0, jnp.full((r, t_pad), -jnp.inf, jnp.float32), out_s_ref[0])
    state_r = jnp.where(is_first > 0, jnp.full((r, t_pad), -1, jnp.int32), out_r_ref[0])

    block_base = meta_ref[3]  # padded-row base of this block
    top_s, top_r = [], []
    for _ in range(r):
        ms = [jnp.max(p, axis=0, keepdims=True) for p in planes]
        m_blk = functools.reduce(jnp.maximum, ms)
        m_st = jnp.max(state_s, axis=0, keepdims=True)
        m = jnp.maximum(m_blk, m_st)
        cand = [
            jnp.where(planes[c] == m, pack * p_iota + c, big) for c in range(pack)
        ]
        rid = functools.reduce(
            jnp.minimum, [jnp.min(cv, axis=0, keepdims=True) for cv in cand]
        )
        from_blk = rid < big
        gr_blk = block_base + rid
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


@functools.partial(jax.jit, static_argnames=("r", "num_lists", "interpret"))
def pq4_block_scan(
    meta: jax.Array,     # (n_blocks*4,) int32 flat [list, hi, is_first, padded_base]
    member: jax.Array,   # (K, 1, T_pad) int8 probe membership
    codes2: jax.Array,   # (n_blocks*BLOCK_ROWS/pack, LANES) int8
    le: jax.Array,       # (bpr*KSUB, T_pad) bf16 even-subspace LUT planes
    lo: jax.Array,       # (bpr*KSUB, T_pad) bf16 odd-subspace LUT planes
    *,
    r: int,
    num_lists: int,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dense masked block scan.  Returns per-list running top-r:
    (scores (K, r, T_pad) fp32, rows (K, r, T_pad) int32 PADDED row ids)."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    n_blocks = meta.shape[0] // 4
    t_pad = le.shape[1]
    bpr = le.shape[0] // KSUB
    pack = LANES // bpr
    rows_p = BLOCK_ROWS // pack
    K = num_lists

    # lane-expansion matrix: ex[:, jj*16+v] = nib[:, jj]
    expand = (
        (jnp.arange(bpr)[:, None] == (jnp.arange(bpr * KSUB)[None, :] // KSUB))
        .astype(jnp.float32)
    )
    vpat = (jnp.arange(bpr * KSUB, dtype=jnp.int32) % KSUB).astype(jnp.float32)[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            # (K, 1, t_pad) with (1, 1, t_pad) blocks: TPU block shapes need
            # the last two dims divisible by (8, 128) or equal to the array's
            pl.BlockSpec((1, 1, t_pad), lambda b, m_ref: (m_ref[b * 4], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_p, LANES), lambda b, m_ref: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bpr, bpr * KSUB), lambda b, m_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bpr * KSUB), lambda b, m_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bpr * KSUB, t_pad), lambda b, m_ref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bpr * KSUB, t_pad), lambda b, m_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, r, t_pad), lambda b, m_ref: (m_ref[b * 4], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, t_pad), lambda b, m_ref: (m_ref[b * 4], 0, 0), memory_space=pltpu.VMEM),
        ),
    )

    def kernel(m_ref, member_ref, buf_ref, expand_ref, vpat_ref, le_ref, lo_ref,
               out_s_ref, out_r_ref):
        b = pl.program_id(0)
        meta_row = (m_ref[b * 4], m_ref[b * 4 + 1], m_ref[b * 4 + 2], m_ref[b * 4 + 3])
        _kernel(meta_row, member_ref, buf_ref, expand_ref, vpat_ref, le_ref, lo_ref,
                out_s_ref, out_r_ref, r=r, pack=pack, bpr=bpr, t_pad=t_pad)

    out_s, out_r = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, r, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, r, t_pad), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * 2 * BLOCK_ROWS * bpr * KSUB * t_pad,
            bytes_accessed=n_blocks * (BLOCK_ROWS * bpr + t_pad) + K * r * t_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, member, codes2, expand, vpat, le.astype(jnp.bfloat16), lo.astype(jnp.bfloat16))
    return out_s, out_r


@functools.partial(jax.jit, static_argnames=("nprobe", "depth", "r", "num_lists", "approx_topk", "interpret"))
def ivf_probe_pq4(
    q_tokens: jax.Array,          # (T, d)
    coarse_centroids: jax.Array,  # (K, d)
    codebooks: jax.Array,         # (m, 16, d/m)
    meta: jax.Array,              # (n_blocks*4,) int32 from pq4_meta
    codes2: jax.Array,            # lane-packed padded codes
    row_of_padded: jax.Array,     # (padded_rows,) int32 -> CSR row or -1
    list_nonempty: jax.Array,     # (K,) int32
    *,
    nprobe: int,
    depth: int,
    r: int = 4,
    num_lists: int,
    approx_topk: bool = False,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """PQ4 probe with the :func:`ivf_probe_sq` contract: per token the
    top-``depth`` (scores, CSR row ids) over its probed lists."""
    T, d = q_tokens.shape
    K = coarse_centroids.shape[0]
    m = codebooks.shape[0]
    t_pad = ((T + 127) // 128) * 128

    coarse = jnp.dot(q_tokens, coarse_centroids.T, preferred_element_type=jnp.float32)
    if approx_topk and jax.default_backend() not in ("cpu",) and nprobe < K:
        vals, lists = jax.lax.approx_max_k(coarse, nprobe)
    else:
        vals, lists = jax.lax.top_k(coarse, nprobe)
    thr = vals[:, -1]
    member = (coarse >= thr[:, None])                           # (T, K)
    member_kt = jnp.pad(member.T.astype(jnp.int8), ((0, 0), (0, t_pad - T)))[:, None, :]

    lut = adc_lut(q_tokens, codebooks)                          # (T, m, 16)
    le = lut[:, 0::2, :].reshape(T, -1)                         # (T, m/2*16)
    lo = lut[:, 1::2, :].reshape(T, -1)
    pad = ((0, t_pad - T), (0, 0))
    le = jnp.pad(le, pad).T
    lo = jnp.pad(lo, pad).T

    out_s, out_r = pq4_block_scan(
        meta, member_kt, codes2, le, lo, r=r, num_lists=num_lists, interpret=interpret
    )

    # map per-(list, token) entries back to pairs + per-token top-depth
    flat_s = jnp.transpose(out_s, (0, 2, 1)).reshape(K * t_pad, r)
    flat_r = jnp.transpose(out_r, (0, 2, 1)).reshape(K * t_pad, r)
    l_flat = lists.reshape(-1)
    t_flat = jnp.repeat(jnp.arange(T, dtype=jnp.int32), nprobe)
    idx = l_flat * t_pad + t_flat
    ps = flat_s[idx]
    pr = flat_r[idx]
    ok = list_nonempty[l_flat] > 0
    ps = jnp.where(ok[:, None], ps, -jnp.inf).reshape(T, nprobe * r)
    pr = jnp.where(ok[:, None], pr, -1).reshape(T, nprobe * r)

    if ps.shape[1] <= depth:
        padw = depth - ps.shape[1]
        s = jnp.pad(ps, ((0, 0), (0, padw)), constant_values=-jnp.inf)
        rows_p = jnp.pad(pr, ((0, 0), (0, padw)), constant_values=-1)
    elif approx_topk and jax.default_backend() not in ("cpu",):
        s, i = jax.lax.approx_max_k(ps, depth)
        rows_p = jnp.take_along_axis(pr, i, axis=1)
    else:
        s, i = jax.lax.top_k(ps, depth)
        rows_p = jnp.take_along_axis(pr, i, axis=1)
    # padded row -> original CSR row
    rows = jnp.where(rows_p >= 0, row_of_padded[jnp.maximum(rows_p, 0)], -1)
    rows = jnp.where(jnp.isfinite(s), rows, -1)
    return s, rows.astype(jnp.int32)
