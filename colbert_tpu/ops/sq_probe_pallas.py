"""Pallas SQ probe kernel: DMA-streamed IVF list scan.

The XLA formulation of the SQ scan gathers probed rows with a generic
row-gather (`codes8_sorted[idx]`), which runs at ~5 GB/s on v5e — far below
DMA speed — because XLA cannot know the rows of one probed list are
CONTIGUOUS in the CSR layout.  This kernel exploits exactly that: for each
query token it walks its ``nprobe`` lists, issuing a double-buffered async
DMA per list slice (one contiguous copy) and scoring the landed rows with a
small MXU matmul while the next list is in flight.  Bandwidth-bound by
construction.

TPU alignment/layout constraints shape the design:

* int8 HBM buffers are lane-tiled to 128, so ``sq_dim``-wide rows are
  **packed**: ``pack = 128 // sq_dim`` consecutive code rows form one
  128-lane row (``codes2 = codes8.reshape(N/pack, 128)``, free reshape).
  Scoring uses a block-diagonal RHS ``(128, pack)`` holding ``pack`` copies
  of the query on disjoint 64-lane bands, so one MXU dot yields each packed
  row's ``pack`` scores — and the row-major flatten restores CSR row order.
* DMA source starts must sit on a sublane boundary, so the caller aligns
  each list's start DOWN to 32 rows and passes the valid window ``[lo, hi)``.
* output stores are sublane-aligned, so ``cap`` must be a multiple of 128.

Coarse top-k probing and final top-depth selection stay in XLA where they
are already fast.  See :func:`colbert_tpu.ops.ivf.ivf_probe_sq` for the
integration (and the XLA gather fallback used on CPU).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(starts_ref, lo_ref, hi_ref, qsr_ref, codes2_ref, out_ref, buf_ref, sem_ref, *, nprobe, cap, pack):
    half = cap // pack

    def dma(slot, j):
        start = pl.multiple_of(starts_ref[0, 0, j] // pack, 32 // pack)
        return pltpu.make_async_copy(
            codes2_ref.at[pl.ds(start, half), :],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    dma(0, 0).start()
    # f32 operands: Mosaic's int8->bf16->MXU chain miscompiles (vector.broadcast
    # verification); the per-list matmul is tiny so f32 costs nothing
    qsr = qsr_ref[0].astype(jnp.float32)  # (LANES, pack) block-diagonal queries

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nprobe)
        def _():
            dma(jax.lax.rem(j + 1, 2), j + 1).start()

        dma(slot, j).wait()
        rows = buf_ref[slot].astype(jnp.float32)  # (half, LANES) = pack rows each
        # computed pre-transposed as (pack, half): a (half, pack) result would
        # lane-pad pack->128 in VMEM (64x waste); here lanes carry `half`
        s = jax.lax.dot_general(
            qsr, rows,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (pack, half): CSR row (pack*r + c) score at (c, r)
        lo = lo_ref[0, 0, j]
        hi = hi_ref[0, 0, j]
        i = pack * jax.lax.broadcasted_iota(jnp.int32, (pack, half), 1) + jax.lax.broadcasted_iota(
            jnp.int32, (pack, half), 0
        )
        out_ref[0, j, :, :] = jnp.where((i >= lo) & (i < hi), s, -jnp.inf)
        return 0

    jax.lax.fori_loop(0, nprobe, body, 0)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def sq_list_scan(
    starts: jax.Array,   # (T, nprobe) int32 — 32-aligned first CSR row of each window
    lo: jax.Array,       # (T, nprobe) int32 — first valid row within the window
    hi: jax.Array,       # (T, nprobe) int32 — one past the last valid row
    qs: jax.Array,       # (T, sq_dim) fp32 — projected/descaled query tokens
    codes8: jax.Array,   # (N_pad, sq_dim) int8 — CSR codes, padded by >=cap rows
    *,
    cap: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Returns (T, nprobe*cap) fp32 scores; slot (t, j*cap + i) scores CSR row
    ``starts[t, j] + i``; -inf outside the [lo, hi) window.

    ``codes8`` MUST be padded with at least ``cap`` trailing rows AND have
    ``N_pad*sq_dim`` divisible by 128 (see ``pad_codes_for_scan``).
    ``interpret`` defaults to True on CPU backends (tests/debugging).
    """
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    if cap % 128 != 0:
        raise ValueError(f"cap must be a multiple of 128, got {cap}")
    T, nprobe = starts.shape
    sq_dim = qs.shape[1]
    if LANES % sq_dim != 0:
        raise ValueError(f"sq_dim must divide {LANES}, got {sq_dim}")
    pack = LANES // sq_dim
    n_pad = codes8.shape[0]
    if n_pad % pack != 0:
        raise ValueError("padded codes rows must divide the packing factor")
    codes2 = codes8.reshape(n_pad // pack, LANES)
    half = cap // pack

    # block-diagonal queries: qsr[:, c] holds qs on lanes [c*sq_dim, (c+1)*sq_dim)
    band = jnp.arange(LANES) // sq_dim                       # (LANES,)
    qs_tiled = jnp.tile(qs, (1, pack))                       # (T, LANES)
    qsr = jnp.where(band[None, :, None] == jnp.arange(pack)[None, None, :], qs_tiled[:, :, None], 0.0)

    out = pl.pallas_call(
        functools.partial(_kernel, nprobe=nprobe, cap=cap, pack=pack),
        out_shape=jax.ShapeDtypeStruct((T, nprobe, pack, half), jnp.float32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, nprobe), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nprobe), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nprobe), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANES, pack), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # codes stay in HBM; manual DMA
        ],
        out_specs=pl.BlockSpec(
            (1, nprobe, pack, half), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, half, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=12 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * nprobe * cap * sq_dim,
            bytes_accessed=T * nprobe * cap * sq_dim + T * nprobe * cap * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts[:, None, :], lo[:, None, :], hi[:, None, :], qsr, codes2)
    # restore CSR row order: (t, j, c, r) -> slot j*cap + pack*r + c
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(T, nprobe * cap)


def pad_codes_for_scan(codes8, cap: int):
    """Append >=``cap`` zero rows so every list window is in-bounds, and make
    the total row count divisible by the lane-packing factor."""
    pack = max(1, LANES // codes8.shape[1])
    extra = cap + (-(codes8.shape[0] + cap)) % pack
    return jnp.pad(codes8, ((0, extra), (0, 0)))
