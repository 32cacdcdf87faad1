"""Pallas SQ probe kernel: DMA-streamed IVF list scan.

The XLA formulation of the SQ scan gathers probed rows with a generic
row-gather (`codes8_sorted[idx]`), which runs at ~5 GB/s on v5e — far below
DMA speed — because XLA cannot know the rows of one probed list are
CONTIGUOUS in the CSR layout.  This kernel exploits exactly that: for each
query token it walks its ``nprobe`` lists, issuing a double-buffered async
DMA per list slice (one contiguous ~16-64 KB copy) and scoring the landed
rows with a small MXU matmul while the next list is in flight.
Bandwidth-bound by construction.

Hardware alignment constraints shape the interface:
  * DMA source starts must sit on a 32-row (int8 sublane) boundary, so the
    caller aligns each list's start DOWN to 32 and passes the valid row
    window ``[lo, hi)`` within the fetched slice;
  * output stores are lane-aligned, so ``cap`` (rows fetched per list) must
    be a multiple of 128.

Coarse top-k probing and final top-depth selection stay in XLA where they
are already fast.  See :func:`colbert_tpu.ops.ivf.ivf_probe_sq` for the
integration (and the XLA gather fallback used on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, lo_ref, hi_ref, qs_ref, codes_ref, out_ref, buf_ref, sem_ref, *, nprobe, cap):
    def dma(slot, j):
        start = pl.multiple_of(starts_ref[0, 0, j], 32)
        return pltpu.make_async_copy(
            codes_ref.at[pl.ds(start, cap), :],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    dma(0, 0).start()
    # f32 operands: Mosaic's int8->bf16->MXU chain miscompiles (vector.broadcast
    # verification); the per-list matmul is tiny so f32 costs nothing
    qs = qs_ref[0].astype(jnp.float32)  # (1, sq_dim) — keep 2-D for Mosaic

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nprobe)
        def _():
            dma(jax.lax.rem(j + 1, 2), j + 1).start()

        dma(slot, j).wait()
        rows = buf_ref[slot].astype(jnp.float32)  # (cap, sq_dim)
        s = jax.lax.dot_general(
            rows, qs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0]
        lo = lo_ref[0, 0, j]
        hi = hi_ref[0, 0, j]
        i = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        off = pl.multiple_of(j * cap, 128)  # cap is 128-aligned (see caller)
        out_ref[0, 0, pl.ds(off, cap)] = jnp.where((i >= lo) & (i < hi), s, -jnp.inf)
        return 0

    jax.lax.fori_loop(0, nprobe, body, 0)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def sq_list_scan(
    starts: jax.Array,   # (T, nprobe) int32 — 32-aligned first row of each window
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

    ``codes8`` MUST be padded with at least ``cap`` trailing rows so the
    final lists' windows stay in bounds (see ``pad_codes_for_scan``).
    ``interpret`` defaults to True on CPU backends (tests/debugging).
    """
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    if cap % 128 != 0:
        raise ValueError(f"cap must be a multiple of 128 (lane-aligned out stores), got {cap}")
    T, nprobe = starts.shape
    sq_dim = qs.shape[1]
    # 3-D shapes: Mosaic requires the last two block dims to divide (8, 128)
    # or equal the array dims — a (1, 1, n) block over (T, 1, n) satisfies it.
    out = pl.pallas_call(
        functools.partial(_kernel, nprobe=nprobe, cap=cap),
        out_shape=jax.ShapeDtypeStruct((T, 1, nprobe * cap), jnp.float32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, nprobe), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nprobe), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nprobe), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, sq_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # codes stay in HBM; manual DMA
        ],
        out_specs=pl.BlockSpec((1, 1, nprobe * cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, cap, sq_dim), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(2 * cap * sq_dim + 4 * nprobe * cap + 1024 * 1024) * 2,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * nprobe * cap * sq_dim,
            bytes_accessed=T * nprobe * cap * sq_dim + T * nprobe * cap * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts[:, None, :], lo[:, None, :], hi[:, None, :], qs[:, None, :], codes8)
    return out[:, 0, :]


def pad_codes_for_scan(codes8, cap: int):
    """Append ``cap`` zero rows so every list window is in-bounds."""
    return jnp.pad(codes8, ((0, cap), (0, 0)))
