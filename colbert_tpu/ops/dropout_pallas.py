"""Zero-memory dropout on the TPU per-core hardware PRNG.

The train-step bisect (``scripts/bench_train.py``) showed dropout
random-bit generation costing 108 ms of the 289 ms step at the reference
operating point — threefry2x32 is ~20 rounds of scalar ALU per 32-bit
word, and the (B, h, L, L) attention-probs masks need ~1.4e9 draws/step.
This op replaces the software PRNG with ``pltpu.prng_random_bits`` — the
TPU's on-core hardware generator — and saves NOTHING between passes:

  fwd:  y  = x  * mask(seed) / keep
  bwd:  dx = dy * mask(seed) / keep

The mask is REGENERATED in the backward pass from the same (seed, tile)
pair (the per-core PRNG is deterministic given its seed), so the op has
zero residual memory and runs at HBM streaming speed both ways.

The drop probability is quantized to 1/256 (one mask byte per element),
matching :class:`colbert_tpu.models.bert.FastDropout`.  Replaces the
reference's ``nn.functional.dropout`` inside hf BERT (torch generates
Philox bits on-GPU; this is the TPU-native equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 512  # rows per tile: 512 x 128 x bf16 = 128 KB blocks


def _kernel(seed_ref, x_ref, o_ref, *, thr: int, scale: float):
    # distinct stream per tile: mix the folded-key seed with the tile index
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    byte = jnp.bitwise_and(bits.astype(jnp.uint32), jnp.uint32(0xFF))
    keep = byte >= jnp.uint32(thr)
    x = x_ref[:]
    o_ref[:] = jnp.where(keep, x * jnp.asarray(scale, x.dtype), jnp.zeros((), x.dtype))


def _apply(x: jax.Array, seed: jax.Array, thr: int, interpret: bool) -> jax.Array:
    n = x.size
    cols = _LANES
    rows_total = -(-n // cols)
    rows_pad = -(-rows_total // _ROWS) * _ROWS
    flat = jnp.pad(x.reshape(-1), (0, rows_pad * cols - n)).reshape(rows_pad, cols)
    scale = 256.0 / (256.0 - thr)
    out = pl.pallas_call(
        functools.partial(_kernel, thr=thr, scale=scale),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        grid=(rows_pad // _ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, cols), lambda r: (r, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, cols), lambda r: (r, 0)),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), flat)
    return out.reshape(-1)[:n].reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hw_dropout(x: jax.Array, seed: jax.Array, thr: int, interpret: bool = False):
    """Dropout with drop probability ``thr / 256``; ``seed`` is a scalar
    uint32/int32 (one software-PRNG draw per call site)."""
    return _apply(x, seed, thr, interpret)


def _fwd(x, seed, thr, interpret):
    return _apply(x, seed, thr, interpret), seed


def _bwd(thr, interpret, seed, g):
    # same mask, same scale — regenerated, never stored
    return _apply(g, seed, thr, interpret), None


hw_dropout.defvjp(_fwd, _bwd)
