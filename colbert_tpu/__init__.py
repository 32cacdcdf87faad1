"""colbert-tpu: a TPU-native late-interaction dense-retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
system (wuyaoxuehun/colbert): ColBERT bi-encoder training with cross-chip
in-batch negatives, multi-view document representations, a cross-encoder
reranker, distributed corpus encoding, an IVF-PQ approximate-nearest-neighbor
index built entirely with on-device kernels (k-means / PQ / ADC), a fused
probe->gather->MaxSim serving pipeline, and end-to-end DuReader-style
evaluation (MRR@10, recall@k).

Design principles (TPU-first, not a port):
  * All hot compute is jitted XLA or Pallas: MaxSim, k-means, PQ training,
    ADC scan, top-k merge.
  * Static shapes everywhere: multiview docs are exactly ``d_view`` vectors;
    non-multiview docs are length-bucketed into a fixed set of padded shapes.
  * Scale-out via ``jax.sharding.Mesh`` + NamedSharding: data-parallel
    training with in-batch negatives gathered over ICI inside the jitted
    step; corpus-sharded indexes with per-shard top-k + all-gather merge.
  * bf16 on the MXU; fp32 accumulation via ``preferred_element_type``.
"""

from colbert_tpu.version import __version__

__all__ = ["__version__"]
