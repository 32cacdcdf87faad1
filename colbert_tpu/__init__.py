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


def __getattr__(name):
    """Lazy top-level API (keeps `import colbert_tpu` free of jax startup)."""
    api = {
        "ColbertConfig": ("colbert_tpu.config", "ColbertConfig"),
        "load_config": ("colbert_tpu.config", "load_config"),
        "ColbertTokenizer": ("colbert_tpu.tokenization", "ColbertTokenizer"),
        "ColbertModel": ("colbert_tpu.models", "ColbertModel"),
        "CrossEncoderModel": ("colbert_tpu.models", "CrossEncoderModel"),
        "ColbertTrainer": ("colbert_tpu.training", "ColbertTrainer"),
        "CETrainer": ("colbert_tpu.training", "CETrainer"),
        "RetrievalDataset": ("colbert_tpu.training", "RetrievalDataset"),
        "CollectionEncoder": ("colbert_tpu.indexing", "CollectionEncoder"),
        "IndexBuilder": ("colbert_tpu.indexing", "IndexBuilder"),
        "IndexStorage": ("colbert_tpu.indexing", "IndexStorage"),
        "FlatIndex": ("colbert_tpu.indexing", "FlatIndex"),
        "ColbertSearcher": ("colbert_tpu.ranking", "ColbertSearcher"),
        "RetrievalService": ("colbert_tpu.serving", "RetrievalService"),
        "RetrievalServer": ("colbert_tpu.serving", "RetrievalServer"),
        "RetrievalClient": ("colbert_tpu.serving", "RetrievalClient"),
    }
    if name in api:
        import importlib

        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'colbert_tpu' has no attribute {name!r}")


__all__ = [
    "__version__", "ColbertConfig", "load_config", "ColbertTokenizer",
    "ColbertModel", "CrossEncoderModel", "ColbertTrainer", "CETrainer",
    "RetrievalDataset", "CollectionEncoder", "IndexBuilder", "IndexStorage",
    "FlatIndex", "ColbertSearcher", "RetrievalService", "RetrievalServer",
    "RetrievalClient",
]
