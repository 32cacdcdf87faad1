from colbert_tpu.parallel.mesh import (
    MeshAxes,
    make_mesh,
    batch_sharding,
    replicated,
    corpus_sharding,
    local_shard_bounds,
)

__all__ = [
    "MeshAxes",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "corpus_sharding",
    "local_shard_bounds",
]
