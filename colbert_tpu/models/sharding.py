"""Tensor-parallel parameter sharding rules.

The reference has no TP (SURVEY §2: "NOT present anywhere"); on TPU it is
nearly free, so we shard the per-layer matmuls over the ``model`` mesh axis
in the Megatron pattern:

  * attention query/key/value kernels: shard the output (head) dim,
  * attention out kernel + MLP output kernel: shard the input dim,
  * MLP intermediate kernel: shard the output dim,
  * embeddings / layernorms / small heads: replicated.

Rules are applied by parameter *path*, so they work for any of our models
without linen partitioning metadata.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colbert_tpu.parallel.mesh import AXES


def _spec_for(path: str, ndim: int) -> P:
    model = AXES.model
    if ndim < 2:
        return P()
    if any(k in path for k in ("query/kernel", "key/kernel", "value/kernel", "intermediate/kernel")):
        return P(None, model)
    if path.endswith("attention/out/kernel") or path.endswith("output/kernel"):
        return P(model, None)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Build a NamedSharding pytree matching ``params``."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs: Dict[str, P] = {}
    for kp, leaf in flat:
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        specs[path] = _spec_for(path, getattr(leaf, "ndim", 0))

    def assign(kp, leaf):
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        return NamedSharding(mesh, specs[path])

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put params with TP shardings over the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))
