"""Flat (exact inner-product) single-vector index — DPR-style baseline.

Parity with the reference's ``DenseFlatIndexer`` (``faiss_indexers.py:20-123``:
``IndexFlatIP`` + id map + serialize/deserialize), as one jitted matmul+top-k
instead of a faiss C++ dependency.  Also serves as the brute-force oracle for
ANN recall tests (SURVEY §4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FlatIndex:
    def __init__(self, vectors: np.ndarray, ids: Optional[np.ndarray] = None):
        self.vectors = jnp.asarray(vectors, jnp.float32)
        self.ids = np.arange(vectors.shape[0], dtype=np.int64) if ids is None else np.asarray(ids)
        self._search = jax.jit(
            lambda q, v, k: jax.lax.top_k(jnp.dot(q, v.T, preferred_element_type=jnp.float32), k),
            static_argnames=("k",),
        )

    def __len__(self) -> int:
        return int(self.vectors.shape[0])

    def search(self, queries: np.ndarray, topk: int) -> Tuple[np.ndarray, np.ndarray]:
        """(B, d) -> (scores (B, topk), external ids (B, topk))."""
        s, i = self._search(jnp.asarray(queries, jnp.float32), self.vectors, min(topk, len(self)))
        return np.asarray(s), self.ids[np.asarray(i)]

    # ---- persistence (parity with serialize/deserialize, faiss_indexers.py:38-76) ----

    def save(self, path: str) -> None:
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        np.save(p / "vectors.npy", np.asarray(self.vectors, np.float32))
        np.save(p / "ids.npy", self.ids)

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        p = Path(path)
        return cls(np.load(p / "vectors.npy"), np.load(p / "ids.npy"))
