"""Single-vector (DPR-style) dense retriever.

Parity with the reference's ``DPRRetriever`` flow
(``faiss_indexers.py:126-158``: encode corpus to one vector per passage,
``DenseFlatIndexer`` exact IP search).  The pooled representation is the
masked mean of the ColBERT token vectors (the reference's DPR path pools
externally; any (B, V, dim) encoder output works here).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.indexing.flat import FlatIndex
from colbert_tpu.models import ColbertModel
from colbert_tpu.models.sharding import param_shardings
from colbert_tpu.parallel.mesh import batch_sharding, make_mesh
from colbert_tpu.tokenization import ColbertTokenizer


class DenseRetriever:
    def __init__(self, cfg: ColbertConfig, tokenizer: ColbertTokenizer, params: Any, mesh=None):
        self.cfg = cfg
        self.tok = tokenizer
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.model = ColbertModel(cfg.model, cfg.multiview)
        self.params = jax.device_put(params, param_shardings(params, self.mesh))
        self.index: Optional[FlatIndex] = None
        self._pooled = jax.jit(self._pooled_fn, static_argnums=(4,))

    def _pooled_fn(self, params, ids, attn, active, is_query: bool):
        method = self.model.query if is_query else self.model.doc
        t = self.model.apply({"params": params}, ids, attn, method=method)  # (B, V, dim)
        m = active.astype(t.dtype)[..., None]
        pooled = (t * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled / jnp.maximum(norm, 1e-12)

    def _encode(self, texts: Sequence[str], is_query: bool, batch: int = 256) -> np.ndarray:
        out = []
        enc_fn = self.tok.encode_queries if is_query else self.tok.encode_docs
        for lo in range(0, len(texts), batch):
            chunk = list(texts[lo : lo + batch])
            n = len(chunk)
            pad = (-n) % max(1, self.mesh.shape["data"])
            chunk = chunk + [""] * pad
            e = enc_fn(chunk)
            sh = batch_sharding(self.mesh, 2)
            v = self._pooled(
                self.params,
                jax.device_put(jnp.asarray(e.input_ids), sh),
                jax.device_put(jnp.asarray(e.attention_mask), sh),
                jax.device_put(jnp.asarray(e.active_mask), sh),
                is_query,
            )
            out.append(np.asarray(v)[:n])
        return np.concatenate(out, axis=0) if out else np.zeros((0, self.cfg.model.dim), np.float32)

    def build_index(self, corpus: Sequence[str], batch: int = 256) -> None:
        self.index = FlatIndex(self._encode(corpus, is_query=False, batch=batch))

    def search(self, questions: Sequence[str], topk: int = 100) -> Tuple[np.ndarray, np.ndarray]:
        if self.index is None:
            raise RuntimeError("call build_index (or load) first")
        q = self._encode(questions, is_query=True)
        return self.index.search(q, topk)

    def save_index(self, path: str) -> None:
        self.index.save(path)

    def load_index(self, path: str) -> None:
        self.index = FlatIndex.load(path)
