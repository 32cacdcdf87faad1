"""Distributed corpus encoder.

TPU-native redesign of the reference's ``CollectionEncoder``/``BatchGenerator``
(``colbert/indexing/encoder.py:44-179``): where the reference runs one NCCL
process per GPU with a tokenizer process-Pool, a bounded queue, per-rank tmp
files, barriers, and a rank-0 file concatenation, here a single process owns
the mesh: a producer thread tokenizes ahead (host), a jitted doc-encoder runs
with the batch sharded over the ``data`` axis (all chips busy), and each
corpus part is written once — no tmp files, no barrier, no file-based gather
(SPMD replaces the filesystem as the collective fabric).

Embeddings are compacted with the active mask before storage (parity with
``qd_mask_to_realinput(keep_dim=False)``, ``encoder.py:176``): only scored
positions are indexed.  fp16 on disk (``encoder.py:175``).
"""

from __future__ import annotations

import queue as queue_mod
import threading
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.models import ColbertModel
from colbert_tpu.models.sharding import param_shardings
from colbert_tpu.parallel.mesh import batch_sharding, make_mesh
from colbert_tpu.indexing.storage import IndexStorage
from colbert_tpu.tokenization import ColbertTokenizer
from colbert_tpu.utils.logging import Timers, get_logger

logger = get_logger("encoder")


class CollectionEncoder:
    def __init__(
        self,
        cfg: ColbertConfig,
        tokenizer: ColbertTokenizer,
        params: Any,
        mesh=None,
    ):
        self.cfg = cfg
        self.tok = tokenizer
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.model = ColbertModel(cfg.model, cfg.multiview)
        self.params = jax.device_put(params, param_shardings(params, self.mesh))
        self._encode = jax.jit(
            lambda p, ids, attn: self.model.apply({"params": p}, ids, attn, method=self.model.doc)
        )
        self.timers = Timers()

    # ---- device step ----

    def encode_batch(self, texts: Sequence[str]) -> Tuple[np.ndarray, List[int]]:
        """Encode a batch of docs -> (flat compacted embeddings fp16, doclens)."""
        enc = self.tok.encode_docs(list(texts))
        return self._encode_tokenized(enc.input_ids, enc.attention_mask, enc.active_mask, len(texts))

    def _encode_tokenized(self, ids, attn, active, n_real) -> Tuple[np.ndarray, List[int]]:
        bsz = ids.shape[0]
        pad = (-bsz) % self.mesh.shape["data"]
        if pad:
            ids = np.pad(ids, ((0, pad), (0, 0)))
            attn = np.pad(attn, ((0, pad), (0, 0)))
            active = np.pad(active, ((0, pad), (0, 0)))
        sh = batch_sharding(self.mesh, 2)
        D = self._encode(self.params, jax.device_put(jnp.asarray(ids), sh), jax.device_put(jnp.asarray(attn), sh))
        D = np.asarray(D)[:n_real]  # (B, V, dim) fp32
        active = active[:n_real].astype(bool)
        if self.cfg.multiview.enabled:
            # static d_view vectors per doc, all active
            doclens = [active.shape[1]] * n_real
            flat = D.reshape(-1, D.shape[-1]).astype(np.float16)
        else:
            # ragged compaction (C++ fast path, numpy fallback)
            from colbert_tpu.native import compact_active

            flat, dl = compact_active(D.astype(np.float16), active.astype(np.int32))
            doclens = dl.tolist()
        return flat, doclens

    # ---- corpus pipeline ----

    def encode_corpus(
        self,
        texts: Sequence[str],
        index_path: str,
        num_parts: Optional[int] = None,
        batch_size: Optional[int] = None,
        prefetch: int = 2,
    ) -> IndexStorage:
        """Encode the whole corpus into part files under ``index_path``."""
        cfg = self.cfg.index
        num_parts = num_parts or cfg.num_parts
        batch_size = batch_size or cfg.encode_batch_size
        storage = IndexStorage(index_path)
        n = len(texts)
        bounds = [(p * n) // num_parts for p in range(num_parts + 1)]

        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=prefetch)
        sentinel = object()

        def produce():
            for p in range(num_parts):
                lo, hi = bounds[p], bounds[p + 1]
                for s in range(lo, hi, batch_size):
                    chunk = [texts[i] for i in range(s, min(hi, s + batch_size))]
                    enc = self.tok.encode_docs(chunk)
                    q.put((p, enc.input_ids, enc.attention_mask, enc.active_mask, len(chunk)))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        cur_part, embs, doclens = 0, [], []

        def flush(part):
            nonlocal embs, doclens
            flat = np.concatenate(embs, axis=0) if embs else np.zeros((0, self.cfg.model.dim), np.float16)
            storage.write_part(part, flat, doclens)
            logger.info("part %d: %d docs, %d vectors", part, len(doclens), flat.shape[0])
            embs, doclens = [], []

        while True:
            item = q.get()
            if item is sentinel:
                break
            p, ids, attn, active, n_real = item
            if p != cur_part:
                flush(cur_part)
                cur_part = p
            with self.timers.span("encode_batch"):
                flat, dl = self._encode_tokenized(ids, attn, active, n_real)
            embs.append(flat)
            doclens += dl
        flush(cur_part)
        t.join()

        storage.write_meta(
            {
                "dim": self.cfg.model.dim,
                "num_docs": n,
                "num_embeddings": int(np.sum(storage.read_doclens())),
                "multiview": self.cfg.multiview.enabled,
                "d_view": self.cfg.multiview.d_view,
                "num_parts": num_parts,
                "embedding_dtype": "float16",
            }
        )
        return storage
