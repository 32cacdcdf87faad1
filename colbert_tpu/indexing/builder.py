"""IVF-PQ index build pipeline.

TPU-native replacement for the reference's faiss build stage
(``colbert/training/faiss_index_model.py`` + ``faiss_index.py`` +
``faiss_indexers.py:204-222``): train coarse k-means + PQ codebooks on a
sample (parts 0..2, like ``get_sample_corpus``), assign + encode every
embedding on device, CSR-sort on host, write flat arrays.

Partition count follows the reference formula when unset:
``1 << round(log2(8 * sqrt(num_embeddings)))`` (``faiss_indexers.py:279-286``).
"""

from __future__ import annotations

import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.indexing.storage import IndexStorage
from colbert_tpu.ops.kmeans import assign_clusters, kmeans
from colbert_tpu.ops.pq import pq_encode, pq_train
from colbert_tpu.utils.logging import Timers, get_logger

logger = get_logger("builder")


def auto_partitions(num_embeddings: int) -> int:
    return 1 << round(math.log2(8 * math.sqrt(max(1, num_embeddings))))


class IndexBuilder:
    def __init__(self, cfg: ColbertConfig, storage: IndexStorage):
        self.cfg = cfg
        self.storage = storage
        self.timers = Timers()

    def build(self, key: Optional[jax.Array] = None, chunk: int = 16384) -> None:
        c = self.cfg.index
        key = key if key is not None else jax.random.PRNGKey(self.cfg.train.seed)
        meta = self.storage.read_meta()
        doclens = self.storage.read_doclens()
        num_embeddings = int(np.sum(doclens))
        partitions = c.partitions or auto_partitions(num_embeddings)
        partitions = min(partitions, max(1, num_embeddings))
        logger.info("building IVF-PQ: N=%d K=%d m=%d", num_embeddings, partitions, c.pq_m)

        # --- train on sample parts (reference trains on parts 0..2) ---
        sample_parts = self.storage.part_ids()[: c.train_sample_parts]
        sample = self.storage.load_all_embeddings(sample_parts).astype(np.float32)
        if sample.shape[0] > c.max_train_points:
            idx = np.random.default_rng(0).choice(sample.shape[0], c.max_train_points, replace=False)
            sample = sample[idx]
        kc = min(chunk, max(256, sample.shape[0]))
        with self.timers.span("kmeans_coarse"):
            centroids, _ = kmeans(
                jnp.asarray(sample), partitions, iters=c.kmeans_iters, key=key, chunk=kc
            )
            centroids.block_until_ready()
        codebooks = sq_proj = sq_scales = None
        if c.codec == "pq":
            with self.timers.span("pq_train"):
                codebooks = pq_train(
                    jnp.asarray(sample), c.pq_m, 2**c.pq_nbits,
                    iters=c.pq_kmeans_iters, key=key, chunk=kc,
                )
                codebooks.block_until_ready()
            code_width, code_dtype = c.pq_m, np.uint8
        else:
            from colbert_tpu.ops.sq import sq_train

            with self.timers.span("sq_train"):
                sq_proj, sq_scales = sq_train(jnp.asarray(sample), c.sq_dim)
                sq_proj.block_until_ready()
            code_width, code_dtype = c.sq_dim, np.int8

        # --- assign + encode all parts ---
        assignments = np.empty(num_embeddings, np.int32)
        codes = np.empty((num_embeddings, code_width), code_dtype)
        pos = 0
        with self.timers.span("assign_encode"):
            for part in self.storage.part_ids():
                embs = np.asarray(self.storage.read_part(part)).astype(np.float32)
                if embs.shape[0] == 0:
                    continue
                a = assign_clusters(jnp.asarray(embs), centroids, chunk=chunk)
                if c.codec == "pq":
                    cc = pq_encode(jnp.asarray(embs), codebooks, chunk=chunk)
                else:
                    from colbert_tpu.ops.sq import sq_encode

                    cc = sq_encode(jnp.asarray(embs), sq_proj, sq_scales, chunk=chunk)
                assignments[pos : pos + embs.shape[0]] = np.asarray(a)
                codes[pos : pos + embs.shape[0]] = np.asarray(cc)
                pos += embs.shape[0]
        assert pos == num_embeddings

        # --- CSR pack + pid map (C++ counting sort; numpy fallback) ---
        from colbert_tpu.native import ivf_pack

        with self.timers.span("csr_pack"):
            perm, offsets, codes_sorted = ivf_pack(
                assignments, codes.view(np.uint8), partitions
            )
            codes_sorted = codes_sorted.view(code_dtype)
            emb2pid = IndexStorage.emb2pid_from_doclens(doclens)
        self.storage.write_ivf(
            np.asarray(centroids), codes_sorted, perm.astype(np.int32), offsets, emb2pid,
            codebooks=np.asarray(codebooks) if codebooks is not None else None,
            sq_proj=np.asarray(sq_proj) if sq_proj is not None else None,
            sq_scales=np.asarray(sq_scales) if sq_scales is not None else None,
        )
        meta.update(
            {
                "partitions": partitions,
                "codec": c.codec,
                "pq_m": c.pq_m,
                "pq_nbits": c.pq_nbits,
                "sq_dim": c.sq_dim,
                "bytes_per_vector": c.pq_m * c.pq_nbits // 8 if c.codec == "pq" else c.sq_dim,
                "build_timers": self.timers.as_dict(),
            }
        )
        self.storage.write_meta(meta)
        logger.info("index built: %s", {k: v for k, v in meta.items() if k != "build_timers"})
