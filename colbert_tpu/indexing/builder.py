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
        elif c.codec == "pq4":
            from colbert_tpu.ops.pq4 import pq4_train

            with self.timers.span("pq4_train"):
                codebooks = pq4_train(
                    jnp.asarray(sample), c.pq4_m, iters=c.pq_kmeans_iters, key=key, chunk=kc
                )
                codebooks.block_until_ready()
            code_width, code_dtype = c.pq4_m // 2, np.int8
        else:
            from colbert_tpu.ops.sq import sq_train

            with self.timers.span("sq_train"):
                sq_proj, sq_scales = sq_train(jnp.asarray(sample), c.sq_dim)
                sq_proj.block_until_ready()
            code_width, code_dtype = c.sq_dim, np.int8

        # --- assign + encode all parts ---
        balanced = c.balance_factor > 0 and partitions > 1
        kc = min(c.balance_candidates, partitions) if balanced else 1
        cand_all = np.empty((num_embeddings, kc), np.int32) if balanced else None
        assignments = np.empty(num_embeddings, np.int32)
        codes = np.empty((num_embeddings, code_width), code_dtype)
        pos = 0
        with self.timers.span("assign_encode"):
            for part in self.storage.part_ids():
                # transfer at the stored width (fp16): host->device bandwidth
                # dominates big builds on a tunnel-attached chip; every op
                # below casts on device (bf16 matmul operands / fp32 encode)
                embs = jnp.asarray(np.asarray(self.storage.read_part(part)))
                if embs.shape[0] == 0:
                    continue
                if balanced:
                    from colbert_tpu.ops.kmeans import nearest_centroids

                    cand_all[pos : pos + embs.shape[0]] = np.asarray(
                        nearest_centroids(jnp.asarray(embs), centroids, kc, chunk=chunk)
                    )
                else:
                    a = assign_clusters(jnp.asarray(embs), centroids, chunk=chunk)
                    assignments[pos : pos + embs.shape[0]] = np.asarray(a)
                if c.codec == "pq":
                    cc = pq_encode(jnp.asarray(embs), codebooks, chunk=chunk)
                elif c.codec == "pq4":
                    from colbert_tpu.ops.pq4 import pq4_encode_packed

                    cc = pq4_encode_packed(jnp.asarray(embs), codebooks, chunk=chunk)
                else:
                    from colbert_tpu.ops.sq import sq_encode

                    cc = sq_encode(jnp.asarray(embs), sq_proj, sq_scales, chunk=chunk)
                codes[pos : pos + embs.shape[0]] = np.asarray(cc)
                pos += embs.shape[0]
        assert pos == num_embeddings
        if balanced:
            from colbert_tpu.native import balanced_assign

            cap_rows = max(1, int(np.ceil(num_embeddings / partitions * c.balance_factor)))
            with self.timers.span("balanced_assign"):
                assignments = balanced_assign(cand_all, partitions, cap_rows)
            lens0 = np.bincount(cand_all[:, 0], minlength=partitions)
            lens1 = np.bincount(assignments, minlength=partitions)
            logger.info(
                "balanced assignment (cap=%d): list p50/p99/max %d/%d/%d -> %d/%d/%d",
                cap_rows,
                int(np.percentile(lens0, 50)), int(np.percentile(lens0, 99)), int(lens0.max()),
                int(np.percentile(lens1, 50)), int(np.percentile(lens1, 99)), int(lens1.max()),
            )

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
                "pq4_m": c.pq4_m,
                "bytes_per_vector": {
                    "pq": c.pq_m * c.pq_nbits // 8, "pq4": c.pq4_m // 2, "sq": c.sq_dim,
                }[c.codec],
                "build_timers": self.timers.as_dict(),
            }
        )
        self.storage.write_meta(meta)
        logger.info("index built: %s", {k: v for k, v in meta.items() if k != "build_timers"})
