"""End-to-end serving benchmark.

Measures the fused query pipeline (encode -> IVF probe -> ADC -> dedup ->
gather -> exact MaxSim -> top-k) on a synthetic corpus at the reference's
operating point (dim 768, multiview d_view=16, PQ m=64 nbits=8 = 64 B per
token vector, nprobe=128, candidate depth=512, topk=100 — see BASELINE.md),
and reports QPS/chip.

``vs_baseline`` compares against a faithful *unfused* translation of the
reference's serving loop (``dense_server_client.py:44-48`` +
``colbert_ranker.py``): queries encoded in a batch, then PER-QUERY probe /
host-side uniq / gather / MaxSim with host round-trips — i.e. what a naive
port of the CUDA/torch design would do on this same chip.  >1 means the
TPU-native fused design wins.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def is_tpu() -> bool:
    return jax.devices()[0].platform not in ("cpu", "gpu")


def build_synthetic_index(num_docs, d_view, dim, cfg, seed=0):
    """Clustered unit vectors -> storage dir (no BERT: we benchmark the
    retrieval engine; query encode IS included via the model forward)."""
    import tempfile

    from colbert_tpu.indexing import IndexBuilder, IndexStorage

    rng = np.random.default_rng(seed)
    n_topics = 256
    topics = rng.normal(size=(n_topics, dim)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    doc_topic = rng.integers(0, n_topics, size=num_docs)
    embs = topics[np.repeat(doc_topic, d_view)] + 0.3 * rng.normal(
        size=(num_docs * d_view, dim)
    ).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)

    path = tempfile.mkdtemp(prefix="colbert_bench_")
    storage = IndexStorage(path)
    parts = 4
    per = num_docs // parts
    for p in range(parts):
        lo, hi = p * per, (p + 1) * per if p < parts - 1 else num_docs
        storage.write_part(p, embs[lo * d_view : hi * d_view].astype(np.float16), [d_view] * (hi - lo))
    storage.write_meta(
        {"dim": dim, "num_docs": num_docs, "num_embeddings": num_docs * d_view,
         "multiview": True, "d_view": d_view, "num_parts": parts, "embedding_dtype": "float16"}
    )
    IndexBuilder(cfg, storage).build(chunk=1 << 14)
    return storage, embs


def naive_reference_loop(searcher, q_ids, q_attn, q_active, topk, nprobe, depth):
    """Unfused per-query serving, as the reference structures it."""
    from colbert_tpu.ops.ivf import ivf_probe_adc
    from colbert_tpu.ops.maxsim import maxsim_xla

    model = searcher.model
    Q = model.apply({"params": searcher.params}, jnp.asarray(q_ids), jnp.asarray(q_attn), method=model.query)
    Q = np.asarray(Q * jnp.asarray(q_active, Q.dtype)[..., None])
    cap = searcher.max_list_len
    rcap = searcher.rerank_cap
    doc_off = np.asarray(searcher.doc_offsets)
    doclens = np.asarray(searcher.doclens)
    emb_table = searcher.emb_table
    row_emb = np.asarray(searcher.row_emb)
    emb2pid = np.asarray(searcher.emb2pid)
    results = []
    for b in range(Q.shape[0]):  # per-query host loop (the reference's shape)
        toks = jnp.asarray(Q[b])
        scores, rows = ivf_probe_adc(
            toks, searcher.coarse, searcher.codebooks, searcher.codes, searcher.offsets,
            nprobe=nprobe, cap=cap, depth=depth, token_chunk=toks.shape[0],
        )
        rows = np.asarray(rows).reshape(-1)
        rows = rows[rows >= 0]
        pids = np.unique(emb2pid[row_emb[rows]])  # host-side uniq, like Pool(16) dedup
        idx = doc_off[pids][:, None] + np.arange(rcap)[None, :]
        valid = np.arange(rcap)[None, :] < doclens[pids][:, None]
        D = jnp.asarray(np.asarray(emb_table)[np.clip(idx, 0, emb_table.shape[0] - 1)])
        s = maxsim_xla(
            jnp.asarray(Q[b : b + 1], D.dtype), D, None, jnp.asarray(valid, D.dtype)
        )[0]
        order = np.argsort(-np.asarray(s))[:topk]
        results.append((pids[order], np.asarray(s)[order]))
    return results


def main():
    tpu = is_tpu()
    num_docs = 20000 if tpu else 400
    dim = 768 if tpu else 64
    d_view, q_view = 16, 16
    nprobe = 128 if tpu else 8
    depth = 512 if tpu else 32
    topk = 100 if tpu else 10
    batch = 32 if tpu else 4
    n_warm, n_iter = 2, 5 if tpu else 2

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.searcher import ColbertSearcher

    model_cfg = (
        ModelConfig(dtype="bfloat16") if tpu else
        ModelConfig(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=64, dim=dim, dtype="float32")
    )
    cfg = ColbertConfig(
        model=model_cfg,
        multiview=MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view),
        tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
        index=IndexConfig(pq_m=64 if tpu else 8, kmeans_iters=10, pq_kmeans_iters=10),
        serve=ServeConfig(nprobe=nprobe, candidate_depth=depth, topk=topk, max_candidates=4096 if tpu else 256),
        mesh=MeshConfig(data=-1, model=1),
    )
    storage, _ = build_synthetic_index(num_docs, d_view, cfg.model.dim, cfg)

    mesh = make_mesh(-1, 1)
    model = ColbertModel(cfg.model, cfg.multiview)
    Lq = cfg.tokenizer.query_maxlen
    rng = np.random.default_rng(0)
    q_ids = rng.integers(0, cfg.model.vocab_size, (batch, Lq)).astype(np.int32)
    q_attn = np.ones((batch, Lq), np.int32)
    q_active = np.ones((batch, q_view), np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(q_ids), jnp.asarray(q_attn),
        jnp.zeros((1, 384), jnp.int32), jnp.ones((1, 384), jnp.int32),
    )["params"]

    class _Tok:  # search_tokens path; no text tokenizer needed
        pass

    searcher = ColbertSearcher(cfg, _Tok(), params, storage, mesh=mesh)

    # --- fused pipeline ---
    for _ in range(n_warm):
        searcher.search_tokens(q_ids, q_attn, q_active, topk=topk, nprobe=nprobe, depth=depth, query_chunk=8)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = searcher.search_tokens(q_ids, q_attn, q_active, topk=topk, nprobe=nprobe, depth=depth, query_chunk=8)
    fused_s = (time.perf_counter() - t0) / n_iter
    qps = batch / fused_s

    # --- naive (reference-shaped) loop ---
    naive_batch = min(batch, 8)
    naive_reference_loop(searcher, q_ids[:naive_batch], q_attn[:naive_batch], q_active[:naive_batch], topk, nprobe, depth)
    t0 = time.perf_counter()
    naive_reference_loop(searcher, q_ids[:naive_batch], q_attn[:naive_batch], q_active[:naive_batch], topk, nprobe, depth)
    naive_s = time.perf_counter() - t0
    naive_qps = naive_batch / naive_s

    print(json.dumps({
        "metric": "serve_qps_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / naive_qps, 2),
        "detail": {
            "p50_batch_latency_ms": round(fused_s * 1e3, 2),
            "batch": batch, "num_docs": num_docs, "dim": cfg.model.dim,
            "nprobe": nprobe, "depth": depth, "topk": topk,
            "naive_qps": round(naive_qps, 2), "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
