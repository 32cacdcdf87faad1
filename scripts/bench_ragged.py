"""Ragged-corpus serving bench (VERDICT r2 item 8 datapoint).

Non-multiview corpora (per-doc token counts vary, as in real passage
collections — the reference's stride-bucket mode,
``colbert_ranker.py:36-51``) served through the stride-bucketed fused
Pallas rerank, vs the multiview fast path at the same total vector count.

Builds a 20k-doc corpus with lognormal doclens (median ~13, clipped to
[4, 48], mean ~16 — matching the multiview bench's 16 views/doc so QPS is
comparable per vector scanned), measures the full pipeline per rerank
dtype, and recall@100 vs a chunked exact-MaxSim oracle.

Usage: python scripts/bench_ragged.py [--docs 20000] [--iters 9]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

if os.environ.get("BENCH_CPU"):  # smoke-test hook (sitecustomize pins axon)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def ragged_doclens(num_docs, rng, median=13.0, sigma=0.55, lo=4, hi=48):
    lens = np.exp(rng.normal(np.log(median), sigma, size=num_docs))
    return np.clip(np.round(lens), lo, hi).astype(np.int32)


def make_ragged_embeddings(num_docs, doclens, dim, seed=0):
    """Same clustered/anisotropic generator as bench.make_synthetic_embeddings
    but with per-doc vector counts."""
    rng = np.random.default_rng(seed)
    n_topics = 256
    spectrum = (1.0 / np.sqrt(1.0 + np.arange(dim))).astype(np.float32)
    topics = rng.normal(size=(n_topics, dim)).astype(np.float32) * spectrum
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    doc_topic = rng.integers(0, n_topics, size=num_docs)
    embs = topics[np.repeat(doc_topic, doclens)] + 0.3 * (
        rng.normal(size=(int(doclens.sum()), dim)).astype(np.float32) * spectrum
    )
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    return embs


def build_ragged_index(embs, doclens, dim, cfg, cache=True):
    from colbert_tpu.indexing import IndexBuilder, IndexStorage

    num_docs = len(doclens)
    tag = (f"ragged_{cfg.index.codec}_{num_docs}x{dim}_p{cfg.index.partitions}"
           f"_sq{cfg.index.sq_dim}")
    path = f"/tmp/colbert_bench_idx_{tag}"
    storage = IndexStorage(path)
    if cache and os.path.exists(os.path.join(path, "ivf", "offsets.npy")):
        return storage
    parts = 4
    per = num_docs // parts
    offs = np.concatenate([[0], np.cumsum(doclens)])
    for p in range(parts):
        lo, hi = p * per, (p + 1) * per if p < parts - 1 else num_docs
        storage.write_part(
            p, embs[offs[lo] : offs[hi]].astype(np.float16), doclens[lo:hi].tolist()
        )
    storage.write_meta(
        {"dim": dim, "num_docs": num_docs, "num_embeddings": int(doclens.sum()),
         "multiview": False, "num_parts": parts, "embedding_dtype": "float16"}
    )
    IndexBuilder(cfg, storage).build(chunk=1 << 14)
    return storage


def ragged_oracle(embs, doclens, Qm, topk, chunk_docs=4096):
    """Chunked exact MaxSim over the ragged corpus (host embeddings)."""
    from colbert_tpu.ops.maxsim import maxsim_xla

    nd = len(doclens)
    cap = int(doclens.max())
    offs = np.concatenate([[0], np.cumsum(doclens)])

    @jax.jit
    def sc(q, D, valid):
        return maxsim_xla(q, D, None, valid)

    tops_s, tops_p = [], []
    for lo in range(0, nd, chunk_docs):
        n = min(chunk_docs, nd - lo)
        D = np.zeros((n, cap, embs.shape[1]), np.float32)
        valid = np.zeros((n, cap), np.float32)
        for i in range(n):
            m = doclens[lo + i]
            D[i, :m] = embs[offs[lo + i] : offs[lo + i] + m]
            valid[i, :m] = 1.0
        s = np.asarray(sc(Qm, jnp.asarray(D), jnp.asarray(valid)))
        k = min(topk, s.shape[1])
        idx = np.argpartition(-s, k - 1, axis=1)[:, :k]
        tops_s.append(np.take_along_axis(s, idx, axis=1))
        tops_p.append(idx + lo)
    s_all = np.concatenate(tops_s, axis=1)
    p_all = np.concatenate(tops_p, axis=1)
    order = np.argsort(-s_all, axis=1)[:, :topk]
    return np.take_along_axis(p_all, order, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument("--depth", type=int, default=512)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.searcher import ColbertSearcher

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    dim, topk = (768, 100) if on_tpu else (128, 10)
    q_view = 16
    nprobe, depth = args.nprobe, args.depth
    if not on_tpu:
        args.docs, args.batch, nprobe, depth = 400, 4, 8, 32

    rng = np.random.default_rng(1)
    doclens = ragged_doclens(args.docs, rng)
    embs = make_ragged_embeddings(args.docs, doclens, dim)
    print(f"doclens: mean {doclens.mean():.1f} p50 {np.percentile(doclens, 50):.0f} "
          f"p99 {np.percentile(doclens, 99):.0f} max {doclens.max()} "
          f"vectors {int(doclens.sum())}", flush=True)

    model_cfg = (
        ModelConfig(dtype="bfloat16") if on_tpu else
        ModelConfig(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=64, dim=dim,
                    dtype="float32")
    )

    def cfg_for(**serve_kw):
        base = dict(nprobe=nprobe, candidate_depth=depth, topk=topk,
                    max_candidates=4096 if on_tpu else 256)
        base.update(serve_kw)
        return ColbertConfig(
            model=model_cfg,
            multiview=MultiviewConfig(enabled=False, q_view=q_view),
            tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
            index=IndexConfig(codec="sq", sq_dim=64 if on_tpu else 16, kmeans_iters=10),
            serve=ServeConfig(**base),
            mesh=MeshConfig(data=-1, model=1),
        )

    cfg0 = cfg_for()
    storage = build_ragged_index(embs, doclens, dim, cfg0)
    mesh = make_mesh(-1, 1)
    model = ColbertModel(model_cfg, cfg0.multiview)
    Lq = 32
    q_ids = rng.integers(0, model_cfg.vocab_size, (args.batch, Lq)).astype(np.int32)
    q_attn = np.ones((args.batch, Lq), np.int32)
    # non-multiview: the active mask covers all query tokens (= attention mask)
    q_active = q_attn.copy()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(q_ids), jnp.asarray(q_attn),
        jnp.zeros((1, 384), jnp.int32), jnp.ones((1, 384), jnp.int32),
    )["params"]

    Q = model.apply({"params": params}, jnp.asarray(q_ids), jnp.asarray(q_attn),
                    method=model.query)
    Qm = np.asarray((Q * jnp.asarray(q_active, Q.dtype)[..., None]).astype(jnp.float32))
    oracle = ragged_oracle(embs, doclens, jnp.asarray(Qm), topk)

    class _Tok:
        pass

    kernel = "pallas" if on_tpu else "pallas_interpret"
    variants = [
        ("ragged xla gather (slow path)", dict(rerank_kernel="xla", rerank_dtype="bfloat16")),
        ("ragged stride-bucket pallas bf16", dict(rerank_kernel=kernel, rerank_dtype="bfloat16")),
        ("ragged stride-bucket pallas int8", dict(rerank_kernel=kernel, rerank_dtype="int8")),
        # exact flat scan on the zero-padded doc-major table (dv = max
        # doclen): pays ~dv/mean_len extra scan FLOPs for recall 1.0
        ("ragged flat exact bf16", dict(mode="flat")),
        ("ragged flat exact int8", dict(mode="flat", rerank_dtype="int8")),
    ]
    rows = []
    for name, serve_kw in variants:
        cfg = cfg_for(**serve_kw)
        searcher = ColbertSearcher(cfg, _Tok(), params, storage, mesh=mesh)
        kw = dict(topk=topk, nprobe=nprobe, depth=depth, query_chunk=8)
        res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
        res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
            lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        handles = [searcher.search_tokens_device(q_ids, q_attn, q_active, **kw)
                   for _ in range(args.iters)]
        for ts, tp in handles:
            np.asarray(ts), np.asarray(tp)
        pipe = (time.perf_counter() - t0) / args.iters
        recall = float(np.mean([
            len(set(res.pids[i]) & set(oracle[i])) / topk for i in range(args.batch)
        ]))
        row = {
            "variant": name,
            "strides": searcher.ragged_strides,
            "p50_ms": round(float(np.median(lat)) * 1e3, 1),
            "qps_seq": round(args.batch / float(np.median(lat)), 1),
            "qps_pipelined": round(args.batch / pipe, 1),
            "recall@100_vs_exact": round(recall, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del searcher

    print("\n| variant | strides | p50 ms | QPS seq | QPS pipelined | recall@100 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['strides']} | {r['p50_ms']} | {r['qps_seq']} | "
              f"{r['qps_pipelined']} | {r['recall@100_vs_exact']} |")


if __name__ == "__main__":
    main()
