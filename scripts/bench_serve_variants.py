"""Same-process serving sweep: probe impl x rerank dtype x query_chunk.

Builds ONE synthetic sq index at the bench operating point and measures the
full fused pipeline per variant (wall clock, results pulled to host — the
honest protocol for the tunnel backend).  Recall@topk vs the exact-MaxSim
oracle is computed per variant.

Usage: python scripts/bench_serve_variants.py [--docs 20000] [--iters 9]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--only", default="",
                    help="substring filter on variant names (comma-separated)")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from bench import build_synthetic_index, exact_oracle_topk, make_synthetic_embeddings
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.searcher import ColbertSearcher

    d_view = q_view = 16
    dim, nprobe, depth, topk = 768, 128, 512, 100
    model_cfg = ModelConfig(dtype="bfloat16")

    def cfg_for(**serve_kw):
        base = dict(nprobe=nprobe, candidate_depth=depth, topk=topk, max_candidates=4096)
        base.update(serve_kw)
        return ColbertConfig(
            model=model_cfg,
            multiview=MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view),
            tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
            index=IndexConfig(codec="sq", sq_dim=64, kmeans_iters=10),
            serve=ServeConfig(**base),
            mesh=MeshConfig(data=-1, model=1),
        )

    embs = make_synthetic_embeddings(args.docs, d_view, dim)
    mesh = make_mesh(-1, 1)
    cfg0 = cfg_for()
    storage = build_synthetic_index(embs, args.docs, d_view, dim, cfg0)

    model = ColbertModel(model_cfg, cfg0.multiview)
    rng = np.random.default_rng(0)
    Lq = 32
    q_ids = rng.integers(0, model_cfg.vocab_size, (args.batch, Lq)).astype(np.int32)
    q_attn = np.ones((args.batch, Lq), np.int32)
    q_active = np.ones((args.batch, q_view), np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(q_ids), jnp.asarray(q_attn),
        jnp.zeros((1, 384), jnp.int32), jnp.ones((1, 384), jnp.int32),
    )["params"]

    class _Tok:
        pass

    variants = [
        ("r1-baseline: token probe, bf16, qc8", dict(probe_impl="token"), dict(query_chunk=8)),
        ("batched r8, bf16, qc8", dict(probe_impl="batched", probe_list_topr=8), dict(query_chunk=8)),
        ("batched r4, bf16, qc8", dict(probe_impl="batched", probe_list_topr=4), dict(query_chunk=8)),
        ("batched r8, bf16, qc16", dict(probe_impl="batched", probe_list_topr=8), dict(query_chunk=16)),
        ("batched r8, bf16, qc48", dict(probe_impl="batched", probe_list_topr=8), dict(query_chunk=48)),
        ("batched r8, int8, qc16", dict(probe_impl="batched", probe_list_topr=8, rerank_dtype="int8"), dict(query_chunk=16)),
        ("batched r8, int8, qc16, cand2048", dict(probe_impl="batched", probe_list_topr=8, rerank_dtype="int8", max_candidates=2048), dict(query_chunk=16)),
        ("token, int8, qc16", dict(probe_impl="token", rerank_dtype="int8"), dict(query_chunk=16)),
        # round-3 headline candidates: int8 table halves rerank HBM traffic
        # (the batch's largest device stage, ~51 ms bf16 at cand 4096);
        # trimming the candidate budget cuts it further if recall holds
        ("hl: batched r8, bf16, qc8, cand4096", dict(probe_impl="batched", probe_list_topr=8), dict(query_chunk=8)),
        ("hl: batched r8, int8, qc8, cand4096", dict(probe_impl="batched", probe_list_topr=8, rerank_dtype="int8"), dict(query_chunk=8)),
        ("hl: batched r8, int8, qc8, cand3072", dict(probe_impl="batched", probe_list_topr=8, rerank_dtype="int8", max_candidates=3072), dict(query_chunk=8)),
        ("hl: batched r8, int8, qc8, cand2048", dict(probe_impl="batched", probe_list_topr=8, rerank_dtype="int8", max_candidates=2048), dict(query_chunk=8)),
        ("hl: batched r8, int8, qc16, cand3072", dict(probe_impl="batched", probe_list_topr=8, rerank_dtype="int8", max_candidates=3072), dict(query_chunk=16)),
        # round-3: exact FLAT serving (ops/flat_scan.py) — no IVF probe, no
        # candidate funnel: one streaming MXU scan of the whole table.
        # recall vs oracle should be ~1.0 by construction.
        ("flat exact, bf16", dict(mode="flat"), dict()),
        ("flat exact, int8", dict(mode="flat", rerank_dtype="int8"), dict()),
        ("flat exact, bf16, blk2048", dict(mode="flat", flat_rows_block=2048), dict()),
        ("flat exact, bf16, blk4096", dict(mode="flat", flat_rows_block=4096), dict()),
        ("flat exact, bf16, blk512", dict(mode="flat", flat_rows_block=512), dict()),
    ]
    if args.only:
        keys = args.only.split(",")
        variants = [v for v in variants if any(k in v[0] for k in keys)]

    oracle = None
    results = []
    for name, serve_kw, search_kw in variants:
        try:
            cfg = cfg_for(**serve_kw)
            searcher = ColbertSearcher(cfg, _Tok(), params, storage, mesh=mesh)
            if oracle is None:
                oracle = exact_oracle_topk(searcher, q_ids, q_attn, q_active, topk) if not searcher.packed_int8 else None
            kw = dict(topk=topk, nprobe=nprobe, depth=depth, **search_kw)
            res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)  # warm
            res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            # pipelined: enqueue all batches, pull at the end (serving mode)
            t0 = time.perf_counter()
            handles = [searcher.search_tokens_device(q_ids, q_attn, q_active, **kw)
                       for _ in range(args.iters)]
            for ts, tp in handles:
                np.asarray(ts), np.asarray(tp)
            pipe = (time.perf_counter() - t0) / args.iters
            rec = float(np.mean([
                len(set(res.pids[i]) & set(oracle[i])) / topk for i in range(args.batch)
            ])) if oracle is not None else float("nan")
            results.append((name, dt * 1e3, args.batch / pipe, rec))
            print(f"{name:45s} {dt*1e3:7.1f} ms  {args.batch/dt:7.1f} QPS seq  "
                  f"{args.batch/pipe:7.1f} QPS pipe  recall@{topk} {rec:.3f}", flush=True)
            del searcher
        except Exception as e:
            print(f"{name:45s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    print("\nsummary (QPS = pipelined):")
    for name, ms, qps, rec in results:
        print(f"  {name:45s} {ms:7.1f} ms {qps:7.1f} QPS recall {rec:.3f}")


if __name__ == "__main__":
    main()
