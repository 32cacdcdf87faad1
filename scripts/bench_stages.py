"""Stage attribution of the serving pipeline: prefix-pipeline wall clocks.

Builds the bench index once and times jitted PREFIXES of the same search
function (encode | +probe | +dedup | full); successive differences are the
per-stage costs.  Same-process only (tunnel variance).

Usage: python scripts/bench_stages.py [--docs 20000] [--iters 9] [--rerank-dtype int8]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--probe-impl", default="batched")
    ap.add_argument("--rerank-dtype", default="bfloat16")
    ap.add_argument("--max-candidates", type=int, default=4096)
    ap.add_argument("--query-chunk", type=int, default=8)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from bench import build_synthetic_index, make_synthetic_embeddings
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
    cfg = ColbertConfig(
        model=model_cfg,
        multiview=MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view),
        tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
        index=IndexConfig(codec="sq", sq_dim=64, kmeans_iters=10),
        serve=ServeConfig(nprobe=nprobe, candidate_depth=depth, topk=topk,
                          max_candidates=args.max_candidates, probe_impl=args.probe_impl,
                          rerank_dtype=args.rerank_dtype),
        mesh=MeshConfig(data=-1, model=1),
    )
    embs = make_synthetic_embeddings(args.docs, d_view, dim)
    mesh = make_mesh(-1, 1)
    storage = build_synthetic_index(embs, args.docs, d_view, dim, cfg)

    model = ColbertModel(model_cfg, cfg.multiview)
    rng = np.random.default_rng(0)
    q_ids = rng.integers(0, model_cfg.vocab_size, (args.batch, 32)).astype(np.int32)
    q_attn = np.ones((args.batch, 32), np.int32)
    q_active = np.ones((args.batch, q_view), np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(q_ids), jnp.asarray(q_attn),
        jnp.zeros((1, 384), jnp.int32), jnp.ones((1, 384), jnp.int32),
    )["params"]

    class _Tok:
        pass

    searcher = ColbertSearcher(cfg, _Tok(), params, storage, mesh=mesh)
    kw = dict(topk=topk, nprobe=nprobe, depth=depth, query_chunk=args.query_chunk)

    # pure call overhead: a trivial jit through the same dispatch path
    trivial = jax.jit(lambda a: (a[:, :1] + 1, a[:, :1]))
    trivial(jnp.asarray(q_ids))
    tt = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        r = trivial(jnp.asarray(q_ids))
        np.asarray(r[0]); np.asarray(r[1])
        tt.append(time.perf_counter() - t0)
    print(f"prefix empty   : {np.median(tt)*1e3:7.1f} ms (pure dispatch+fetch)", flush=True)

    stages = ["encode", "probe:coarse", "probe:sched", "probe:kernel",
              "probe:gather", "probe", "dedup", None]
    med = {}
    for stage in stages:
        searcher.debug_stop_stage = stage
        searcher._search_fns = {}
        searcher.search_tokens(q_ids, q_attn, q_active, **kw)  # compile+warm
        searcher.search_tokens(q_ids, q_attn, q_active, **kw)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            searcher.search_tokens(q_ids, q_attn, q_active, **kw)
            times.append(time.perf_counter() - t0)
        med[stage] = float(np.median(times)) * 1e3
        print(f"prefix {stage or 'full':8s}: {med[stage]:7.1f} ms", flush=True)

    print("\nattribution:")
    prev = 0.0
    for stage, label in [("encode", "encode"), ("probe:coarse", "coarse+topk"),
                         ("probe:sched", "schedule"), ("probe:kernel", "scan kernel"),
                         ("probe:gather", "pair gather"), ("probe", "top-depth"),
                         ("dedup", "dedup"), (None, "rerank+topk")]:
        if stage in med or stage is None:
            cur = med[stage]
            print(f"  {label:12s}: {cur - prev:7.1f} ms")
            prev = cur
    print(f"  total       : {med[None]:7.1f} ms  ({args.batch / (med[None] / 1e3):.0f} QPS)")


if __name__ == "__main__":
    main()
