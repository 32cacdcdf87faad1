"""Corpus-size scaling curve: QPS / recall / HBM per corpus size.

VERDICT items 2+9: a bench datapoint at >=10x the round-1 corpus with the
int8 table (the beyond-HBM mode), and a scaling table for BENCHLOG.

Per size: build (cached) sq index, measure sequential latency + pipelined
throughput + recall@100 vs the exact oracle (oracle only at sizes where the
brute force fits), report index + table HBM bytes.

Usage: python scripts/bench_scaling.py [--sizes 20000,100000,200000] [--iters 7]
"""

from __future__ import annotations

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def oracle_topk(searcher, model, params, q_ids, q_attn, q_active, topk):
    """Exact-MaxSim oracle that understands the int8 lane-packed table
    (bench.exact_oracle_topk assumes a flat bf16 table).  Dequantizes doc
    CHUNKS only — the full bf16 table never materializes, so the oracle
    runs even at 1M-doc corpora where it would be 25 GB."""
    from colbert_tpu.ops.maxsim import maxsim_xla

    Q = model.apply({"params": params}, jnp.asarray(q_ids), jnp.asarray(q_attn), method=model.query)
    Qm = (Q * jnp.asarray(q_active, Q.dtype)[..., None]).astype(jnp.bfloat16)
    flat = getattr(searcher, "flat_dv", None) is not None
    nd = searcher.num_docs
    cap = searcher.flat_dv if flat else searcher.rerank_cap
    dim = searcher.dim
    chunk = max(1, min(nd, (1 << 29) // (cap * dim * 4)))
    nk = getattr(searcher, "nk", 0)
    if flat:
        inv = searcher.emb_inv_scale
        inv = inv.astype(jnp.bfloat16) if inv is not None else None

        @jax.jit
        def sc(q, rows):
            D = rows.reshape(-1, cap, dim).astype(jnp.bfloat16)
            if inv is not None:
                D = D * inv
            return maxsim_xla(q, D)

        rows_per_doc = cap
    elif searcher.packed_int8:
        inv = searcher.emb_inv_scale.astype(jnp.bfloat16)

        @jax.jit
        def sc(q, rows):
            n = rows.shape[0] // (nk * cap)
            D = rows.reshape(n, nk, cap, 128)
            D = jnp.transpose(D, (0, 2, 1, 3)).reshape(n, cap, dim)
            return maxsim_xla(q, D.astype(jnp.bfloat16) * inv)

        rows_per_doc = nk * cap
    else:

        @jax.jit
        def sc(q, rows):
            return maxsim_xla(q, rows.reshape(-1, cap, dim).astype(jnp.bfloat16))

        rows_per_doc = cap
    tops_s, tops_p = [], []
    for lo in range(0, nd, chunk):
        n = min(chunk, nd - lo)
        rows = jax.lax.slice_in_dim(searcher.emb_table, lo * rows_per_doc,
                                    (lo + n) * rows_per_doc)
        s = np.asarray(sc(Qm, rows))
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
    ap.add_argument("--sizes", default="20000,100000,200000")
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--rerank-dtype", default="int8")
    ap.add_argument("--oracle-max-docs", type=int, default=120000)
    ap.add_argument("--balance-factor", type=float, default=0.0)
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument("--depth", type=int, default=512)
    ap.add_argument("--max-candidates", type=int, default=4096)
    ap.add_argument("--list-topr", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=0,
                    help="IVF partitions; 0 = the reference's auto formula "
                         "1<<round(log2(8*sqrt(N))) (faiss_indexers.py:279-286)")
    ap.add_argument("--codec", default="sq", choices=("sq", "pq4", "pq"),
                    help="index codec (pq4 for the DESIGN crossover table)")
    ap.add_argument("--mode", default="ann", choices=("ann", "flat"),
                    help="flat = exact brute-force MXU scan (no IVF build at "
                         "all; recall 1.0 by construction)")
    ap.add_argument("--query-chunk", type=int, default=8,
                    help="queries per retrieval_core chunk; 4 halves the "
                         "rerank-gather transient (needed at 500k docs int8: "
                         "the 6.1 GB table + nprobe-scaled hot-list buffers "
                         "left the default serve program 1.5 GB over HBM)")
    ap.add_argument("--topics", default="auto",
                    help="'auto' = constant ~80-docs/topic density above "
                         "200k docs (256 below, matching earlier rows); or "
                         "an explicit topic count")
    ap.add_argument("--gen", default="host", choices=("host", "device"),
                    help="corpus generation: 'device' = jax.random on the "
                         "accelerator (use above ~200k docs; this bench "
                         "host's numpy RNG is ~2M gaussians/s)")
    ap.add_argument("--sweep", default="",
                    help="serve-knob sweep on ONE index + oracle per size: "
                         "comma-separated nprobe:depth:topr:maxcand combos, "
                         "e.g. '128:512:8:4096,256:768:8:6144'")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import sys
    sys.path.insert(0, ".")
    from bench import build_synthetic_index
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.searcher import ColbertSearcher

    d_view = q_view = 16
    dim, topk = 768, 100
    nprobe, depth = args.nprobe, args.depth
    model_cfg = ModelConfig(dtype="bfloat16")
    mesh = make_mesh(-1, 1)
    model = ColbertModel(model_cfg, MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view))
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

    combos = [(nprobe, depth, args.list_topr, args.max_candidates)]
    if args.sweep:
        combos = [tuple(int(x) for x in c.split(":")) for c in args.sweep.split(",")]

    rows = []
    for num_docs in sizes:
        def cfg_for(np_, dp_, r_, mc_):
            return ColbertConfig(
                model=model_cfg,
                multiview=MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view),
                tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
                index=IndexConfig(codec=args.codec, sq_dim=64, pq_m=64, pq4_m=128,
                                  kmeans_iters=10, pq_kmeans_iters=10,
                                  balance_factor=args.balance_factor,
                                  partitions=args.partitions),
                serve=ServeConfig(mode=args.mode,
                                  nprobe=np_, candidate_depth=dp_, topk=topk,
                                  max_candidates=mc_, rerank_dtype=args.rerank_dtype,
                                  probe_list_topr=r_),
                mesh=MeshConfig(data=-1, model=1),
            )

        cfg = cfg_for(*combos[0])
        t0 = time.time()
        if args.topics == "auto":
            # constant cluster density (~80 docs/topic, the 20k-doc bench's
            # density): a FIXED 256-topic mixture makes recall-vs-exact
            # degenerate at large corpora — at 1.4M docs each topic holds
            # ~5.5k near-duplicates whose fp32 rank-order no 64 B codec can
            # reproduce (measured: 0.16 recall at budgets worth 0.94+ at
            # 200k).  256 below 200k docs keeps earlier rows comparable.
            n_topics = 256 if num_docs <= 200_000 else min(65536, num_docs // 80)
        else:
            n_topics = int(args.topics)
        storage = build_synthetic_index(None, num_docs, d_view, dim, cfg,
                                        ivf=(args.mode != "flat"), gen=args.gen,
                                        n_topics=n_topics)
        print(f"[{num_docs}] index ready in {time.time()-t0:.0f}s", flush=True)
        if args.mode == "flat":
            lens = np.zeros(1, np.int64)
            bytes_codes = 0
        else:
            ivf = storage.read_ivf()
            lens = ivf["offsets"][1:] - ivf["offsets"][:-1]
            bytes_codes = int(ivf["codes"].nbytes)
            del ivf

        oracle = None
        for np_, dp_, r_, mc_ in combos:
            searcher = ColbertSearcher(cfg_for(np_, dp_, r_, mc_), _Tok(), params, storage, mesh=mesh)
            bytes_table = int(searcher.emb_table.nbytes)  # no host transfer
            kw = dict(topk=topk, nprobe=np_, depth=dp_, query_chunk=args.query_chunk)
            res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)  # compile
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

            recall = float("nan")
            if num_docs <= args.oracle_max_docs:
                if oracle is None:  # knob-independent: compute once per index
                    oracle = oracle_topk(searcher, model, params, q_ids, q_attn, q_active, topk)
                recall = float(np.mean([
                    len(set(res.pids[i]) & set(oracle[i])) / topk for i in range(args.batch)
                ]))
            row = {
                "docs": num_docs, "vectors": num_docs * d_view,
                "knobs": (f"flat exact {args.rerank_dtype}" if args.mode == "flat"
                          else f"nprobe{np_} d{dp_} r{r_} c{mc_}"),
                "p50_ms": round(float(np.median(lat)) * 1e3, 1),
                "qps_seq": round(args.batch / float(np.median(lat)), 1),
                "qps_pipelined": round(args.batch / pipe, 1),
                "recall@100": round(recall, 3) if np.isfinite(recall) else None,
                "codes_MB": round(bytes_codes / 1e6, 1),
                "table_MB": round(bytes_table / 1e6, 1),
                "list_len_p50": int(np.percentile(lens, 50)),
                "list_len_p99": int(np.percentile(lens, 99)),
                "list_len_max": int(lens.max()),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            del searcher

    print("\n| docs | vectors | knobs | p50 ms | QPS seq | QPS pipelined | recall@100 | codes MB | table MB | list p50/p99/max |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['docs']} | {r['vectors']} | {r['knobs']} | {r['p50_ms']} | {r['qps_seq']} | "
              f"{r['qps_pipelined']} | {r['recall@100']} | {r['codes_MB']} | {r['table_MB']} | "
              f"{r['list_len_p50']}/{r['list_len_p99']}/{r['list_len_max']} |")


if __name__ == "__main__":
    main()
