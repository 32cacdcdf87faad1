"""Beyond-HBM serving: host-RAM rerank table (VERDICT r2 item 7 datapoint).

The reference serves its rerank table from host RAM
(``colbert_ranker.py:61-73``) — corpus bounded by hundreds of GB, not
device memory.  ``serve.rerank_table='host'`` is the TPU-native analogue:
candidate generation stays on-device (sq codes in HBM), and only the
PLAID-style funnel's top ``host_rerank_candidates`` doc blocks per query
cross host->device, as int8.

Default corpus: 1.4M docs x 16 views x dim 768 — the int8 table alone is
17.2 GB > the v5e's 16 GB HBM, so NO in-HBM mode (bf16 or int8 lane-packed)
can serve it on one chip; codes in HBM are 1.4 GB.

The corpus is generated and written part-by-part so host RAM never holds
the fp32 embeddings at once.  Recall@100 is measured against a chunked
exact oracle that dequantizes the host table on device chunk-by-chunk
(one-time ~17 GB host->device stream).

Usage: python scripts/bench_host_table.py [--docs 1400000] [--partitions 8192]
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


def write_big_corpus(path, num_docs, d_view, dim, parts=32, seed=0):
    """Chunked variant of bench.make_synthetic_embeddings: same topic
    mixture + anisotropic spectrum, one part in RAM at a time."""
    from colbert_tpu.indexing import IndexStorage

    storage = IndexStorage(path)
    if os.path.exists(os.path.join(path, "meta.json")):
        return storage
    rng = np.random.default_rng(seed)
    n_topics = 256
    spectrum = (1.0 / np.sqrt(1.0 + np.arange(dim))).astype(np.float32)
    topics = rng.normal(size=(n_topics, dim)).astype(np.float32) * spectrum
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    per = num_docs // parts
    for p in range(parts):
        lo, hi = p * per, (p + 1) * per if p < parts - 1 else num_docs
        n = hi - lo
        doc_topic = rng.integers(0, n_topics, size=n)
        embs = topics[np.repeat(doc_topic, d_view)] + 0.3 * (
            rng.normal(size=(n * d_view, dim)).astype(np.float32) * spectrum
        )
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        storage.write_part(p, embs.astype(np.float16), [d_view] * n)
        print(f"part {p + 1}/{parts} written ({hi}/{num_docs} docs)", flush=True)
    storage.write_meta(
        {"dim": dim, "num_docs": num_docs, "num_embeddings": num_docs * d_view,
         "multiview": True, "d_view": d_view, "num_parts": parts,
         "embedding_dtype": "float16"}
    )
    return storage


def host_oracle(searcher, Qm, topk, chunk_docs=65536):
    """Exact MaxSim over the host int8 table, dequantized on device in
    chunks (the full table never materializes in HBM)."""
    from colbert_tpu.ops.maxsim import maxsim_xla

    nd, cap = searcher.num_docs, searcher.rerank_cap
    inv = searcher.emb_inv_scale.astype(jnp.bfloat16)

    @jax.jit
    def sc(q, rows):
        D = rows.reshape(-1, cap, rows.shape[-1]).astype(jnp.bfloat16) * inv
        return maxsim_xla(q, D)

    q = jnp.asarray(Qm, jnp.bfloat16)
    tops_s, tops_p = [], []
    for lo in range(0, nd, chunk_docs):
        n = min(chunk_docs, nd - lo)
        rows = searcher.host_table[lo : lo + n].reshape(n * cap, -1)
        s = np.asarray(sc(q, jnp.asarray(rows)))
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
    ap.add_argument("--docs", type=int, default=1_400_000)
    ap.add_argument("--balance-factor", type=float, default=1.3,
                    help="balanced k-means cap (ceil(mean*factor)); at 22M+ "
                         "vectors an UNBALANCED build's max list inflates the "
                         "hot-list scan's per-block SMEM meta past the 1 MB "
                         "SMEM (measured: maxb~285 -> 4.6 MB operand)")
    ap.add_argument("--partitions", type=int, default=8192,
                    help="auto formula gives 32768 at 22.4M vectors; 8192 "
                         "keeps the one-off build tractable on the single "
                         "tunnel-attached chip (assignment is transfer-bound)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument("--depth", type=int, default=512)
    ap.add_argument("--host-candidates", type=int, default=256)
    ap.add_argument("--max-candidates", type=int, default=4096,
                    help="post-dedup candidate budget.  The round-5 rerun at "
                         "defaults measured recall@100 = 0.162 with EITHER "
                         "dedup: the 4096-candidate budget is 0.3%% of a "
                         "1.4M-doc corpus — the fixed-knob scaling curve "
                         "(BENCHLOG round 2) reaches the same place.  Scale "
                         "budget knobs with the corpus, as the 200k IVF v2 "
                         "table does (d1024 c8192 -> 0.980).")
    ap.add_argument("--list-topr", type=int, default=8)
    ap.add_argument("--dedup", default="auto", choices=("auto", "exact", "packed"),
                    help="candidate dedup ranking; 'auto' now resolves to "
                         "exact fp32 for the host funnel (the packed 6-bit "
                         "score quantization at 22M vectors collapsed "
                         "recall@100 to 0.16 — measured round 5)")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--gen", default="device", choices=("host", "device"),
                    help="corpus generation: 'device' = jax.random on the "
                         "accelerator (this bench host's numpy RNG is ~2M "
                         "gaussians/s — 22.4M vectors would take hours)")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.searcher import ColbertSearcher

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    d_view = q_view = 16
    dim, topk = (768, 100) if on_tpu else (64, 10)
    nprobe, depth = args.nprobe, args.depth
    if not on_tpu:
        args.docs, args.batch, nprobe, depth, args.partitions = 2000, 4, 8, 32, 64

    model_cfg = (
        ModelConfig(dtype="bfloat16") if on_tpu else
        ModelConfig(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=64, dim=dim,
                    dtype="float32")
    )
    cfg = ColbertConfig(
        model=model_cfg,
        multiview=MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view),
        tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
        index=IndexConfig(codec="sq", sq_dim=64 if on_tpu else 8, kmeans_iters=10,
                          partitions=args.partitions,
                          balance_factor=args.balance_factor),
        serve=ServeConfig(nprobe=nprobe, candidate_depth=depth, topk=topk,
                          max_candidates=args.max_candidates if on_tpu else 256,
                          rerank_table="host",
                          host_rerank_candidates=args.host_candidates,
                          probe_list_topr=args.list_topr,
                          dedup_impl=args.dedup),
        mesh=MeshConfig(data=-1, model=1),
    )

    path = f"/tmp/colbert_bench_idx_host_{args.docs}x{d_view}x{dim}_p{args.partitions}_b{args.balance_factor}"
    if args.gen == "device":
        path += "_dgen"  # corpus provenance tag: device-gen != host-gen corpora
    t0 = time.time()
    if args.gen == "device":
        from bench import write_synthetic_parts_device

        storage = write_synthetic_parts_device(path, args.docs, d_view, dim)
    else:
        storage = write_big_corpus(path, args.docs, d_view, dim)
    print(f"corpus ready in {time.time() - t0:.0f}s", flush=True)
    if not os.path.exists(os.path.join(path, "ivf", "offsets.npy")):
        t0 = time.time()
        IndexBuilder(cfg, storage).build(chunk=1 << 15)
        print(f"index built in {time.time() - t0:.0f}s", flush=True)

    mesh = make_mesh(-1, 1)
    model = ColbertModel(model_cfg, cfg.multiview)
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

    t0 = time.time()
    searcher = ColbertSearcher(cfg, _Tok(), params, storage, mesh=mesh)
    print(f"searcher ready in {time.time() - t0:.0f}s; host table "
          f"{searcher.host_table.nbytes / 1e9:.1f} GB "
          f"(> {'16 GB v5e HBM' if searcher.host_table.nbytes > 16e9 else 'n/a'})",
          flush=True)

    kw = dict(topk=topk, nprobe=nprobe, depth=depth, query_chunk=8)
    res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)  # compile
    res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
    searcher.timers.totals.clear()
    searcher.timers.counts.clear()
    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        res = searcher.search_tokens(q_ids, q_attn, q_active, **kw)
        lat.append(time.perf_counter() - t0)
    spans = {k: round(v * 1e3 / args.iters, 1) for k, v in searcher.timers.totals.items()}

    # pipelined (round 5): search_tokens_device returns a lazy handle — the
    # host gather of batch i overlaps the device probe of batch i+1 on a
    # worker thread (VERDICT r4 item 7); measured as back-to-back submission
    pipe_qps = None
    if hasattr(searcher, "_host_candidates"):
        def one_pass(n):
            t0 = time.perf_counter()
            handles = [
                searcher.search_tokens_device(q_ids, q_attn, q_active, **kw)
                for _ in range(n)
            ]
            for h in handles:
                ts, tp = h
                np.asarray(ts), np.asarray(tp)
            return (time.perf_counter() - t0) / n
        one_pass(2)  # warm
        pipe = [one_pass(args.iters) for _ in range(3)]
        pipe_qps = round(args.batch / float(np.median(pipe)), 1)

    # emit the QPS record BEFORE the (minutes-long) oracle stream so a
    # wall-clock kill still leaves the datapoint on stdout
    p50 = float(np.median(lat))
    pre = {
        "docs": args.docs, "vectors": args.docs * d_view,
        "host_table_GB": round(searcher.host_table.nbytes / 1e9, 1),
        "codes_GB": round(int(np.asarray(searcher.codes).nbytes) / 1e9, 2),
        "partitions": args.partitions,
        "host_candidates": args.host_candidates,
        "p50_ms": round(p50 * 1e3, 1),
        "qps": round(args.batch / p50, 1),
        "qps_pipelined": pipe_qps,
        "recall@100_vs_exact": None,
        "stage_ms_per_batch": spans,
    }
    print(json.dumps(pre), flush=True)

    recall = None
    if not args.skip_oracle:
        Q = model.apply({"params": params}, jnp.asarray(q_ids), jnp.asarray(q_attn),
                        method=model.query)
        Qm = np.asarray((Q * jnp.asarray(q_active, Q.dtype)[..., None]).astype(jnp.float32))
        t0 = time.time()
        oracle = host_oracle(searcher, Qm, topk)
        print(f"oracle in {time.time() - t0:.0f}s", flush=True)
        recall = float(np.mean([
            len(set(res.pids[i]) & set(oracle[i])) / topk for i in range(args.batch)
        ]))

    p50 = float(np.median(lat))
    out = {
        "docs": args.docs, "vectors": args.docs * d_view,
        "host_table_GB": round(searcher.host_table.nbytes / 1e9, 1),
        "codes_GB": round(int(np.asarray(searcher.codes).nbytes) / 1e9, 2),
        "partitions": args.partitions,
        "host_candidates": args.host_candidates,
        "p50_ms": round(p50 * 1e3, 1),
        "qps": round(args.batch / p50, 1),
        "qps_pipelined": pipe_qps,
        "recall@100_vs_exact": round(recall, 3) if recall is not None else None,
        "stage_ms_per_batch": spans,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
