"""Micro-benchmark: token-major vs list-major batched SQ probe on the TPU.

Builds the bench-sized synthetic SQ index (20k docs x 16 views, dim 768,
K=auto partitions) and times the two probe implementations at the serving
operating point (2304 tokens = batch 144 x q_view 16, nprobe=128, depth=512).
Wall clock with results pulled to host (the tunnel backend's
block_until_ready is unreliable — see CLAUDE.md).

Usage: python scripts/bench_probe.py [--docs 20000] [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tokens", type=int, default=2304)
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument("--depth", type=int, default=512)
    ap.add_argument("--r", type=int, default=8)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from bench import make_synthetic_embeddings
    from colbert_tpu.indexing.builder import auto_partitions
    from colbert_tpu.ops.ivf import ivf_probe_sq, ivf_probe_sq_batched, sort_by_list
    from colbert_tpu.ops.kmeans import assign_clusters, kmeans
    from colbert_tpu.ops.sq import sq_encode, sq_train

    d_view, dim, sq_dim = 16, 768, 64
    embs = make_synthetic_embeddings(args.docs, d_view, dim)
    N = embs.shape[0]
    K = auto_partitions(N)
    print(f"N={N} K={K}", flush=True)
    t0 = time.perf_counter()
    sample = embs[np.random.default_rng(0).choice(N, min(N, 1 << 18), replace=False)]
    centroids, _ = kmeans(jnp.asarray(sample), K, iters=10, chunk=16384)
    proj, scales = sq_train(jnp.asarray(sample), sq_dim)
    assign = np.asarray(assign_clusters(jnp.asarray(embs), centroids))
    codes = np.asarray(sq_encode(jnp.asarray(embs), proj, scales))
    perm, offsets = sort_by_list(assign, K)
    codes_sorted = jnp.asarray(codes[perm])
    offsets_d = jnp.asarray(offsets)
    lens = offsets[1:] - offsets[:-1]
    cap = int(lens.max())
    maxb = (cap + 31 + 127) // 128
    print(f"build {time.perf_counter()-t0:.1f}s; list len mean={lens.mean():.1f} "
          f"p50={np.percentile(lens, 50):.0f} p99={np.percentile(lens, 99):.0f} max={cap}", flush=True)

    rng = np.random.default_rng(1)
    q = embs[rng.choice(N, args.tokens, replace=False)] + 0.1 * rng.normal(size=(args.tokens, dim)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    def run_token():
        return ivf_probe_sq(q, centroids, proj, scales, codes_sorted, offsets_d,
                            nprobe=args.nprobe, cap=cap, depth=args.depth,
                            token_chunk=32, approx_topk=True)

    def run_batched():
        return ivf_probe_sq_batched(q, centroids, proj, scales, codes_sorted, offsets_d,
                                    nprobe=args.nprobe, depth=args.depth, maxb=maxb,
                                    r=args.r, approx_topk=True)

    # device-side reduction: timing must not pull the (T, depth) result
    # through the tunnel (~44 ms/MB would dominate); a scalar pull still
    # forces completion via data dependency
    reduce_jit = jax.jit(lambda s, r: jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0)) + jnp.sum(r))

    # ---- stage breakdown of the batched probe ----
    from colbert_tpu.ops.sq import sq_query
    from colbert_tpu.ops.sq_probe_batched import (
        build_slot_schedule, probe_batched_postprocess, slot_capacity, sq_batch_list_scan,
    )
    from colbert_tpu.ops.sq_probe_pallas import pad_codes_for_scan

    pack = 128 // sq_dim
    s_cap = slot_capacity(args.tokens * args.nprobe, K, 128)

    @jax.jit
    def stage_sched(qq):
        coarse_s = jnp.dot(qq, jnp.asarray(centroids).T, preferred_element_type=jnp.float32)
        _, lists = jax.lax.top_k(coarse_s, args.nprobe)
        sched = build_slot_schedule(lists, offsets_d, tpl=128, s_cap=s_cap, pack=pack)
        return sched

    codes_padded = pad_codes_for_scan(codes_sorted, maxb * 128)
    t_pad = ((args.tokens + 127) // 128) * 128

    @jax.jit
    def stage_qs(qq):
        qs = sq_query(qq, proj, scales)
        return jnp.pad(qs, ((0, t_pad - args.tokens), (0, 0))).T

    def stage_kernel(sched, qsT):
        return sq_batch_list_scan(sched.qidx, sched.meta, qsT, codes_padded, tpl=128, r=args.r)

    post = jax.jit(lambda sched, out_s, out_r: probe_batched_postprocess(
        sched, out_s, out_r, args.tokens, args.nprobe, args.depth, True))

    sched = stage_sched(q); qsT = stage_qs(q)
    out_s, out_r = stage_kernel(sched, qsT)
    fin = jax.jit(lambda x: jnp.where(jnp.isfinite(x), 1.0, 0.0).sum())
    for name, run in (
        ("  sched", lambda: float(jnp.sum(stage_sched(q).slot_of_pair))),
        ("  kernel", lambda: float(fin(stage_kernel(sched, qsT)[0]))),
        ("  post", lambda: float(fin(post(sched, out_s, out_r)[0]))),
    ):
        run()
        tt = []
        for _ in range(args.iters):
            t0 = time.perf_counter(); run(); tt.append(time.perf_counter() - t0)
        print(f"{name}: {np.median(tt)*1e3:.1f} ms", flush=True)

    results = {}
    for name, fn in (("token", run_token), ("batched", run_batched)):
        try:
            s, r = fn()  # compile + warm
            float(reduce_jit(s, r))
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                s, r = fn()
                float(reduce_jit(s, r))
                times.append(time.perf_counter() - t0)
            results[name] = (float(np.median(times)), np.asarray(s), np.asarray(r))
            print(f"{name}: {np.median(times)*1e3:.1f} ms (min {np.min(times)*1e3:.1f})", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    if len(results) == 2:
        # candidate DOC-set overlap (rows of the same multiview doc are
        # interchangeable for the downstream dedup+rerank)
        row2pid = perm // d_view  # sorted-row -> doc id
        _, s1, r1 = results["token"]
        _, s2, r2 = results["batched"]
        ov = []
        for t in range(0, args.tokens, 37):
            p1 = set(row2pid[r1[t][r1[t] >= 0]].tolist())
            p2 = set(row2pid[r2[t][r2[t] >= 0]].tolist())
            ov.append(len(p1 & p2) / max(1, len(p1)))
        print(f"pid-set coverage vs token-major: mean {np.mean(ov):.3f} p10 {np.percentile(ov, 10):.3f}")
        print(f"speedup: {results['token'][0] / results['batched'][0]:.1f}x")


if __name__ == "__main__":
    main()
