"""Socket-protocol serving throughput (VERDICT r3 item 3).

Measures QPS at the PROTOCOL surface — client connects over the
``multiprocessing.connection`` socket, sends batches of questions, receives
``(pid, score, text)`` triples — with the round-4 pipelined service
(batches dispatched via ``search_tokens_device`` with
``serve.pipeline_inflight`` in flight) against the same corpus/operating
point as the bench headline.  Request shape follows the reference's
evaluator: batches of 1024 questions, topk 100
(``dense_server_client.py:105-118``).

The corpus is the bench's synthetic one (no real text), so queries go
through a deterministic hash tokenizer — the BERT encode work is identical
to the headline's; only the (trivial) text->ids mapping differs.

Usage: python scripts/bench_server.py [--inflight 3] [--requests 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


class HashTokenizer:
    """Deterministic text->tokens stub: same shapes/dtypes as the real
    tokenizer's query encoding; content is a seeded hash of the text."""

    def __init__(self, Lq: int, q_view: int, vocab_size: int):
        self.Lq, self.q_view, self.vocab = Lq, q_view, vocab_size

    def encode_queries(self, texts):
        import types

        n = len(texts)
        ids = np.empty((n, self.Lq), np.int32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % (1 << 32))
            ids[i] = rng.integers(0, self.vocab, self.Lq)
        return types.SimpleNamespace(
            input_ids=ids,
            attention_mask=np.ones((n, self.Lq), np.int32),
            active_mask=np.ones((n, self.q_view), np.int32),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inflight", type=int, default=3)
    ap.add_argument("--requests", type=int, default=5)
    ap.add_argument("--request-size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--mode", default="flat", choices=("flat", "ann"))
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import build_synthetic_index, is_tpu, make_synthetic_embeddings
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.searcher import ColbertSearcher
    from colbert_tpu.serving import RetrievalClient, RetrievalServer, RetrievalService

    tpu = is_tpu()
    num_docs = 20000 if tpu else 400
    dim = 768 if tpu else 64
    d_view = q_view = 16
    model_cfg = (
        ModelConfig(dtype="bfloat16") if tpu else
        ModelConfig(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=64, dim=dim,
                    dtype="float32")
    )
    cfg = ColbertConfig(
        model=model_cfg,
        multiview=MultiviewConfig(enabled=True, q_view=q_view, d_view=d_view),
        tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=32, doc_maxlen=384),
        index=IndexConfig(codec="sq", pq_m=64 if tpu else 8, sq_dim=64 if tpu else 8,
                          pq4_m=128 if tpu else 16, kmeans_iters=10, pq_kmeans_iters=10),
        serve=ServeConfig(mode=args.mode, nprobe=128 if tpu else 8,
                          candidate_depth=512 if tpu else 32,
                          topk=100 if tpu else 10,
                          max_candidates=4096 if tpu else 256,
                          query_batch_size=args.batch if tpu else 4,
                          pipeline_inflight=args.inflight,
                          port=0),
        mesh=MeshConfig(data=-1, model=1),
    )
    embs = None if tpu else make_synthetic_embeddings(num_docs, d_view, dim)
    storage = build_synthetic_index(embs, num_docs, d_view, dim, cfg,
                                    ivf=(args.mode == "ann"),
                                    gen="device" if tpu else "host")
    mesh = make_mesh(-1, 1)
    model = ColbertModel(model_cfg, cfg.multiview)
    Lq = cfg.tokenizer.query_maxlen
    dummy = jnp.zeros((1, Lq), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, jnp.ones_like(dummy),
                        jnp.zeros((1, 384), jnp.int32), jnp.ones((1, 384), jnp.int32))["params"]
    tok = HashTokenizer(Lq, q_view, model_cfg.vocab_size)
    searcher = ColbertSearcher(cfg, tok, params, storage, mesh=mesh)
    corpus = [f"synthetic passage {i}" for i in range(num_docs)]
    service = RetrievalService(searcher, corpus, cfg)

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = RetrievalServer(service, host="127.0.0.1", port=port, authkey=b"bench")
    server.start_background()
    time.sleep(0.5)

    client = RetrievalClient(port=port, authkey=b"bench")
    n_req = args.request_size if tpu else 16
    questions = [f"query number {i} about topic {i % 97}" for i in range(n_req)]
    topk = cfg.serve.topk

    # warmup (compiles)
    res = client.retrieve(questions, topk=topk,
                          depth=cfg.serve.candidate_depth, nprobe=cfg.serve.nprobe)
    assert len(res) == n_req and len(res[0]) == topk

    t0 = time.perf_counter()
    for _ in range(args.requests):
        res = client.retrieve(questions, topk=topk,
                              depth=cfg.serve.candidate_depth, nprobe=cfg.serve.nprobe)
    dt = (time.perf_counter() - t0) / args.requests
    qps = n_req / dt

    # reference-shaped synchronous service for comparison (inflight=1)
    service.cfg.serve.pipeline_inflight = 1
    client.retrieve(questions, topk=topk, depth=cfg.serve.candidate_depth,
                    nprobe=cfg.serve.nprobe)
    t0 = time.perf_counter()
    for _ in range(max(1, args.requests // 2)):
        client.retrieve(questions, topk=topk, depth=cfg.serve.candidate_depth,
                        nprobe=cfg.serve.nprobe)
    dt_sync = (time.perf_counter() - t0) / max(1, args.requests // 2)
    service.cfg.serve.pipeline_inflight = args.inflight

    client.shutdown()
    print(json.dumps({
        "mode": args.mode, "num_docs": num_docs,
        "request_size": n_req, "service_batch": cfg.serve.query_batch_size,
        "inflight": args.inflight,
        "socket_qps": round(qps, 1),
        "socket_qps_sync": round(n_req / dt_sync, 1),
        "ms_per_request": round(dt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
