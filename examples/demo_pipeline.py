"""Self-contained five-stage demo: train -> encode -> index -> serve -> eval.

Runs offline on any backend (CPU mesh included) with a synthetic corpus and
a from-scratch tiny model — the full reference workflow (``eval.sh`` stages)
through this framework's APIs.  Takes ~2 minutes on CPU.

    python examples/demo_pipeline.py [--workdir /tmp/colbert_demo]
"""

from __future__ import annotations

import argparse
import tempfile

import jax
import numpy as np

WORDS = ["apple", "river", "mountain", "piano", "dragon", "silver", "ocean",
         "candle", "forest", "marble", "copper", "meadow", "canyon", "harbor"]


def synth_corpus(n=80, seed=3):
    rng = np.random.default_rng(seed)
    texts, examples = [], []
    for i in range(n):
        w = WORDS[i % len(WORDS)]
        words = [w] * 3 + ["about", w, f"doc{i}"]
        rng.shuffle(words)
        texts.append(" ".join(words))
    for i in range(n):
        w = WORDS[i % len(WORDS)]
        pos = [texts[j] for j in range(n) if WORDS[j % len(WORDS)] == w]
        negs = [texts[j] for j in rng.permutation(n)[:20] if WORDS[j % len(WORDS)] != w]
        examples.append({
            "question": f"find {w}",
            "positive_ctxs": pos,        # every doc of the topic is relevant
            "hard_negative_ctxs": negs[:18],
        })
    return texts, examples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    work = args.workdir or tempfile.mkdtemp(prefix="colbert_demo_")

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig, TrainConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.serving import RetrievalService, evaluate_retrieval
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from colbert_tpu.training import ColbertTrainer, RetrievalDataset

    texts, examples = synth_corpus()
    vocab_path = write_vocab(build_vocab(texts + ["find"]), f"{work}/vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=64, num_layers=2, num_heads=4,
                          intermediate_size=128, max_position_embeddings=64, dim=32,
                          dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=8),
        tokenizer=TokenizerConfig(vocab_path=vocab_path, query_maxlen=16, doc_maxlen=32),
        train=TrainConfig(learning_rate=1e-3, per_device_batch_size=4, num_epochs=2,
                          eval_num_positives=1, eval_num_negatives=3,
                          checkpoint_dir=f"{work}/ckpt", log_every=5, seed=0),
        index=IndexConfig(index_path=f"{work}/index", codec="sq", sq_dim=16,
                          partitions=16, kmeans_iters=8, num_parts=3),
        serve=ServeConfig(nprobe=16, candidate_depth=64, topk=10, max_candidates=80),
        mesh=MeshConfig(data=-1, model=1),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)

    print("== stage 1: train retriever ==")
    trainer = ColbertTrainer(cfg, tok)
    ds = RetrievalDataset(examples)
    trainer.train(ds, dev_ds=RetrievalDataset(examples[:8]), num_epochs=2)
    params = trainer.state.params

    print("== stage 2: encode corpus ==")
    storage = CollectionEncoder(cfg, tok, params).encode_corpus(texts, cfg.index.index_path, batch_size=16)

    print("== stage 3: build IVF index ==")
    IndexBuilder(cfg, storage).build(chunk=512)

    print("== stage 4: serve ==")
    searcher = ColbertSearcher(cfg, tok, params, storage)
    service = RetrievalService(searcher, texts, cfg)

    print("== stage 5: evaluate ==")
    eval_data = [{"question": e["question"], "positive_ctxs": e["positive_ctxs"]} for e in examples[:20]]
    metrics = evaluate_retrieval(lambda qs, k: service.retrieve(qs, topk=k), eval_data, topk=10, recall_topk=[5, 10])
    print("metrics:", metrics)
    res = service.retrieve(["find ocean"], topk=3)[0]
    print("sample query 'find ocean' ->", [(p, round(s, 2), t[:30]) for p, s, t in res])
    assert metrics["recall@10"] > 0.5, "trained demo should retrieve most positives"
    print("demo OK")


if __name__ == "__main__":
    main()
