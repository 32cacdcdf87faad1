"""End-to-end quality run on REAL text: the full five-stage CLI pipeline on
the Python-docstring retrieval corpus (VERDICT item 4).

train -> encode -> build-index -> evaluate (local service), all through
``colbert_tpu.cli``, reporting MRR@10 / recall@50 / recall@100 from
``cmd_evaluate`` — the reference's quality protocol
(``proj_utils/dureader_utils.py:51-73``) on the one real corpus available
offline.

Usage:
  python scripts/real_data_e2e.py --workdir /tmp/pydocs_e2e [--max-entries 20000]
  python scripts/real_data_e2e.py --workdir ... --stage data     # just build data
  python scripts/real_data_e2e.py --workdir ... --stage train    # resume pipeline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STAGES = ("data", "train", "encode", "index", "evaluate")


def build_data(workdir: str, max_entries: int, num_negatives: int, seed: int = 0,
               vocab_kind: str = "charword"):
    from colbert_tpu.evaluation.pydocs import (
        build_retrieval_dataset, collect_docstrings, train_dev_split,
    )
    from colbert_tpu.tokenization import build_vocab, train_wordpiece, write_vocab

    t0 = time.time()
    entries = collect_docstrings(max_entries=max_entries)
    texts, examples = build_retrieval_dataset(entries, num_negatives=num_negatives, seed=seed)
    train, dev = train_dev_split(examples, dev_frac=0.04, seed=seed)
    vocab_texts = texts + [e["question"] for e in examples]
    if vocab_kind == "wordpiece":
        # learned subword merges (VERDICT r2 item 9) vs the char+word builder
        vocab = train_wordpiece(vocab_texts, vocab_size=30000)
    else:
        vocab = build_vocab(vocab_texts, max_size=30000)
    write_vocab(vocab, os.path.join(workdir, "vocab.txt"))
    json.dump(texts, open(os.path.join(workdir, "corpus.json"), "w"))
    json.dump(train, open(os.path.join(workdir, "train.json"), "w"))
    json.dump(dev, open(os.path.join(workdir, "dev.json"), "w"))
    print(f"data: {len(texts)} passages, {len(train)} train / {len(dev)} dev, "
          f"vocab {len(vocab)}, {time.time()-t0:.0f}s", flush=True)


def write_config(workdir: str, on_tpu: bool, fast: bool = False,
                 hidden: int = 256, layers: int = 4, heads: int = 4):
    import yaml

    conf = {
        # BERT-small from scratch: trainable on one chip in minutes/epoch
        # (hidden/layers/heads exposed for the capacity ablation)
        "model": {"vocab_size": 30592, "hidden_size": hidden, "num_layers": layers,
                  "num_heads": heads, "intermediate_size": 4 * hidden,
                  "max_position_embeddings": 256, "dim": 128,
                  "dtype": "bfloat16" if on_tpu else "float32"},
        "multiview": {"enabled": True, "q_view": 8, "d_view": 8},
        "tokenizer": {"vocab_path": os.path.join(workdir, "vocab.txt"),
                      "query_maxlen": 32, "doc_maxlen": 224},
        "train": {"learning_rate": 5e-4, "per_device_batch_size": 32 if on_tpu else 4,
                  "num_epochs": 8 if on_tpu else 1, "evals_per_epoch": 1,
                  "score_temperature": 0.05, "warmup_ratio": 0.05,
                  "checkpoint_dir": os.path.join(workdir, "ckpt"),
                  "keep_checkpoints": 3, "log_every": 50},
        "index": {"codec": "sq", "sq_dim": 64, "kmeans_iters": 10,
                  "index_path": os.path.join(workdir, "index"),
                  "num_parts": 4},
        "serve": {"nprobe": 64, "candidate_depth": 256, "topk": 100,
                  "max_candidates": 2048},
        "mesh": {"data": -1, "model": 1},
    }
    if fast:
        # round-3 training-throughput options: per-batch doc-length buckets +
        # length-grouped pools + byte dropout (bench_train.py --dist numbers)
        conf["train"].update({"doc_length_buckets": [96, 160, 224],
                              "length_group_pool": 8})
        conf["model"].update({"dropout_impl": "byte",
                              "attention_dropout_site": "output"})
    path = os.path.join(workdir, "conf.yaml")
    yaml.safe_dump(conf, open(path, "w"))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-entries", type=int, default=20000)
    ap.add_argument("--num-negatives", type=int, default=20)
    ap.add_argument("--stage", default="data", choices=STAGES,
                    help="start from this stage (earlier outputs must exist)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--vocab", default="charword", choices=("charword", "wordpiece"))
    ap.add_argument("--fast", action="store_true",
                    help="doc-length buckets + length-grouped batches + byte dropout")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    start = STAGES.index(args.stage)

    if start <= 0:
        build_data(args.workdir, args.max_entries, args.num_negatives,
                   vocab_kind=args.vocab)
    conf = write_config(args.workdir, on_tpu, fast=args.fast,
                        hidden=args.hidden, layers=args.layers, heads=args.heads)

    from colbert_tpu.cli import main as cli

    sets = []
    if args.epochs is not None:
        sets += ["--set", f"train.num_epochs={args.epochs}"]
    t0 = time.time()
    if start <= 1:
        cli(["train", "--config", conf, "--train-data", os.path.join(args.workdir, "train.json"),
             "--dev-data", os.path.join(args.workdir, "dev.json")] + sets)
        print(f"train done in {time.time()-t0:.0f}s", flush=True)
    if start <= 2:
        t0 = time.time()
        cli(["encode", "--config", conf, "--corpus", os.path.join(args.workdir, "corpus.json")])
        print(f"encode done in {time.time()-t0:.0f}s", flush=True)
    if start <= 3:
        t0 = time.time()
        cli(["build-index", "--config", conf])
        print(f"build-index done in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    cli(["evaluate", "--config", conf, "--eval-data", os.path.join(args.workdir, "dev.json"),
         "--corpus", os.path.join(args.workdir, "corpus.json"), "--topk", "100",
         "--out", os.path.join(args.workdir, "metrics.json")])
    print(f"evaluate done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
