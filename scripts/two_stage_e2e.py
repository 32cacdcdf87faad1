"""Two-stage + iterative-mining quality table on the pydocs corpus
(VERDICT r2 item 5): three rows through ``cmd_evaluate`` —

  1. retriever only                (train -> encode -> build-index -> evaluate)
  2. + one hard-negative mining round  (mine -> retrain -> re-encode -> re-evaluate)
  3. + cross-encoder second stage  (train-ce on mined negatives -> evaluate --rerank-ce)

The reference recipe: ``proj_utils/dureader_utils.py:76-83`` (gen_iter mining),
``colbert/training/ce_trainer.py:97-123`` (CE rerank of top-100).  The CE's
negatives are retrieval-derived with positives filtered out (gen_ce parity,
``dureader_utils.py:30-36``).

Uses the learned WordPiece vocab (VERDICT r2 item 9) — the baseline row doubles
as the WordPiece-vs-charword delta against BENCHLOG's 40-epoch charword table.

Usage:
  python scripts/two_stage_e2e.py --workdir /tmp/pydocs_2stage
  python scripts/two_stage_e2e.py --workdir ... --stage mine   # resume
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

STAGES = ("data", "train", "eval_base", "mine", "retrain", "eval_mined",
          "train_ce", "eval_ce", "train_ce_distill", "eval_ce_distill")


def write_config(workdir: str, on_tpu: bool, mined: bool, hidden: int = 256,
                 layers: int = 4, heads: int = 4) -> str:
    """Pipeline config; ``mined=True`` points checkpoints/index at the
    post-mining copies so both generations stay on disk."""
    import yaml

    tag = "2" if mined else ""
    conf = {
        "model": {"vocab_size": 30592, "hidden_size": hidden, "num_layers": layers,
                  "num_heads": heads, "intermediate_size": 4 * hidden,
                  "max_position_embeddings": 256, "dim": 128,
                  "dtype": "bfloat16" if on_tpu else "float32",
                  "dropout_impl": "byte", "attention_dropout_site": "output",
                  "attention_softmax_dtype": "compute"},
        "multiview": {"enabled": True, "q_view": 8, "d_view": 8},
        "tokenizer": {"vocab_path": os.path.join(workdir, "vocab.txt"),
                      "query_maxlen": 32, "doc_maxlen": 224, "ce_maxlen": 256},
        "train": {"learning_rate": 5e-4, "per_device_batch_size": 32 if on_tpu else 4,
                  "num_epochs": 40 if on_tpu else 1, "evals_per_epoch": 1,
                  "score_temperature": 0.05, "warmup_ratio": 0.05,
                  "checkpoint_dir": os.path.join(workdir, f"ckpt{tag}"),
                  "keep_checkpoints": 3, "log_every": 100,
                  "doc_length_buckets": [96, 160, 224], "length_group_pool": 8},
        # CE: same BERT-small scale (no pretrained macbert exists offline);
        # from-scratch lr matched to the retriever's
        "ce_model": {"vocab_size": 30592, "hidden_size": 256, "num_layers": 4,
                     "num_heads": 4, "intermediate_size": 1024,
                     "max_position_embeddings": 256,
                     "dtype": "bfloat16" if on_tpu else "float32",
                     "dropout_impl": "byte", "attention_dropout_site": "output",
                     "attention_softmax_dtype": "compute"},
        "ce_train": {"learning_rate": 3e-4, "per_device_batch_size": 16 if on_tpu else 2,
                     "num_epochs": 5 if on_tpu else 1, "neg_num": 4,
                     "evals_per_epoch": 1, "eval_topk": 100,
                     # from-scratch CE is data-starved (measured near-random
                     # top-100 rerank); warm-start from the trained retriever
                     "init_from_retriever": True,
                     "checkpoint_dir": os.path.join(workdir, "ckpt_ce"),
                     "keep_checkpoints": 3, "log_every": 100},
        "index": {"codec": "sq", "sq_dim": 64, "kmeans_iters": 10,
                  "index_path": os.path.join(workdir, f"index{tag}"),
                  "num_parts": 4},
        "serve": {"nprobe": 64, "candidate_depth": 256, "topk": 100,
                  "max_candidates": 2048},
        "mesh": {"data": -1, "model": 1},
    }
    path = os.path.join(workdir, f"conf{tag}.yaml")
    yaml.safe_dump(conf, open(path, "w"))
    return path


def filter_positives(mined_path: str, out_path: str) -> None:
    """gen_ce parity: CE negatives must not contain positives
    (``dureader_utils.py:30-36``); mining (gen_iter) does not filter them."""
    data = json.load(open(mined_path))
    kept = []
    for ex in data:
        pos = set(ex["positive_ctxs"])
        negs = [n for n in ex["hard_negative_ctxs"] if n not in pos]
        if negs:
            kept.append({**ex, "hard_negative_ctxs": negs})
    json.dump(kept, open(out_path, "w"))
    print(f"ce data: {len(kept)}/{len(data)} examples after positive filtering", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-entries", type=int, default=20000)
    ap.add_argument("--stage", default="data", choices=STAGES)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--ce-epochs", type=int, default=None)
    ap.add_argument("--ce-lr", type=float, default=None)
    # retriever capacity ablation (VERDICT r4 item 9b): 6L/384h vs 4L/256h
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--stop-after", default=None, choices=STAGES)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (validation; the image pins "
                         "JAX_PLATFORMS=axon at interpreter start)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    start = STAGES.index(args.stage)
    results = {}
    res_path = os.path.join(args.workdir, "table.json")
    if os.path.exists(res_path):
        results = json.load(open(res_path))

    def record(row, metrics_file):
        results[row] = json.load(open(metrics_file))
        json.dump(results, open(res_path, "w"), indent=2)
        print(f"[{row}] {results[row]}", flush=True)

    from scripts.real_data_e2e import build_data

    if start <= STAGES.index("data"):
        build_data(args.workdir, args.max_entries, num_negatives=20,
                   vocab_kind="wordpiece")
    conf = write_config(args.workdir, on_tpu, mined=False,
                        hidden=args.hidden, layers=args.layers, heads=args.heads)
    conf2 = write_config(args.workdir, on_tpu, mined=True,
                         hidden=args.hidden, layers=args.layers, heads=args.heads)

    from colbert_tpu.cli import main as cli

    sets = ["--set", f"train.num_epochs={args.epochs}"] if args.epochs else []
    train_json = os.path.join(args.workdir, "train.json")
    dev_json = os.path.join(args.workdir, "dev.json")
    corpus_json = os.path.join(args.workdir, "corpus.json")
    mined_json = os.path.join(args.workdir, "train_iter1.json")
    ce_json = os.path.join(args.workdir, "train_ce.json")
    distill_json = os.path.join(args.workdir, "train_ce_distill.json")

    def run(stage, fn):
        if start > STAGES.index(stage):
            return
        t0 = time.time()
        fn()
        print(f"{stage} done in {time.time() - t0:.0f}s", flush=True)
        if args.stop_after == stage:
            sys.exit(0)

    run("train", lambda: cli(
        ["train", "--config", conf, "--train-data", train_json, "--dev-data", dev_json] + sets))

    def eval_base():
        cli(["encode", "--config", conf, "--corpus", corpus_json])
        cli(["build-index", "--config", conf])
        cli(["evaluate", "--config", conf, "--eval-data", dev_json, "--corpus", corpus_json,
             "--topk", "100", "--out", os.path.join(args.workdir, "metrics_base.json")])
        record("retriever", os.path.join(args.workdir, "metrics_base.json"))
    run("eval_base", eval_base)

    run("mine", lambda: cli(
        ["mine", "--config", conf, "--eval-data", train_json, "--corpus", corpus_json,
         "--out", mined_json, "--topk", "50", "--keep-old", "10",
         "--distill-out", distill_json,
         "--set", "ce_train.distill_group=8"]))

    run("retrain", lambda: cli(
        ["train", "--config", conf2, "--train-data", mined_json, "--dev-data", dev_json] + sets))

    def eval_mined():
        cli(["encode", "--config", conf2, "--corpus", corpus_json])
        cli(["build-index", "--config", conf2])
        cli(["evaluate", "--config", conf2, "--eval-data", dev_json, "--corpus", corpus_json,
             "--topk", "100", "--out", os.path.join(args.workdir, "metrics_mined.json")])
        record("retriever+mining", os.path.join(args.workdir, "metrics_mined.json"))
    run("eval_mined", eval_mined)

    def train_ce():
        filter_positives(mined_json, ce_json)
        ce_sets = []
        if args.ce_epochs:
            ce_sets += ["--set", f"ce_train.num_epochs={args.ce_epochs}"]
        if args.ce_lr:
            ce_sets += ["--set", f"ce_train.learning_rate={args.ce_lr}"]
        cli(["train-ce", "--config", conf2, "--train-data", ce_json,
             "--dev-data", dev_json] + ce_sets)
    run("train_ce", train_ce)

    run("eval_ce", lambda: (
        cli(["evaluate", "--config", conf2, "--eval-data", dev_json, "--corpus", corpus_json,
             "--topk", "100", "--rerank-ce",
             "--out", os.path.join(args.workdir, "metrics_ce.json")]),
        record("retriever+mining+ce", os.path.join(args.workdir, "metrics_ce.json"))))

    # --- CE distillation variant (round 4, VERDICT r3 item 9): train the CE
    # against the bi-encoder's own top-window scores (KL + NLL anchor) and
    # rerank with it.  Checkpoints go to a separate dir so both CEs survive.
    distill_sets = ["--set", "ce_train.distill_weight=0.5",
                    "--set", "ce_train.distill_group=8",
                    "--set", f"ce_train.checkpoint_dir={os.path.join(args.workdir, 'ckpt_ce_distill')}"]
    if args.ce_epochs:
        distill_sets += ["--set", f"ce_train.num_epochs={args.ce_epochs}"]

    run("train_ce_distill", lambda: cli(
        ["train-ce", "--config", conf2, "--train-data", distill_json,
         "--dev-data", dev_json] + distill_sets))

    run("eval_ce_distill", lambda: (
        cli(["evaluate", "--config", conf2, "--eval-data", dev_json, "--corpus", corpus_json,
             "--topk", "100", "--rerank-ce",
             "--set", f"ce_train.checkpoint_dir={os.path.join(args.workdir, 'ckpt_ce_distill')}",
             "--out", os.path.join(args.workdir, "metrics_ce_distill.json")]),
        record("retriever+mining+ce_distill", os.path.join(args.workdir, "metrics_ce_distill.json"))))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
