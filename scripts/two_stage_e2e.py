"""Two-stage + iterative-mining quality recipe on the pydocs corpus
(VERDICT r2 item 5): the reference's full quality loop —
retrieve -> CE rerank (stage 6, ce_trainer.py:97-123) and
retrieve -> mine -> retrain -> re-evaluate (gen_iter,
proj_utils/dureader_utils.py:76-83) — through the CLI, recording a
three-row table (retriever / +CE / +mining) from ``cmd_evaluate``.

Assumes a completed ``real_data_e2e.py`` workdir (trained retriever,
index, corpus/train/dev JSONs).

Usage:
  python scripts/two_stage_e2e.py --workdir /tmp/pydocs_e2e [--stage ce|mine]
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

STAGES = ("ce", "ce-eval", "mine", "retrain", "reindex", "mine-eval")


def patch_config(workdir: str, on_tpu: bool) -> str:
    """Extend the retriever conf with CE sections (small from-scratch CE:
    no pretrained checkpoint exists in this environment)."""
    import yaml

    conf = yaml.safe_load(open(os.path.join(workdir, "conf.yaml")))
    conf["ce_model"] = {
        "vocab_size": conf["model"]["vocab_size"], "hidden_size": 256,
        "num_layers": 4, "num_heads": 4, "intermediate_size": 1024,
        "max_position_embeddings": 288, "dim": 128,
        "dtype": "bfloat16" if on_tpu else "float32",
    }
    conf["tokenizer"]["ce_maxlen"] = 256
    conf["ce_train"] = {
        # from-scratch CE: retriever-scale LR, not the reference's 1e-5
        # (that was for pretrained macbert-large, eval.sh:46)
        "learning_rate": 2e-4, "per_device_batch_size": 16 if on_tpu else 2,
        "num_epochs": 8 if on_tpu else 1, "neg_num": 4,
        "evals_per_epoch": 1, "keep_checkpoints": 2, "log_every": 50,
        "checkpoint_dir": os.path.join(workdir, "ckpt_ce"),
    }
    path = os.path.join(workdir, "conf_ce.yaml")
    yaml.safe_dump(conf, open(path, "w"))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--stage", default="ce", choices=STAGES)
    ap.add_argument("--ce-epochs", type=int, default=None)
    ap.add_argument("--retrain-epochs", type=int, default=40)
    args = ap.parse_args()
    wd = args.workdir

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    conf = patch_config(wd, on_tpu)
    start = STAGES.index(args.stage)

    from colbert_tpu.cli import main as cli

    corpus = os.path.join(wd, "corpus.json")
    train, dev = os.path.join(wd, "train.json"), os.path.join(wd, "dev.json")
    sets_ce = ["--set", f"ce_train.num_epochs={args.ce_epochs}"] if args.ce_epochs else []

    if start <= 0:  # CE training
        t0 = time.time()
        cli(["train-ce", "--config", conf, "--train-data", train, "--dev-data", dev] + sets_ce)
        print(f"train-ce done in {time.time()-t0:.0f}s", flush=True)
    if start <= 1:  # two-stage eval: retriever + CE rerank
        t0 = time.time()
        cli(["evaluate", "--config", conf, "--eval-data", dev, "--corpus", corpus,
             "--topk", "100", "--rerank-ce",
             "--out", os.path.join(wd, "metrics_ce.json")])
        print(f"evaluate+ce done in {time.time()-t0:.0f}s", flush=True)
    if start <= 2:  # hard-negative mining from the CURRENT retriever
        t0 = time.time()
        cli(["mine", "--config", conf, "--eval-data", train, "--corpus", corpus,
             "--out", os.path.join(wd, "train_iter1.json"), "--topk", "50"])
        print(f"mine done in {time.time()-t0:.0f}s", flush=True)

    # iteration-1 retriever: fresh checkpoint dir + index path
    sets_iter = ["--set", f"train.checkpoint_dir={os.path.join(wd, 'ckpt_iter1')}",
                 "--set", f"index.index_path={os.path.join(wd, 'index_iter1')}",
                 "--set", f"train.num_epochs={args.retrain_epochs}"]
    if start <= 3:
        t0 = time.time()
        cli(["train", "--config", conf, "--train-data", os.path.join(wd, "train_iter1.json"),
             "--dev-data", dev] + sets_iter)
        print(f"retrain done in {time.time()-t0:.0f}s", flush=True)
    if start <= 4:
        t0 = time.time()
        cli(["encode", "--config", conf, "--corpus", corpus] + sets_iter)
        cli(["build-index", "--config", conf] + sets_iter)
        print(f"reindex done in {time.time()-t0:.0f}s", flush=True)
    if start <= 5:
        t0 = time.time()
        cli(["evaluate", "--config", conf, "--eval-data", dev, "--corpus", corpus,
             "--topk", "100", "--out", os.path.join(wd, "metrics_iter1.json")] + sets_iter)
        cli(["evaluate", "--config", conf, "--eval-data", dev, "--corpus", corpus,
             "--topk", "100", "--rerank-ce",
             "--out", os.path.join(wd, "metrics_iter1_ce.json")] + sets_iter)
        print(f"mine-eval done in {time.time()-t0:.0f}s", flush=True)

    for name in ("metrics.json", "metrics_ce.json", "metrics_iter1.json", "metrics_iter1_ce.json"):
        p = os.path.join(wd, name)
        if os.path.exists(p):
            print(name, json.load(open(p)), flush=True)


if __name__ == "__main__":
    main()
