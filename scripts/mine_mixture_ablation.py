"""Mining-mixture ablation (VERDICT r4 item 9a): pure-mined negatives
(``--keep-old 0``) vs the reference's 10-old + 50-fresh mixture
(``proj_utils/dureader_utils.py:76-83``), on a completed two_stage_e2e
workdir.  Reuses the base checkpoint/index/data; trains one extra retriever
generation on the pure-mined set and evaluates it through the same CLI.

Usage: python scripts/mine_mixture_ablation.py --workdir /tmp/pydocs_r5
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    wd = args.workdir

    from colbert_tpu.cli import main as cli

    conf = os.path.join(wd, "conf.yaml")   # base generation (ckpt/, index/)
    train_json = os.path.join(wd, "train.json")
    dev_json = os.path.join(wd, "dev.json")
    corpus_json = os.path.join(wd, "corpus.json")
    pure_json = os.path.join(wd, "train_iter1_pure.json")
    for p in (conf, train_json, os.path.join(wd, "ckpt")):
        if not os.path.exists(p):
            raise FileNotFoundError(f"{p} missing — run two_stage_e2e first")

    # a third generation's paths: conf2 with ckpt2/index2 -> ckpt_pure/index_pure
    conf_pure = os.path.join(wd, "conf_pure.yaml")
    txt = open(os.path.join(wd, "conf2.yaml")).read()
    txt = txt.replace("ckpt2", "ckpt_pure").replace("index2", "index_pure")
    open(conf_pure, "w").write(txt)

    sets = ["--set", f"train.num_epochs={args.epochs}"] if args.epochs else []
    results_path = os.path.join(wd, "table.json")
    results = json.load(open(results_path)) if os.path.exists(results_path) else {}

    def step(name, fn):
        t0 = time.time()
        fn()
        print(f"{name} done in {time.time() - t0:.0f}s", flush=True)

    if not os.path.exists(pure_json):
        step("mine-pure", lambda: cli(
            ["mine", "--config", conf, "--eval-data", train_json,
             "--corpus", corpus_json, "--out", pure_json,
             "--topk", "50", "--keep-old", "0"]))
    dev_sets = ["--dev-data", dev_json]
    step("retrain-pure", lambda: cli(
        ["train", "--config", conf_pure, "--train-data", pure_json] + dev_sets + sets))
    step("encode-pure", lambda: cli(
        ["encode", "--config", conf_pure, "--corpus", corpus_json]))
    step("build-index-pure", lambda: cli(["build-index", "--config", conf_pure]))
    out = os.path.join(wd, "metrics_pure_mined.json")
    step("eval-pure", lambda: cli(
        ["evaluate", "--config", conf_pure, "--eval-data", dev_json,
         "--corpus", corpus_json, "--topk", "100", "--out", out]))
    results["retriever+pure_mining"] = json.load(open(out))
    json.dump(results, open(results_path, "w"), indent=2)
    print("[retriever+pure_mining]", results["retriever+pure_mining"], flush=True)


if __name__ == "__main__":
    main()
