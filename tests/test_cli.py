"""Five-stage pipeline through the CLI entry points (in-process)."""

import json

import numpy as np
import pytest

from colbert_tpu.cli import main
from colbert_tpu.tokenization import build_vocab, write_vocab
from colbert_tpu.utils.io import dump_json, load_json
from tests.test_end_to_end import TOPICS, corpus_texts


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    work = tmp_path_factory.mktemp("cliwork")
    texts = corpus_texts(24)
    vp = write_vocab(build_vocab(texts + TOPICS + ["find"], max_size=4000), work / "vocab.txt")
    rng = np.random.default_rng(0)
    examples = []
    for i, t in enumerate(texts):
        topic = TOPICS[i % len(TOPICS)]
        negs = [texts[j] for j in rng.permutation(len(texts)) if TOPICS[j % len(TOPICS)] != topic]
        examples.append({"question": f"find {topic}", "positive_ctxs": [t], "hard_negative_ctxs": negs[:18]})
    dump_json(examples, work / "train.json")
    dump_json(texts, work / "corpus.json")
    cfg = {
        "model": {"vocab_size": 4096, "hidden_size": 32, "num_layers": 1, "num_heads": 2,
                  "intermediate_size": 64, "max_position_embeddings": 64, "dim": 16, "dtype": "float32"},
        "multiview": {"enabled": True, "q_view": 4, "d_view": 4},
        "tokenizer": {"vocab_path": str(vp), "query_maxlen": 16, "doc_maxlen": 24},
        "train": {"learning_rate": 1e-3, "per_device_batch_size": 1, "num_epochs": 1,
                  "eval_num_positives": 1, "eval_num_negatives": 3,
                  "checkpoint_dir": str(work / "ckpt"), "log_every": 4, "seed": 0},
        "index": {"index_path": str(work / "index"), "codec": "sq", "sq_dim": 8,
                  "partitions": 8, "kmeans_iters": 5, "num_parts": 2},
        "serve": {"nprobe": 8, "candidate_depth": 32, "topk": 5, "max_candidates": 24,
                  "query_batch_size": 4},
        "mesh": {"data": 4, "model": 2},
    }
    import yaml

    with open(work / "conf.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return work


def test_cli_pipeline(workdir, capsys):
    conf = str(workdir / "conf.yaml")
    main(["train", "--config", conf, "--train-data", str(workdir / "train.json")])
    main(["encode", "--config", conf, "--corpus", str(workdir / "corpus.json")])
    main(["build-index", "--config", conf])
    eval_data = [
        {"question": t["question"], "positive_ctxs": t["positive_ctxs"]}
        for t in load_json(workdir / "train.json")[:6]
    ]
    dump_json(eval_data, workdir / "eval.json")
    main([
        "evaluate", "--config", conf, "--eval-data", str(workdir / "eval.json"),
        "--corpus", str(workdir / "corpus.json"), "--topk", "5",
        "--out", str(workdir / "metrics.json"),
    ])
    metrics = load_json(workdir / "metrics.json")
    assert "mrr@10" in metrics and "recall@50" in metrics
    main([
        "mine", "--config", conf, "--eval-data", str(workdir / "eval.json"),
        "--corpus", str(workdir / "corpus.json"), "--out", str(workdir / "mined.json"),
        "--topk", "5",
    ])
    mined = load_json(workdir / "mined.json")
    assert len(mined) == 6 and "hard_negative_ctxs" in mined[0]


def test_cli_override_rejects_unknown(workdir):
    with pytest.raises(ValueError):
        main(["build-index", "--config", str(workdir / "conf.yaml"), "--set", "nope.key=1"])
