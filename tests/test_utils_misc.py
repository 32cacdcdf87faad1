import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.kmeans import kmeans
from colbert_tpu.training.checkpoint import CheckpointManager
from colbert_tpu.utils.io import dump_jsonl, load_json, load_jsonl
from colbert_tpu.utils.logging import Timers, print_message


def test_kmeans_more_clusters_than_points(rng):
    x = rng.normal(size=(5, 8)).astype(np.float32)
    cents, assign = kmeans(jnp.asarray(x), 16, iters=3, chunk=8)
    assert cents.shape == (16, 8)
    assert np.asarray(assign).shape == (5,)
    assert np.isfinite(np.asarray(cents)).all()


def test_checkpoint_gc_and_metadata(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    tree = {"w": jnp.ones((3,)), "step": 0}
    for s in (1, 2, 3):
        mgr.save(s, {**tree, "step": s}, metadata={"metrics": {"loss": float(s)}})
    assert mgr.all_steps() == [2, 3]  # keep=2 garbage-collected step 1
    assert mgr.latest_step() == 3
    restored = mgr.restore(3, tree)
    assert int(restored["step"]) == 3
    assert mgr.load_metadata(3)["metrics"]["loss"] == 3.0


def test_timers_and_print():
    t = Timers()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        pass
    d = t.as_dict()
    assert d["a"]["count"] == 2 and d["a"]["total_s"] >= 0.01
    line = print_message("hello", "world", condition=False)
    assert line.endswith("hello world")


def test_jsonl_roundtrip(tmp_path):
    rows = [{"a": 1}, {"b": "中文"}]
    dump_jsonl(rows, tmp_path / "x.jsonl")
    assert load_jsonl(tmp_path / "x.jsonl") == rows
    assert load_json(tmp_path / "x.jsonl", line=True) == rows


def test_mesh_bounds():
    from colbert_tpu.parallel import local_shard_bounds

    bounds = [local_shard_bounds(10, s, 4) for s in range(4)]
    assert bounds == [(0, 3), (3, 6), (6, 8), (8, 10)]
    assert bounds[0][0] == 0 and bounds[-1][1] == 10


def test_config_coerces_yaml_numeric_strings():
    """YAML 1.1 parses '1e-3' (no dot) as a string; the loader must coerce
    numeric strings for float/int fields instead of surfacing a cryptic
    optax TypeError mid-train."""
    from colbert_tpu.config import ColbertConfig

    c = ColbertConfig.from_dict(
        {"train": {"learning_rate": "1e-3", "num_epochs": "5"},
         "serve": {"nprobe": "64"}}
    )
    assert c.train.learning_rate == 1e-3
    assert c.train.num_epochs == 5
    assert c.serve.nprobe == 64
