"""Ragged-corpus fast rerank: stride-bucketed zero-padded tables + the
fused Pallas kernel with per-bucket candidate routing (VERDICT r2 item 8;
the reference's percentile stride buckets, colbert_ranker.py:36-41)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.config import (
    ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
    ServeConfig, TokenizerConfig,
)
from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
from colbert_tpu.models import ColbertModel
from colbert_tpu.ops.rerank_pallas import build_ragged_buckets, stride_buckets
from colbert_tpu.ranking import ColbertSearcher
from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
from tests.test_end_to_end import TOPICS


def ragged_corpus_texts(n=160):
    """Clustered synthetic corpus with VARYING doc lengths (1x-12x topic
    repeats) so doclens span several stride buckets."""
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        t = TOPICS[i % len(TOPICS)]
        words = t.split() * int(rng.integers(1, 13)) + [f"doc{i}"]
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


class TestBuckets:
    def test_stride_schedule(self):
        lens = [3, 10, 20, 33, 64, 100, 120]
        s = stride_buckets(lens, row_multiple=16)
        assert s == sorted(set(s))
        assert all(x % 16 == 0 for x in s)
        assert s[-1] >= max(lens)

    def test_build_scatters_rows(self):
        rng = np.random.default_rng(0)
        doclens = np.array([3, 17, 5, 16, 30])
        dim = 8
        emb = rng.normal(size=(int(doclens.sum()), dim)).astype(np.float32)
        strides = stride_buckets(doclens, row_multiple=16)  # [16, 32]
        tables, b_of, s_of = build_ragged_buckets(emb, doclens, strides)
        offs = np.concatenate([[0], np.cumsum(doclens)])
        for p, n in enumerate(doclens):
            s = strides[b_of[p]]
            blk = tables[b_of[p]][s_of[p] * s : s_of[p] * s + s]
            np.testing.assert_array_equal(blk[:n], emb[offs[p] : offs[p] + n])
            assert (blk[n:] == 0).all()  # zero pad = mask-zero MaxSim semantics

    def test_rejects_overlong(self):
        with pytest.raises(ValueError, match="stride"):
            build_ragged_buckets(np.zeros((40, 4), np.float32), [40], [16])


def _build_ragged(tmp_path, mesh8, texts, **serve_kw):
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=96, dim=128,
                          dtype="float32"),
        multiview=MultiviewConfig(enabled=False),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=48),
        index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=8, candidate_depth=64, topk=5, max_candidates=128,
                          **serve_kw),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 48), jnp.int32), jnp.ones((1, 48), jnp.int32))["params"]
    storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
        texts, str(tmp_path / "idx"), batch_size=8
    )
    IndexBuilder(cfg, storage).build(chunk=256)
    return cfg, tok, params, storage


class TestRaggedSearcher:
    def test_bucketed_pallas_matches_xla(self, tmp_path, mesh8):
        texts = ragged_corpus_texts(160)
        cfg, tok, params, storage = _build_ragged(
            tmp_path, mesh8, texts, rerank_kernel="pallas_interpret",
        )
        doclens = np.asarray(storage.read_doclens())
        assert len(set(doclens.tolist())) > 1, "corpus must be ragged for this test"
        s_fast = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert s_fast.ragged_strides is not None
        cfg_xla = dataclasses.replace(
            cfg, serve=dataclasses.replace(cfg.serve, rerank_kernel="xla",
                                           rerank_dtype="float32")
        )
        s_xla = ColbertSearcher(cfg_xla, tok, params, storage, mesh=mesh8)
        assert s_xla.ragged_strides is None

        queries = ["apple fruit", "piano music", "river water"]
        a = s_xla.search(queries, topk=5)
        b = s_fast.search(queries, topk=5)
        # bf16 bucket tables vs fp32 flat: small score tolerance
        np.testing.assert_allclose(b.scores, a.scores, rtol=2e-2, atol=2e-2)

    def test_bucketed_int8_matches_xla(self, tmp_path, mesh8):
        texts = ragged_corpus_texts(120)
        cfg, tok, params, storage = _build_ragged(
            tmp_path, mesh8, texts,
            rerank_kernel="pallas_interpret", rerank_dtype="int8",
        )
        s8 = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert s8.ragged_strides is not None and s8.packed_int8
        cfg_xla = dataclasses.replace(
            cfg, serve=dataclasses.replace(cfg.serve, rerank_kernel="xla",
                                           rerank_dtype="float32")
        )
        s_xla = ColbertSearcher(cfg_xla, tok, params, storage, mesh=mesh8)
        queries = ["apple fruit", "piano music"]
        a = s_xla.search(queries, topk=5)
        b = s8.search(queries, topk=5)
        np.testing.assert_allclose(b.scores, a.scores, rtol=4e-2, atol=4e-2)
        # oracle works from the retained host copy
        o = s8.search_brute_force(["apple fruit"], topk=5)
        np.testing.assert_allclose(o.scores[0, 0], a.scores[0, 0], rtol=4e-2, atol=4e-2)
