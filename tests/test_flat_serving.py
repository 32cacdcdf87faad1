"""Flat (exact brute-force) serving mode: serve.mode='flat'.

No IVF index is built or read — the searcher serves straight from the
encoded parts; results must equal the fp32 all-pairs oracle (recall 1.0 by
construction)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.config import (
    ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
    ServeConfig, TokenizerConfig,
)
from colbert_tpu.indexing import CollectionEncoder
from colbert_tpu.models import ColbertModel
from colbert_tpu.ranking import ColbertSearcher
from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
from tests.test_end_to_end import TOPICS, corpus_texts


def _encode_only(tmp_path, mesh8, texts, multiview=True, **serve_kw):
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=96, dim=128,
                          dtype="float32"),
        multiview=MultiviewConfig(enabled=multiview, q_view=4, d_view=8),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=48),
        index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
        serve=ServeConfig(mode="flat", topk=5, **serve_kw),
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
    # NOTE: no IndexBuilder.build() — flat mode needs no IVF index
    return cfg, tok, params, storage


QUERIES = ["apple fruit", "piano music", "river water"]


class TestFlatServing:
    def test_exact_match_with_oracle(self, tmp_path, mesh8):
        texts = corpus_texts(120)
        cfg, tok, params, storage = _encode_only(tmp_path, mesh8, texts)
        s = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert s.flat_dv == 8
        got = s.search(QUERIES, topk=5)
        want = s.search_brute_force(QUERIES, topk=5)
        # same docs in the same order (bf16 table vs fp32 oracle: tiny score
        # fuzz can swap near-ties, so compare scores, not pid identity)
        np.testing.assert_allclose(got.scores, want.scores, rtol=2e-2, atol=2e-2)
        top1_match = (got.pids[:, 0] == want.pids[:, 0]).mean()
        assert top1_match == 1.0
        assert ((got.pids >= 0) & (got.pids < len(texts))).all()

    def test_int8_table_close_to_oracle(self, tmp_path, mesh8):
        texts = corpus_texts(80)
        cfg, tok, params, storage = _encode_only(
            tmp_path, mesh8, texts, rerank_dtype="int8"
        )
        s = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert s.emb_table.dtype == jnp.int8
        got = s.search(QUERIES, topk=5)
        want = s.search_brute_force(QUERIES, topk=5)
        np.testing.assert_allclose(got.scores, want.scores, rtol=3e-2, atol=3e-2)

    def test_ragged_corpus(self, tmp_path, mesh8):
        texts = corpus_texts(60)
        cfg, tok, params, storage = _encode_only(
            tmp_path, mesh8, texts, multiview=False
        )
        s = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        doclens = np.asarray(storage.read_doclens())
        assert s.flat_dv == int(doclens.max())
        got = s.search(QUERIES, topk=5)
        want = s.search_brute_force(QUERIES, topk=5)
        np.testing.assert_allclose(got.scores, want.scores, rtol=2e-2, atol=2e-2)

    def test_device_async_path(self, tmp_path, mesh8):
        texts = corpus_texts(40)
        cfg, tok, params, storage = _encode_only(tmp_path, mesh8, texts)
        s = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        enc = tok.encode_queries(QUERIES)
        ts, tp = s.search_tokens_device(enc.input_ids, enc.attention_mask, enc.active_mask)
        assert isinstance(ts, jax.Array) and isinstance(tp, jax.Array)
        ref = s.search(QUERIES, topk=5)
        np.testing.assert_allclose(np.asarray(ts), ref.scores, rtol=1e-5)

    def test_config_rejects_unknown_mode(self):
        with pytest.raises(ValueError, match="serve.mode"):
            ColbertConfig(serve=ServeConfig(mode="warp"))


class TestShardedFlat:
    def test_sharded_matches_single(self, tmp_path, mesh8):
        """Corpus-sharded flat scan == single-chip flat scan (both exact)."""
        from colbert_tpu.ranking.sharded import ShardedColbertSearcher

        texts = corpus_texts(100)
        cfg, tok, params, storage = _encode_only(tmp_path, mesh8, texts)
        single = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        shard = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert shard.flat_dv == single.flat_dv
        a = single.search(QUERIES, topk=5)
        b = shard.search(QUERIES, topk=5)
        np.testing.assert_allclose(b.scores, a.scores, rtol=1e-4, atol=1e-4)
        assert (b.pids[:, 0] == a.pids[:, 0]).all()

    def test_sharded_int8(self, tmp_path, mesh8):
        from colbert_tpu.ranking.sharded import ShardedColbertSearcher

        texts = corpus_texts(64)
        cfg, tok, params, storage = _encode_only(
            tmp_path, mesh8, texts, rerank_dtype="int8"
        )
        single = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        shard = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        a = single.search(QUERIES, topk=5)
        b = shard.search(QUERIES, topk=5)
        # same global quantization scale -> identical scores modulo bf16 fuzz
        np.testing.assert_allclose(b.scores, a.scores, rtol=1e-3, atol=1e-3)
