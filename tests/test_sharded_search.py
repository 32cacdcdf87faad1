"""Corpus-sharded SPMD search on a 4-way data mesh must match the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_end_to_end import setup  # fixture: global index + searcher


def test_shard_index_partitions(setup):
    from colbert_tpu.ranking.sharded import shard_index

    cfg, tok, params, storage, searcher, texts = setup
    sh = shard_index(storage, 4)
    assert sh["codes"].shape[0] == 4
    # shards cover all docs exactly once
    total = int(sum(sh["num_docs"][s, 0] for s in range(4)))
    assert total == len(texts)
    bases = [int(sh["pid_base"][s, 0]) for s in range(4)]
    assert bases[0] == 0 and all(b2 > b1 for b1, b2 in zip(bases, bases[1:]))
    # per-shard emb2pid stays in local range
    for s in range(4):
        nd = int(sh["num_docs"][s, 0])
        e = sh["emb2pid"][s]
        e = e[e >= 0]
        assert e.max() < nd


def test_sharded_matches_oracle(setup, mesh8):
    from colbert_tpu.ranking.sharded import ShardedColbertSearcher

    cfg, tok, params, storage, searcher, texts = setup
    sharded = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8, rerank_dtype=jnp.float32)
    queries = ["apple fruit", "ocean wave", "piano music", "forest tree"]
    oracle = searcher.search_brute_force(queries, topk=5)
    got = sharded.search(queries, topk=5, nprobe=8, depth=64)
    assert got.pids.shape == (4, 5)
    assert ((got.pids >= -1) & (got.pids < len(texts))).all()
    recall = np.mean([
        len(set(got.pids[i]) & set(oracle.pids[i])) / 5 for i in range(len(queries))
    ])
    assert recall >= 0.8, (recall, got.pids, oracle.pids)


def test_sharded_device_path_and_service(setup, mesh8):
    """search_tokens_device returns unsynchronized device arrays equal to
    the sync path, and RetrievalService pipelines over a SHARDED searcher
    (round 4: the async serving contract is backend-agnostic)."""
    from colbert_tpu.ranking.sharded import ShardedColbertSearcher
    from colbert_tpu.serving import RetrievalService

    cfg, tok, params, storage, searcher, texts = setup
    sharded = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8, rerank_dtype=jnp.float32)
    queries = ["apple fruit", "ocean wave", "piano music", "forest tree"]
    enc = tok.encode_queries(queries)
    sync = sharded.search_tokens(enc.input_ids, enc.attention_mask, enc.active_mask, topk=5)
    ts, tp = sharded.search_tokens_device(enc.input_ids, enc.attention_mask, enc.active_mask, topk=5)
    np.testing.assert_array_equal(np.asarray(tp), sync.pids)
    np.testing.assert_allclose(np.asarray(ts), sync.scores, rtol=1e-6)

    service = RetrievalService(sharded, texts, cfg)
    rows = service.retrieve(queries, topk=5)
    assert len(rows) == 4
    got = [[pid for pid, _, _ in r] for r in rows]
    want = [[int(p) for p in sync.pids[i] if p >= 0] for i in range(4)]
    assert got == want


def test_sharded_consistent_with_single(setup, mesh8):
    """Sharded candidate generation is a superset per shard; the sharded
    merge must attain the single-chip searcher's top scores.

    Compared on SCORES, not top-1 pids: the random-init fixture model ties
    many docs within ~5e-4 (duplicate-topic corpus), so which pid lands at
    rank 0 is numerics-environment-dependent (diagnosed round 3 — on this
    host pids 51 vs 31 tie; ANN matches the brute-force oracle exactly)."""
    from colbert_tpu.ranking.sharded import ShardedColbertSearcher

    cfg, tok, params, storage, searcher, texts = setup
    sharded = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8, rerank_dtype=jnp.float32)
    queries = ["silver metal", "dragon fire"]
    a = searcher.search(queries, topk=3, nprobe=8, depth=64)
    b = sharded.search(queries, topk=3, nprobe=8, depth=64)
    assert ((b.pids >= 0) & (b.pids < len(texts))).all()
    np.testing.assert_allclose(
        np.asarray(b.scores), np.asarray(a.scores), rtol=2e-2, atol=2e-2
    )


def test_sharded_sq_codec(tmp_path, mesh8):
    """Sharded searcher with the SQ codec (quantizer is a pytree tuple)."""
    import jax
    import jax.numpy as jnp

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.ranking.sharded import ShardedColbertSearcher
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from tests.test_end_to_end import TOPICS, corpus_texts

    texts = corpus_texts(32)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=8, candidate_depth=32, topk=5, max_candidates=32),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))["params"]
    storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
        texts, str(tmp_path / "idx"), batch_size=8
    )
    IndexBuilder(cfg, storage).build(chunk=256)
    single = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
    sharded = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8, rerank_dtype=jnp.float32)
    oracle = single.search_brute_force(["apple fruit", "piano music"], topk=5)
    got = sharded.search(["apple fruit", "piano music"], topk=5, nprobe=8, depth=32)
    recall = np.mean([len(set(got.pids[i]) & set(oracle.pids[i])) / 5 for i in range(2)])
    assert recall >= 0.8, (recall, got.pids, oracle.pids)


def test_sharded_ragged_corpus(tmp_path, mesh8):
    """Non-multiview (ragged doclens) corpus through the sharded searcher."""
    import jax
    import jax.numpy as jnp

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.ranking.sharded import ShardedColbertSearcher
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from tests.test_end_to_end import TOPICS, corpus_texts

    texts = corpus_texts(28)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=False),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=12, doc_maxlen=24),
        index=IndexConfig(pq_m=4, partitions=4, kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=4, candidate_depth=32, topk=5, max_candidates=28),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 24), jnp.int32), jnp.ones((1, 24), jnp.int32))["params"]
    storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
        texts, str(tmp_path / "idx"), batch_size=8)
    assert len(set(storage.read_doclens())) >= 1
    IndexBuilder(cfg, storage).build(chunk=256)
    single = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
    sharded = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8, rerank_dtype=jnp.float32)
    assert not sharded.uniform_doclen or len(set(storage.read_doclens())) == 1
    oracle = single.search_brute_force(["apple fruit"], topk=3)
    got = sharded.search(["apple fruit"], topk=3, nprobe=4, depth=32)
    # an untrained tiny model scores many docs identically, so compare
    # SCORES (tie-safe), not pid sets
    assert ((got.pids >= 0) & (got.pids < len(texts))).all()
    np.testing.assert_allclose(got.scores[0, 0], oracle.scores[0, 0], rtol=5e-2)


def test_sharded_uses_fused_kernels_and_matches_single(tmp_path, mesh8):
    """VERDICT item 5: the sharded searcher runs the SAME fast path as the
    single-chip searcher (batched probe + Pallas fused rerank, interpret mode
    on CPU) and agrees with it modulo the all-gather merge."""
    import jax
    import jax.numpy as jnp

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.ranking.sharded import ShardedColbertSearcher
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from tests.test_end_to_end import TOPICS, corpus_texts

    texts = corpus_texts(160)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
        # max_candidates=128: the fused rerank requires a multiple of 128
        serve=ServeConfig(nprobe=8, candidate_depth=64, topk=5, max_candidates=128,
                          rerank_kernel="pallas_interpret", probe_impl="batched"),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))["params"]
    storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
        texts, str(tmp_path / "idx"), batch_size=8
    )
    IndexBuilder(cfg, storage).build(chunk=256)
    single = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
    sharded = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8, rerank_dtype=jnp.bfloat16)
    queries = ["apple fruit", "piano music"]
    a = single.search(queries, topk=5)
    b = sharded.search(queries, topk=5)
    # same kernels both sides: the top-5 score vectors must agree to bf16
    # tolerance (the untrained tiny model ties many duplicate-topic docs, so
    # pid sets are ambiguous — scores are the tie-safe comparison)
    np.testing.assert_allclose(b.scores, a.scores, rtol=2e-2, atol=2e-2)
    assert ((b.pids >= 0) & (b.pids < len(texts))).all()
