"""End-to-end: encode corpus -> build IVF-PQ -> fused search vs exact oracle.

This is the minimum end-to-end slice of SURVEY §7 (steps 2+4+5+6) at toy
scale: the ANN pipeline must approach the brute-force MaxSim oracle.
"""

import jax
import numpy as np
import pytest

from colbert_tpu.config import (
    ColbertConfig,
    IndexConfig,
    MeshConfig,
    ModelConfig,
    MultiviewConfig,
    ServeConfig,
    TokenizerConfig,
)
from colbert_tpu.indexing import CollectionEncoder, IndexBuilder, IndexStorage
from colbert_tpu.models import ColbertModel
from colbert_tpu.ranking import ColbertSearcher
from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab

TOPICS = ["apple fruit", "river water", "mountain peak", "piano music", "dragon fire",
          "silver metal", "ocean wave", "candle light", "forest tree", "marble stone"]


def corpus_texts(n=60):
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        t = TOPICS[i % len(TOPICS)]
        words = t.split() * 3 + [f"doc{i}"]
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    texts = corpus_texts()
    vocab = build_vocab(texts + TOPICS + ["what is where find"], max_size=4000)
    vp = write_vocab(vocab, tmp_path_factory.mktemp("v") / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=2, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=vp, query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(pq_m=4, partitions=8, kmeans_iters=8, pq_kmeans_iters=6, num_parts=3),
        serve=ServeConfig(nprobe=8, candidate_depth=64, topk=10, max_candidates=64),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    import jax.numpy as jnp

    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))["params"]
    index_path = str(tmp_path_factory.mktemp("index"))
    from colbert_tpu.parallel import make_mesh

    mesh = make_mesh(4, 2)
    enc = CollectionEncoder(cfg, tok, params, mesh=mesh)
    storage = enc.encode_corpus(texts, index_path, batch_size=16)
    IndexBuilder(cfg, storage).build(chunk=256)
    searcher = ColbertSearcher(cfg, tok, params, storage, mesh=mesh)
    return cfg, tok, params, storage, searcher, texts


def test_encoder_artifacts(setup):
    cfg, tok, params, storage, searcher, texts = setup
    meta = storage.read_meta()
    assert meta["num_docs"] == len(texts)
    assert meta["num_embeddings"] == len(texts) * cfg.multiview.d_view
    assert len(storage.part_ids()) == 3
    doclens = storage.read_doclens()
    assert all(d == cfg.multiview.d_view for d in doclens)
    emb = storage.load_all_embeddings()
    assert emb.shape == (meta["num_embeddings"], cfg.model.dim)
    assert emb.dtype == np.float16
    # L2-normalized rows (fp16 storage)
    np.testing.assert_allclose(np.linalg.norm(emb.astype(np.float32), axis=1), 1.0, atol=2e-2)


def test_ivf_artifacts(setup):
    cfg, tok, params, storage, searcher, texts = setup
    ivf = storage.read_ivf()
    n = storage.read_meta()["num_embeddings"]
    assert ivf["codes"].shape == (n, cfg.index.pq_m)
    assert ivf["offsets"][-1] == n
    assert sorted(ivf["row_emb"].tolist()) == list(range(n))
    assert ivf["emb2pid"].shape == (n,)
    assert ivf["emb2pid"][-1] == len(texts) - 1


def test_search_matches_oracle(setup):
    cfg, tok, params, storage, searcher, texts = setup
    queries = ["apple fruit", "ocean wave", "piano music", "forest tree"]
    oracle = searcher.search_brute_force(queries, topk=5)
    got = searcher.search(queries, topk=5, nprobe=8, depth=64)
    recall = np.mean([
        len(set(got.pids[i]) & set(oracle.pids[i])) / 5 for i in range(len(queries))
    ])
    assert recall >= 0.8, (recall, got.pids, oracle.pids)
    # top-1 score must match the oracle exactly when the top-1 pid agrees
    for i in range(len(queries)):
        if got.pids[i, 0] == oracle.pids[i, 0]:
            np.testing.assert_allclose(got.scores[i, 0], oracle.scores[i, 0], rtol=5e-2)


def test_search_batch_independence(setup):
    """Scores for a query must not depend on what else is in the batch."""
    cfg, tok, params, storage, searcher, texts = setup
    solo = searcher.search(["silver metal"], topk=5)
    batch = searcher.search(["silver metal", "dragon fire", "candle light"], topk=5)
    np.testing.assert_array_equal(solo.pids[0], batch.pids[0])
    np.testing.assert_allclose(solo.scores[0], batch.scores[0], rtol=1e-5)


def test_non_multiview_end_to_end(tmp_path):
    texts = corpus_texts(24)
    vocab = build_vocab(texts + ["find"], max_size=4000)
    vp = write_vocab(vocab, tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=False),
        tokenizer=TokenizerConfig(vocab_path=vp, query_maxlen=12, doc_maxlen=24),
        index=IndexConfig(pq_m=4, partitions=4, kmeans_iters=6, pq_kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=4, candidate_depth=32, topk=5, max_candidates=24),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    import jax.numpy as jnp

    ids = jnp.zeros((1, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 24), jnp.int32), jnp.ones((1, 24), jnp.int32))["params"]
    from colbert_tpu.parallel import make_mesh

    mesh = make_mesh(4, 2)
    enc = CollectionEncoder(cfg, tok, params, mesh=mesh)
    storage = enc.encode_corpus(texts, str(tmp_path / "idx"), batch_size=8)
    # ragged doclens: punctuation-free text -> active = all non-pad except SEP
    doclens = storage.read_doclens()
    assert len(set(doclens)) > 1 or doclens[0] <= 24
    IndexBuilder(cfg, storage).build(chunk=256)
    searcher = ColbertSearcher(cfg, tok, params, storage, mesh=mesh)
    oracle = searcher.search_brute_force(["apple fruit"], topk=3)
    got = searcher.search(["apple fruit"], topk=3, nprobe=4, depth=32)
    assert len(set(got.pids[0]) & set(oracle.pids[0])) >= 2


def test_pallas_rerank_matches_xla(tmp_path):
    """Fused Pallas rerank (interpret mode on CPU) must agree with XLA.
    Needs >=128 docs so max_candidates can be a 128-multiple (kernel tile)."""
    import dataclasses

    import jax.numpy as jnp

    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking import ColbertSearcher

    texts = corpus_texts(160)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=8, candidate_depth=64, topk=10, max_candidates=128),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))["params"]
    mesh = make_mesh(4, 2)
    storage = CollectionEncoder(cfg, tok, params, mesh=mesh).encode_corpus(
        texts, str(tmp_path / "idx"), batch_size=16)
    IndexBuilder(cfg, storage).build(chunk=256)
    cfg2 = dataclasses.replace(cfg, serve=dataclasses.replace(cfg.serve, rerank_kernel="pallas_interpret"))
    queries = ["apple fruit", "ocean wave", "piano music"]
    a = ColbertSearcher(cfg, tok, params, storage, mesh=mesh).search(queries, topk=5)
    s2 = ColbertSearcher(cfg2, tok, params, storage, mesh=mesh)
    # confirm the fused path is actually active for this config
    assert cfg2.serve.max_candidates % 128 == 0 and s2.uniform_doclen
    b = s2.search(queries, topk=5)
    np.testing.assert_array_equal(a.pids, b.pids)
    np.testing.assert_allclose(a.scores, b.scores, rtol=2e-2, atol=2e-2)


def test_packed_dedup_matches_default(setup):
    """serve.dedup_impl='packed' (int32-packed sort + quantized scores) must
    reach the same results as the exact dedup through the full pipeline."""
    import dataclasses

    cfg, tok, params, storage, searcher, texts = setup
    cfg2 = dataclasses.replace(cfg, serve=dataclasses.replace(cfg.serve, dedup_impl="packed"))
    s2 = ColbertSearcher(cfg2, tok, params, storage, mesh=searcher.mesh)
    queries = ["apple fruit", "ocean wave", "piano music"]
    a = searcher.search(queries, topk=5, nprobe=8, depth=64)
    b = s2.search(queries, topk=5, nprobe=8, depth=64)
    # candidate sets may differ at quantization ties; the exact re-rank makes
    # final scores comparable
    np.testing.assert_allclose(np.asarray(b.scores), np.asarray(a.scores), rtol=2e-2, atol=2e-2)
