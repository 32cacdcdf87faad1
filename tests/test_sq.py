import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.sq import sq_encode, sq_query, sq_score, sq_train


def test_sq_roundtrip_ip_approximation(rng):
    n, d, out = 2000, 64, 32
    # anisotropic data: most energy in a 32-dim subspace (like BERT embeddings)
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0].astype(np.float32)
    z = rng.normal(size=(n, d)).astype(np.float32) * np.concatenate(
        [np.full(out, 1.0), np.full(d - out, 0.05)]
    )[None, :]
    x = z @ basis.T
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    proj, scales = sq_train(jnp.asarray(x), out)
    codes = sq_encode(jnp.asarray(x), proj, scales, chunk=512)
    assert codes.dtype == jnp.int8

    q = x[:5] + 0.01 * rng.normal(size=(5, d)).astype(np.float32)
    qs = sq_query(jnp.asarray(q), proj, scales)
    approx = np.asarray(sq_score(qs, codes))
    exact = q @ x.T
    # candidate selection quality: top-10 by approx overlaps top-10 exact
    for i in range(5):
        a = set(np.argsort(-approx[i])[:10])
        e = set(np.argsort(-exact[i])[:10])
        assert len(a & e) >= 7, (i, a, e)


def test_sq_end_to_end(tmp_path):
    """Full pipeline with codec='sq' must match the oracle like PQ does."""
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from tests.test_end_to_end import TOPICS, corpus_texts

    texts = corpus_texts(40)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=2, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=vp, query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=6, num_parts=2),
        serve=ServeConfig(nprobe=8, candidate_depth=64, topk=5, max_candidates=40),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))["params"]
    mesh = make_mesh(4, 2)
    storage = CollectionEncoder(cfg, tok, params, mesh=mesh).encode_corpus(
        texts, str(tmp_path / "idx"), batch_size=8
    )
    IndexBuilder(cfg, storage).build(chunk=256)
    assert storage.read_meta()["codec"] == "sq"
    assert storage.read_meta()["bytes_per_vector"] == 8
    searcher = ColbertSearcher(cfg, tok, params, storage, mesh=mesh)
    assert searcher.codec == "sq"
    queries = ["apple fruit", "ocean wave", "piano music"]
    oracle = searcher.search_brute_force(queries, topk=5)
    got = searcher.search(queries, topk=5, nprobe=8, depth=64)
    recall = np.mean([
        len(set(got.pids[i]) & set(oracle.pids[i])) / 5 for i in range(len(queries))
    ])
    assert recall >= 0.8, (recall, got.pids, oracle.pids)
