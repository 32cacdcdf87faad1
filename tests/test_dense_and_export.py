import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_end_to_end import TOPICS, corpus_texts


def test_dense_retriever(tmp_path):
    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig, TokenizerConfig,
    )
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking.dense import DenseRetriever
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab

    texts = corpus_texts(20)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=False),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=12, doc_maxlen=24),
        index=IndexConfig(pq_m=4),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 24), jnp.int32), jnp.ones((1, 24), jnp.int32))["params"]
    r = DenseRetriever(cfg, tok, params, mesh=make_mesh(4, 2))
    r.build_index(texts, batch=8)
    scores, ids_out = r.search(["apple fruit", "ocean wave"], topk=5)
    assert scores.shape == (2, 5) and ids_out.shape == (2, 5)
    # exactness: a doc's own (unit-norm) pooled vector scores 1.0, and that
    # is the top score (an untrained tiny encoder can produce near-ties, so
    # assert on scores, not index identity)
    v = r._encode([texts[3]], is_query=False)
    s2, i2 = r.index.search(v, topk=3)
    assert s2[0, 0] == pytest.approx(1.0, abs=1e-3)
    full_s, full_i = r.index.search(v, topk=len(texts))
    rank_of_3 = list(full_i[0]).index(3)
    assert full_s[0, rank_of_3] == pytest.approx(s2[0, 0], abs=1e-3)
    # persistence roundtrip
    r.save_index(str(tmp_path / "flat"))
    r2 = DenseRetriever(cfg, tok, params, mesh=make_mesh(4, 2))
    r2.load_index(str(tmp_path / "flat"))
    s3, i3 = r2.index.search(v, topk=3)
    np.testing.assert_array_equal(i2, i3)


def test_torch_export_roundtrip():
    torch = pytest.importorskip("torch")
    from colbert_tpu.config import ModelConfig, MultiviewConfig
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.models.convert import colbert_params_from_torch, colbert_params_to_torch_state_dict

    cfg = ModelConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                      intermediate_size=32, max_position_embeddings=32, dim=8, dtype="float32")
    model = ColbertModel(cfg, MultiviewConfig(enabled=False))
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids), ids, jnp.ones_like(ids))["params"]
    sd = colbert_params_to_torch_state_dict(jax.tree.map(np.asarray, params), cfg)
    assert "model.encoder.layer.1.attention.self.query.weight" in sd
    assert "linear.weight" in sd
    back = colbert_params_from_torch({k: torch.tensor(v) for k, v in sd.items()}, cfg)
    for a, b in zip(jax.tree.leaves(params["bert"]), jax.tree.leaves(back["bert"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["linear"]["kernel"]), back["linear"]["kernel"], atol=1e-6
    )
