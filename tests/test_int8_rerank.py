"""int8 lane-packed rerank table: the beyond-HBM serving mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.rerank_pallas import (
    maxsim_rerank_uniform_packed,
    pack_int8_table,
    quantize_emb_table,
)


class TestQuantize:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(64, 256)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q8, scale = quantize_emb_table(emb, chunk=17)
        rec = q8.astype(np.float32) / scale
        err = np.abs(rec - emb).max()
        assert err <= (1.0 / scale).max()  # within one quantization step
        assert q8.dtype == np.int8

    def test_pack_layout(self):
        rng = np.random.default_rng(1)
        dv, dim = 16, 256
        nk = dim // 128
        emb = rng.integers(-127, 128, size=(3 * dv, dim)).astype(np.int8)
        packed = pack_int8_table(emb, dv)
        assert packed.shape == (3 * nk * dv, 128)
        # doc 1, row 2, dims [128:256) live at packed[doc*nk*dv + 1*dv + 2]
        np.testing.assert_array_equal(packed[1 * nk * dv + dv + 2], emb[dv + 2, 128:256])

    def test_pack_rejects_misaligned(self):
        with pytest.raises(ValueError):
            pack_int8_table(np.zeros((8, 128), np.int8), dv=8)  # nk*dv = 8 < 32


class TestPackedKernel:
    def test_matches_dequantized_maxsim(self):
        rng = np.random.default_rng(2)
        dv, dim, qv = 16, 256, 4
        num_docs, B, C = 40, 3, 128
        nk = dim // 128
        emb = rng.normal(size=(num_docs * dv, dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q8, scale = quantize_emb_table(emb)
        packed = jnp.asarray(pack_int8_table(q8, dv))
        Qm = rng.normal(size=(B, qv, dim)).astype(np.float32)
        cand = np.stack([rng.choice(num_docs, C, replace=False).astype(np.int32) if C <= num_docs
                         else np.arange(C, dtype=np.int32) for _ in range(B)]) if C <= num_docs else None
        # C > num_docs: tile + pad with -1
        cand = np.full((B, C), -1, np.int32)
        for b in range(B):
            cand[b, :num_docs] = rng.permutation(num_docs)

        got = np.asarray(maxsim_rerank_uniform_packed(
            jnp.asarray(cand), jnp.asarray(Qm) * jnp.asarray(1.0 / scale), packed,
            dv=dv, nk=nk, interpret=True,
        ))
        # reference: exact MaxSim over the DEQUANTIZED vectors
        deq = q8.astype(np.float32) / scale
        for b in range(B):
            for c in range(num_docs):
                pid = cand[b, c]
                sim = Qm[b] @ deq[pid * dv : (pid + 1) * dv].T  # (qv, dv)
                expect = sim.max(axis=1).sum()
                np.testing.assert_allclose(got[b, c], expect, rtol=1e-4, atol=1e-3)
            assert not np.isfinite(got[b, num_docs:]).any()


class TestSearcherInt8:
    def test_end_to_end_matches_bf16(self, tmp_path, mesh8):
        """Full searcher with rerank_dtype=int8 reaches the same top results
        as the bf16 table on a clustered synthetic corpus."""
        import dataclasses

        from colbert_tpu.config import (
            ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
            ServeConfig, TokenizerConfig,
        )
        from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
        from colbert_tpu.models import ColbertModel
        from colbert_tpu.ranking import ColbertSearcher
        from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
        from tests.test_end_to_end import TOPICS, corpus_texts

        texts = corpus_texts(160)
        vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
        # dim 128 -> nk*dv = 1*16: pad dv via d_view=32 so nk*dv = 32
        cfg = ColbertConfig(
            model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                              intermediate_size=64, max_position_embeddings=96, dim=128, dtype="float32"),
            multiview=MultiviewConfig(enabled=True, q_view=4, d_view=32),
            tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=64),
            index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
            serve=ServeConfig(nprobe=8, candidate_depth=64, topk=5, max_candidates=128,
                              rerank_kernel="pallas_interpret", rerank_dtype="int8"),
            mesh=MeshConfig(data=4, model=2),
        )
        tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
        model = ColbertModel(cfg.model, cfg.multiview)
        ids = jnp.zeros((1, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                            jnp.zeros((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32))["params"]
        from colbert_tpu.parallel import make_mesh

        storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
            texts, str(tmp_path / "idx"), batch_size=8
        )
        IndexBuilder(cfg, storage).build(chunk=256)
        s_int8 = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert s_int8.packed_int8
        cfg_bf16 = dataclasses.replace(cfg, serve=dataclasses.replace(cfg.serve, rerank_dtype="bfloat16"))
        s_bf16 = ColbertSearcher(cfg_bf16, tok, params, storage, mesh=mesh8)

        queries = ["apple fruit", "piano music"]
        a = s_bf16.search(queries, topk=5)
        b = s_int8.search(queries, topk=5)
        np.testing.assert_allclose(b.scores, a.scores, rtol=3e-2, atol=3e-2)
        # brute force works on the packed table too
        o = s_int8.search_brute_force(queries, topk=5)
        np.testing.assert_allclose(o.scores[:, 0], a.scores[:, 0], rtol=3e-2, atol=3e-2)

    def test_sharded_int8_matches_sharded_bf16(self, tmp_path, mesh8):
        """VERDICT r2 item 3: the int8 beyond-HBM table composes with the
        corpus-sharded searcher — sharded-int8 results == sharded-bf16
        modulo quantization (one GLOBAL scale so shard scores merge)."""
        import dataclasses

        from colbert_tpu.config import (
            ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
            ServeConfig, TokenizerConfig,
        )
        from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
        from colbert_tpu.models import ColbertModel
        from colbert_tpu.ranking.sharded import ShardedColbertSearcher
        from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
        from tests.test_end_to_end import TOPICS, corpus_texts

        texts = corpus_texts(160)
        vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
        cfg = ColbertConfig(
            model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                              intermediate_size=64, max_position_embeddings=96, dim=128, dtype="float32"),
            multiview=MultiviewConfig(enabled=True, q_view=4, d_view=32),
            tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=64),
            index=IndexConfig(codec="sq", sq_dim=8, partitions=8, kmeans_iters=5, num_parts=2),
            serve=ServeConfig(nprobe=8, candidate_depth=64, topk=5, max_candidates=128,
                              rerank_kernel="pallas_interpret", rerank_dtype="int8"),
            mesh=MeshConfig(data=4, model=2),
        )
        tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
        model = ColbertModel(cfg.model, cfg.multiview)
        ids = jnp.zeros((1, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                            jnp.zeros((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32))["params"]
        storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
            texts, str(tmp_path / "idx"), batch_size=8
        )
        IndexBuilder(cfg, storage).build(chunk=256)
        sh_int8 = ShardedColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
        assert sh_int8.packed_int8  # dtype resolved from cfg.serve.rerank_dtype
        cfg_bf16 = dataclasses.replace(cfg, serve=dataclasses.replace(cfg.serve, rerank_dtype="bfloat16"))
        sh_bf16 = ShardedColbertSearcher(cfg_bf16, tok, params, storage, mesh=mesh8)

        queries = ["apple fruit", "piano music"]
        a = sh_bf16.search(queries, topk=5)
        b = sh_int8.search(queries, topk=5)
        np.testing.assert_allclose(b.scores, a.scores, rtol=3e-2, atol=3e-2)
        assert ((b.pids >= 0) & (b.pids < len(texts))).all()

    def test_int8_rejects_ragged(self, tmp_path, mesh8):
        from colbert_tpu.config import (
            ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
            ServeConfig, TokenizerConfig,
        )
        from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
        from colbert_tpu.models import ColbertModel
        from colbert_tpu.ranking import ColbertSearcher
        from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
        from tests.test_end_to_end import TOPICS, corpus_texts

        texts = corpus_texts(24)
        vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
        cfg = ColbertConfig(
            model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                              intermediate_size=64, max_position_embeddings=64, dim=128, dtype="float32"),
            multiview=MultiviewConfig(enabled=False),
            tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=12, doc_maxlen=24),
            index=IndexConfig(codec="sq", sq_dim=8, partitions=4, kmeans_iters=3, num_parts=2),
            serve=ServeConfig(nprobe=4, candidate_depth=16, topk=3, max_candidates=16,
                              rerank_dtype="int8"),
            mesh=MeshConfig(data=4, model=2),
        )
        tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
        model = ColbertModel(cfg.model, cfg.multiview)
        ids = jnp.zeros((1, 12), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), ids, jnp.ones_like(ids),
                            jnp.zeros((1, 24), jnp.int32), jnp.ones((1, 24), jnp.int32))["params"]
        storage = CollectionEncoder(cfg, tok, params, mesh=mesh8).encode_corpus(
            texts, str(tmp_path / "idx"), batch_size=8
        )
        IndexBuilder(cfg, storage).build(chunk=256)
        if len(set(storage.read_doclens())) > 1:
            with pytest.raises(ValueError, match="uniform-doclen"):
                ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
