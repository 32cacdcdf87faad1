import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.ivf import dedup_pids_by_score, ivf_probe_adc, sort_by_list
from colbert_tpu.ops.kmeans import assign_clusters, kmeans
from colbert_tpu.ops.pq import adc_lut, adc_score, pq_decode, pq_encode, pq_train


def blobs(rng, n, k, d, scale=0.05):
    centers = rng.normal(size=(k, d)).astype(np.float32)
    a = rng.integers(0, k, size=n)
    return (centers[a] + scale * rng.normal(size=(n, d))).astype(np.float32), centers, a


def test_kmeans_recovers_blobs(rng):
    x, centers, true_a = blobs(rng, 2000, 8, 16)
    cents, assign = kmeans(jnp.asarray(x), 8, iters=15, key=jax.random.PRNGKey(1), chunk=512)
    cents = np.asarray(cents)
    # every true center has a learned centroid nearby
    d = np.linalg.norm(centers[:, None] - cents[None], axis=-1).min(axis=1)
    assert d.max() < 0.2
    # assignment consistent with nearest centroid
    a2 = np.asarray(assign_clusters(jnp.asarray(x), jnp.asarray(cents), chunk=512))
    np.testing.assert_array_equal(np.asarray(assign), a2)


def test_kmeans_reduces_error(rng):
    x = rng.normal(size=(1500, 24)).astype(np.float32)
    cents, assign = kmeans(jnp.asarray(x), 16, iters=10, chunk=512)
    err = np.linalg.norm(x - np.asarray(cents)[np.asarray(assign)], axis=1).mean()
    cents0 = x[:16]
    a0 = np.asarray(assign_clusters(jnp.asarray(x), jnp.asarray(cents0), chunk=512))
    err0 = np.linalg.norm(x - cents0[a0], axis=1).mean()
    assert err < err0


def test_pq_roundtrip_and_adc(rng):
    n, d, m = 1200, 32, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    books = pq_train(jnp.asarray(x), m, 256, iters=8, chunk=512)
    codes = pq_encode(jnp.asarray(x), books, chunk=512)
    recon = np.asarray(pq_decode(codes, books))
    err = np.linalg.norm(recon - x, axis=1).mean()
    assert err < 0.7  # much better than random (norm-1 vectors)

    q = rng.normal(size=(3, d)).astype(np.float32)
    lut = adc_lut(jnp.asarray(q), books)
    s = np.asarray(adc_score(lut, codes[:50]))
    want = q @ recon[:50].T
    np.testing.assert_allclose(s, want, rtol=1e-4, atol=1e-4)


def test_sort_by_list():
    a = np.asarray([2, 0, 1, 0, 2, 2], np.int32)
    perm, offsets = sort_by_list(a, 4)
    np.testing.assert_array_equal(a[perm], [0, 0, 1, 2, 2, 2])
    np.testing.assert_array_equal(offsets, [0, 2, 3, 6, 6])


def _brute_adc_topk(q, books, codes, depth):
    lut = adc_lut(jnp.asarray(q), books)
    s = np.asarray(adc_score(lut, jnp.asarray(codes)))
    idx = np.argsort(-s, axis=1)[:, :depth]
    return np.take_along_axis(s, idx, axis=1), idx


def test_ivf_probe_exact_when_probing_all(rng):
    n, d, K, m = 3000, 32, 16, 8
    x, _, _ = blobs(rng, n, K, d, scale=0.2)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cents, assign = kmeans(jnp.asarray(x), K, iters=8, chunk=512)
    books = pq_train(jnp.asarray(x), m, 256, iters=6, chunk=512)
    codes = np.asarray(pq_encode(jnp.asarray(x), books, chunk=512))
    perm, offsets = sort_by_list(np.asarray(assign), K)
    codes_sorted = codes[perm]
    cap = int((offsets[1:] - offsets[:-1]).max())

    q = rng.normal(size=(5, d)).astype(np.float32)
    scores, rows = ivf_probe_adc(
        jnp.asarray(q), cents, books, jnp.asarray(codes_sorted), jnp.asarray(offsets),
        nprobe=K, cap=cap, depth=10, token_chunk=4,
    )
    want_s, want_idx = _brute_adc_topk(q, books, codes, 10)
    got_ids = perm[np.asarray(rows)]
    np.testing.assert_allclose(np.asarray(scores), want_s, rtol=1e-4, atol=1e-4)
    # ids may differ on ties; compare via scores of selected ids
    lut = adc_lut(jnp.asarray(q), books)
    s_all = np.asarray(adc_score(lut, jnp.asarray(codes)))
    sel = np.take_along_axis(s_all, got_ids, axis=1)
    np.testing.assert_allclose(sel, want_s, rtol=1e-4, atol=1e-4)


def test_ivf_probe_partial_recall(rng):
    n, d, K, m = 4000, 32, 32, 8
    x, _, _ = blobs(rng, n, K, d, scale=0.15)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cents, assign = kmeans(jnp.asarray(x), K, iters=8, chunk=512)
    books = pq_train(jnp.asarray(x), m, 256, iters=6, chunk=512)
    codes = np.asarray(pq_encode(jnp.asarray(x), books, chunk=512))
    perm, offsets = sort_by_list(np.asarray(assign), K)
    cap = int((offsets[1:] - offsets[:-1]).max())
    # queries near data points
    q = x[rng.integers(0, n, size=8)] + 0.01 * rng.normal(size=(8, d)).astype(np.float32)
    q = q.astype(np.float32)
    scores, rows = ivf_probe_adc(
        jnp.asarray(q), cents, books, jnp.asarray(codes[perm]), jnp.asarray(offsets),
        nprobe=8, cap=cap, depth=20, token_chunk=8,
    )
    got_ids = perm[np.asarray(rows)]
    _, want_idx = _brute_adc_topk(q, books, codes, 20)
    recall = np.mean([len(set(got_ids[i]) & set(want_idx[i])) / 20 for i in range(8)])
    assert recall > 0.7, recall


def test_dedup_pids_by_score():
    pids = jnp.asarray([3, 1, 3, 2, 1, -1, 2, 3], jnp.int32)
    scores = jnp.asarray([0.5, 0.9, 0.7, 0.1, 0.2, -np.inf, 0.4, 0.3], jnp.float32)
    out_pids, out_scores = dedup_pids_by_score(pids, scores, max_out=4)
    got = dict(zip(np.asarray(out_pids).tolist(), np.asarray(out_scores).tolist()))
    assert got.pop(-1, None) is not None or len(got) == 3
    assert got[1] == pytest.approx(0.9)
    assert got[3] == pytest.approx(0.7)
    assert got[2] == pytest.approx(0.4)


def test_adc_onehot_matches_gather(rng):
    from colbert_tpu.ops.pq import adc_score_onehot

    m, ksub, C, B = 8, 256, 100, 3
    lut = jnp.asarray(rng.normal(size=(B, m, ksub)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, ksub, size=(C, m)).astype(np.uint8))
    a = np.asarray(adc_score(lut, codes))
    b = np.asarray(adc_score_onehot(lut, codes))
    # one-hot path rounds the LUT to bf16 (candidate-selection scores only)
    np.testing.assert_allclose(a, b, atol=0.06)


def test_ivf_probe_onehot_method_matches(rng):
    n, d, K, m = 2000, 32, 8, 8
    x, _, _ = blobs(rng, n, K, d, scale=0.2)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cents, assign = kmeans(jnp.asarray(x), K, iters=6, chunk=512)
    books = pq_train(jnp.asarray(x), m, 256, iters=5, chunk=512)
    codes = np.asarray(pq_encode(jnp.asarray(x), books, chunk=512))
    perm, offsets = sort_by_list(np.asarray(assign), K)
    cap = int((offsets[1:] - offsets[:-1]).max())
    q = rng.normal(size=(3, d)).astype(np.float32)
    kw = dict(nprobe=K, cap=cap, depth=10)
    s1, r1 = ivf_probe_adc(jnp.asarray(q), cents, books, jnp.asarray(codes[perm]),
                           jnp.asarray(offsets), token_chunk=3, adc_method="gather", **kw)
    s2, r2 = ivf_probe_adc(jnp.asarray(q), cents, books, jnp.asarray(codes[perm]),
                           jnp.asarray(offsets), token_chunk=3, adc_method="onehot", **kw)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0.06)
    # selected candidates must be essentially the same set
    for i in range(3):
        assert len(set(np.asarray(r1)[i]) & set(np.asarray(r2)[i])) >= 8


def test_ivf_probe_sq_pallas_matches_gather(rng):
    from colbert_tpu.ops.ivf import ivf_probe_sq
    from colbert_tpu.ops.sq import sq_encode, sq_train

    n, d, K = 2000, 32, 8
    x, _, _ = blobs(rng, n, K, d, scale=0.2)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cents, assign = kmeans(jnp.asarray(x), K, iters=6, chunk=512)
    proj, scales = sq_train(jnp.asarray(x), 16)
    codes8 = np.asarray(sq_encode(jnp.asarray(x), proj, scales, chunk=512))
    perm, offsets = sort_by_list(np.asarray(assign), K)
    cap = int((offsets[1:] - offsets[:-1]).max())
    q = rng.normal(size=(5, d)).astype(np.float32)
    kw = dict(nprobe=K, cap=cap, depth=12, token_chunk=5)
    s1, r1 = ivf_probe_sq(jnp.asarray(q), cents, proj, scales, jnp.asarray(codes8[perm]),
                          jnp.asarray(offsets), use_pallas=False, **kw)
    # pallas path runs in interpret mode on the CPU test backend
    s2, r2 = ivf_probe_sq(jnp.asarray(q), cents, proj, scales, jnp.asarray(codes8[perm]),
                          jnp.asarray(offsets), use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-2, atol=0.05)
    for i in range(5):
        assert len(set(np.asarray(r1)[i]) & set(np.asarray(r2)[i])) >= 10


def test_dedup_by_approx_maxsim():
    from colbert_tpu.ops.ivf import dedup_pids_by_approx_maxsim

    # 2 tokens; doc 5 found by both tokens (0.9 + 0.8), doc 3 only by one (1.0)
    pids = jnp.asarray([5, 3, -1, 5, 5, 7], jnp.int32)
    toks = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    scores = jnp.asarray([0.9, 1.0, -np.inf, 0.8, 0.5, 0.2], jnp.float32)
    out_pids, out_scores = dedup_pids_by_approx_maxsim(pids, toks, scores, 2, max_out=3)
    got = dict(zip(np.asarray(out_pids).tolist(), np.asarray(out_scores).tolist()))
    assert got[5] == pytest.approx(1.7)   # 0.9 + max(0.8, 0.5)
    assert got[3] == pytest.approx(1.0)
    assert got[7] == pytest.approx(0.2)
    # approx-maxsim ordering: doc 5 ranks first
    assert int(out_pids[0]) == 5


class TestBalancedAssign:
    def test_native_caps_lists(self):
        import numpy as np

        from colbert_tpu.native import balanced_assign

        rng = np.random.default_rng(0)
        n, k, kc, cap = 500, 10, 4, 60
        # skewed candidates: everyone prefers list 0
        cand = np.concatenate(
            [np.zeros((n, 1), np.int32), rng.integers(1, k, (n, kc - 1)).astype(np.int32)], axis=1
        )
        out = balanced_assign(cand, k, cap)
        counts = np.bincount(out, minlength=k)
        assert counts.max() <= cap
        assert counts.sum() == n
        assert counts[0] == cap  # the hot list fills exactly to capacity

    def test_builder_balances(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        from colbert_tpu.config import ColbertConfig, IndexConfig, MultiviewConfig
        from colbert_tpu.indexing import IndexBuilder, IndexStorage

        rng = np.random.default_rng(1)
        num_docs, d_view, dim = 64, 4, 32
        # clustered embeddings: unbalanced natural assignment
        centers = rng.normal(size=(4, dim)).astype(np.float32)
        embs = (centers[rng.choice(4, num_docs * d_view, p=[0.7, 0.1, 0.1, 0.1])]
                + 0.05 * rng.normal(size=(num_docs * d_view, dim)).astype(np.float32))
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)

        def build(factor, path):
            cfg = ColbertConfig(
                multiview=MultiviewConfig(enabled=True, q_view=4, d_view=d_view),
                index=IndexConfig(codec="sq", sq_dim=8, partitions=16, kmeans_iters=4,
                                  balance_factor=factor),
            )
            cfg.model.dim = dim
            storage = IndexStorage(str(path))
            storage.write_part(0, embs.astype(np.float16), [d_view] * num_docs)
            storage.write_meta({"dim": dim, "num_docs": num_docs,
                                "num_embeddings": num_docs * d_view, "multiview": True,
                                "d_view": d_view, "num_parts": 1, "embedding_dtype": "float16"})
            IndexBuilder(cfg, storage).build(chunk=256)
            ivf = storage.read_ivf()
            lens = ivf["offsets"][1:] - ivf["offsets"][:-1]
            return int(lens.max())

        unbal = build(0.0, tmp_path / "u")
        bal = build(1.25, tmp_path / "b")
        cap = int(np.ceil(num_docs * d_view / 16 * 1.25))
        assert bal <= cap < unbal


def test_dedup_packed_matches_exact():
    """The packed-key dedup (one int32 sort + quantized scores) must select
    the same candidate SET as the exact form (scores approximate — only
    membership matters, the output feeds an exact re-rank)."""
    from colbert_tpu.ops.ivf import (
        dedup_pids_by_approx_maxsim,
        dedup_pids_by_approx_maxsim_packed,
    )

    rng = np.random.default_rng(0)
    num_docs, qv, depth = 300, 4, 64
    n = qv * depth
    pids = rng.integers(0, num_docs, n).astype(np.int32)
    pids[rng.random(n) < 0.1] = -1
    toks = np.repeat(np.arange(qv, dtype=np.int32), depth)
    scores = rng.normal(size=n).astype(np.float32) * 3 + 10
    scores[pids < 0] = -np.inf
    max_out = 64

    ep, es = dedup_pids_by_approx_maxsim(
        jnp.asarray(pids), jnp.asarray(toks), jnp.asarray(scores), qv, max_out)
    pp, ps = dedup_pids_by_approx_maxsim_packed(
        jnp.asarray(pids), jnp.asarray(toks), jnp.asarray(scores), qv, max_out,
        num_docs, approx_sel=False)
    eset = set(int(p) for p in np.asarray(ep) if p >= 0)
    pset = set(int(p) for p in np.asarray(pp) if p >= 0)
    # membership agreement (quantization can flip ties at the budget edge)
    assert len(eset & pset) >= 0.95 * len(eset), (len(eset & pset), len(eset))
    # approximate scores track the exact ones
    em = {int(p): float(s) for p, s in zip(np.asarray(ep), np.asarray(es)) if p >= 0}
    pm = {int(p): float(s) for p, s in zip(np.asarray(pp), np.asarray(ps)) if p >= 0}
    span = max(em.values()) - min(em.values())
    for p in eset & pset:
        assert abs(em[p] - pm[p]) < 0.02 * span + 0.05, (p, em[p], pm[p])


def test_dedup_packed_all_invalid():
    from colbert_tpu.ops.ivf import dedup_pids_by_approx_maxsim_packed

    pids = jnp.full((8,), -1, jnp.int32)
    toks = jnp.zeros((8,), jnp.int32)
    scores = jnp.full((8,), -np.inf, jnp.float32)
    p, s = dedup_pids_by_approx_maxsim_packed(pids, toks, scores, 2, 4, 100, approx_sel=False)
    assert (np.asarray(p) == -1).all()
    assert not np.isfinite(np.asarray(s)).any()
