"""Exact flat MaxSim scan vs the all-pairs oracle (uniform, ragged, int8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.flat_scan import (
    build_flat_table,
    flat_maxsim_scan,
    flat_maxsim_scan_xla,
    flat_topk,
    pick_rows_block,
)
from colbert_tpu.ops.maxsim import maxsim_xla


def _oracle(Qm, emb, doclens, dv):
    """Reference semantics: zero-pad docs to dv rows, all-pairs maxsim."""
    num_docs = len(doclens)
    h = emb.shape[1]
    D = np.zeros((num_docs, dv, h), np.float32)
    offs = np.concatenate([[0], np.cumsum(doclens)])
    for d in range(num_docs):
        D[d, : doclens[d]] = emb[offs[d] : offs[d] + doclens[d]]
    return np.asarray(maxsim_xla(jnp.asarray(Qm), jnp.asarray(D)))  # (B, nd)


@pytest.mark.parametrize("uniform", [True, False])
def test_flat_scan_matches_oracle(uniform):
    rng = np.random.default_rng(0)
    B, m, h = 5, 4, 128
    num_docs = 37
    doclens = (
        np.full(num_docs, 6, np.int64)
        if uniform
        else rng.integers(1, 7, size=num_docs)
    )
    emb = rng.normal(size=(int(doclens.sum()), h)).astype(np.float32)
    Qm = rng.normal(size=(B, m, h)).astype(np.float32)
    Qm[1, 2:] = 0.0  # masked query views contribute 0

    table, inv, dv = build_flat_table(emb, doclens, dtype="float32")
    want = _oracle(Qm, emb, doclens, dv)

    got_xla = np.asarray(
        flat_maxsim_scan_xla(jnp.asarray(Qm), jnp.asarray(table), dv=dv)
    )[:num_docs].T
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-4)

    rb = pick_rows_block(dv, 2, target_rows=64)
    got = np.asarray(
        flat_maxsim_scan(
            jnp.asarray(Qm), jnp.asarray(table, jnp.bfloat16), dv=dv, rows_blk=rb
        )
    )[: table.shape[0] // dv].T[:, :num_docs]
    # bf16 table + bf16 queries in the kernel: coarse tolerance
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.3)
    # ranking agreement at the top
    for b in range(B):
        top_want = set(np.argsort(-want[b])[:3])
        top_got = set(np.argsort(-got[b])[:3])
        assert len(top_want & top_got) >= 2


def test_flat_scan_int8_close_to_oracle():
    rng = np.random.default_rng(1)
    B, m, h = 3, 4, 128
    num_docs = 29
    dv = 4
    doclens = np.full(num_docs, dv, np.int64)
    emb = rng.normal(size=(num_docs * dv, h)).astype(np.float32)
    Qm = rng.normal(size=(B, m, h)).astype(np.float32)

    table, inv, dv2 = build_flat_table(emb, doclens, dtype="int8")
    assert dv2 == dv and table.dtype == np.int8 and inv is not None
    want = _oracle(Qm, emb, doclens, dv)

    rb = pick_rows_block(dv, 1, target_rows=64)
    got = np.asarray(
        flat_maxsim_scan(
            jnp.asarray(Qm * inv[None, None, :]), jnp.asarray(table),
            dv=dv, rows_blk=rb,
        )
    ).T[:, :num_docs]
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.5)


def test_flat_topk_segmented_matches_direct():
    rng = np.random.default_rng(2)
    docs_pad, B, num_docs, k = 600, 7, 555, 10
    s = jnp.asarray(rng.normal(size=(docs_pad, B)).astype(np.float32))
    ts_d, ti_d = flat_topk(s, num_docs, k, segment=1 << 17)
    ts_s, ti_s = flat_topk(s, num_docs, k, segment=128)
    np.testing.assert_allclose(np.asarray(ts_d), np.asarray(ts_s), rtol=1e-6)
    assert (np.asarray(ti_d) == np.asarray(ti_s)).mean() > 0.99  # ties only
    assert int(np.asarray(ti_d).max()) < num_docs
    # num_docs ending INSIDE a full segment: the per-segment mask (round-4
    # no-copy path) must drop pad docs there too
    ts_d2, ti_d2 = flat_topk(s, 300, k, segment=1 << 17)
    ts_s2, ti_s2 = flat_topk(s, 300, k, segment=128)
    np.testing.assert_allclose(np.asarray(ts_d2), np.asarray(ts_s2), rtol=1e-6)
    assert int(np.asarray(ti_s2).max()) < 300


def test_flat_scan_topk_matches_unfused():
    """Fused two-stage top-k (round 5): exact agreement with the
    scan+flat_topk path for the same stored score dtype, across group
    boundaries and num_docs cutoffs."""
    from colbert_tpu.ops.flat_scan import flat_scan_topk

    rng = np.random.default_rng(3)
    B, m, h = 5, 4, 128
    dv = 4
    for num_docs, k in ((200, 10), (37, 50), (64, 7)):
        doclens = np.full(num_docs, dv, np.int64)
        emb = rng.normal(size=(num_docs * dv, h)).astype(np.float32)
        Qm = rng.normal(size=(B, m, h)).astype(np.float32)
        rb = pick_rows_block(dv, 2, target_rows=64)
        table, _, _ = build_flat_table(emb, doclens, dtype="float32", rows_blk=rb)
        tbl = jnp.asarray(table, jnp.bfloat16)

        scores = flat_maxsim_scan(jnp.asarray(Qm), tbl, dv=dv, rows_blk=rb)
        ts_ref, ti_ref = flat_topk(scores, num_docs, k)

        ts, ti = flat_scan_topk(
            jnp.asarray(Qm), tbl, dv=dv, num_docs=num_docs, topk=k,
            rows_blk=rb, score_dtype="float32",
        )
        np.testing.assert_allclose(np.asarray(ts), np.asarray(ts_ref), rtol=1e-6)
        # ids can differ only on exact ties
        agree = (np.asarray(ti) == np.asarray(ti_ref)).mean()
        assert agree > 0.98, agree
        assert int(np.asarray(ti).max()) < num_docs

        # bf16-stored scores: self-consistent exactness (every returned score
        # is the stored score of the returned doc, ranked descending)
        ts16, ti16 = flat_scan_topk(
            jnp.asarray(Qm), tbl, dv=dv, num_docs=num_docs, topk=k,
            rows_blk=rb, score_dtype="bfloat16",
        )
        full = np.asarray(scores)[:num_docs].astype(np.float32)
        full16 = full.astype(jnp.bfloat16).astype(np.float32)
        for b in range(B):
            want = np.sort(full16[:, b])[::-1][:k]
            np.testing.assert_allclose(np.sort(np.asarray(ts16[b]))[::-1], want,
                                       rtol=1e-6)
