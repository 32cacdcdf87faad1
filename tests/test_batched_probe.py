"""List-major batched probe: schedule, kernel (interpret), probe contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.ivf import ivf_probe_sq, ivf_probe_sq_batched, sort_by_list
from colbert_tpu.ops.sq import sq_encode, sq_query, sq_train
from colbert_tpu.ops.sq_probe_batched import (
    build_slot_schedule,
    slot_capacity,
    sq_batch_list_scan,
)


def _random_csr(rng, num_lists, sq_dim, max_len):
    lens = rng.integers(0, max_len + 1, size=num_lists)
    offsets = np.zeros(num_lists + 1, np.int32)
    np.cumsum(lens, out=offsets[1:])
    n = int(offsets[-1])
    codes = rng.integers(-127, 128, size=(n, sq_dim)).astype(np.int8)
    return codes, offsets


class TestSlotSchedule:
    def test_every_pair_assigned_once(self):
        rng = np.random.default_rng(0)
        T, nprobe, K, tpl = 13, 5, 16, 4
        lists = np.stack([rng.choice(K, nprobe, replace=False) for _ in range(T)]).astype(np.int32)
        offsets = np.arange(K + 1, dtype=np.int32) * 7
        s_cap = slot_capacity(T * nprobe, K, tpl)
        sched = build_slot_schedule(jnp.asarray(lists), jnp.asarray(offsets), tpl=tpl, s_cap=s_cap, pack=2)
        qidx = np.asarray(sched.qidx)
        slot_of, pos_of = np.asarray(sched.slot_of_pair), np.asarray(sched.pos_of_pair)
        meta = np.asarray(sched.meta)[:, 0, :]
        # each pair lands where the schedule says, on a slot for its list
        for i in range(T * nprobe):
            t, j = divmod(i, nprobe)
            s, p = slot_of[i], pos_of[i]
            assert qidx[s, p] == t
            aligned = meta[s, 4]
            lo, hi = meta[s, 2], meta[s, 3]
            assert aligned + lo == offsets[lists[t, j]]
            assert aligned + hi == offsets[lists[t, j] + 1]
        # no position is used twice (every filled slot entry is some pair's)
        filled = (qidx >= 0).sum()
        assert filled == T * nprobe

    def test_hot_list_overflows_to_multiple_slots(self):
        T, nprobe, K, tpl = 10, 1, 2, 4
        lists = np.zeros((T, 1), np.int32)  # everyone probes list 0
        offsets = np.array([0, 50, 60], np.int32)
        s_cap = slot_capacity(T, K, tpl)
        sched = build_slot_schedule(jnp.asarray(lists), jnp.asarray(offsets), tpl=tpl, s_cap=s_cap, pack=2)
        slots = np.unique(np.asarray(sched.slot_of_pair))
        assert len(slots) == 3  # ceil(10/4)
        qidx = np.asarray(sched.qidx)
        assert sorted(qidx[qidx >= 0].tolist()) == list(range(T))


def _reference_list_topr(qs, codes, offsets, lists, r):
    """Per (token, probed list) top-r rows by int8 dot score."""
    T, nprobe = lists.shape
    out_s = np.full((T, nprobe, r), -np.inf, np.float32)
    out_rows = np.full((T, nprobe, r), -1, np.int64)
    for t in range(T):
        for j in range(nprobe):
            l = int(lists[t, j])
            rows = np.arange(int(offsets[l]), int(offsets[l + 1]))
            if len(rows) == 0:
                continue
            s = codes[rows].astype(np.float32) @ qs[t]
            order = np.argsort(-s, kind="stable")[:r]
            out_s[t, j, : len(order)] = s[order]
            out_rows[t, j, : len(order)] = rows[order]
    return out_s, out_rows


class TestBatchedScanKernel:
    @pytest.mark.parametrize("sq_dim,tpl", [(8, 8), (64, 16)])
    def test_matches_reference_list_topr(self, sq_dim, tpl):
        rng = np.random.default_rng(1)
        K, max_len, T, nprobe, r = 12, 300, 9, 4, 2
        codes, offsets = _random_csr(rng, K, sq_dim, max_len)
        qs = rng.normal(size=(T, sq_dim)).astype(np.float32)
        lists = np.stack([rng.choice(K, nprobe, replace=False) for _ in range(T)]).astype(np.int32)
        maxb = (max_len + 31 + 127) // 128
        pack = 128 // sq_dim

        s_cap = slot_capacity(T * nprobe, K, tpl)
        sched = build_slot_schedule(jnp.asarray(lists), jnp.asarray(offsets), tpl=tpl, s_cap=s_cap, pack=pack)
        t_pad = 128
        qsT = jnp.pad(jnp.asarray(qs), ((0, t_pad - T), (0, 0))).T
        from colbert_tpu.ops.sq_probe_pallas import pad_codes_for_scan

        codes_p = pad_codes_for_scan(jnp.asarray(codes), maxb * 128)
        out_s, out_r = sq_batch_list_scan(
            sched.qidx, sched.meta, qsT, codes_p, tpl=tpl, r=r, interpret=True
        )
        out_s, out_r = np.asarray(out_s), np.asarray(out_r)
        ref_s, ref_rows = _reference_list_topr(qs, codes, offsets, lists, r)

        slot_of = np.asarray(sched.slot_of_pair)
        pos_of = np.asarray(sched.pos_of_pair)
        for i in range(T * nprobe):
            t, j = divmod(i, nprobe)
            s, p = slot_of[i], pos_of[i]
            got_s = out_s[s, :, p]
            got_r = out_r[s, :, p]
            # the kernel's query-pack matmul runs in bf16 -> ~1e-3 rel error
            np.testing.assert_allclose(
                np.sort(got_s), np.sort(ref_s[t, j]), rtol=5e-3, atol=5e-3,
                err_msg=f"pair (t={t}, j={j})",
            )
            # rows agree wherever scores are unique
            for k in range(r):
                if np.isfinite(got_s[k]):
                    match = np.isclose(ref_s[t, j], got_s[k], rtol=5e-3, atol=5e-3)
                    assert got_r[k] in ref_rows[t, j][match]


class TestTieHandling:
    def test_duplicate_scores_all_kept(self):
        """Rows with IDENTICAL scores must each occupy a top-r entry
        (regression: masking consumed entries by score equality collapsed
        ties to one entry per list)."""
        sq_dim, tpl, r = 8, 8, 4
        codes = np.ones((40, sq_dim), np.int8)  # every row scores the same
        offsets = np.array([0, 20, 40], np.int32)
        qs = np.ones((3, sq_dim), np.float32)
        lists = np.array([[0, 1]] * 3, np.int32)
        s_cap = slot_capacity(6, 2, tpl)
        sched = build_slot_schedule(jnp.asarray(lists), jnp.asarray(offsets), tpl=tpl, s_cap=s_cap, pack=128 // sq_dim)
        from colbert_tpu.ops.sq_probe_pallas import pad_codes_for_scan

        codes_p = pad_codes_for_scan(jnp.asarray(codes), 128)
        qsT = jnp.pad(jnp.asarray(qs), ((0, 125), (0, 0))).T
        out_s, out_r = sq_batch_list_scan(
            sched.qidx, sched.meta, qsT, codes_p, tpl=tpl, r=r, interpret=True
        )
        out_s, out_r = np.asarray(out_s), np.asarray(out_r)
        slot_of, pos_of = np.asarray(sched.slot_of_pair), np.asarray(sched.pos_of_pair)
        for i in range(6):
            s, p = slot_of[i], pos_of[i]
            assert np.isfinite(out_s[s, :, p]).all()
            rows = out_r[s, :, p]
            assert len(set(rows.tolist())) == r, rows  # r DISTINCT rows


class TestProbeContract:
    def _setup(self, rng, num_docs=60, d_view=4, dim=32, sq_dim=8, K=16):
        embs = rng.normal(size=(num_docs * d_view, dim)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        proj, scales = sq_train(jnp.asarray(embs), sq_dim)
        codes = np.asarray(sq_encode(jnp.asarray(embs), proj, scales))
        coarse = embs[rng.choice(len(embs), K, replace=False)]
        assign = np.argmax(embs @ coarse.T, axis=1).astype(np.int32)
        perm, offsets = sort_by_list(assign, K)
        return embs, proj, scales, codes[perm], coarse, offsets

    def test_batched_matches_exact_when_r_covers_lists(self):
        """With r >= max list length, per-list top-r keeps every row, so
        batched == token-major (XLA gather) probe exactly."""
        rng = np.random.default_rng(2)
        embs, proj, scales, codes_sorted, coarse, offsets = self._setup(
            rng, num_docs=24, d_view=2, K=12
        )
        max_len = int((offsets[1:] - offsets[:-1]).max())
        assert max_len <= 12, "test setup needs short lists (small unrolled r)"
        q = rng.normal(size=(7, embs.shape[1])).astype(np.float32)

        nprobe, depth = 4, 16
        s1, r1 = ivf_probe_sq(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes_sorted), jnp.asarray(offsets),
            nprobe=nprobe, cap=max(1, max_len), depth=depth, use_pallas=False,
        )
        s2, r2 = ivf_probe_sq_batched(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes_sorted), jnp.asarray(offsets),
            nprobe=nprobe, depth=depth, maxb=1, r=max_len, interpret=True,
        )
        s1, s2 = np.asarray(s1), np.asarray(s2)
        r1, r2 = np.asarray(r1), np.asarray(r2)
        # the token-major XLA path scores in bf16, the kernel in f32 — compare
        # at bf16 tolerance
        for t in range(q.shape[0]):
            v1 = {int(r): float(s) for r, s in zip(r1[t], s1[t]) if r >= 0}
            v2 = {int(r): float(s) for r, s in zip(r2[t], s2[t]) if r >= 0}
            np.testing.assert_allclose(
                np.sort(s2[t]), np.sort(s1[t]), rtol=2e-2, atol=2e-2
            )
            common = set(v1) & set(v2)
            # bf16 vs f32 scoring can swap rows near the depth cutoff
            assert len(common) >= min(len(v1), len(v2)) - 3
            for rr in common:
                np.testing.assert_allclose(v1[rr], v2[rr], rtol=2e-2, atol=2e-2)

    def test_list_topr_keeps_high_overlap(self):
        """At depth ≈ nprobe * r the per-list truncation loses little."""
        rng = np.random.default_rng(3)
        embs, proj, scales, codes_sorted, coarse, offsets = self._setup(
            rng, num_docs=200, d_view=4, K=8
        )
        max_len = int((offsets[1:] - offsets[:-1]).max())
        maxb = (max_len + 31 + 127) // 128
        q = rng.normal(size=(5, embs.shape[1])).astype(np.float32)
        nprobe, depth, r = 4, 16, 8
        s1, r1 = ivf_probe_sq(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes_sorted), jnp.asarray(offsets),
            nprobe=nprobe, cap=max_len, depth=depth, use_pallas=False,
        )
        s2, r2 = ivf_probe_sq_batched(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes_sorted), jnp.asarray(offsets),
            nprobe=nprobe, depth=depth, maxb=maxb, r=r, interpret=True,
        )
        r1, r2 = np.asarray(r1), np.asarray(r2)
        overlaps = [
            len(set(r1[t][r1[t] >= 0]) & set(r2[t][r2[t] >= 0])) / max(1, (r1[t] >= 0).sum())
            for t in range(q.shape[0])
        ]
        assert np.mean(overlaps) > 0.8, overlaps


class TestHotLists:
    def test_hot_list_scanned_densely(self):
        """A list probed by more tokens than the slot capacity routes through
        the dense hot scan and still matches the token-major probe
        (regression: popularity-skew truncation collapsed recall 0.98->0.13
        at the bench operating point)."""
        rng = np.random.default_rng(7)
        sq_dim, dim, K = 8, 32, 6
        # one dominant cluster: every token probes list 0 first
        center = rng.normal(size=(1, dim)).astype(np.float32)
        embs = np.concatenate([
            center + 0.05 * rng.normal(size=(200, dim)),
            rng.normal(size=(100, dim)),
        ]).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        proj, scales = sq_train(jnp.asarray(embs), sq_dim)
        codes = np.asarray(sq_encode(jnp.asarray(embs), proj, scales))
        coarse = np.concatenate([center / np.linalg.norm(center),
                                 rng.normal(size=(K - 1, dim)).astype(np.float32)])
        assign = np.argmax(embs @ coarse.T, axis=1).astype(np.int32)
        perm, offsets = sort_by_list(assign, K)
        q = (center + 0.1 * rng.normal(size=(20, dim))).astype(np.float32)

        lists = np.argsort(-(q @ coarse.T), axis=1)[:, :3]
        maxb = (int((offsets[1:] - offsets[:-1]).max()) + 31 + 127) // 128
        kw = dict(nprobe=3, depth=24, maxb=maxb, r=8, interpret=True)
        # tpl=4, groups=2 -> slot capacity 8 < 20 probing tokens: the big
        # list is hot; without the hot path, tokens with member-rank >= 8
        # lose it entirely
        s_hot, r_hot = ivf_probe_sq_batched(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes[perm]), jnp.asarray(offsets),
            tpl=4, groups=2, hot_cap=3, **kw,
        )
        s_cut, r_cut = ivf_probe_sq_batched(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes[perm]), jnp.asarray(offsets),
            tpl=4, groups=2, hot_cap=0, **kw,
        )
        r_hot, r_cut = np.asarray(r_hot), np.asarray(r_cut)
        # the dominant list (probed first by every token)
        big = int(lists[0, 0])
        lo, hi = int(offsets[big]), int(offsets[big + 1])
        in_big = lambda rr: ((rr >= lo) & (rr < hi)).sum()
        hot_cov = [in_big(r_hot[t]) for t in range(q.shape[0])]
        cut_cov = [in_big(r_cut[t]) for t in range(q.shape[0])]
        # with the hot path EVERY token keeps its top-8 of the hot list
        assert min(hot_cov) == 8, (hot_cov, cut_cov)
        # without it, capacity (2 groups x 4) limits coverage to 8 tokens
        assert sum(1 for c in cut_cov if c == 0) >= q.shape[0] - 8, (hot_cov, cut_cov)
        # hot-path scores agree with the slot path for a non-truncated token
        # (hot scores are f32 band matmuls; slot scores go through the bf16
        # query-pack matmul)
        np.testing.assert_allclose(
            np.sort(np.asarray(s_hot)[0]), np.sort(np.asarray(s_cut)[0]),
            rtol=5e-3, atol=5e-3,
        )

    def test_many_overflowing_lists_need_wide_hot_cap(self):
        """Raising nprobe lowers every token's membership threshold, so MANY
        lists can overflow the groups*tpl slot capacity at once; a hot_cap
        smaller than that count silently drops pairs (measured at 200k
        docs/K=16384: nprobe 128->256 at hot_cap=64 dropped recall@100
        0.779->0.652).  With hot_cap >= the overflow count every token keeps
        its per-list top-r for every probed list."""
        rng = np.random.default_rng(11)
        sq_dim, dim, K, n_hot = 8, 32, 8, 5
        centers = rng.normal(size=(n_hot, dim)).astype(np.float32)
        embs = np.concatenate(
            [c + 0.05 * rng.normal(size=(60, dim)) for c in centers]
            + [rng.normal(size=(80, dim))]
        ).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        proj, scales = sq_train(jnp.asarray(embs), sq_dim)
        codes = np.asarray(sq_encode(jnp.asarray(embs), proj, scales))
        coarse = np.concatenate([
            centers / np.linalg.norm(centers, axis=1, keepdims=True),
            rng.normal(size=(K - n_hot, dim)).astype(np.float32),
        ])
        assign = np.argmax(embs @ coarse.T, axis=1).astype(np.int32)
        perm, offsets = sort_by_list(assign, K)
        # queries near the centroid MEAN probe all n_hot lists (wide nprobe)
        q = (centers.mean(0) + 0.05 * rng.normal(size=(20, dim))).astype(np.float32)
        maxb = (int((offsets[1:] - offsets[:-1]).max()) + 31 + 127) // 128
        # capacity 2x4=8 < 20 probing tokens for each of the n_hot lists
        kw = dict(nprobe=n_hot, depth=n_hot * 8, maxb=maxb, r=8,
                  tpl=4, groups=2, interpret=True)
        probe = lambda hc: [np.asarray(a) for a in ivf_probe_sq_batched(
            jnp.asarray(q), jnp.asarray(coarse), proj, scales,
            jnp.asarray(codes[perm]), jnp.asarray(offsets), hot_cap=hc, **kw,
        )]
        _, r_narrow = probe(2)      # hot_cap < overflowing lists: pairs drop
        _, r_wide = probe(n_hot)    # the auto default covers them all
        lists = np.argsort(-(q @ coarse.T), axis=1)[:, :n_hot]
        cover = lambda rows, t: sum(
            int(((rows[t] >= offsets[l]) & (rows[t] < offsets[l + 1])).sum() > 0)
            for l in lists[t]
        )
        wide_cov = [cover(r_wide, t) for t in range(q.shape[0])]
        narrow_cov = [cover(r_narrow, t) for t in range(q.shape[0])]
        # with hot_cap >= overflow count every token sees all probed lists
        assert min(wide_cov) == n_hot, (wide_cov, narrow_cov)
        # with a narrow hot_cap most tokens lose whole probed lists
        assert np.mean(narrow_cov) < n_hot - 1, (wide_cov, narrow_cov)

    def test_searcher_auto_hot_cap_tracks_nprobe(self):
        """ServeConfig.probe_hot_lists=0 resolves to max(64, nprobe)."""
        from colbert_tpu.config import ServeConfig

        assert ServeConfig().probe_hot_lists == 0
        for nprobe, want in ((8, 64), (64, 64), (256, 256), (512, 512)):
            assert (ServeConfig().probe_hot_lists or max(64, nprobe)) == want
