"""Fused end-to-end query pipeline.

One jitted program replaces the reference's serve path
(``dense_server_client.py:35-49`` + ``colbert_ranker.py``):

    encode -> IVF probe -> ADC -> emb->pid -> dedup -> gather -> MaxSim -> top-k

Key redesigns vs the reference:

* the reference re-ranks **one query at a time** on the host
  (``dense_server_client.py:44``, flagged in SURVEY §3.4 as a serving
  inefficiency) — here the whole query batch flows through one program;
* ``emb2pid`` lookup + per-query uniq ran on CPU with a Pool(16)
  (``colbert_ranker.py:212-229``) — here it's a device-side sort/segment-max
  (:func:`colbert_tpu.ops.ivf.dedup_pids_by_score`);
* the pinned-memory ``as_strided`` stride-bucket gather
  (``colbert_ranker.py:45-59,96-109``) becomes a static-shape CSR gather
  from the HBM-resident embedding table — the same trick for multiview
  (every doc exactly ``d_view`` rows) and ragged docs (``doc_offsets`` +
  masked ``cap`` window).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.indexing.storage import IndexStorage
from colbert_tpu.models import ColbertModel
from colbert_tpu.models.sharding import param_shardings
from colbert_tpu.ops.ivf import (
    dedup_pids_by_approx_maxsim,
    dedup_pids_by_score,
    ivf_probe_adc,
    ivf_probe_sq,
    ivf_probe_sq_batched,
)
from colbert_tpu.ops.maxsim import maxsim_qd
from colbert_tpu.parallel.mesh import make_mesh
from colbert_tpu.tokenization import ColbertTokenizer
from colbert_tpu.utils.logging import Timers, get_logger

logger = get_logger("searcher")


@dataclass
class SearchResult:
    pids: np.ndarray    # (B, topk) int32, -1 padded
    scores: np.ndarray  # (B, topk) fp32


class _PendingResult:
    """Lazy (scores, pids) pair: unpacking blocks on a background future.

    Lets :meth:`ColbertSearcher.search_tokens_device` keep its contract
    ("returns a (scores, pids) handle that synchronizes on fetch") for modes
    whose mid-pipeline work runs on a worker thread (host-RAM rerank table)."""

    def __init__(self, future):
        self._future = future

    def __iter__(self):
        return iter(self._future.result())


def _meta_d_view(meta: dict, cfg: ColbertConfig) -> int:
    """The index's stored rows-per-doc, validated against the serving config.

    The doc-major reshape/gather silently misaligns if the serving config's
    ``d_view`` differs from the value the index was built with, so a stored
    ``meta['d_view']`` is authoritative and a mismatch is an error."""
    stored = meta.get("d_view")
    if stored is None:
        return cfg.multiview.d_view
    if int(stored) != cfg.multiview.d_view:
        raise ValueError(
            f"index was built with d_view={stored} but the serving config has "
            f"multiview.d_view={cfg.multiview.d_view}; these must match"
        )
    return int(stored)


def make_probe_fn(codec, coarse, quant, codes, offsets, *, nprobe: int, cap: int, depth: int,
                  approx_topk: bool = False, probe_impl: str = "auto", list_topr: int = 8,
                  probe_stop: Optional[str] = None, hot_cap: int = 64):
    """Codec-dispatched candidate generator closure for :func:`retrieval_core`.

    ``quant``: PQ codebooks (codec="pq") or an (sq_proj, sq_scales) tuple
    (codec="sq")."""
    if codec == "pq":
        return lambda tokens: ivf_probe_adc(
            tokens, coarse, quant, codes, offsets,
            nprobe=nprobe, cap=cap, depth=depth, token_chunk=min(32, tokens.shape[0]),
            approx_topk=approx_topk,
        )
    if codec == "pq4":
        from colbert_tpu.ops.pq4 import ivf_probe_pq4

        codebooks, meta, codes2, row_of, nonempty = quant
        return lambda tokens: ivf_probe_pq4(
            tokens, coarse, codebooks, meta, codes2, row_of, nonempty,
            nprobe=nprobe, depth=depth, r=list_topr,
            num_lists=int(nonempty.shape[0]), approx_topk=approx_topk,
        )
    proj, scales = quant
    if probe_impl in ("auto", "batched"):
        maxb = (cap + 31 + 127) // 128
        return lambda tokens: ivf_probe_sq_batched(
            tokens, coarse, proj, scales, codes, offsets,
            nprobe=nprobe, depth=depth, maxb=maxb, r=list_topr,
            approx_topk=approx_topk, stop=probe_stop, hot_cap=hot_cap,
        )
    return lambda tokens: ivf_probe_sq(
        tokens, coarse, proj, scales, codes, offsets,
        nprobe=nprobe, cap=cap, depth=depth, token_chunk=min(32, tokens.shape[0]),
        approx_topk=approx_topk,
    )


def retrieval_core(
    Qm: jax.Array,        # (B, qv, dim) masked query reps
    qm: jax.Array,        # (B, qv) active mask
    probe_fn,             # (T, dim) tokens -> (scores (T, depth), rows (T, depth))
    pid_by_row: jax.Array,  # (N,) int32: CSR row -> pid (emb2pid[row_emb], precomputed)
    emb_table: jax.Array,
    doc_offsets: jax.Array,
    doclens: jax.Array,
    *,
    depth: int,
    max_cand: int,
    rerank_cap: int,
    topk: int,
    query_chunk: int,
    uniform_doclen: bool = False,
    candidate_ranking: str = "best_row",
    rerank_kernel: str = "xla",
    emb_inv_scale: Optional[jax.Array] = None,
    packed_int8: bool = False,
    dedup_impl: str = "auto",
    stop_stage: Optional[str] = None,
    ragged_strides: Optional[Tuple[int, ...]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Everything after query encode: probe -> candidate scores -> dedup ->
    gather -> exact MaxSim -> local top-k.  Pure function of device arrays
    so it can run standalone (single chip) or per-shard inside shard_map.
    ``probe_fn`` encapsulates the codec (PQ ADC or SQ int8 matmul).

    ``uniform_doclen``: every doc has exactly ``rerank_cap`` vectors
    (multiview).  The flat table is then reshaped to one row per doc —
    free, same memory layout — so the re-rank gather moves doc-sized
    contiguous blocks (~10x faster on TPU than per-token-row gathers).

    ``packed_int8``: ``emb_table`` is an int8 lane-packed table
    (:func:`colbert_tpu.ops.rerank_pallas.pack_int8_table`) with per-dim
    dequantization vector ``1/scale`` in ``emb_inv_scale`` — 4x the corpus
    per HBM byte vs bf16 (the beyond-HBM serving mode).  Requires
    ``uniform_doclen`` or ``ragged_strides``.

    ``ragged_strides``: the ragged-corpus FAST path — ``emb_table`` is a
    ``(bucket_tables, bucket_of_pid, slot_of_pid)`` tuple of per-stride
    zero-padded doc-major tables (:func:`build_ragged_buckets`, the
    reference's percentile stride buckets, ``colbert_ranker.py:36-41``).
    Each candidate is routed to exactly its bucket's fused kernel call
    (non-members are -1 slots whose DMA the kernel skips), and per-bucket
    scores combine with an elementwise max — exact MaxSim, since zero pad
    rows reproduce the mask-zeroing semantics."""
    B, q_view, _ = Qm.shape
    if packed_int8 and not uniform_doclen and ragged_strides is None:
        raise ValueError("packed int8 rerank requires uniform doclens or stride buckets")
    if ragged_strides is not None:
        bucket_tables, bucket_of_pid, slot_of_pid = emb_table

    tokens = Qm.reshape(B * q_view, -1)
    adc_scores, rows = probe_fn(tokens)  # (B*qv, depth)
    pids = jnp.where(rows >= 0, pid_by_row[jnp.maximum(rows, 0)], -1)
    # dead query tokens (masked) contribute nothing
    token_valid = qm.reshape(B * q_view) > 0
    pids = jnp.where(token_valid[:, None], pids, -1)
    adc_scores = jnp.where(token_valid[:, None], adc_scores, -jnp.inf)
    pids = pids.reshape(B, q_view * depth)
    adc_scores = adc_scores.reshape(B, q_view * depth)
    if stop_stage is not None and stop_stage.startswith("probe"):  # timing only
        return adc_scores[:, :topk], pids[:, :topk]

    num_docs = doclens.shape[0]
    dim = Qm.shape[-1]
    nk = dim // 128
    if uniform_doclen and stop_stage not in ("dedup", "candidates"):
        # (N, dim) -> (num_docs, rerank_cap * dim): same layout, no copy.
        # Skipped when the pipeline stops before the rerank (the host-table
        # mode passes a placeholder emb_table that cannot be reshaped).
        rows_per_doc = nk * rerank_cap if packed_int8 else rerank_cap
        emb_by_doc = emb_table[: num_docs * rows_per_doc].reshape(num_docs, -1)

    token_ids = jnp.repeat(jnp.arange(q_view, dtype=jnp.int32), depth)
    if candidate_ranking == "approx_maxsim":
        kt_bits = int(np.ceil(np.log2(max(2, num_docs * q_view))))
        # the packed dedup quantizes scores to the 31-kt_bits low bits — fine
        # when EVERY surviving candidate gets an exact re-rank (membership is
        # all that matters), but the host-table funnel (stop_stage=
        # "candidates") re-ranks only the TOP host_rerank_candidates of this
        # ranking: at 1.4M docs the auto rule left 6-bit scores and recall@100
        # collapsed to 0.16 (measured round 5).  Funnel consumers get exact
        # fp32 ranking unless packed is forced.
        use_packed = dedup_impl == "packed" or (
            dedup_impl == "auto"
            and stop_stage != "candidates"
            and jax.default_backend() not in ("cpu", "gpu")
            and 31 - kt_bits >= 6
        )
        if use_packed:
            from colbert_tpu.ops.ivf import dedup_pids_by_approx_maxsim_packed

            dedup = lambda pp, ss: dedup_pids_by_approx_maxsim_packed(
                pp, token_ids, ss, q_view, max_cand, num_docs
            )
        else:
            dedup = lambda pp, ss: dedup_pids_by_approx_maxsim(pp, token_ids, ss, q_view, max_cand)
    else:
        dedup = lambda pp, ss: dedup_pids_by_score(pp, ss, max_cand)

    # candidate-slice chunking bounds the gather transient:
    # qc x cand_chunk x rerank_cap x dim x 2B (matters for ragged corpora
    # where rerank_cap can be doc_maxlen)
    cand_chunk = max_cand
    while query_chunk * cand_chunk * rerank_cap * dim * 2 > (1 << 30) and cand_chunk > 256:
        cand_chunk //= 2
    n_cslices = max_cand // cand_chunk if max_cand % cand_chunk == 0 else 1
    if n_cslices == 1:
        cand_chunk = max_cand

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    use_fused_rerank = (
        (rerank_kernel == "pallas" and on_tpu) or rerank_kernel == "pallas_interpret"
    ) and uniform_doclen and max_cand % 128 == 0

    def query_chunk_body(inp):
        p, s, q, qmask = inp  # (qc, qv*depth), ..., (qc, qv, dim), (qc, qv)
        cand, cand_s = jax.vmap(dedup)(p, s)
        if stop_stage == "dedup":  # timing attribution only
            return cand_s[:, :topk], cand[:, :topk]
        if stop_stage == "candidates":
            # full-width candidate set, ranked desc by dedup score — the
            # host-streamed rerank consumes the first N columns (the funnel)
            return cand_s, cand
        # (measured: pid-sorting candidates before the gather does NOT help —
        # 137.5 vs 130.4 ms/batch; XLA's doc-row gather is insensitive to
        # index order at this scale)
        qc = cand.shape[0]

        if ragged_strides is not None:
            from colbert_tpu.ops.rerank_pallas import (
                maxsim_rerank_uniform,
                maxsim_rerank_uniform_packed,
            )

            C = cand.shape[1]
            C_pad = -(-C // 128) * 128
            cand_p = jnp.pad(cand, ((0, 0), (0, C_pad - C)), constant_values=-1)
            safe = jnp.maximum(cand_p, 0)
            b_of = jnp.where(cand_p >= 0, bucket_of_pid[safe], -1)
            s_of = slot_of_pid[safe]
            scores = jnp.full(cand_p.shape, -jnp.inf, jnp.float32)
            for b, s_b in enumerate(ragged_strides):
                in_b = b_of == b
                cand_b = jnp.where(in_b, s_of, -1)
                if packed_int8:
                    sb = maxsim_rerank_uniform_packed(
                        cand_b, q * emb_inv_scale, bucket_tables[b],
                        dv=s_b, nk=nk, tc=128,
                    )
                else:
                    sb = maxsim_rerank_uniform(cand_b, q, bucket_tables[b], dv=s_b, tc=128)
                scores = jnp.maximum(scores, jnp.where(in_b, sb, -jnp.inf))
            scores = scores[:, :C]
            k = min(topk, max_cand)
            ts, ti = jax.lax.top_k(scores, k)
            tp = jnp.take_along_axis(cand, ti, axis=1)
            return ts, jnp.where(jnp.isfinite(ts), tp, -1)

        if use_fused_rerank:
            from colbert_tpu.ops.rerank_pallas import (
                maxsim_rerank_uniform,
                maxsim_rerank_uniform_packed,
            )

            # q is already mask-multiplied (Qm); docs are uniform -> no
            # doclen mask needed: identical semantics to the XLA branch
            if packed_int8:
                scores = maxsim_rerank_uniform_packed(
                    cand, q * emb_inv_scale, emb_table[: num_docs * nk * rerank_cap],
                    dv=rerank_cap, nk=nk, tc=128,
                )
            else:
                scores = maxsim_rerank_uniform(
                    cand, q, emb_table[: num_docs * rerank_cap], dv=rerank_cap, tc=128
                )
            k = min(topk, max_cand)
            ts, ti = jax.lax.top_k(scores, k)
            tp = jnp.take_along_axis(cand, ti, axis=1)
            tp = jnp.where(jnp.isfinite(ts), tp, -1)
            return ts, tp

        def score_slice(c_slice):
            safe = jnp.maximum(c_slice, 0)
            ln = doclens[safe]
            valid = (jnp.arange(rerank_cap)[None, None, :] < ln[..., None]) & (c_slice >= 0)[..., None]
            if packed_int8:
                D = emb_by_doc[safe].reshape(qc, cand_chunk, nk, rerank_cap, 128)
                D = jnp.transpose(D, (0, 1, 3, 2, 4)).reshape(qc, cand_chunk, rerank_cap, dim)
                return maxsim_qd(
                    (q * emb_inv_scale).astype(jnp.bfloat16), D.astype(jnp.bfloat16),
                    qmask, valid.astype(jnp.bfloat16),
                )
            if uniform_doclen:
                D = emb_by_doc[safe].reshape(qc, cand_chunk, rerank_cap, dim)
            else:
                base = doc_offsets[safe]
                idx = base[..., None] + jnp.arange(rerank_cap)[None, None, :]
                idx = jnp.clip(idx, 0, emb_table.shape[0] - 1)
                D = emb_table[idx.reshape(qc, -1)].reshape(qc, cand_chunk, rerank_cap, -1)
            return maxsim_qd(q.astype(emb_table.dtype), D, qmask, valid.astype(emb_table.dtype))

        if n_cslices == 1:
            scores = score_slice(cand)
        else:
            sl = jax.lax.map(
                lambda c: score_slice(c),
                jnp.moveaxis(cand.reshape(qc, n_cslices, cand_chunk), 1, 0),
            )  # (n_cslices, qc, cand_chunk)
            scores = jnp.moveaxis(sl, 0, 1).reshape(qc, max_cand)
        scores = jnp.where(cand >= 0, scores, -jnp.inf)
        k = min(topk, max_cand)
        ts, ti = jax.lax.top_k(scores, k)
        tp = jnp.take_along_axis(cand, ti, axis=1)
        tp = jnp.where(jnp.isfinite(ts), tp, -1)
        return ts, tp

    n_chunks = -(-B // query_chunk)
    B_pad = n_chunks * query_chunk
    padq = lambda a: jnp.pad(a, [(0, B_pad - B)] + [(0, 0)] * (a.ndim - 1))
    ts, tp = jax.lax.map(
        query_chunk_body,
        (
            padq(pids).reshape(n_chunks, query_chunk, -1),
            padq(adc_scores).reshape(n_chunks, query_chunk, -1),
            padq(Qm).reshape(n_chunks, query_chunk, q_view, -1),
            padq(qm).reshape(n_chunks, query_chunk, q_view),
        ),
    )
    k = ts.shape[-1]
    return ts.reshape(B_pad, k)[:B], tp.reshape(B_pad, k)[:B]


class ColbertSearcher:
    def __init__(
        self,
        cfg: ColbertConfig,
        tokenizer: ColbertTokenizer,
        params: Any,
        storage: IndexStorage,
        mesh=None,
        rerank_dtype=None,
    ):
        self.cfg = cfg
        self.tok = tokenizer
        # concurrent server connections share one searcher: guard the
        # compiled-fn cache so a key races to ONE jit wrapper (jax dispatch
        # itself is thread-safe)
        self._fns_lock = threading.Lock()
        self._host_executor = None  # lazy; host-table async path only
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.model = ColbertModel(cfg.model, cfg.multiview)
        self.params = jax.device_put(params, param_shardings(params, self.mesh))
        self.timers = Timers()
        if rerank_dtype is None:
            rerank_dtype = {
                "bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": jnp.int8,
            }[cfg.serve.rerank_dtype]

        meta = storage.read_meta()
        doclens = np.asarray(storage.read_doclens(), np.int32)
        self.num_docs = len(doclens)
        self.flat_dv = None

        if cfg.serve.mode == "flat":
            # exact brute-force serving (ops/flat_scan.py): no IVF index is
            # read or required — the doc-major table IS the index.  Recall
            # 1.0 by construction; the TPU-native observation is that the
            # MXU scores the whole corpus faster than the candidate funnel
            # can gather a few thousand docs (see BENCHLOG round 3).
            from colbert_tpu.ops.flat_scan import build_flat_table

            emb_np = storage.load_all_embeddings()
            self.dim = int(meta["dim"])
            dv = (
                _meta_d_view(meta, cfg)
                if meta.get("multiview", True)
                else (int(doclens.max()) if len(doclens) else 1)
            )
            dtype = "int8" if cfg.serve.rerank_dtype == "int8" else "bfloat16"
            table, inv, dv = build_flat_table(
                emb_np, doclens, dv=dv, dtype=dtype,
                rows_blk=cfg.serve.flat_rows_block or None,
            )
            self.flat_dv = dv
            self.rerank_cap = dv  # rows/doc, for oracle and introspection
            self.packed_int8 = dtype == "int8"
            self.emb_table = jnp.asarray(
                table, jnp.int8 if dtype == "int8" else jnp.bfloat16
            )
            self.emb_inv_scale = (
                jnp.asarray(inv, jnp.float32) if inv is not None else None
            )
            self.doclens = jnp.asarray(doclens, jnp.int32)
            self.uniform_doclen = bool(len(doclens) and (doclens == dv).all())
            self.host_table = None
            self.ragged_strides = None
            self._search_fns = {}
            return

        ivf = storage.read_ivf()

        # device-resident index state
        self.codec = meta.get("codec", "pq" if "codebooks" in ivf else "sq")
        self.coarse = jnp.asarray(ivf["coarse_centroids"], jnp.float32)
        self.codebooks = self.sq_proj = self.sq_scales = self.pq4_blocks = None
        if self.codec in ("pq", "pq4"):
            self.codebooks = jnp.asarray(ivf["codebooks"], jnp.float32)
        else:
            self.sq_proj = jnp.asarray(ivf["sq_proj"], jnp.float32)
            self.sq_scales = jnp.asarray(ivf["sq_scales"], jnp.float32)
        if self.codec == "pq4":
            from colbert_tpu.ops.pq4 import build_pq4_blocks, pq4_meta

            blocks = build_pq4_blocks(
                np.ascontiguousarray(ivf["codes"], np.int8), np.asarray(ivf["offsets"])
            )
            self.pq4_blocks = {
                "meta": jnp.asarray(pq4_meta(blocks)),
                "codes2": jnp.asarray(blocks.codes2),
                "row_of_padded": jnp.asarray(blocks.row_of_padded),
                "list_nonempty": jnp.asarray(
                    (ivf["offsets"][1:] > ivf["offsets"][:-1]).astype(np.int32)
                ),
            }
        self.codes = jnp.asarray(ivf["codes"])
        self.row_emb = jnp.asarray(ivf["row_emb"], jnp.int32)
        self.offsets = jnp.asarray(ivf["offsets"], jnp.int32)
        self.emb2pid = jnp.asarray(ivf["emb2pid"], jnp.int32)
        # fused CSR-row -> pid map (one gather on the hot path instead of two)
        self.pid_by_row = jnp.asarray(
            np.asarray(ivf["emb2pid"])[np.asarray(ivf["row_emb"], np.int64)], jnp.int32
        )
        self.doc_offsets = jnp.asarray(IndexStorage.doc_offsets_from_doclens(doclens.tolist()), jnp.int32)
        self.doclens = jnp.asarray(doclens, jnp.int32)

        lens = ivf["offsets"][1:] - ivf["offsets"][:-1]
        self.max_list_len = int(lens.max()) if lens.size else 1
        self.rerank_cap = (
            _meta_d_view(meta, self.cfg) if meta.get("multiview", True) else int(doclens.max() or 1)
        )
        self.uniform_doclen = bool(len(doclens) and (doclens == self.rerank_cap).all())

        emb_np = storage.load_all_embeddings()
        dim = int(meta["dim"])
        self.dim = dim
        self.host_table = None
        self.ragged_strides = None
        self.packed_int8 = rerank_dtype == jnp.int8
        if cfg.serve.rerank_table == "host":
            # the reference's table placement (host RAM, colbert_ranker.py:61-73):
            # corpus bounded by host memory; only the funnel's top candidates
            # ever cross host->device, as int8 (4x less traffic than fp32)
            from colbert_tpu.ops.rerank_pallas import quantize_emb_table

            q8, scale = quantize_emb_table(emb_np)
            if self.uniform_doclen:
                # doc-major contiguous rows: one fancy-index per candidate
                self.host_table = np.ascontiguousarray(
                    q8[: self.num_docs * self.rerank_cap].reshape(self.num_docs, -1)
                )
                self.host_offsets = None
            else:
                # ragged-native, like the reference's flat CSR host tensor
                # (colbert_ranker.py:61-73): candidate doc rows are gathered
                # on host by offset+doclen and zero-masked on device
                self.host_table = np.ascontiguousarray(q8)
                self.host_offsets = np.asarray(
                    IndexStorage.doc_offsets_from_doclens(doclens.tolist()), np.int64
                )
            self.host_doclens = doclens.astype(np.int32)
            self.emb_inv_scale = jnp.asarray(1.0 / scale, jnp.float32)
            self.emb_table = jnp.zeros((1, dim), jnp.bfloat16)  # unused placeholder
            self.packed_int8 = False
            self.nk = dim // 128 if dim % 128 == 0 else 0
            self._search_fns = {}
            return
        ragged_fast = (
            not self.uniform_doclen
            and self.num_docs > 0
            and dim % 128 == 0
            and (
                (cfg.serve.rerank_kernel == "pallas"
                 and jax.default_backend() not in ("cpu", "gpu"))
                or cfg.serve.rerank_kernel == "pallas_interpret"
            )
        )
        if ragged_fast:
            # ragged-corpus FAST path: the reference's percentile stride
            # buckets (colbert_ranker.py:36-41) as per-stride zero-padded
            # doc-major tables, scored by the fused uniform kernel with
            # per-bucket candidate routing (see retrieval_core).
            from colbert_tpu.ops.rerank_pallas import (
                build_ragged_buckets, pack_int8_table, quantize_emb_table,
                stride_buckets,
            )

            nk = dim // 128
            self.nk = nk
            if self.packed_int8:
                # lane-packed int8 needs (nk * stride) % 32 == 0
                row_mult = 16 if (nk * 16) % 32 == 0 else 32
                strides = stride_buckets(doclens, row_multiple=row_mult)
                q8, scale = quantize_emb_table(emb_np)
                raw, b_of, s_of = build_ragged_buckets(q8, doclens, strides)
                tables = tuple(
                    jnp.asarray(pack_int8_table(t, s)) for t, s in zip(raw, strides)
                )
                self.emb_inv_scale = jnp.asarray(1.0 / scale, jnp.float32)
            else:
                strides = stride_buckets(doclens, row_multiple=16)
                raw, b_of, s_of = build_ragged_buckets(
                    np.asarray(emb_np, np.float32), doclens, strides
                )
                # the fused kernel streams bf16 tiles; fp32 requests are
                # served at bf16 table precision on this path
                tables = tuple(jnp.asarray(t, jnp.bfloat16) for t in raw)
                self.emb_inv_scale = None
            self.ragged_strides = tuple(int(s) for s in strides)
            self.emb_table = (tables, jnp.asarray(b_of), jnp.asarray(s_of))
            self._oracle_emb = emb_np  # host copy, search_brute_force only
            self._search_fns = {}
            return
        if self.packed_int8:
            # beyond-HBM serving mode: int8 lane-packed table = 4x the corpus
            # per HBM byte vs the reference's fp16 table
            # (colbert_ranker.py:61-73); exactness up to int8 quantization
            from colbert_tpu.ops.rerank_pallas import pack_int8_table, quantize_emb_table

            if not self.uniform_doclen:
                raise ValueError(
                    "rerank_dtype=int8 requires a uniform-doclen (multiview) "
                    "corpus (ragged corpora get int8 via the stride-bucketed "
                    "pallas rerank: serve.rerank_kernel='pallas')"
                )
            q8, scale = quantize_emb_table(emb_np)
            self.emb_table = jnp.asarray(pack_int8_table(q8, self.rerank_cap))
            self.emb_inv_scale = jnp.asarray(1.0 / scale, jnp.float32)
            self.nk = dim // 128
        else:
            self.emb_table = jnp.asarray(emb_np.astype(np.float32), rerank_dtype)
            self.emb_inv_scale = None
            self.nk = dim // 128 if dim % 128 == 0 else 0
        self._search_fns = {}

    # ---- jitted pipeline ----

    def _make_flat_fn(self, topk: int):
        """Exact serving: encode -> stream-scan the whole table -> top-k."""
        from colbert_tpu.ops.flat_scan import (
            flat_maxsim_scan, flat_scan_topk, flat_topk,
        )

        model = self.model
        dv = self.flat_dv
        num_docs = self.num_docs
        s = self.cfg.serve
        segment = s.flat_segment_docs
        rows_blk = s.flat_rows_block
        fused = s.flat_fused_topk
        score_dtype = s.flat_score_dtype
        if score_dtype == "auto":
            # fp32 scores below 256k docs (tie-exact at negligible memory);
            # bf16 above (halves the score matrix — the 1M-doc envelope cap)
            score_dtype = "float32" if num_docs <= (1 << 18) else "bfloat16"

        def fn(params, table, inv, q_ids, q_attn, q_active):
            Q = model.apply({"params": params}, q_ids, q_attn, method=model.query)
            Qm = Q * q_active.astype(Q.dtype)[..., None]
            if inv is not None:
                Qm = Qm * inv
            if fused:
                return flat_scan_topk(
                    Qm.astype(jnp.float32), table, dv=dv, num_docs=num_docs,
                    topk=topk, rows_blk=rows_blk, score_dtype=score_dtype,
                )
            scores = flat_maxsim_scan(
                Qm.astype(jnp.float32), table, dv=dv, rows_blk=rows_blk
            )
            return flat_topk(scores, num_docs, topk, segment=segment)

        return jax.jit(fn)

    def _search_tokens_flat(self, q_ids, q_attn, q_active, topk: int):
        key = ("flat", topk)
        with self._fns_lock:
            if key not in self._search_fns:
                self._search_fns[key] = self._make_flat_fn(topk)
        return self._search_fns[key](
            self.params, self.emb_table, self.emb_inv_scale,
            jnp.asarray(q_ids), jnp.asarray(q_attn), jnp.asarray(q_active),
        )

    def _make_search_fn(self, topk: int, nprobe: int, depth: int, cap: int, max_cand: int,
                        query_chunk: int, stop_stage: Optional[str] = None):
        model = self.model
        rerank_cap = self.rerank_cap
        codec = self.codec
        uniform = self.uniform_doclen
        ranking = self.cfg.serve.candidate_ranking

        packed_int8 = self.packed_int8

        stop_stage = stop_stage or getattr(self, "debug_stop_stage", None)
        want_q = stop_stage == "candidates"

        def fn(params, coarse, quant, codes, offsets, pid_by_row,
               emb_table, emb_inv_scale, doc_offsets, doclens, q_ids, q_attn, q_active):
            Q = model.apply({"params": params}, q_ids, q_attn, method=model.query)  # (B, qv, dim)
            qm = q_active.astype(Q.dtype)
            Qm = Q * qm[..., None]
            if stop_stage == "encode":  # timing attribution only
                return Qm[:, :, 0], (q_active[:, :1] * 0 - 1)
            probe_stop = (
                stop_stage.split(":", 1)[1]
                if stop_stage and stop_stage.startswith("probe:") else None
            )
            probe_fn = make_probe_fn(
                codec, coarse, quant, codes, offsets, nprobe=nprobe, cap=cap, depth=depth,
                approx_topk=self.cfg.serve.approx_probe_topk,
                probe_impl=self.cfg.serve.probe_impl,
                list_topr=self.cfg.serve.probe_list_topr,
                probe_stop=probe_stop,
                hot_cap=self.cfg.serve.probe_hot_lists or max(64, nprobe),
            )
            out = retrieval_core(
                Qm, qm, probe_fn, pid_by_row,
                emb_table, doc_offsets, doclens,
                depth=depth, max_cand=max_cand,
                rerank_cap=rerank_cap, topk=topk, query_chunk=query_chunk,
                uniform_doclen=uniform, candidate_ranking=ranking,
                rerank_kernel=self.cfg.serve.rerank_kernel,
                emb_inv_scale=emb_inv_scale, packed_int8=packed_int8,
                dedup_impl=self.cfg.serve.dedup_impl,
                stop_stage=stop_stage,
                ragged_strides=self.ragged_strides,
            )
            if want_q:
                return out + (Qm, qm)
            return out

        return jax.jit(fn)

    @property
    def _quant(self):
        if self.codec == "pq":
            return self.codebooks
        if self.codec == "pq4":
            b = self.pq4_blocks
            return (self.codebooks, b["meta"], b["codes2"], b["row_of_padded"], b["list_nonempty"])
        return (self.sq_proj, self.sq_scales)

    # ---- public API ----

    def search(
        self,
        questions: Sequence[str],
        topk: Optional[int] = None,
        nprobe: Optional[int] = None,
        depth: Optional[int] = None,
        query_chunk: int = 8,
    ) -> SearchResult:
        enc = self.tok.encode_queries(list(questions))
        return self.search_tokens(
            enc.input_ids, enc.attention_mask, enc.active_mask,
            topk=topk, nprobe=nprobe, depth=depth, query_chunk=query_chunk,
        )

    def search_tokens(
        self,
        q_ids,
        q_attn,
        q_active,
        topk: Optional[int] = None,
        nprobe: Optional[int] = None,
        depth: Optional[int] = None,
        query_chunk: int = 8,
    ) -> SearchResult:
        """Search from pre-tokenized queries (the fused device pipeline)."""
        s = self.cfg.serve
        topk = topk or s.topk
        if self.flat_dv is not None:
            with self.timers.span("search"):
                ts, tp = self._search_tokens_flat(q_ids, q_attn, q_active, topk)
            return SearchResult(np.asarray(tp), np.asarray(ts))
        nprobe = min(nprobe or s.nprobe, int(self.coarse.shape[0]))
        depth = depth or s.candidate_depth
        cap = self.max_list_len
        max_cand = min(s.max_candidates, self.num_docs)
        if self.host_table is not None:
            return self._search_tokens_host(
                q_ids, q_attn, q_active, topk, nprobe, depth, max_cand, query_chunk
            )
        key = (topk, nprobe, depth, cap, max_cand, query_chunk)
        with self._fns_lock:
            if key not in self._search_fns:
                self._search_fns[key] = self._make_search_fn(*key)
        fn = self._search_fns[key]

        inv = self.emb_inv_scale if self.emb_inv_scale is not None else jnp.ones((1,), jnp.float32)
        with self.timers.span("search"):
            ts, tp = fn(
                self.params, self.coarse, self._quant, self.codes, self.offsets,
                self.pid_by_row, self.emb_table, inv, self.doc_offsets, self.doclens,
                jnp.asarray(q_ids), jnp.asarray(q_attn), jnp.asarray(q_active),
            )
        return SearchResult(np.asarray(tp), np.asarray(ts))

    def _host_rerank_fn(self, topk: int):
        """Jitted exact MaxSim over host-gathered int8 candidate blocks."""
        dv = self.rerank_cap

        def fn(Qm, qm, inv, cand, dl, blocks):
            B, hc = cand.shape
            D = blocks.reshape(B, hc, dv, -1).astype(jnp.bfloat16)
            valid = (jnp.arange(dv)[None, None, :] < dl[..., None]) & (cand >= 0)[..., None]
            scores = maxsim_qd(
                (Qm * inv).astype(jnp.bfloat16), D, qm.astype(jnp.bfloat16),
                valid.astype(jnp.bfloat16),
            )
            scores = jnp.where(cand >= 0, scores, -jnp.inf)
            ts, ti = jax.lax.top_k(scores, min(topk, hc))
            tp = jnp.take_along_axis(cand, ti, axis=1)
            return ts, jnp.where(jnp.isfinite(ts), tp, -1)

        return jax.jit(fn)

    def _host_candidates(self, q_ids, q_attn, q_active, topk, nprobe, depth,
                         max_cand, query_chunk):
        """Dispatch the on-device candidate funnel (async — device arrays are
        returned without synchronizing)."""
        key = ("host-cand", nprobe, depth, self.max_list_len, max_cand, query_chunk)
        with self._fns_lock:
            if key not in self._search_fns:
                self._search_fns[key] = self._make_search_fn(
                    topk, nprobe, depth, self.max_list_len, max_cand, query_chunk,
                    stop_stage="candidates",
                )
            rkey = ("host-rerank", topk)
            if rkey not in self._search_fns:
                self._search_fns[rkey] = self._host_rerank_fn(topk)
        _, cand, Qm, qm = self._search_fns[key](
            self.params, self.coarse, self._quant, self.codes, self.offsets,
            self.pid_by_row, self.emb_table, self.emb_inv_scale, self.doc_offsets,
            self.doclens,
            jnp.asarray(q_ids), jnp.asarray(q_attn), jnp.asarray(q_active),
        )
        return cand, Qm, qm

    def _host_finish(self, cand, Qm, qm, topk, hc):
        """Synchronize candidates, gather their doc blocks from the host-RAM
        table, dispatch the exact device re-rank.  Returns DEVICE arrays."""
        with self.timers.span("host_candidates"):
            cand_np = np.asarray(cand)[:, :hc]
        with self.timers.span("host_gather"):
            # pid-sorted gather for host memory locality; order is irrelevant
            # (the exact re-rank re-scores everything)
            order = np.argsort(cand_np, axis=1, kind="stable")
            cand_sorted = np.take_along_axis(cand_np, order, axis=1)
            safe = np.maximum(cand_sorted, 0)
            if self.host_offsets is None:
                blocks = self.host_table[safe.reshape(-1)]
            else:
                # ragged CSR gather: doc d's rows live at
                # host_table[offsets[d] : offsets[d] + doclens[d]]; rows past
                # the doclen gather junk that the device mask zeroes
                cap = self.rerank_cap
                idx = self.host_offsets[safe][..., None] + np.arange(cap)[None, None, :]
                idx = np.minimum(idx, self.host_table.shape[0] - 1)
                blocks = self.host_table[idx.reshape(-1)]
            dl = self.host_doclens[safe]
            blocks = blocks.reshape(cand_np.shape[0], hc, -1)
        with self.timers.span("host_rerank"):
            ts, tp = self._search_fns[("host-rerank", topk)](
                Qm, qm, self.emb_inv_scale, jnp.asarray(cand_sorted),
                jnp.asarray(dl), jnp.asarray(blocks),
            )
        return ts, tp

    def _search_tokens_host(self, q_ids, q_attn, q_active, topk, nprobe, depth,
                            max_cand, query_chunk) -> SearchResult:
        """Host-streamed rerank: device candidates -> host int8 gather ->
        device exact MaxSim.  The candidate funnel (dedup output is ranked
        desc by approx-MaxSim) bounds host->device traffic to
        ``host_rerank_candidates * d_view * dim`` int8 bytes per query —
        the reference's host-RAM table (colbert_ranker.py:61-73) with a
        PLAID-style funnel instead of a full-depth gather."""
        s = self.cfg.serve
        hc = max(topk, min(s.host_rerank_candidates, max_cand, self.num_docs))
        cand, Qm, qm = self._host_candidates(
            q_ids, q_attn, q_active, topk, nprobe, depth, max_cand, query_chunk
        )
        ts, tp = self._host_finish(cand, Qm, qm, topk, hc)
        return SearchResult(np.asarray(tp), np.asarray(ts))

    def search_tokens_device(self, q_ids, q_attn, q_active, topk=None, nprobe=None,
                             depth=None, query_chunk: int = 8):
        """Like :meth:`search_tokens` but returns DEVICE arrays (scores,
        pids) without synchronizing — the async serving path: submitting the
        next batch before fetching the previous one overlaps the per-call
        dispatch/transfer latency with device execution (the reference's
        serving loop is fully synchronous per batch,
        ``dense_server_client.py:39-49``)."""
        if self.flat_dv is not None:
            return self._search_tokens_flat(
                q_ids, q_attn, q_active, topk or self.cfg.serve.topk
            )
        if self.host_table is not None:
            # double-buffered beyond-HBM path: the candidate funnel for this
            # batch is dispatched NOW (async); the mid-pipeline host gather +
            # rerank dispatch run on a dedicated worker thread, so batch i's
            # host `take` overlaps batch i+1's device probe (the pinned-buffer
            # overlap intent of the reference, colbert_ranker.py:53-59)
            s = self.cfg.serve
            topk = topk or s.topk
            nprobe = min(nprobe or s.nprobe, int(self.coarse.shape[0]))
            depth = depth or s.candidate_depth
            max_cand = min(s.max_candidates, self.num_docs)
            hc = max(topk, min(s.host_rerank_candidates, max_cand, self.num_docs))
            cand, Qm, qm = self._host_candidates(
                q_ids, q_attn, q_active, topk, nprobe, depth, max_cand, query_chunk
            )
            with self._fns_lock:
                if self._host_executor is None:
                    from concurrent.futures import ThreadPoolExecutor

                    # ONE worker: host gathers from concurrent batches
                    # serialize (they contend for the same memory bandwidth
                    # anyway) while the main thread keeps dispatching probes
                    self._host_executor = ThreadPoolExecutor(
                        max_workers=1, thread_name_prefix="host-rerank"
                    )
            fut = self._host_executor.submit(
                self._host_finish, cand, Qm, qm, topk, hc
            )
            return _PendingResult(fut)
        s = self.cfg.serve
        topk = topk or s.topk
        nprobe = min(nprobe or s.nprobe, int(self.coarse.shape[0]))
        depth = depth or s.candidate_depth
        key = (topk, nprobe, depth, self.max_list_len,
               min(s.max_candidates, self.num_docs), query_chunk)
        with self._fns_lock:
            if key not in self._search_fns:
                self._search_fns[key] = self._make_search_fn(*key)
        inv = self.emb_inv_scale if self.emb_inv_scale is not None else jnp.ones((1,), jnp.float32)
        return self._search_fns[key](
            self.params, self.coarse, self._quant, self.codes, self.offsets,
            self.pid_by_row, self.emb_table, inv, self.doc_offsets, self.doclens,
            jnp.asarray(q_ids), jnp.asarray(q_attn), jnp.asarray(q_active),
        )

    def search_brute_force(self, questions: Sequence[str], topk: int) -> SearchResult:
        """Exact MaxSim over the WHOLE corpus (no ANN) — the recall oracle
        (BASELINE config 1; SURVEY §7 step 2)."""
        enc = self.tok.encode_queries(list(questions))
        Q = self.model.apply(
            {"params": self.params}, jnp.asarray(enc.input_ids), jnp.asarray(enc.attention_mask),
            method=self.model.query,
        )
        Qm = Q * jnp.asarray(enc.active_mask, Q.dtype)[..., None]
        B = Q.shape[0]
        if self.flat_dv is not None:
            # independent oracle for the flat path: fp32 XLA all-pairs
            cap = self.flat_dv
            D = self.emb_table[: self.num_docs * cap].reshape(
                self.num_docs, cap, -1
            ).astype(jnp.float32)
            if self.emb_inv_scale is not None:
                D = D * self.emb_inv_scale
            from colbert_tpu.ops.maxsim import maxsim_xla

            scores = maxsim_xla(Qm.astype(jnp.float32), D)
            k = min(topk, self.num_docs)
            ts, tp = jax.lax.top_k(scores, k)
            return SearchResult(np.asarray(tp, np.int32), np.asarray(ts))
        cap = self.rerank_cap
        valid = jnp.arange(cap)[None, :] < self.doclens[:, None]
        if self.host_table is not None:
            if self.host_table.size > (1 << 28):
                raise ValueError(
                    "search_brute_force with a host table this large would "
                    "materialize it on device; use ANN search"
                )
            if self.host_offsets is not None:  # ragged CSR host table
                idx = self.host_offsets[:, None] + np.arange(cap)[None, :]
                idx = np.minimum(idx[: self.num_docs], self.host_table.shape[0] - 1)
                D = jnp.asarray(
                    self.host_table[idx.reshape(-1)].reshape(self.num_docs, cap, -1)
                )
            else:
                D = jnp.asarray(self.host_table).reshape(self.num_docs, cap, -1)
            D = D.astype(jnp.float32) * self.emb_inv_scale
        elif self.ragged_strides is not None:
            # oracle from the retained host copy (the serving path holds
            # only the stride-bucketed tables)
            table = jnp.asarray(np.asarray(self._oracle_emb, np.float32))
            base = self.doc_offsets[jnp.arange(self.num_docs, dtype=jnp.int32)]
            idx = base[:, None] + jnp.arange(cap)[None, :]
            idx = jnp.clip(idx, 0, table.shape[0] - 1)
            D = table[idx.reshape(-1)].reshape(self.num_docs, cap, -1)
        elif self.packed_int8:
            # dequantize the lane-packed table (oracle path: small corpora)
            D = self.emb_table.reshape(self.num_docs, self.nk, cap, 128)
            D = jnp.transpose(D, (0, 2, 1, 3)).reshape(self.num_docs, cap, -1)
            D = D.astype(jnp.float32) * self.emb_inv_scale
        else:
            all_pids = jnp.arange(self.num_docs, dtype=jnp.int32)
            base = self.doc_offsets[all_pids]
            idx = base[:, None] + jnp.arange(cap)[None, :]
            idx = jnp.clip(idx, 0, self.emb_table.shape[0] - 1)
            D = self.emb_table[idx.reshape(-1)].reshape(self.num_docs, cap, -1)
        from colbert_tpu.ops.maxsim import maxsim_xla

        scores = maxsim_xla(
            Qm.astype(jnp.float32), D.astype(jnp.float32), None, valid.astype(jnp.float32)
        )
        k = min(topk, self.num_docs)
        ts, tp = jax.lax.top_k(scores, k)
        return SearchResult(np.asarray(tp, np.int32), np.asarray(ts))
