"""Corpus-sharded SPMD search: per-chip IVF-PQ shards + ICI top-k merge.

The BASELINE north star: "corpus sharded across a pod slice with ICI
all-gather top-k merge".  The reference's analogue is faiss's single-process
multi-GPU index sharding (``colbert_ranker.py:145-157``); here each device
of the mesh's ``data`` axis owns a contiguous slice of the corpus (its own
CSR IVF arrays + embedding table over SHARED coarse/PQ codebooks), the full
query batch runs the complete local pipeline per shard inside ``shard_map``,
and per-shard top-k results are merged with one all-gather over ICI.

Host-side, :func:`shard_index` re-partitions a globally built index into
per-shard stacked arrays (padded to equal sizes so the stack shards evenly).
"""

from __future__ import annotations

import threading
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from colbert_tpu.config import ColbertConfig
from colbert_tpu.indexing.storage import IndexStorage
from colbert_tpu.models import ColbertModel
from colbert_tpu.models.sharding import param_shardings
from colbert_tpu.ops.ivf import sort_by_list
from colbert_tpu.parallel.mesh import AXES, local_shard_bounds, make_mesh
from colbert_tpu.ranking.searcher import SearchResult, make_probe_fn, retrieval_core
from colbert_tpu.tokenization import ColbertTokenizer
from colbert_tpu.utils.logging import get_logger

logger = get_logger("sharded")


def _pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


def shard_index(storage: IndexStorage, n_shards: int) -> Dict[str, np.ndarray]:
    """Split a globally built index into ``n_shards`` contiguous pid ranges.

    Returns stacked arrays with a leading shard axis, plus per-shard
    ``pid_base`` so local pids map back to global.
    """
    ivf = storage.read_ivf()
    doclens = np.asarray(storage.read_doclens(), np.int64)
    num_docs = len(doclens)
    emb2pid = ivf["emb2pid"]
    K = ivf["offsets"].shape[0] - 1
    # un-sort codes back to embedding order once, then re-sort per shard
    codes_by_emb = np.empty_like(ivf["codes"])
    codes_by_emb[ivf["row_emb"]] = ivf["codes"]
    assign_by_emb = np.repeat(
        np.arange(K, dtype=np.int32), ivf["offsets"][1:] - ivf["offsets"][:-1]
    )
    assign_sorted = np.empty(emb2pid.shape[0], np.int32)
    assign_sorted[ivf["row_emb"]] = assign_by_emb

    emb_all = np.asarray(storage.load_all_embeddings())
    doc_off_all = IndexStorage.doc_offsets_from_doclens(doclens.tolist())

    shards: Dict[str, list] = {k: [] for k in (
        "codes", "row_emb", "offsets", "emb2pid", "pid_by_row", "emb_table",
        "doc_offsets", "doclens", "pid_base", "num_docs"
    )}
    bounds = [local_shard_bounds(num_docs, s, n_shards) for s in range(n_shards)]
    max_docs = max(hi - lo for lo, hi in bounds)
    max_embs = max(int(doclens[lo:hi].sum()) for lo, hi in bounds)
    for s, (lo, hi) in enumerate(bounds):
        e_lo, e_hi = int(doc_off_all[lo]), int(doc_off_all[hi])
        a = assign_sorted[e_lo:e_hi]
        c = codes_by_emb[e_lo:e_hi]
        perm, offsets = sort_by_list(a, K)
        n_local = e_hi - e_lo
        shards["codes"].append(_pad_rows(c[perm], max_embs))
        shards["row_emb"].append(_pad_rows(perm.astype(np.int32), max_embs, fill=-1))
        shards["offsets"].append(offsets)
        e2p_local = (emb2pid[e_lo:e_hi] - lo).astype(np.int32)
        shards["emb2pid"].append(_pad_rows(e2p_local, max_embs, fill=-1))
        shards["pid_by_row"].append(_pad_rows(e2p_local[perm], max_embs, fill=-1))
        shards["emb_table"].append(_pad_rows(emb_all[e_lo:e_hi], max_embs))
        dl = doclens[lo:hi].astype(np.int32)
        shards["doclens"].append(_pad_rows(dl, max_docs))
        d_off = np.zeros(max_docs + 1, np.int32)
        np.cumsum(_pad_rows(dl, max_docs), out=d_off[1:])
        shards["doc_offsets"].append(d_off)
        shards["pid_base"].append(np.asarray([lo], np.int32))
        shards["num_docs"].append(np.asarray([hi - lo], np.int32))
    return {k: np.stack(v) for k, v in shards.items()}


class ShardedColbertSearcher:
    """Same contract as :class:`ColbertSearcher`, corpus sharded over the
    mesh's ``data`` axis."""

    def __init__(
        self,
        cfg: ColbertConfig,
        tokenizer: ColbertTokenizer,
        params: Any,
        storage: IndexStorage,
        mesh: Optional[Mesh] = None,
        rerank_dtype=None,
    ):
        self.cfg = cfg
        self.tok = tokenizer
        # per-connection server threads share one searcher: serialize
        # compiled-fn cache inserts (mirrors ColbertSearcher._fns_lock)
        self._fns_lock = threading.Lock()
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.n_shards = self.mesh.shape[AXES.data]
        self.model = ColbertModel(cfg.model, cfg.multiview)
        self.params = jax.device_put(params, param_shardings(params, self.mesh))
        if rerank_dtype is None:
            rerank_dtype = {
                "bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": jnp.int8,
            }[cfg.serve.rerank_dtype]

        meta = storage.read_meta()
        self.flat_dv = None
        if cfg.serve.mode == "flat":
            self._init_flat(storage, meta, rerank_dtype)
            return
        ivf = storage.read_ivf()
        if meta.get("codec") == "pq4":
            raise ValueError(
                "the pq4 codec's dense block scan is single-chip only (cost "
                "grows with corpus x tokens); use codec='sq' for sharded serving"
            )
        sh = shard_index(storage, self.n_shards)
        dl_all_np = np.asarray(storage.read_doclens())
        from colbert_tpu.ranking.searcher import _meta_d_view

        self.rerank_cap = (
            _meta_d_view(meta, cfg) if meta.get("multiview", True)
            else max(1, int(dl_all_np.max()))
        )
        self.uniform_doclen = bool(len(dl_all_np) and (dl_all_np == self.rerank_cap).all())
        self.packed_int8 = rerank_dtype == jnp.int8
        dim = int(meta["dim"])
        if self.packed_int8:
            # beyond-HBM x multi-chip: each shard's table is int8 lane-packed
            # with ONE global per-dim scale (scores merge across shards, so
            # per-shard scales would skew the all-gather top-k)
            from colbert_tpu.ops.rerank_pallas import pack_int8_table, quantize_emb_table

            if not self.uniform_doclen:
                raise ValueError(
                    "rerank_dtype=int8 requires a uniform-doclen (multiview) corpus"
                )
            S, max_embs, _ = sh["emb_table"].shape
            q8, scale = quantize_emb_table(sh["emb_table"].reshape(S * max_embs, dim))
            q8 = q8.reshape(S, max_embs, dim)
            emb_shard = np.stack(
                [pack_int8_table(q8[s], self.rerank_cap) for s in range(S)]
            )
            self.emb_inv_scale = jnp.asarray(1.0 / scale, jnp.float32)
        else:
            emb_shard = sh["emb_table"].astype(np.float32)
            self.emb_inv_scale = None
        shard0 = NamedSharding(self.mesh, P(AXES.data))
        put = lambda a, dt=None: jax.device_put(jnp.asarray(a, dt), shard0)
        self.arrays = {
            "codes": put(sh["codes"]),
            "row_emb": put(sh["row_emb"], jnp.int32),
            "pid_by_row": put(sh["pid_by_row"], jnp.int32),
            "offsets": put(sh["offsets"], jnp.int32),
            "emb2pid": put(sh["emb2pid"], jnp.int32),
            "emb_table": put(emb_shard, jnp.int8 if self.packed_int8 else rerank_dtype),
            "doc_offsets": put(sh["doc_offsets"], jnp.int32),
            "doclens": put(sh["doclens"], jnp.int32),
            "pid_base": put(sh["pid_base"], jnp.int32),
        }
        # shared (replicated) quantizers
        rep = NamedSharding(self.mesh, P())
        self.codec = meta.get("codec", "pq" if "codebooks" in ivf else "sq")
        self.coarse = jax.device_put(jnp.asarray(ivf["coarse_centroids"], jnp.float32), rep)
        if self.codec == "pq":
            self.quant = jax.device_put(jnp.asarray(ivf["codebooks"], jnp.float32), rep)
        else:
            self.quant = (
                jax.device_put(jnp.asarray(ivf["sq_proj"], jnp.float32), rep),
                jax.device_put(jnp.asarray(ivf["sq_scales"], jnp.float32), rep),
            )

        lens = sh["offsets"][:, 1:] - sh["offsets"][:, :-1]
        self.max_list_len = max(1, int(lens.max()))
        self.num_docs = int(np.asarray(storage.read_meta()["num_docs"]))
        # (rerank_cap / uniform_doclen computed above, before table packing;
        # shard padding keeps the doc-major layout intact — padded docs have
        # len 0 and probe rows in padding map to pid -1)
        self._fns: Dict[Tuple, Any] = {}

    def _init_flat(self, storage: IndexStorage, meta: Dict, rerank_dtype) -> None:
        """Corpus-sharded exact serving: each shard owns a contiguous
        doc-major flat table slice; per-shard streaming MaxSim scan + local
        top-k, merged with one ICI all-gather.  No IVF index is read."""
        from colbert_tpu.ops.flat_scan import build_flat_table, pick_rows_block
        from colbert_tpu.ranking.searcher import _meta_d_view

        cfg = self.cfg
        dl_all = np.asarray(storage.read_doclens(), np.int64)
        self.num_docs = len(dl_all)
        dim = int(meta["dim"])
        dv = (
            _meta_d_view(meta, cfg)
            if meta.get("multiview", True)
            else (int(dl_all.max()) if len(dl_all) else 1)
        )
        self.flat_dv = dv
        self.packed_int8 = rerank_dtype == jnp.int8
        self.uniform_doclen = bool(len(dl_all) and (dl_all == dv).all())

        emb_all = storage.load_all_embeddings()
        if self.packed_int8:
            # ONE global scale: scores merge across shards in the all-gather
            from colbert_tpu.ops.rerank_pallas import quantize_emb_table

            src, scale = quantize_emb_table(emb_all)
            self.emb_inv_scale = jnp.asarray(1.0 / scale, jnp.float32)
            dev_dtype = jnp.int8
        else:
            src = np.asarray(emb_all, np.float32)
            self.emb_inv_scale = None
            dev_dtype = jnp.bfloat16

        doc_off = IndexStorage.doc_offsets_from_doclens(dl_all.tolist())
        bounds = [
            local_shard_bounds(self.num_docs, s, self.n_shards)
            for s in range(self.n_shards)
        ]
        tables, n_local = [], []
        for lo, hi in bounds:
            e_lo, e_hi = int(doc_off[lo]), int(doc_off[hi])
            t, _, _ = build_flat_table(
                src[e_lo:e_hi], dl_all[lo:hi], dv=dv, dtype="raw"
            )
            tables.append(t)
            n_local.append(hi - lo)
        rb = pick_rows_block(dv, 1 if self.packed_int8 else 2)
        max_rows = -(-max(t.shape[0] for t in tables) // rb) * rb
        stacked = np.stack([_pad_rows(t, max_rows) for t in tables])
        shard0 = NamedSharding(self.mesh, P(AXES.data))
        self.arrays = {
            "emb_table": jax.device_put(jnp.asarray(stacked, dev_dtype), shard0),
            "pid_base": jax.device_put(
                jnp.asarray([[lo] for lo, _ in bounds], jnp.int32), shard0
            ),
            "n_local": jax.device_put(
                jnp.asarray([[n] for n in n_local], jnp.int32), shard0
            ),
        }
        self._fns: Dict[Tuple, Any] = {}

    def _make_flat_fn(self, topk: int):
        from colbert_tpu.ops.flat_scan import flat_maxsim_scan, flat_topk

        model = self.model
        mesh = self.mesh
        dv = self.flat_dv
        segment = self.cfg.serve.flat_segment_docs

        def local(emb_table, pid_base, n_local, Qm, inv):
            table = emb_table[0]
            if inv.shape[0] == table.shape[1]:
                Qm = Qm * inv
            scores = flat_maxsim_scan(Qm.astype(jnp.float32), table, dv=dv)
            docs_pad = scores.shape[0]
            valid = jnp.arange(docs_pad) < n_local[0, 0]
            scores = jnp.where(valid[:, None], scores, -jnp.inf)
            ts, ti = flat_topk(scores, docs_pad, min(topk, docs_pad), segment=segment)
            tp = jnp.where(jnp.isfinite(ts), ti + pid_base[0, 0], -1)
            all_ts = jax.lax.all_gather(ts, AXES.data, axis=-1, tiled=True)
            all_tp = jax.lax.all_gather(tp, AXES.data, axis=-1, tiled=True)
            s, i = jax.lax.top_k(all_ts, min(topk, all_ts.shape[-1]))
            return s, jnp.take_along_axis(all_tp, i, axis=-1)

        data = AXES.data
        sharded = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(data), P(data), P(data), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )

        def fn(params, arrays, q_inputs, inv):
            q_ids, q_attn, q_active = q_inputs
            Q = model.apply({"params": params}, q_ids, q_attn, method=model.query)
            Qm = Q * q_active.astype(Q.dtype)[..., None]
            return sharded(
                arrays["emb_table"], arrays["pid_base"], arrays["n_local"], Qm, inv
            )

        return jax.jit(fn)

    def _make_fn(self, topk, nprobe, depth, cap, max_cand, query_chunk):
        model = self.model
        rerank_cap = self.rerank_cap
        mesh = self.mesh
        codec = self.codec
        uniform = self.uniform_doclen
        k_local = min(topk, max_cand)

        packed_int8 = self.packed_int8

        def local(coarse, quant, codes, pid_by_row, offsets,
                  emb_table, doc_offsets, doclens, pid_base, Qm, qm, emb_inv_scale):
            # shard_map gives blocks with the leading shard axis of size 1
            sq = lambda a: a[0]
            probe_fn = make_probe_fn(
                codec, coarse, quant, sq(codes), sq(offsets),
                nprobe=nprobe, cap=cap, depth=depth,
                approx_topk=self.cfg.serve.approx_probe_topk,
                probe_impl=self.cfg.serve.probe_impl,
                list_topr=self.cfg.serve.probe_list_topr,
                hot_cap=self.cfg.serve.probe_hot_lists or max(64, nprobe),
            )
            ts, tp = retrieval_core(
                Qm, qm, probe_fn, sq(pid_by_row),
                sq(emb_table), sq(doc_offsets), sq(doclens),
                depth=depth, max_cand=max_cand,
                rerank_cap=rerank_cap, topk=k_local, query_chunk=query_chunk,
                uniform_doclen=uniform,
                candidate_ranking=self.cfg.serve.candidate_ranking,
                rerank_kernel=self.cfg.serve.rerank_kernel,
                emb_inv_scale=emb_inv_scale, packed_int8=packed_int8,
                dedup_impl=self.cfg.serve.dedup_impl,
            )
            tp = jnp.where(tp >= 0, tp + sq(pid_base)[0], -1)
            # ICI merge: gather every shard's local top-k, reduce to global top-k
            all_ts = jax.lax.all_gather(ts, AXES.data, axis=-1, tiled=True)
            all_tp = jax.lax.all_gather(tp, AXES.data, axis=-1, tiled=True)
            s, i = jax.lax.top_k(all_ts, min(topk, all_ts.shape[-1]))
            return s, jnp.take_along_axis(all_tp, i, axis=-1)

        data = AXES.data
        quant_spec = P() if codec == "pq" else (P(), P())
        sharded = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(), quant_spec,                # coarse + quantizer (replicated)
                P(data), P(data), P(data), P(data), P(data), P(data), P(data),
                P(), P(),                       # Qm, qm replicated
                P(),                            # emb_inv_scale (replicated)
            ),
            out_specs=(P(), P()),
            check_rep=False,
        )

        def fn(params, coarse, quant, arrays, Qm_inputs, emb_inv_scale):
            # index arrays are jit ARGUMENTS, never closure constants — a
            # closed-over device array gets baked into the serialized HLO
            # (hundreds of MB for the embedding table)
            q_ids, q_attn, q_active = Qm_inputs
            Q = model.apply({"params": params}, q_ids, q_attn, method=model.query)
            qm = q_active.astype(Q.dtype)
            Qm = Q * qm[..., None]
            a = arrays
            return sharded(
                coarse, quant, a["codes"], a["pid_by_row"], a["offsets"],
                a["emb_table"], a["doc_offsets"], a["doclens"], a["pid_base"],
                Qm, qm, emb_inv_scale,
            )

        return jax.jit(fn)

    def search(self, questions: Sequence[str], topk=None, nprobe=None, depth=None, query_chunk: int = 8) -> SearchResult:
        enc = self.tok.encode_queries(list(questions))
        return self.search_tokens(enc.input_ids, enc.attention_mask, enc.active_mask,
                                  topk=topk, nprobe=nprobe, depth=depth, query_chunk=query_chunk)

    def search_tokens_device(self, q_ids, q_attn, q_active, topk=None,
                             nprobe=None, depth=None, query_chunk: int = 8):
        """Async path: returns (scores, pids) DEVICE arrays without
        synchronizing — same contract as
        :meth:`ColbertSearcher.search_tokens_device`, so the pipelined
        serving service works over a sharded corpus unchanged."""
        s = self.cfg.serve
        topk = topk or s.topk
        inv = (
            self.emb_inv_scale
            if self.emb_inv_scale is not None
            else jnp.ones((1,), jnp.float32)
        )
        if self.flat_dv is not None:
            key = ("flat", topk)
            with self._fns_lock:
                if key not in self._fns:
                    self._fns[key] = self._make_flat_fn(topk)
            return self._fns[key](
                self.params, self.arrays,
                (jnp.asarray(q_ids), jnp.asarray(q_attn), jnp.asarray(q_active)),
                inv,
            )
        nprobe = min(nprobe or s.nprobe, int(self.coarse.shape[0]))
        depth = depth or s.candidate_depth
        cap = self.max_list_len
        max_cand = min(s.max_candidates, self.num_docs)
        key = (topk, nprobe, depth, cap, max_cand, query_chunk)
        with self._fns_lock:
            if key not in self._fns:
                self._fns[key] = self._make_fn(*key)
        return self._fns[key](
            self.params, self.coarse, self.quant, self.arrays,
            (jnp.asarray(q_ids), jnp.asarray(q_attn), jnp.asarray(q_active)), inv,
        )

    def search_tokens(self, q_ids, q_attn, q_active, topk=None, nprobe=None, depth=None, query_chunk: int = 8) -> SearchResult:
        ts, tp = self.search_tokens_device(
            q_ids, q_attn, q_active, topk=topk, nprobe=nprobe, depth=depth,
            query_chunk=query_chunk,
        )
        return SearchResult(np.asarray(tp), np.asarray(ts))
