"""Retrieval serving: in-process service + socket server/client + evaluator.

Protocol parity with the reference (``dense_server_client.py:21-78``):
requests are ``(questions, topk, candidate_depth, nprobe)`` tuples over a
``multiprocessing.connection`` socket; responses are per-question lists of
``(pid, score, paragraph_text)`` triples.  Improvements over the reference:

* queries flow through the fused batched searcher (the reference re-ranked
  one query at a time on the host, SURVEY §3.4);
* batches within a request are PIPELINED: the next batch is tokenized and
  dispatched while the device still runs the previous one
  (:meth:`ColbertSearcher.search_tokens_device`), so the socket surface
  reaches the async headline throughput instead of paying a dispatch+fetch
  round-trip per batch (the reference's loop is fully synchronous,
  ``dense_server_client.py:39-49``);
* connections are served concurrently (thread per connection) — a slow
  client cannot block the listener (the reference serves one connection at
  a time, ``dense_server_client.py:51-65``);
* errors return a structured ``{"error": ...}`` payload instead of being
  swallowed by a bare except (``dense_server_client.py:64-65``);
* the service is usable in-process (no IPC) — the server is a thin shell.
"""

from __future__ import annotations

import threading
import traceback
from collections import deque
from multiprocessing.connection import Client as MPClient, Listener
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.evaluation.metrics import eval_retrieval
from colbert_tpu.ranking.searcher import ColbertSearcher
from colbert_tpu.utils.logging import get_logger

logger = get_logger("serving")

Triple = Tuple[int, float, str]


class RetrievalService:
    """Batched retrieval over a searcher + in-RAM passage texts
    (the reference holds the full corpus in RAM too, ``dense_server_client.py:33``)."""

    def __init__(self, searcher: ColbertSearcher, corpus: Sequence[str], cfg: Optional[ColbertConfig] = None):
        self.searcher = searcher
        self.corpus = corpus
        self.cfg = cfg or searcher.cfg
        self._serializer = None  # lazy: built on first retrieve_pickled
        self._ser_lock = threading.Lock()

    def _rows(self, pids, scores, n_real) -> List[List[Triple]]:
        # one bulk ndarray->python conversion (tolist), then pure-python
        # assembly: ~6x fewer per-element numpy scalar conversions than a
        # per-(pid, score) loop at batch 144 x topk 100
        pl = pids[:n_real].tolist()
        sl = scores[:n_real].tolist()
        corpus = self.corpus
        return [
            [(p, s, corpus[p]) for p, s in zip(prow, srow) if p >= 0]
            for prow, srow in zip(pl, sl)
        ]

    def _retrieve_batches(
        self,
        questions: Sequence[str],
        topk: Optional[int],
        depth: Optional[int],
        nprobe: Optional[int],
        consume,
    ) -> None:
        """Pipelined batch driver: up to ``serve.pipeline_inflight`` batches
        in flight — batch i+1 is tokenized and dispatched while the device
        still executes batch i, hiding the per-call dispatch/fetch latency
        (~80 ms on a tunnel-attached chip — the difference between the
        sequential and pipelined headline numbers in BENCHLOG).
        ``consume(pids, scores, n_real)`` runs per drained batch, in order —
        its work (triple building / response serialization) overlaps the
        in-flight batches' device execution."""
        s = self.cfg.serve
        topk = topk or s.topk
        bs = s.query_batch_size
        # unknown searcher types (no async device path / tokenizer) degrade
        # to the synchronous per-batch loop instead of failing at request
        # time.  The host-table mode pipelines through its own double-buffered
        # path (search_tokens_device returns a lazy handle that overlaps the
        # host gather of batch i with the device probe of batch i+1).
        pipelined = hasattr(self.searcher, "search_tokens_device") and hasattr(
            self.searcher, "tok"
        )
        inflight = max(1, s.pipeline_inflight) if pipelined else 1
        pending: deque = deque()

        def drain_one():
            n_real, handle = pending.popleft()
            ts, tp = handle
            consume(np.asarray(tp), np.asarray(ts), n_real)

        for lo in range(0, len(questions), bs):
            chunk = list(questions[lo : lo + bs])
            n_real = len(chunk)
            # pad the tail batch to the static size: one compiled program
            # serves every request shape
            chunk = chunk + [""] * (bs - n_real)
            if pipelined:
                enc = self.searcher.tok.encode_queries(chunk)
                handle = self.searcher.search_tokens_device(
                    enc.input_ids, enc.attention_mask, enc.active_mask,
                    topk=topk, nprobe=nprobe, depth=depth,
                )
                pending.append((n_real, handle))
                if len(pending) >= inflight:
                    drain_one()
            else:
                res = self.searcher.search(chunk, topk=topk, nprobe=nprobe, depth=depth)
                consume(res.pids, res.scores, n_real)
        while pending:
            drain_one()

    def retrieve(
        self,
        questions: Sequence[str],
        topk: Optional[int] = None,
        depth: Optional[int] = None,
        nprobe: Optional[int] = None,
    ) -> List[List[Triple]]:
        out: List[List[Triple]] = []
        self._retrieve_batches(
            questions, topk, depth, nprobe,
            lambda pids, scores, n_real: out.extend(self._rows(pids, scores, n_real)),
        )
        return out

    def retrieve_pickled(
        self,
        questions: Sequence[str],
        topk: Optional[int] = None,
        depth: Optional[int] = None,
        nprobe: Optional[int] = None,
    ) -> bytes:
        """Same result as :meth:`retrieve`, already serialized as the pickle
        payload ``conn.recv()`` expects — assembled from pre-encoded corpus
        fragments by the native lib with the GIL released, overlapped with
        the next batch's tokenization (VERDICT r4 item 5: response assembly
        was ~250 ms/request of GIL-serial Python, 2/3 of the socket gap)."""
        if self._serializer is None:
            from colbert_tpu.serving.serializer import TripleSerializer

            with self._ser_lock:
                if self._serializer is None:
                    self._serializer = TripleSerializer(self.corpus)
        ser = self._serializer
        chunks: List[bytes] = []
        self._retrieve_batches(
            questions, topk, depth, nprobe,
            lambda pids, scores, n_real: chunks.append(
                ser.serialize_batch(pids[:n_real], scores[:n_real])
            ),
        )
        return ser.wrap(chunks)


class RetrievalServer:
    def __init__(self, service: RetrievalService, host: Optional[str] = None, port: Optional[int] = None, authkey: Optional[bytes] = None):
        s = service.cfg.serve
        self.service = service
        self.address = (host or s.host, port or s.port)
        self.authkey = authkey or s.authkey.encode()
        self._stop = threading.Event()
        self._listener: Optional[Listener] = None

    def _handle_conn(self, conn) -> None:
        """Per-connection request loop, run on its own thread — concurrent
        clients interleave at batch granularity on the device queue instead
        of blocking each other at the listener."""
        try:
            while True:
                try:
                    req = conn.recv()
                except (EOFError, OSError):
                    break
                if req == "__shutdown__":
                    self._stop.set()
                    conn.send({"ok": True})
                    self.stop()  # close the listener: unblocks accept()
                    break
                try:
                    questions, topk, depth, nprobe = req
                    # response assembled straight to pickle bytes (native
                    # serializer, GIL-released) — a stock conn.recv() client
                    # decodes it identically to conn.send(triples)
                    payload = self.service.retrieve_pickled(
                        questions, topk=topk, depth=depth, nprobe=nprobe
                    )
                    conn.send_bytes(payload)
                except Exception as e:  # noqa: BLE001 — report, don't die
                    logger.error("retrieval error: %s", traceback.format_exc())
                    conn.send({"error": f"{type(e).__name__}: {e}"})
        finally:
            conn.close()

    def serve_forever(self) -> None:
        self._listener = Listener(self.address, authkey=self.authkey)
        logger.info("retrieval server listening on %s", self.address)
        from multiprocessing import AuthenticationError

        while not self._stop.is_set():
            try:
                conn = self._listener.accept()
            except AuthenticationError:
                # a client with a bad authkey must not take the server down
                logger.warning("rejected connection: bad authkey")
                continue
            except (OSError, EOFError):
                break
            threading.Thread(
                target=self._handle_conn, args=(conn,), daemon=True
            ).start()
        try:
            self._listener.close()
        except OSError:
            pass

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def stop(self) -> None:
        self._stop.set()
        if self._listener is not None:
            try:
                self._listener.close()
            except OSError:
                pass


class RetrievalClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 9090, authkey: bytes = b"colbert-tpu"):
        self.address = (host, port)
        self.authkey = authkey

    def retrieve(
        self, questions: Sequence[str], topk: int = 100, depth: int = 512, nprobe: int = 128
    ) -> List[List[Triple]]:
        with MPClient(self.address, authkey=self.authkey) as conn:
            conn.send((list(questions), topk, depth, nprobe))
            res = conn.recv()
        if isinstance(res, dict) and "error" in res:
            raise RuntimeError(res["error"])
        return res

    def shutdown(self) -> None:
        with MPClient(self.address, authkey=self.authkey) as conn:
            conn.send("__shutdown__")
            conn.recv()


def evaluate_retrieval(
    retrieve_fn,
    eval_data: Sequence[Dict[str, Any]],
    topk: int = 100,
    batch: int = 1024,
    recall_topk: Sequence[int] = (50, 100),
) -> Dict[str, float]:
    """End-to-end eval driver (parity with ``dureader_evaluate``,
    ``dense_server_client.py:87-130``): retrieve in batches, attach ``res``,
    compute MRR@10 / recall@k."""
    out = []
    for lo in range(0, len(eval_data), batch):
        chunk = list(eval_data[lo : lo + batch])
        res = retrieve_fn([t["question"] for t in chunk], topk)
        for t, r in zip(chunk, res):
            out.append({**t, "res": r})
    return eval_retrieval(out, topk=10, recall_topk=recall_topk)
