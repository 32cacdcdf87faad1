"""Native pickle-stream response serializer for the retrieval server.

The serving protocol returns per-question lists of ``(pid, score, text)``
triples over a ``multiprocessing.connection`` socket — which is, on the
wire, a pickle stream (the reference pays this cost per batch on its
synchronous loop, ``colbert/training/dense_server_client.py:44-49,60-63``).
At the evaluator's request shape (1024 questions x topk 100) building and
pickling 102k text-bearing tuples in Python costs ~250 ms per request,
GIL-serial with next-batch tokenization (BENCHLOG round 4, "socket protocol
surface").

This module assembles the SAME bytes directly instead: every passage text
is pre-encoded ONCE as a pickle fragment (``'X' + len + utf8 + TUPLE3``) in
one contiguous blob, and each response batch becomes bounds-checked memcpys
in the C++ native lib (GIL released for the whole call; pure-Python
fallback when the lib is unavailable).  ``conn.send_bytes(payload)`` then
delivers bytes that a stock ``conn.recv()`` client unpickles transparently
— full protocol parity, no client changes.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np

# protocol-2 pickle: PROTO 2, EMPTY_LIST, MARK ... APPENDS, STOP
_HEADER = b"\x80\x02]("
_FOOTER = b"e."


class TripleSerializer:
    """Pre-encoded corpus text fragments + per-batch response assembly."""

    def __init__(self, corpus: Sequence[str]):
        parts: List[bytes] = []
        off = np.empty(len(corpus) + 1, np.int64)
        off[0] = 0
        w = 0
        for i, t in enumerate(corpus):
            b = t.encode("utf-8")
            # BINUNICODE + TUPLE3: pushes the text, closes the triple
            parts.append(b"X" + struct.pack("<I", len(b)) + b + b"\x87")
            w += 6 + len(b)
            off[i + 1] = w
        self._blob_bytes = b"".join(parts)
        self.blob = np.frombuffer(self._blob_bytes, np.uint8)
        self.off = off
        self.num_pids = len(corpus)

    def serialize_batch(self, pids: np.ndarray, scores: np.ndarray):
        """Pickle body for one batch of response rows: ``(nq, k)`` pids
        (-1 padded) + scores -> the per-question ``](...)e`` byte runs.
        Returns a bytes-like (uint8 ndarray on the native path — the only
        copy is the final :meth:`wrap` join)."""
        from colbert_tpu.native.lib import pickle_triples

        out = pickle_triples(
            np.ascontiguousarray(pids, np.int32),
            np.ascontiguousarray(scores, np.float32),
            self.num_pids, self.blob, self.off,
        )
        if out is not None:
            return out
        return self._py_batch(pids, scores)

    def _py_batch(self, pids: np.ndarray, scores: np.ndarray) -> bytes:
        blob, off = self._blob_bytes, self.off
        out: List[bytes] = []
        for prow, srow in zip(pids.tolist(), scores.tolist()):
            out.append(b"](")
            for p, s in zip(prow, srow):
                if p >= 0:
                    out.append(
                        b"J" + struct.pack("<i", p) + b"G" + struct.pack(">d", s)
                        + blob[off[p] : off[p + 1]]
                    )
            out.append(b"e")
        return b"".join(out)

    @staticmethod
    def wrap(batch_chunks: Sequence):
        """Complete pickle payload from per-batch bodies.

        Assembles into one preallocated buffer with numpy slice-copies and
        returns a bytes-like uint8 ndarray (``conn.send_bytes`` accepts any
        buffer, so no final ``bytes()`` copy): measured 72 ms -> 12 ms per
        38 MB response vs ``b"".join`` over buffer objects."""
        total = len(_HEADER) + sum(len(c) for c in batch_chunks) + len(_FOOTER)
        out = np.empty(total, np.uint8)
        out[: len(_HEADER)] = np.frombuffer(_HEADER, np.uint8)
        pos = len(_HEADER)
        for c in batch_chunks:
            n = len(c)
            out[pos : pos + n] = (
                c if isinstance(c, np.ndarray) else np.frombuffer(c, np.uint8)
            )
            pos += n
        out[pos:] = np.frombuffer(_FOOTER, np.uint8)
        return out
