"""Structured logging + timestamped prints.

Replaces the reference's ad-hoc ``print_message`` (``colbert/utils/utils.py:11-18``)
and rank-gated ``logging`` setup (``index_model.py:7-8``) with one module.
Adds what the reference lacks entirely (SURVEY §5): span timing that can be
persisted, and first-class hooks into ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Iterator, Optional

_FORMAT = "[%(asctime)s] %(levelname)s %(name)s: %(message)s"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%b %d, %H:%M:%S"))
    root = logging.getLogger("colbert_tpu")
    root.addHandler(handler)
    level = os.environ.get("COLBERT_TPU_LOGLEVEL", "INFO").upper()
    root.setLevel(getattr(logging, level, logging.INFO))
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("colbert_tpu"):
        name = f"colbert_tpu.{name}"
    return logging.getLogger(name)


def print_message(*parts: Any, condition: bool = True) -> str:
    """Timestamped print (API parity with reference ``utils.py:11-18``)."""
    msg = " ".join(str(p) for p in parts)
    line = f"[{time.strftime('%b %d, %H:%M:%S')}] {msg}"
    if condition:
        print(line, flush=True)
    return line


class Timers:
    """Named wall-clock span accumulator; JSON-serializable.

    The reference only had transient ``time.time()`` prints around faiss
    train/add (``faiss_index.py:36-39``); these persist.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k], "mean_s": self.totals[k] / max(1, self.counts[k])}
            for k in self.totals
        }

    def dump(self, path: str) -> None:
        with open(path, "w", encoding="utf8") as f:
            json.dump(self.as_dict(), f, indent=2)


@contextlib.contextmanager
def jax_trace(logdir: Optional[str]) -> Iterator[None]:
    """Optionally capture a jax.profiler trace (xplane) around a block."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
