"""Orbax-backed checkpointing.

Capability parity with the reference's HF-trainer checkpoints
(``awtrainer.py:1497-1679``: model + optimizer + scheduler + RNG + trainer
state, save every half-epoch, resume restores all) — but as a thin layer
over orbax.  RNG state needs no file: dropout keys are ``fold_in(seed,
step)`` so resume-at-step reproduces the stream by construction.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp

from colbert_tpu.utils.logging import get_logger

logger = get_logger("checkpoint")

_STEP_RE = re.compile(r"^checkpoint-(\d+)$")


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 20):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> Path:
        return self.dir / f"checkpoint-{step}"

    def all_steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.dir):
            m = _STEP_RE.match(name)
            if m and (self.dir / name / "_METADATA").exists() or m and (self.dir / name).is_dir():
                steps.append(int(m.group(1)))
        return sorted(set(steps))

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any, metadata: Optional[Dict[str, Any]] = None) -> str:
        path = self._path(step)
        self._ckptr.save(path / "state", tree, force=True)
        self._ckptr.wait_until_finished()
        if metadata is not None:
            with open(path / "meta.json", "w", encoding="utf8") as f:
                json.dump(metadata, f, indent=2)
        logger.info("saved checkpoint step=%d -> %s", step, path)
        self._gc()
        return str(path)

    def restore(self, step: int, target: Any) -> Any:
        """``target`` is an abstract/concrete pytree matching the saved one."""
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckptr.restore(self._path(step) / "state", abstract)

    def load_metadata(self, step: int) -> Optional[Dict[str, Any]]:
        p = self._path(step) / "meta.json"
        if p.exists():
            with open(p, "r", encoding="utf8") as f:
                return json.load(f)
        return None

    def _gc(self) -> None:
        steps = self.all_steps()
        import shutil

        for s in steps[: -self.keep] if self.keep > 0 else []:
            shutil.rmtree(self._path(s), ignore_errors=True)
