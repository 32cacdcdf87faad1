"""ctypes bindings + lazy build for the C++ host runtime."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from colbert_tpu.utils.logging import get_logger

logger = get_logger("native")

_SRC = Path(__file__).parent / "ivf_pack.cpp"
_SO = Path(__file__).parent / "_colbert_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
                subprocess.run(cmd, check=True, capture_output=True)
                logger.info("built native library: %s", _SO.name)
            lib = ctypes.CDLL(str(_SO))
            lib.ivf_pack.restype = ctypes.c_int
            lib.compact_active.restype = ctypes.c_int
            lib.balanced_assign.restype = ctypes.c_int
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("native build unavailable, using numpy fallbacks: %s", e)
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def ivf_pack(assignments: np.ndarray, codes: np.ndarray, num_lists: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(perm, offsets, codes_sorted) — C++ counting sort, numpy fallback."""
    assignments = np.ascontiguousarray(assignments, np.int32)
    codes = np.ascontiguousarray(codes, np.uint8)
    n, m = codes.shape
    lib = _load()
    if lib is None:
        perm = np.argsort(assignments, kind="stable").astype(np.int32)
        counts = np.bincount(assignments, minlength=num_lists)
        offsets = np.zeros(num_lists + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        return perm, offsets, codes[perm]
    perm = np.empty(n, np.int32)
    offsets = np.empty(num_lists + 1, np.int32)
    out_codes = np.empty_like(codes)
    rc = lib.ivf_pack(
        assignments.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        ctypes.c_int32(num_lists),
        ctypes.c_int32(m),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"ivf_pack failed with code {rc} (bad assignment range?)")
    return perm, offsets, out_codes


def compact_active(embs_f16: np.ndarray, active: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(flat (sum_active, dim) fp16, doclens (B,) int32) from a (B, L, dim)
    fp16 batch and (B, L) activity mask."""
    embs_f16 = np.ascontiguousarray(embs_f16, np.float16)
    active = np.ascontiguousarray(active, np.int32)
    b, l, dim = embs_f16.shape
    lib = _load()
    if lib is None:
        mask = active.astype(bool)
        return embs_f16[mask], mask.sum(axis=1).astype(np.int32)
    total = int(active.astype(bool).sum())
    flat = np.empty((total, dim), np.float16)
    doclens = np.empty(b, np.int32)
    rc = lib.compact_active(
        embs_f16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(b),
        ctypes.c_int64(l),
        ctypes.c_int64(dim),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        doclens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"compact_active failed: {rc}")
    return flat, doclens


def balanced_assign(candidates: np.ndarray, num_lists: int, cap: int) -> np.ndarray:
    """Capacity-constrained assignment from per-point nearest-centroid
    candidates (N, kc), best first.  C++ greedy; numpy loop fallback."""
    candidates = np.ascontiguousarray(candidates, np.int32)
    n, kc = candidates.shape
    out = np.empty(n, np.int32)
    lib = _load()
    if lib is None:
        fill = np.zeros(num_lists, np.int64)
        spill = []
        for i in range(n):
            for a in candidates[i]:
                if 0 <= a < num_lists and fill[a] < cap:
                    out[i] = a
                    fill[a] += 1
                    break
            else:
                spill.append(i)
        for i in spill:
            a = int(np.argmin(fill))
            out[i] = a
            fill[a] += 1
        return out
    rc = lib.balanced_assign(
        candidates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n),
        ctypes.c_int32(kc),
        ctypes.c_int32(num_lists),
        ctypes.c_int32(cap),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"balanced_assign failed: {rc}")
    return out
