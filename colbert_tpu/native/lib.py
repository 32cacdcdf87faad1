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
                # -fno-trapping-math/-fno-math-errno: lets GCC vectorize the
                # rintf/fabsf loops (roundps/vmaxps); rounding semantics are
                # unchanged (still nearest-even), only FP traps/errno are not
                cmd = ["g++", "-O3", "-march=native", "-funroll-loops",
                       "-fno-trapping-math", "-fno-math-errno",
                       "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
                subprocess.run(cmd, check=True, capture_output=True)
                logger.info("built native library: %s", _SO.name)
            lib = ctypes.CDLL(str(_SO))
            lib.ivf_pack.restype = ctypes.c_int
            lib.compact_active.restype = ctypes.c_int
            lib.balanced_assign.restype = ctypes.c_int
            lib.f16_absmax.restype = ctypes.c_int
            lib.f16_quantize_i8.restype = ctypes.c_int
            lib.f16_to_bf16.restype = ctypes.c_int
            lib.pickle_triples.restype = ctypes.c_int64
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


def f16_absmax_into(chunk_f16: np.ndarray, amax: np.ndarray) -> bool:
    """Accumulate per-dim |max| of an fp16 chunk into ``amax`` (fp32).
    Returns False (untouched) when the native lib is unavailable."""
    lib = _load()
    if lib is None or chunk_f16.dtype != np.float16:
        return False
    chunk_f16 = np.ascontiguousarray(chunk_f16)
    n, dim = chunk_f16.shape
    rc = lib.f16_absmax(
        chunk_f16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(n), ctypes.c_int64(dim),
        amax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"f16_absmax failed: {rc}")
    return True


def f16_quantize_i8_into(chunk_f16: np.ndarray, scale: np.ndarray, out_i8: np.ndarray) -> bool:
    """out_i8[:] = clip(rint(chunk * scale), -127, 127), hardware-f16 fast
    path.  Returns False when unavailable (caller uses the numpy path)."""
    lib = _load()
    if lib is None or chunk_f16.dtype != np.float16:
        return False
    chunk_f16 = np.ascontiguousarray(chunk_f16)
    n, dim = chunk_f16.shape
    rc = lib.f16_quantize_i8(
        chunk_f16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(n), ctypes.c_int64(dim),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_i8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    if rc != 0:
        raise ValueError(f"f16_quantize_i8 failed: {rc}")
    return True


def f16_to_bf16_into(chunk_f16: np.ndarray, out_bf16_u16: np.ndarray) -> bool:
    """fp16 -> bf16 (round-to-nearest-even via fp32; ml_dtypes semantics)
    into a uint16-viewed output buffer.  Returns False when unavailable."""
    lib = _load()
    if lib is None or chunk_f16.dtype != np.float16:
        return False
    chunk_f16 = np.ascontiguousarray(chunk_f16)
    rc = lib.f16_to_bf16(
        chunk_f16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(chunk_f16.size),
        out_bf16_u16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if rc != 0:
        raise ValueError(f"f16_to_bf16 failed: {rc}")
    return True


def pickle_triples(pids: np.ndarray, scores: np.ndarray, num_pids: int,
                   text_blob: np.ndarray, text_off: np.ndarray) -> Optional[np.ndarray]:
    """Assemble the pickle-protocol body for one batch of (pid, score, text)
    response rows (see ivf_pack.cpp docstring).  Returns None when the
    native lib is unavailable (caller uses the Python assembler)."""
    lib = _load()
    if lib is None:
        return None
    pids = np.ascontiguousarray(pids, np.int32)
    scores = np.ascontiguousarray(scores, np.float32)
    nq, k = pids.shape
    valid = pids >= 0
    cap = (
        3 * nq + 14 * int(valid.sum())
        + int((text_off[np.where(valid, pids, 0) + 1] - text_off[np.where(valid, pids, 0)])[valid].sum())
    )
    out = np.empty(cap, np.uint8)
    w = lib.pickle_triples(
        pids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(nq), ctypes.c_int64(k), ctypes.c_int64(num_pids),
        text_blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        text_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap),
    )
    if w < 0:
        raise ValueError(f"pickle_triples failed: {w}")
    # ndarray view, not .tobytes(): bytes.join (in TripleSerializer.wrap)
    # accepts buffer objects, so the only copy is the final payload join
    return out[:w]


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
