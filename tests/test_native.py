import numpy as np
import pytest

from colbert_tpu.native import compact_active, ivf_pack, native_available
from colbert_tpu.ops.ivf import sort_by_list


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_ivf_pack_matches_numpy(rng):
    n, k, m = 5000, 37, 8
    a = rng.integers(0, k, size=n).astype(np.int32)
    codes = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    perm, offsets, codes_sorted = ivf_pack(a, codes, k)
    want_perm, want_offsets = sort_by_list(a, k)
    np.testing.assert_array_equal(perm, want_perm)
    np.testing.assert_array_equal(offsets, want_offsets)
    np.testing.assert_array_equal(codes_sorted, codes[want_perm])


def test_ivf_pack_rejects_bad_assignment():
    a = np.asarray([0, 5], np.int32)
    codes = np.zeros((2, 4), np.uint8)
    if native_available():
        with pytest.raises(ValueError):
            ivf_pack(a, codes, 3)


def test_compact_active(rng):
    b, l, dim = 4, 6, 8
    embs = rng.normal(size=(b, l, dim)).astype(np.float16)
    active = (rng.random(size=(b, l)) > 0.4).astype(np.int32)
    flat, doclens = compact_active(embs, active)
    mask = active.astype(bool)
    np.testing.assert_array_equal(flat, embs[mask])
    np.testing.assert_array_equal(doclens, mask.sum(axis=1))
