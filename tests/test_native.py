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


def test_f16_conversions_match_numpy():
    """Native fp16 table conversions (round 5, VERDICT r4 item 8): identical
    rint/clip/RNE semantics to the numpy/ml_dtypes paths they accelerate."""
    import ml_dtypes

    from colbert_tpu.native.lib import (
        f16_absmax_into, f16_quantize_i8_into, f16_to_bf16_into, native_available,
    )

    rng = np.random.default_rng(0)
    x = (rng.normal(size=(500, 64)) * 3).astype(np.float16)
    amax = np.zeros(64, np.float32)
    if not f16_absmax_into(x, amax):
        assert not native_available()
        return  # numpy fallback environment: nothing to compare
    np.testing.assert_array_equal(amax, np.abs(x.astype(np.float32)).max(axis=0))

    scale = (127.0 / np.maximum(amax, 1e-6)).astype(np.float32)
    out = np.empty(x.shape, np.int8)
    assert f16_quantize_i8_into(x, scale, out)
    ref = np.clip(np.rint(x.astype(np.float32) * scale), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(out, ref)

    bf = np.empty(x.shape, np.uint16)
    assert f16_to_bf16_into(x, bf)
    np.testing.assert_array_equal(bf, x.astype(ml_dtypes.bfloat16).view(np.uint16))
    # specials: inf/-inf/0/-0/subnormal exact, NaN stays NaN
    sp = np.array([[np.nan, np.inf, -np.inf, 0.0, -0.0, 65504.0, 6e-8]], np.float16)
    b2 = np.empty(sp.shape, np.uint16)
    assert f16_to_bf16_into(sp, b2)
    got = b2.view(ml_dtypes.bfloat16)
    ref2 = sp.astype(ml_dtypes.bfloat16)
    fin = ~np.isnan(ref2.astype(np.float32))
    np.testing.assert_array_equal(got[fin], ref2[fin])
    assert np.isnan(got.astype(np.float32)[~fin]).all()


def test_pickle_serializer_protocol_parity():
    """The hand-assembled pickle stream decodes to EXACTLY the triples the
    old conn.send(...) produced, native and pure-Python paths alike."""
    import pickle

    from colbert_tpu.serving.serializer import TripleSerializer

    corpus = ["hello world", "héllo ünïcode 中文 文本", "", "long " * 80]
    ser = TripleSerializer(corpus)
    pids = np.array([[0, 2, -1], [3, 1, 0], [-1, -1, -1]], np.int32)
    scores = np.array([[1.5, -2.25, 0.0], [3.75, 0.125, -1e9], [0, 0, 0]], np.float32)
    want = [
        [(int(p), float(s), corpus[p]) for p, s in zip(pr, sr) if p >= 0]
        for pr, sr in zip(pids, scores)
    ]
    payload = ser.wrap([ser.serialize_batch(pids, scores)])
    assert pickle.loads(payload) == want
    assert pickle.loads(ser.wrap([ser._py_batch(pids, scores)])) == want
    # multi-batch accumulation (the pipelined drain path)
    two = ser.wrap([ser.serialize_batch(pids[:1], scores[:1]),
                    ser.serialize_batch(pids[1:], scores[1:])])
    assert pickle.loads(two) == want
    # empty request
    assert pickle.loads(ser.wrap([])) == []
