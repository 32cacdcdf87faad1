import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops.pooling import avg_pool_by_mask, batch_index_select, max_pool_by_mask, span_mean


def test_batch_index_select():
    t = jnp.arange(24.0).reshape(2, 4, 3)
    idx = jnp.asarray([[0, 2], [3, 1]])
    out = np.asarray(batch_index_select(t, idx))
    np.testing.assert_array_equal(out[0, 0], np.asarray(t)[0, 0])
    np.testing.assert_array_equal(out[1, 0], np.asarray(t)[1, 3])


def test_span_mean():
    h = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    spans = jnp.asarray([[[0, 2], [1, 4], [2, 2]]])
    out = np.asarray(span_mean(h, spans))
    np.testing.assert_allclose(out[0, 0], np.asarray(h)[0, :2].mean(0))
    np.testing.assert_allclose(out[0, 1], np.asarray(h)[0, 1:4].mean(0))
    np.testing.assert_allclose(out[0, 2], 0.0)


def test_mask_pools():
    t = jnp.asarray([[[1.0, -5.0], [3.0, 2.0], [9.0, 9.0]]])
    mask = jnp.asarray([[1, 1, 0]])
    np.testing.assert_allclose(np.asarray(max_pool_by_mask(t, mask))[0], [3.0, 2.0])
    np.testing.assert_allclose(np.asarray(avg_pool_by_mask(t, mask))[0], [2.0, -1.5])
