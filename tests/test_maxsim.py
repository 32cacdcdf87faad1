"""MaxSim op tests.

The hand-computed case mirrors the reference's only unit test
(``BaseModel.py:70-79``): Q=(1,2,3), D=(2,2,3) => scores [[21, 41]].
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops import maxsim_pallas, maxsim_xla


def _ref_maxsim(Q, D, q_mask, d_mask):
    Q = Q * q_mask[..., None]
    D = D * d_mask[..., None]
    sim = np.einsum("qmh,dnh->qdmn", Q, D)
    return sim.max(-1).sum(-1)


def test_reference_hand_case():
    Q = jnp.asarray([[[1.0, 5.0, 4.0], [2.0, 8.0, 1.0]]])
    D = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], [[3.0, 2.0, 1.0], [1.0, 1.0, 3.0]]])
    q_mask = jnp.ones(Q.shape[:2])
    d_mask = jnp.ones(D.shape[:2])
    scores = maxsim_xla(Q, D, q_mask, d_mask)
    np.testing.assert_allclose(np.asarray(scores), [[21.0, 41.0]], rtol=1e-6)


def test_mask_zero_not_neginf():
    # A doc whose only valid token has negative similarity must still get the
    # 0 contributed by masked slots (reference masks by multiply, not -inf).
    Q = jnp.ones((1, 1, 4))
    D = jnp.stack([jnp.full((2, 4), -1.0)])  # one doc, two tokens
    d_mask = jnp.asarray([[1.0, 0.0]])
    q_mask = jnp.ones((1, 1))
    scores = maxsim_xla(Q, D, q_mask, d_mask)
    np.testing.assert_allclose(np.asarray(scores), [[0.0]], atol=1e-6)


@pytest.mark.parametrize("nq,m,nd,n,h", [(3, 16, 5, 16, 128), (2, 32, 7, 24, 64), (1, 5, 130, 16, 96)])
def test_pallas_matches_xla(rng, nq, m, nd, n, h):
    Q = rng.normal(size=(nq, m, h)).astype(np.float32)
    D = rng.normal(size=(nd, n, h)).astype(np.float32)
    q_mask = (rng.random(size=(nq, m)) > 0.2).astype(np.float32)
    d_mask = (rng.random(size=(nd, n)) > 0.2).astype(np.float32)
    want = _ref_maxsim(Q, D, q_mask, d_mask)
    got = maxsim_pallas(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(q_mask), jnp.asarray(d_mask), interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_no_masks():
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(2, 4, 8)).astype(np.float32)
    D = rng.normal(size=(3, 6, 8)).astype(np.float32)
    want = _ref_maxsim(Q, D, np.ones((2, 4), np.float32), np.ones((3, 6), np.float32))
    got = maxsim_xla(jnp.asarray(Q), jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
