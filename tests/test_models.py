import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.config import ModelConfig, MultiviewConfig
from colbert_tpu.models import ColbertModel, CrossEncoderModel
from colbert_tpu.models.sharding import shard_params

TINY = ModelConfig(
    vocab_size=128,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    dim=16,
    dtype="float32",
)


@pytest.fixture(scope="module")
def colbert_and_params():
    model = ColbertModel(TINY, MultiviewConfig(enabled=True, q_view=4, d_view=6))
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, ids, mask)["params"]
    return model, params


def test_colbert_shapes_and_norms(colbert_and_params):
    model, params = colbert_and_params
    ids = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 128
    mask = jnp.ones((2, 16), jnp.int32)
    Q = model.apply({"params": params}, ids, mask, method=model.query)
    D = model.apply({"params": params}, ids, mask, method=model.doc)
    assert Q.shape == (2, 4, 16)  # q_view slices
    assert D.shape == (2, 6, 16)  # d_view slices
    np.testing.assert_allclose(np.linalg.norm(np.asarray(Q), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(D), axis=-1), 1.0, rtol=1e-5)


def test_non_multiview_full_length():
    model = ColbertModel(TINY, MultiviewConfig(enabled=False))
    ids = jnp.zeros((1, 16), jnp.int32)
    mask = jnp.ones((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, ids, mask)["params"]
    Q = model.apply({"params": params}, ids, mask, method=model.query)
    assert Q.shape == (1, 16, 16)


def test_ce_model_scalar_logits():
    model = CrossEncoderModel(TINY)
    ids = jnp.zeros((3, 16), jnp.int32)
    mask = jnp.ones((3, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    logits = model.apply({"params": params}, ids, mask)
    assert logits.shape == (3,)


def test_tp_sharded_forward_matches(colbert_and_params, mesh8):
    model, params = colbert_and_params
    ids = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 128
    mask = jnp.ones((2, 16), jnp.int32)
    want = model.apply({"params": params}, ids, mask, method=model.query)
    sharded = shard_params(params, mesh8)
    got = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m, method=model.query))(sharded, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_torch_conversion_fidelity():
    """torch HF BertModel and our Flax encoder must agree to ~1e-4 (SURVEY §7:
    per-token embedding cosine > 0.999 is the checkpoint-porting bar)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        max_position_embeddings=TINY.max_position_embeddings,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    from colbert_tpu.models.bert import BertEncoder
    from colbert_tpu.models.convert import bert_params_from_torch

    params = bert_params_from_torch({k: v for k, v in hf.state_dict().items()}, TINY)
    ids_np = np.random.default_rng(0).integers(0, 128, size=(2, 12))
    mask_np = np.ones((2, 12), np.int64)
    mask_np[1, 8:] = 0
    with torch.no_grad():
        want = hf(
            torch.tensor(ids_np), attention_mask=torch.tensor(mask_np), output_hidden_states=True
        ).hidden_states[-1].numpy()
    enc = BertEncoder(TINY)
    got = enc.apply({"params": params}, jnp.asarray(ids_np, jnp.int32), jnp.asarray(mask_np, jnp.int32))
    valid = mask_np.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], want[valid], atol=2e-4)
    cos = np.sum(np.asarray(got)[valid] * want[valid], -1) / (
        np.linalg.norm(np.asarray(got)[valid], axis=-1) * np.linalg.norm(want[valid], axis=-1)
    )
    assert cos.min() > 0.999


class TestFastDropout:
    def test_byte_dropout_statistics_and_scale(self):
        from colbert_tpu.models.bert import FastDropout

        drop = FastDropout(0.1, impl="byte")
        x = jnp.ones((256, 256), jnp.float32)
        y = drop.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
        y = np.asarray(y)
        frac = (y == 0).mean()
        # quantized drop rate = 26/256 ~ 0.1016
        assert abs(frac - 26 / 256) < 0.01
        nz = y[y != 0]
        np.testing.assert_allclose(nz, 256.0 / 230.0, rtol=1e-6)

    def test_deterministic_given_key(self):
        from colbert_tpu.models.bert import FastDropout

        drop = FastDropout(0.25, impl="byte")
        x = jnp.ones((64, 64), jnp.float32)
        k = jax.random.PRNGKey(3)
        a = drop.apply({}, x, False, rngs={"dropout": k})
        b = drop.apply({}, x, False, rngs={"dropout": k})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_hw_falls_back_on_cpu(self):
        from colbert_tpu.models.bert import FastDropout

        drop = FastDropout(0.1, impl="hw")
        x = jnp.ones((32, 32), jnp.float32)
        y = drop.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(y)).all()

    def test_deterministic_mode_identity(self):
        from colbert_tpu.models.bert import FastDropout

        drop = FastDropout(0.5, impl="byte")
        x = jnp.arange(12.0).reshape(3, 4)
        y = drop.apply({}, x, True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_fused_qkv_matches_unfused(colbert_and_params):
    """fused_qkv concatenates the q/k/v kernels at apply time: identical
    parameter tree, identical outputs (fp32 here, so exact up to reassoc)."""
    import dataclasses

    model, params = colbert_and_params
    fused = ColbertModel(
        dataclasses.replace(TINY, fused_qkv=True),
        MultiviewConfig(enabled=True, q_view=4, d_view=6),
    )
    ids = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 128
    mask = jnp.ones((2, 16), jnp.int32)
    # same param tree: init of the fused model produces the same structure
    p2 = fused.init(jax.random.PRNGKey(0), ids, mask, ids, mask)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    a = model.apply({"params": params}, ids, mask, method=model.query)
    b = fused.apply({"params": params}, ids, mask, method=fused.query)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_onehot_embedding_matches_take(colbert_and_params):
    """embedding_impl='onehot' keeps the parameter tree and the outputs
    identical (fp32: a one-hot matmul row-selects exactly)."""
    import dataclasses

    model, params = colbert_and_params
    oh = ColbertModel(
        dataclasses.replace(TINY, embedding_impl="onehot"),
        MultiviewConfig(enabled=True, q_view=4, d_view=6),
    )
    ids = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 128
    mask = jnp.ones((2, 16), jnp.int32)
    p2 = oh.init(jax.random.PRNGKey(0), ids, mask, ids, mask)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    a = model.apply({"params": params}, ids, mask, method=model.query)
    b = oh.apply({"params": params}, ids, mask, method=oh.query)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_compute_softmax_close_to_fp32(colbert_and_params):
    import dataclasses

    model, params = colbert_and_params
    sm = ColbertModel(
        dataclasses.replace(TINY, attention_softmax_dtype="compute"),
        MultiviewConfig(enabled=True, q_view=4, d_view=6),
    )
    ids = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 128
    mask = jnp.ones((2, 16), jnp.int32)
    a = model.apply({"params": params}, ids, mask, method=model.query)
    b = sm.apply({"params": params}, ids, mask, method=sm.query)
    # fp32 compute dtype here, so the only difference is the einsum
    # preferred_element_type — results must agree tightly
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_remat_attn_gradients_exact(colbert_and_params):
    """remat='attn' (drop only the tagged (B,h,L,L) logits/probs residuals)
    must be a pure scheduling change: gradients identical to no-remat."""
    import dataclasses

    model, params = colbert_and_params
    rm = ColbertModel(
        dataclasses.replace(TINY, remat="attn"),
        MultiviewConfig(enabled=True, q_view=4, d_view=6),
    )
    ids = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 128
    mask = jnp.ones((2, 16), jnp.int32)

    def loss_with(m):
        def loss(p):
            return m.apply({"params": p}, ids, mask, method=m.query).sum()

        return jax.grad(loss)(params)

    g0 = loss_with(model)
    g1 = loss_with(rm)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
