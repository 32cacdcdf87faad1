"""Checkpoint-conversion fidelity against a REAL HF ``transformers.BertModel``.

The reference's quality rests entirely on pretrained torch BERTs
(``colbert/modeling/colbert_model.py:46-50``, ``ce_model.py:49``); SURVEY §7
names conversion fidelity a top-4 risk ("per-token cosine > 0.999").  The
self-round-trip test (test_dense_and_export.py) cannot catch a transpose or
naming drift that is symmetric in both directions — this one can: it runs
the SAME weights through torch's BertModel and our Flax BertEncoder and
compares hidden states per token.  Random init is sufficient: it is the
parameter LAYOUT being validated, not trained values.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    import jax
    import jax.numpy as jnp

    from colbert_tpu.config import ModelConfig
    from colbert_tpu.models.bert import BertEncoder
    from colbert_tpu.models.convert import bert_params_from_torch

    hf_cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg)
    hf.eval()

    cfg = ModelConfig(
        vocab_size=512, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, max_position_embeddings=64, dtype="float32",
    )
    params = bert_params_from_torch(
        {k: v for k, v in hf.state_dict().items()}, cfg
    )
    enc = BertEncoder(cfg)

    rng = np.random.default_rng(0)
    B, L = 3, 24
    ids = rng.integers(0, 512, (B, L)).astype(np.int32)
    attn = np.ones((B, L), np.int32)
    attn[1, 16:] = 0  # a padded row exercises the mask path
    attn[2, 8:] = 0

    with torch.no_grad():
        t_out = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(attn, dtype=torch.long),
        ).last_hidden_state.numpy()
    j_out = np.asarray(
        enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(attn))
    )
    return t_out, j_out, attn


def test_hidden_state_cosine(tiny_pair):
    """Per-token cosine > 0.999 on every VALID token (SURVEY §7 criterion)."""
    t_out, j_out, attn = tiny_pair
    num = (t_out * j_out).sum(-1)
    cos = num / (np.linalg.norm(t_out, axis=-1) * np.linalg.norm(j_out, axis=-1))
    valid = attn.astype(bool)
    assert cos[valid].min() > 0.999, f"min cosine {cos[valid].min()}"


def test_hidden_state_close(tiny_pair):
    """Beyond direction: elementwise agreement at fp32 accumulation noise."""
    t_out, j_out, attn = tiny_pair
    valid = attn.astype(bool)
    err = np.abs(t_out - j_out)[valid].max()
    assert err < 1e-4, f"max |torch - flax| = {err}"


def test_colbert_checkpoint_import_export():
    """A reference-layout checkpoint (``model.*`` + ``linear.weight``,
    ``colbert_model.py:98-114``) imports into the full ColbertModel tree,
    and exporting it back is key- and value-identical."""
    from colbert_tpu.config import ModelConfig
    from colbert_tpu.models.convert import (
        colbert_params_from_torch,
        colbert_params_to_torch_state_dict,
    )

    hf_cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, type_vocab_size=2,
    )
    torch.manual_seed(1)
    hf = transformers.BertModel(hf_cfg)
    sd = {f"model.{k}": v for k, v in hf.state_dict().items()}
    sd["linear.weight"] = torch.randn(16, 32)

    cfg = ModelConfig(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=32, dim=16,
        dtype="float32",
    )
    params = colbert_params_from_torch(sd, cfg)
    assert params["linear"]["kernel"].shape == (32, 16)
    back = colbert_params_to_torch_state_dict(params, cfg)
    for k, v in sd.items():
        if "pooler" in k or "position_ids" in k:
            continue  # pooler/buffers are not part of the encoder we serve
        assert k in back, f"missing exported key {k}"
        np.testing.assert_allclose(back[k], v.numpy(), rtol=0, atol=0)
