"""Cross-encoder reranker: BERT + Dense(1) over [CLS].

Parity with reference ``CEModel`` (``colbert/modeling/ce_model.py:41-101``):
the logit is a biased linear readout of the last hidden state at position 0.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from colbert_tpu.config import ModelConfig
from colbert_tpu.models.bert import BertEncoder


class CrossEncoderModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.bert = BertEncoder(self.cfg, name="bert")
        self.linear = nn.Dense(
            1,
            kernel_init=nn.initializers.normal(self.cfg.initializer_range),
            dtype=jnp.dtype(self.cfg.dtype),
            name="linear",
        )

    def __call__(self, input_ids, attention_mask, deterministic: bool = True) -> jax.Array:
        hidden = self.bert(input_ids, attention_mask, deterministic=deterministic)
        cls = hidden[:, 0, :]
        return self.linear(cls).astype(jnp.float32)[:, 0]  # (B,)
