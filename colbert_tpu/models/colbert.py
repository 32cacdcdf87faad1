"""ColBERT bi-encoder: BERT + bias-free projection + L2-normalize (+multiview).

Capability parity with the reference ``ColbertModel``/``BaseModel``
(``colbert/modeling/colbert_model.py:39-50``, ``BaseModel.py:21-46``):

* ``get_representation``: optionally slice the first ``q_view``/``d_view``
  positions (multiview), apply a bias-free ``Dense(dim)``, L2-normalize
  along the feature axis (``BaseModel.py:21-27``).
* scoring is the shared :mod:`colbert_tpu.ops.maxsim` op.

Unlike the reference (which tokenizes inside ``forward`` on every step,
``colbert_model.py:80-84``), tokenization lives in the host input pipeline;
the model is a pure function of dense int32 arrays — mandatory for jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from colbert_tpu.config import ModelConfig, MultiviewConfig
from colbert_tpu.models.bert import BertEncoder


class ColbertModel(nn.Module):
    cfg: ModelConfig
    multiview: MultiviewConfig

    def setup(self):
        self.bert = BertEncoder(self.cfg, name="bert")
        self.linear = nn.Dense(
            self.cfg.dim,
            use_bias=False,
            kernel_init=nn.initializers.normal(self.cfg.initializer_range),
            dtype=jnp.dtype(self.cfg.dtype),
            name="linear",
        )

    def _represent(self, hidden: jax.Array, is_query: bool) -> jax.Array:
        if self.multiview.enabled:
            view = self.multiview.q_view if is_query else self.multiview.d_view
            hidden = hidden[:, :view, :]
        t = self.linear(hidden).astype(jnp.float32)
        norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
        return t / jnp.maximum(norm, 1e-12)

    def query(self, input_ids, attention_mask, deterministic: bool = True) -> jax.Array:
        hidden = self.bert(input_ids, attention_mask, deterministic=deterministic)
        return self._represent(hidden, is_query=True)

    def doc(self, input_ids, attention_mask, deterministic: bool = True) -> jax.Array:
        hidden = self.bert(input_ids, attention_mask, deterministic=deterministic)
        return self._represent(hidden, is_query=False)

    def __call__(self, q_ids, q_mask, d_ids, d_mask, deterministic: bool = True):
        """Encode both sides (the training forward, minus loss)."""
        return (
            self.query(q_ids, q_mask, deterministic=deterministic),
            self.doc(d_ids, d_mask, deterministic=deterministic),
        )
