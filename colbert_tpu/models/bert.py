"""BERT encoder in Flax linen, TPU-first.

Functional equivalent of the reference's HF ``BertModel`` usage
(``colbert/modeling/colbert_model.py:47``, ``ce_model.py:51`` — the encoder
output consumed is always ``hidden_states[-1]``, i.e. the last layer's
hidden states, ``BaseModel.py:30,35``).  Re-designed rather than ported:

* compute dtype is configurable (bf16 on the MXU), params stay fp32;
* attention logits + softmax accumulate in fp32;
* static shapes only; the attention mask is an additive bias computed once;
* parameter names mirror HF so torch checkpoints convert mechanically
  (see ``colbert_tpu/models/convert.py``).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from colbert_tpu.config import ModelConfig


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


class FastDropout(nn.Module):
    """Dropout from 8-bit random fields: 4 mask bytes per threefry word —
    4x fewer PRNG bits than ``nn.Dropout``'s 32-bit draw per element.

    Measured on v5e at the reference training operating point: random-bit
    generation for dropout was 108 ms of the 288 ms step (the xla+nodrop
    bisect in ``scripts/bench_train.py``), dominated by the (B, h, L, L)
    attention-probs masks.  The drop probability is quantized to 1/256
    (0.1 -> 26/256 ~ 0.1016); each element's mask is still an independent
    Bernoulli draw, so this IS dropout, at coarser rate resolution."""

    rate: float
    impl: str = "byte"

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate <= 0.0:
            return x
        thr = int(round(self.rate * 256))
        if thr <= 0:
            return x
        if self.impl == "hw" and jax.default_backend() not in ("cpu", "gpu"):
            # TPU hardware PRNG, zero-residual custom-VJP kernel (no CPU
            # interpret path: prng_seed has no CPU lowering — tests get the
            # byte fallback below, same quantized-Bernoulli semantics)
            from colbert_tpu.ops.dropout_pallas import hw_dropout

            seed = jax.random.bits(self.make_rng("dropout"), (), jnp.uint32)
            return hw_dropout(x, seed, thr)
        keep_scale = jnp.asarray(256.0 / (256.0 - thr), x.dtype)
        # manual 4-bytes-per-word unpack: jax.random.bits(uint8) under the
        # partitionable threefry (the default) runs one full threefry2x32
        # PER ELEMENT and truncates — no savings.  Drawing uint32 words and
        # splitting them recovers the real 4x.
        n = x.size
        nw = -(-n // 4)
        words = jax.random.bits(self.make_rng("dropout"), (nw,), jnp.uint32)
        b = jax.lax.shift_right_logical(
            words[:, None], jnp.arange(4, dtype=jnp.uint32)[None, :] * 8
        ).astype(jnp.uint8)
        bits = b.reshape(-1)[:n].reshape(x.shape)
        return jnp.where(bits >= thr, x * keep_scale, jnp.zeros((), x.dtype))


def _dropout(cfg: ModelConfig, rate: float):
    if cfg.dropout_impl in ("byte", "hw"):
        return FastDropout(rate, impl=cfg.dropout_impl)
    return nn.Dropout(rate)


class _EmbedParams(nn.Module):
    """An ``nn.Embed``-shaped parameter holder (same tree path) that lets the
    caller choose the lookup implementation (see ``embedding_impl``)."""

    num_embeddings: int
    features: int
    embedding_init: object

    @nn.compact
    def __call__(self):
        return self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features)
        )


class BertEmbeddings(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        c = self.cfg
        init = nn.initializers.normal(c.initializer_range)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, embedding_init=init, dtype=_dtype(c), name="position_embeddings")
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=init, dtype=_dtype(c), name="token_type_embeddings")
        positions = jnp.arange(input_ids.shape[1])[None, :]
        if c.embedding_impl == "onehot":
            # dense one-hot matmul: the word-embedding gradient becomes an
            # MXU matmul instead of a serialized scatter-add (the one-hot is
            # an iota-compare XLA fuses into the dot, never materialized)
            table = _EmbedParams(c.vocab_size, c.hidden_size, init, name="word_embeddings")()
            oh = jax.nn.one_hot(input_ids, c.vocab_size, dtype=_dtype(c))
            xw = oh @ table.astype(_dtype(c))
        else:
            word = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=init, dtype=_dtype(c), name="word_embeddings")
            xw = word(input_ids)
        x = xw + pos(positions) + typ(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=_dtype(c), name="layernorm")(x)
        return _dropout(c, c.hidden_dropout)(x, deterministic=deterministic)


def _use_flash(cfg: ModelConfig, seq_len: int) -> bool:
    if cfg.attention_impl in ("xla", "auto"):
        # auto = xla: measured SLOWER with the generic Pallas flash kernel
        # for BERT-base at seq 384 on v5e (375.5 vs 288.5 ms/step; the
        # kernel's bwd pass dominates).  flash stays opt-in for the
        # long-sequence regimes it was built for.
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if cfg.attention_impl == "flash" and not on_tpu:
        raise ValueError("attention_impl='flash' requires a TPU backend")
    # the Pallas kernel needs 128-multiple sequence blocks; short query
    # sequences (32) stay on the XLA path (attention is ~free there)
    return on_tpu and seq_len % 128 == 0 and seq_len >= 128


class _DenseParams(nn.Module):
    """Holds a Dense layer's (kernel, bias) under the standard HF names
    without applying it — lets ``fused_qkv`` concatenate the three
    projections into one matmul while keeping the parameter tree (and
    torch checkpoint conversion) identical to three ``nn.Dense`` modules."""

    features: int
    kernel_init: object

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class BertSelfAttention(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias, attention_mask, deterministic: bool):
        c = self.cfg
        h, nh = c.hidden_size, c.num_heads
        hd = h // nh
        init = nn.initializers.normal(c.initializer_range)
        if c.fused_qkv:
            # one (H, 3H) matmul instead of three (H, H): fewer kernel
            # launches, one fused bwd dX matmul; params stay separate
            wq, bq = _DenseParams(h, init, name="query")(h)
            wk, bk = _DenseParams(h, init, name="key")(h)
            wv, bv = _DenseParams(h, init, name="value")(h)
            W = jnp.concatenate([wq, wk, wv], axis=1).astype(_dtype(c))
            bqkv = jnp.concatenate([bq, bk, bv]).astype(_dtype(c))
            qkv = x @ W + bqkv
            q, k, v = (
                qkv[..., :h].reshape(*x.shape[:2], nh, hd),
                qkv[..., h : 2 * h].reshape(*x.shape[:2], nh, hd),
                qkv[..., 2 * h :].reshape(*x.shape[:2], nh, hd),
            )
        else:
            dense = lambda name: nn.Dense(h, kernel_init=init, dtype=_dtype(c), name=name)
            q = dense("query")(x).reshape(*x.shape[:2], nh, hd)
            k = dense("key")(x).reshape(*x.shape[:2], nh, hd)
            v = dense("value")(x).reshape(*x.shape[:2], nh, hd)
        if _use_flash(c, x.shape[1]):
            # fused flash-attention kernel: the (B, nh, L, L) logits/probs
            # never hit HBM (recomputed in bwd) — the XLA path materializes
            # them in fp32, ~240 MB/layer at the training operating point.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            seg = attention_mask.astype(jnp.int32)
            ctx = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(1.0 / math.sqrt(hd)),
            )
            ctx = ctx.transpose(0, 2, 1, 3).reshape(*x.shape[:2], h)
            # the kernel has no probs-dropout; apply the same rate to the
            # attention output instead (documented deviation, ~L x fewer
            # random bits than the (B, nh, L, L) probs mask)
            ctx = _dropout(c, c.attention_dropout)(ctx, deterministic=deterministic)
        else:
            # fp32 logits + softmax for stability by default ("compute"
            # halves the (B, h, L, L) HBM traffic at bf16; softmax is
            # max-subtracted so bf16 is stable at BERT logit scales)
            sm = jnp.float32 if c.attention_softmax_dtype == "fp32" else _dtype(c)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=sm)
            logits = logits / jnp.sqrt(hd).astype(sm) + bias.astype(sm)
            # tag the only (B, h, L, L) residuals so remat="attn" can drop
            # exactly these from the saved set (recomputed in bwd from the
            # saved q/k: one einsum + softmax, ~2% of the step's FLOPs,
            # saves ~2.9 GB/step of HBM residual write+read at the
            # reference operating point)
            logits = checkpoint_name(logits, "attn_inter")
            probs = checkpoint_name(
                jax.nn.softmax(logits, axis=-1).astype(_dtype(c)), "attn_inter"
            )
            if c.attention_dropout_site == "probs":
                probs = _dropout(c, c.attention_dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape[:2], h)
            if c.attention_dropout_site == "output":
                ctx = _dropout(c, c.attention_dropout)(ctx, deterministic=deterministic)
        return nn.Dense(h, kernel_init=init, dtype=_dtype(c), name="out")(ctx)


class BertLayer(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias, attention_mask, deterministic: bool):
        c = self.cfg
        init = nn.initializers.normal(c.initializer_range)
        attn = BertSelfAttention(c, name="attention")(x, bias, attention_mask, deterministic)
        attn = _dropout(c, c.hidden_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=_dtype(c), name="attention_layernorm")(x + attn)
        y = nn.Dense(c.intermediate_size, kernel_init=init, dtype=_dtype(c), name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, kernel_init=init, dtype=_dtype(c), name="output")(y)
        y = _dropout(c, c.hidden_dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=_dtype(c), name="output_layernorm")(x + y)


class BertEncoder(nn.Module):
    """Returns the last layer's hidden states, shape (B, L, H)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = BertEmbeddings(c, name="embeddings")(input_ids, token_type_ids, deterministic)
        # additive mask bias, fp32: 0 for attend, -1e9 for masked
        bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        layer_cls = BertLayer
        if c.remat != "none":
            policy = {
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "full": jax.checkpoint_policies.nothing_saveable,
                # "attn": save every intermediate EXCEPT the (B, h, L, L)
                # attention logits/probs (tagged above) — the cheapest
                # FLOPs-for-HBM trade in the layer
                "attn": jax.checkpoint_policies.save_any_names_but_these("attn_inter"),
            }[c.remat]
            layer_cls = nn.remat(BertLayer, policy=policy, static_argnums=(4,))
        for i in range(c.num_layers):
            x = layer_cls(c, name=f"layer_{i}")(x, bias, attention_mask, deterministic)
        return x
