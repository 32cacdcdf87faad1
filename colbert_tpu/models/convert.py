"""Torch -> JAX checkpoint conversion.

Loads either a pretrained HF ``BertModel`` state dict (how the reference
initializes, ``colbert_model.py:47``) or a checkpoint saved by the reference
itself (``pytorch.bin`` with ``model.*``/``linear.*`` keys,
``colbert_model.py:98-114``), and rebuilds our Flax parameter pytree.

torch is only needed for reading the file; all arrays leave as numpy.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from colbert_tpu.config import ModelConfig


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _np(v) for k, v in obj.items()}


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize torch key prefixes: 'model.' (reference save) or 'bert.'."""
    out = {}
    for k, v in sd.items():
        for pre in ("model.", "bert."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        if k.startswith(("embeddings.", "encoder.", "pooler.")):
            k = "encoder_root." + k
        out[k] = _np(v)
    return out


def bert_params_from_torch(sd: Dict[str, np.ndarray], cfg: ModelConfig) -> Dict[str, Any]:
    """Map HF BertModel keys -> our BertEncoder pytree (transposing Dense kernels)."""
    sd = _strip_prefix(sd)
    g = lambda k: sd["encoder_root." + k]

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": g(prefix + ".weight").T, "bias": g(prefix + ".bias")}

    def ln(prefix: str) -> Dict[str, np.ndarray]:
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
            "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
            "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
            "layernorm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(p + "attention.self.query"),
                "key": dense(p + "attention.self.key"),
                "value": dense(p + "attention.self.value"),
                "out": dense(p + "attention.output.dense"),
            },
            "attention_layernorm": ln(p + "attention.output.LayerNorm"),
            "intermediate": dense(p + "intermediate.dense"),
            "output": dense(p + "output.dense"),
            "output_layernorm": ln(p + "output.LayerNorm"),
        }
    return params


def colbert_params_from_torch(path_or_sd, cfg: ModelConfig) -> Dict[str, Any]:
    """Full ColbertModel pytree: {'bert': ..., 'linear': {'kernel': ...}}.

    Accepts a reference ``pytorch.bin`` (has ``linear.weight``) or a plain
    HF BertModel checkpoint (then the projection is left for init).
    """
    sd = load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str) else {k: _np(v) for k, v in path_or_sd.items()}
    out: Dict[str, Any] = {"bert": bert_params_from_torch(sd, cfg)}
    if "linear.weight" in sd:
        out["linear"] = {"kernel": sd["linear.weight"].T}
    return out


def colbert_params_to_torch_state_dict(params: Dict[str, Any], cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Export our Flax ColBERT pytree to the reference's ``pytorch.bin`` key
    layout (``model.*`` BERT keys + ``linear.weight``), so checkpoints
    trained here can be loaded by torch-based tooling."""
    bert = params["bert"]
    out: Dict[str, np.ndarray] = {}

    def put_dense(prefix: str, node: Dict[str, np.ndarray]):
        out[prefix + ".weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            out[prefix + ".bias"] = np.asarray(node["bias"])

    def put_ln(prefix: str, node: Dict[str, np.ndarray]):
        out[prefix + ".weight"] = np.asarray(node["scale"])
        out[prefix + ".bias"] = np.asarray(node["bias"])

    emb = bert["embeddings"]
    out["model.embeddings.word_embeddings.weight"] = np.asarray(emb["word_embeddings"]["embedding"])
    out["model.embeddings.position_embeddings.weight"] = np.asarray(emb["position_embeddings"]["embedding"])
    out["model.embeddings.token_type_embeddings.weight"] = np.asarray(emb["token_type_embeddings"]["embedding"])
    put_ln("model.embeddings.LayerNorm", emb["layernorm"])
    for i in range(cfg.num_layers):
        L = bert[f"layer_{i}"]
        p = f"model.encoder.layer.{i}."
        put_dense(p + "attention.self.query", L["attention"]["query"])
        put_dense(p + "attention.self.key", L["attention"]["key"])
        put_dense(p + "attention.self.value", L["attention"]["value"])
        put_dense(p + "attention.output.dense", L["attention"]["out"])
        put_ln(p + "attention.output.LayerNorm", L["attention_layernorm"])
        put_dense(p + "intermediate.dense", L["intermediate"])
        put_dense(p + "output.dense", L["output"])
        put_ln(p + "output.LayerNorm", L["output_layernorm"])
    if "linear" in params:
        put_dense("linear", params["linear"])
    return out


def ce_params_from_torch(path_or_sd, cfg: ModelConfig) -> Dict[str, Any]:
    sd = load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str) else {k: _np(v) for k, v in path_or_sd.items()}
    out: Dict[str, Any] = {"bert": bert_params_from_torch(sd, cfg)}
    if "linear.weight" in sd:
        out["linear"] = {"kernel": sd["linear.weight"].T, "bias": sd["linear.bias"]}
    return out
