"""ColBERT tokenizer: marker tokens, punctuation masking, multiview markers.

Reproduces the observable behavior of the reference ``CostomTokenizer``
(``colbert/modeling/tokenizers.py:7-95``) on top of HF ``BertTokenizerFast``:

* non-multiview (``tokenize_seqs``, ``:32-40``): sequences are
  ``[CLS] <marker> text [SEP]`` with ``[unused1]`` as the query marker and
  ``[unused2]`` as the doc marker; truncated to max length; ``active_mask``
  is 1 everywhere except punctuation tokens and ``[SEP]`` (note: ``[CLS]``
  and the marker ARE scored — the reference only ignores punctuation+SEP).
* multiview (``tokenize_multiview``, ``:42-63``): sequences are
  ``<q_view or d_view view-markers> text [SEP]`` with NO ``[CLS]``; padded to
  max length; ``active_mask`` covers exactly the first ``view_num``
  positions (only view vectors are scored).  Query markers are
  ``[unused1..q_view]``, doc markers ``[unused{q_view+1}..{q_view+d_view}]``
  (the reference's ``d_makers`` range expression at ``tokenizers.py:30`` is
  written as ``d_view+d_view+1`` — coincidentally correct only when
  ``q_view==d_view``; we use ``q_view+d_view+1``).
* cross-encoder pairs (``tokenize_ce``, ``:65-76``):
  ``[CLS] q [SEP] p [SEP]`` padded/truncated to ``ce_maxlen``.

Outputs are dense numpy int32 arrays, ready to feed a jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from colbert_tpu.config import MultiviewConfig, TokenizerConfig
from colbert_tpu.tokenization.punctuation import IGNORED_TOKENS


@dataclass
class TokenBatch:
    input_ids: np.ndarray        # (B, L) int32
    attention_mask: np.ndarray   # (B, L) int32
    active_mask: Optional[np.ndarray] = None  # (B, L') int32; L'=view_num for multiview

    def __iter__(self):
        yield self.input_ids
        yield self.attention_mask
        yield self.active_mask


def _load_hf_tokenizer(vocab_path: str, do_lower_case: bool):
    from transformers import BertTokenizerFast

    import os

    if os.path.isdir(vocab_path):
        return BertTokenizerFast.from_pretrained(vocab_path, do_lower_case=do_lower_case)
    return BertTokenizerFast(vocab_file=vocab_path, do_lower_case=do_lower_case)


class ColbertTokenizer:
    def __init__(self, cfg: TokenizerConfig, multiview: MultiviewConfig):
        if not cfg.vocab_path:
            raise ValueError("TokenizerConfig.vocab_path is required")
        self.cfg = cfg
        self.multiview = multiview
        self.tok = _load_hf_tokenizer(cfg.vocab_path, cfg.do_lower_case)
        if multiview.enabled:
            n = multiview.q_view + multiview.d_view
            markers = [f"[unused{i}]" for i in range(1, n + 1)]
            self.q_markers = "".join(markers[: multiview.q_view])
            self.d_markers = "".join(markers[multiview.q_view :])
        else:
            markers = ["[unused1]", "[unused2]"]
            self.q_markers = markers[0]
            self.d_markers = markers[1]
        self.tok.add_special_tokens({"additional_special_tokens": markers})
        self._marker_ids = set(self.tok.convert_tokens_to_ids(markers))

    # ---- public API ----

    @property
    def vocab_size(self) -> int:
        return len(self.tok)

    def encode_queries(self, texts: Sequence[str]) -> TokenBatch:
        if self.multiview.enabled:
            return self._encode_multiview(texts, self.cfg.query_maxlen, is_query=True)
        return self._encode_marked(texts, self.cfg.query_maxlen, is_query=True)

    def encode_docs(self, texts: Sequence[str]) -> TokenBatch:
        if self.multiview.enabled:
            return self._encode_multiview(texts, self.cfg.doc_maxlen, is_query=False)
        return self._encode_marked(texts, self.cfg.doc_maxlen, is_query=False)

    def encode_ce_pairs(self, pairs: Sequence[Tuple[str, str]]) -> TokenBatch:
        texts = [f"[CLS]{q}[SEP]{p}[SEP]" for q, p in pairs]
        enc = self.tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.cfg.ce_maxlen,
            add_special_tokens=False,
        )
        return TokenBatch(
            np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.int32),
        )

    # ---- internals ----

    def _encode_marked(self, texts: Sequence[str], maxlen: int, is_query: bool) -> TokenBatch:
        """Non-multiview path: hand-rolled [CLS]/markers + punctuation mask."""
        marker = self.q_markers if is_query else self.d_markers
        batch_tokens: List[List[str]] = [
            self.tok.tokenize(f"[CLS]{marker}{t}[SEP]")[:maxlen] for t in texts
        ]
        b = len(batch_tokens)
        ids = np.zeros((b, maxlen), np.int32)
        attn = np.zeros((b, maxlen), np.int32)
        active = np.zeros((b, maxlen), np.int32)
        for i, toks in enumerate(batch_tokens):
            L = len(toks)
            ids[i, :L] = self.tok.convert_tokens_to_ids(toks)
            attn[i, :L] = 1
            active[i, :L] = [0 if t in IGNORED_TOKENS else 1 for t in toks]
        return TokenBatch(ids, attn, active)

    def _encode_multiview(self, texts: Sequence[str], maxlen: int, is_query: bool) -> TokenBatch:
        marker = self.q_markers if is_query else self.d_markers
        view_num = self.multiview.q_view if is_query else self.multiview.d_view
        enc = self.tok(
            [f"{marker}{t}[SEP]" for t in texts],
            padding="max_length",
            truncation=True,
            max_length=maxlen,
            add_special_tokens=False,
        )
        ids = np.asarray(enc["input_ids"], np.int32)
        attn = np.asarray(enc["attention_mask"], np.int32)
        active = np.ones((ids.shape[0], view_num), np.int32)
        return TokenBatch(ids, attn, active)
