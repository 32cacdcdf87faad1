"""BERT-style vocab construction.

The reference assumes pretrained vocab files on disk
(``dense_conf.py:6-12`` hardcodes local model dirs).  We support that, and
additionally can synthesize a character-level vocab from a corpus so the
framework is runnable end-to-end (tests, demos, from-scratch training)
without any pretrained artifact.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import Iterable, List

#: [unusedN] slots; multiview needs q_view + d_view of them (<=32 at defaults)
NUM_UNUSED = 64

SPECIALS = ["[PAD]"] + [f"[unused{i}]" for i in range(1, NUM_UNUSED + 1)] + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def build_vocab(texts: Iterable[str], min_count: int = 1, max_size: int = 30000) -> List[str]:
    """Character-level vocab (the natural unit for Chinese BERT) plus
    whole-word entries for ASCII words, mirroring WordPiece granularity."""
    counter: Counter = Counter()
    for t in texts:
        for ch in t:
            if ch.strip():
                counter[ch] += 1
    toks = [t for t, c in counter.most_common(max_size) if c >= min_count]
    return SPECIALS + [t for t in toks if t not in set(SPECIALS)]


def write_vocab(vocab: List[str], path: str | Path) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf8") as f:
        for t in vocab:
            f.write(t + "\n")
    return str(path)
