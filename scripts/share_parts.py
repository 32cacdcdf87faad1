"""Hardlink one bench corpus's part files into another tagged index dir.

The bench cache tags index dirs by (codec, size, partitions, balance, ...),
so two configs over the SAME synthetic corpus would otherwise regenerate
identical part files (minutes of device-gen + tunnel pull per 100k docs).
Part generation is deterministic per (num_docs, d_view, dim, gen-mode), so
hardlinking parts + doclens + meta is exact.

Usage: python scripts/share_parts.py SRC_DIR DST_DIR
"""

import json
import os
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    if not os.path.exists(os.path.join(src, "meta.json")):
        print(f"src {src} has no corpus; nothing to share")
        return
    if os.path.exists(os.path.join(dst, "meta.json")):
        print(f"dst {dst} already has a corpus; skipping")
        return
    os.makedirs(os.path.join(dst, "parts"), exist_ok=True)
    n = 0
    for f in os.listdir(os.path.join(src, "parts")):
        s, d = os.path.join(src, "parts", f), os.path.join(dst, "parts", f)
        if not os.path.exists(d):
            os.link(s, d)
            n += 1
    meta = json.load(open(os.path.join(src, "meta.json")))
    # build metadata (codec etc.) belongs to the src build; keep corpus keys
    corpus_keys = ("dim", "num_docs", "num_embeddings", "multiview", "d_view",
                   "num_parts", "embedding_dtype")
    json.dump({k: meta[k] for k in corpus_keys if k in meta},
              open(os.path.join(dst, "meta.json"), "w"))
    print(f"linked {n} part files {src} -> {dst}")


if __name__ == "__main__":
    main()
