"""Extend a device-generated synthetic corpus with additional parts.

Hardlinks an existing corpus's parts into a destination dir, then generates
only the additional docs on-device and writes the combined meta.  Saves the
~1 min/65k-docs tunnel pull when a larger corpus subsumes a cached smaller
one (the synthetic corpora are i.i.d. draws from the same topic mixture, so
appending differently-keyed parts preserves the distribution; recall is
always measured against the corpus's own oracle).

Usage: python scripts/extend_corpus.py SRC_DIR DST_DIR TOTAL_DOCS
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    src, dst, total = sys.argv[1], sys.argv[2], int(sys.argv[3])
    meta = json.load(open(os.path.join(src, "meta.json")))
    if os.path.exists(os.path.join(dst, "meta.json")):
        print(f"{dst} already complete")
        return
    d_view, dim = int(meta["d_view"]), int(meta["dim"])
    src_docs = int(meta["num_docs"])
    assert total > src_docs, (total, src_docs)
    os.makedirs(os.path.join(dst, "parts"), exist_ok=True)
    n_src_parts = int(meta["num_parts"])
    for p in range(n_src_parts):
        for f in (f"{p}.npy", f"doclens.{p}.json"):
            s, d = os.path.join(src, "parts", f), os.path.join(dst, "parts", f)
            if not os.path.exists(d):
                os.link(s, d)
    print(f"linked {n_src_parts} parts ({src_docs} docs) from {src}", flush=True)

    import numpy as np
    from bench import write_synthetic_parts_device  # noqa: deferred jax init
    import jax.numpy as jnp
    from jax import random as jr

    from colbert_tpu.indexing import IndexStorage

    storage = IndexStorage(dst)
    extra = total - src_docs
    docs_per_part = 65536
    n_topics = 256
    spectrum = jnp.asarray((1.0 / np.sqrt(1.0 + np.arange(dim))).astype(np.float32))
    key = jr.PRNGKey(12345)  # distinct key chain from the base corpus
    kt, key = jr.split(key)
    topics = jr.normal(kt, (n_topics, dim), jnp.float32) * spectrum
    topics = topics / jnp.linalg.norm(topics, axis=1, keepdims=True)

    @jax.jit
    def gen_chunk(k):
        kd, kn = jr.split(k)
        doc_topic = jr.randint(kd, (docs_per_part,), 0, n_topics)
        base = jnp.repeat(topics[doc_topic], d_view, axis=0)
        noise = jr.normal(kn, (docs_per_part * d_view, dim), jnp.float32)
        e = base + 0.3 * (noise * spectrum)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return e.astype(jnp.float16)

    parts = (extra + docs_per_part - 1) // docs_per_part
    for p in range(parts):
        n = min(docs_per_part, extra - p * docs_per_part)
        key, kc = jr.split(key)
        e = np.asarray(gen_chunk(kc))[: n * d_view]
        storage.write_part(n_src_parts + p, e, [d_view] * n)
        print(f"[extend] part {p + 1}/{parts} ({n} docs) written", flush=True)
    json.dump(
        {"dim": dim, "num_docs": total, "num_embeddings": total * d_view,
         "multiview": True, "d_view": d_view, "num_parts": n_src_parts + parts,
         "embedding_dtype": "float16"},
        open(os.path.join(dst, "meta.json"), "w"),
    )
    print(f"extended to {total} docs at {dst}", flush=True)


if __name__ == "__main__":
    main()
