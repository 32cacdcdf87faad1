"""Training-step throughput + MFU attribution (v5e).

Times the jitted SPMD train step at the reference operating point
(BERT-base bf16, 34 queries + 68 docs x 384, MaxSim + NLL + AdamW) and
bisects the gap to peak with targeted variants:

  * xla+threefry   — the round-1/2 production step (baseline)
  * xla+rbg        — TPU hardware RNG for dropout bits
  * flash+rbg      — Pallas flash-attention kernel (no (B,h,L,L) HBM
                     logits/probs; attention dropout moved to the output)
  * flash+rbg+nodrop — deterministic fwd (isolates remaining dropout cost)
  * fwd-only       — loss without grad (fwd/bwd split)

Wall clock over many steps, results pulled to host (tunnel protocol:
block_until_ready does not synchronize).  Usage:
python scripts/bench_train.py [--steps 30]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/colbert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=34)
    ap.add_argument("--doc-len", type=int, default=384)
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--dist-runs", type=str, default="",
                    help="comma-separated substring filter of dist-mode run names")
    ap.add_argument("--dist", action="store_true",
                    help="realistic-doclen mode: lognormal doc lengths "
                         "(mean ~170 tok, clipped to doc-len), length-grouped "
                         "pools of 8 batches, doc_length_buckets truncation — "
                         "measures the bucketing win the all-384 operating "
                         "point cannot show")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from colbert_tpu.config import ColbertConfig, MeshConfig, ModelConfig, MultiviewConfig, TokenizerConfig, TrainConfig
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.ops.maxsim import maxsim_xla
    from colbert_tpu.training.losses import biencoder_nll_loss
    from colbert_tpu.training.train_state import make_train_state

    B, Ld, Lq = args.batch, args.doc_len, 32
    group = 2
    mc = ModelConfig(dtype="bfloat16", attention_impl="xla")
    cfg = ColbertConfig(
        model=mc,
        multiview=MultiviewConfig(enabled=True, q_view=16, d_view=16),
        tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=Lq, doc_maxlen=Ld),
        train=TrainConfig(),
        mesh=MeshConfig(data=1, model=1),
    )
    rng = np.random.default_rng(0)
    q_ids = jnp.asarray(rng.integers(0, mc.vocab_size, (B, Lq)), jnp.int32)
    d_ids = jnp.asarray(rng.integers(0, mc.vocab_size, (B * group, Ld)), jnp.int32)
    q_attn, d_attn = jnp.ones_like(q_ids), jnp.ones_like(d_ids)
    q_act = jnp.ones((B, 16), jnp.int32)
    d_act = jnp.ones((B * group, 16), jnp.int32)
    model0 = ColbertModel(mc, cfg.multiview)
    params = model0.init(jax.random.PRNGKey(0), q_ids, q_attn, d_ids, d_attn)["params"]
    state = make_train_state(model0.apply, params, cfg.train, 1000)

    def make_loss(model, deterministic):
        def loss_for(params, key):
            rngs = None if deterministic else {"dropout": jax.random.fold_in(key, 0)}
            Q = model.apply({"params": params}, q_ids, q_attn, deterministic=deterministic,
                            method=model.query, rngs=rngs)
            rngs2 = None if deterministic else {"dropout": jax.random.fold_in(key, 1)}
            D = model.apply({"params": params}, d_ids, d_attn, deterministic=deterministic,
                            method=model.doc, rngs=rngs2)
            scores = maxsim_xla(Q, D, q_act, d_act) / 0.05
            labels = jnp.arange(B, dtype=jnp.int32) * group
            return biencoder_nll_loss(scores, labels)
        return loss_for

    def make_step(model, deterministic):
        loss_for = make_loss(model, deterministic)

        def step(state, key):
            loss, grads = jax.value_and_grad(loss_for)(state.params, key)
            return state.apply_gradients(grads=grads), loss
        return jax.jit(step)  # no donation: `state` is reused across variants

    # flops estimate: encoder matmuls (6*P*tokens fwd+bwd) + attention
    n_enc = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) - mc.vocab_size * mc.hidden_size
    tokens = B * Lq + B * group * Ld
    flops_mm = 6 * n_enc * tokens
    L = mc.num_layers
    flops_attn = 3 * 2 * 2 * mc.hidden_size * (B * Lq**2 + B * group * Ld**2) * L
    total_flops = flops_mm + flops_attn

    def key_for(impl):
        return jax.random.key(1, impl=impl)

    if args.dist:
        # realistic-doclen mode: most passages are far below doc_maxlen
        # (the reference pads every training doc to 384, tokenizers.py:78-95;
        # here doc_length_buckets + length-grouped pools truncate per batch)
        buckets = tuple(b for b in (128, 192, 256, Ld) if b <= Ld)

        def make_bucket_step(model, donate=False):
            def step(state, key, d_ids_b, d_attn_b):
                def loss_for(p, k):
                    rngs = {"dropout": jax.random.fold_in(k, 0)}
                    Q = model.apply({"params": p}, q_ids, q_attn, deterministic=False,
                                    method=model.query, rngs=rngs)
                    rngs2 = {"dropout": jax.random.fold_in(k, 1)}
                    D = model.apply({"params": p}, d_ids_b, d_attn_b, deterministic=False,
                                    method=model.doc, rngs=rngs2)
                    scores = maxsim_xla(Q, D, q_act, d_act) / 0.05
                    labels = jnp.arange(B, dtype=jnp.int32) * group
                    return biencoder_nll_loss(scores, labels)

                loss, grads = jax.value_and_grad(loss_for)(state.params, key)
                return state.apply_gradients(grads=grads), loss
            # donate matches the production trainer (trainer.py:159)
            return jax.jit(step, donate_argnums=(0,) if donate else ())

        n_batches = args.steps
        # lognormal doclens, median ~160 tokens, clipped (an assumed
        # DuReader-like passage distribution; no corpus is available offline)
        lens = np.clip(rng.lognormal(np.log(160.0), 0.55, n_batches * B * group),
                       24, Ld).astype(np.int64)

        def batch_lengths(grouped: bool):
            ls = lens.copy()
            if grouped:  # pools of 8 batches, sorted within pool
                pool = 8 * B * group
                for lo in range(0, len(ls), pool):
                    ls[lo : lo + pool] = np.sort(ls[lo : lo + pool])
            per_batch = ls.reshape(n_batches, B * group).max(axis=1)
            return [next(b for b in buckets if b >= m) for m in per_batch]

        byte_out_mc = dataclasses.replace(
            mc, dropout_impl="byte", attention_dropout_site="output")
        sm16_mc = dataclasses.replace(byte_out_mc, attention_softmax_dtype="compute")
        runs = (
            ("random-batches", False, mc, False),
            ("length-grouped", True, mc, False),
            ("grouped+bytedrop", True, byte_out_mc, False),
            ("grouped+sm16", True, sm16_mc, False),
            # donate: opt-in via --dist-runs donate.  On the tunnel backend
            # donated buffers are apparently NOT freed across the 4 bucket
            # executables (ResourceExhausted even running this variant
            # alone); the production trainer donates ONE executable and is
            # unaffected.
            ("donate", True, byte_out_mc, True),
        )
        want = [w for w in args.dist_runs.split(",") if w] or ["random", "grouped"]
        for name, grouped, mci, donate in runs:
            if want and not any(w in name for w in want):
                continue
            step_fn = make_bucket_step(ColbertModel(mci, cfg.multiview), donate)
            Ls = batch_lengths(grouped)
            data = {}
            copy_state = lambda: jax.tree.map(jnp.copy, state)  # noqa: E731
            for Lb in sorted(set(Ls)):
                d_ids_b = jnp.asarray(rng.integers(0, mc.vocab_size, (B * group, Lb)), jnp.int32)
                data[Lb] = (d_ids_b, jnp.ones_like(d_ids_b))
                st, _ = step_fn(copy_state() if donate else state,
                                key_for("threefry2x32"), *data[Lb])  # compile
            np.asarray(jax.tree.leaves(st.params)[0][:1])
            key = key_for("threefry2x32")
            st = copy_state() if donate else state
            t0 = time.perf_counter()
            for i, Lb in enumerate(Ls):
                st, loss = step_fn(st, jax.random.fold_in(key, i), *data[Lb])
            float(loss)
            dt = (time.perf_counter() - t0) / n_batches
            print(f"dist/{name:16s}: {dt*1e3:7.1f} ms/step  ex/s={B/dt:6.1f}  "
                  f"mean padded doclen {np.mean(Ls):.0f} (buckets {buckets})", flush=True)
        return

    flash = dataclasses.replace(mc, attention_impl="flash")
    byte = dataclasses.replace(mc, dropout_impl="byte")
    byte_out = dataclasses.replace(byte, attention_dropout_site="output")
    exact = dataclasses.replace(mc, dropout_impl="exact")
    hw = dataclasses.replace(mc, dropout_impl="hw")
    hw_out = dataclasses.replace(hw, attention_dropout_site="output")
    qkv = dataclasses.replace(byte_out, fused_qkv=True)
    sm16 = dataclasses.replace(byte_out, attention_softmax_dtype="compute")
    best = dataclasses.replace(qkv, attention_softmax_dtype="compute")
    variants = [
        # measured once: xla+rbg = 613.6 ms/step (rbg 2.1x SLOWER; dropped)
        # round-3 history: exact 288.5 | flash 375.5 | nodrop 179.9 |
        # flash+nodrop 318.4 | flash-fwd 95.2 ms/step
        ("xla+exact", exact, "threefry2x32", False, "step"),
        ("xla+byte", byte, "threefry2x32", False, "step"),
        ("xla+byte+attnout", byte_out, "threefry2x32", False, "step"),
        ("xla+hw", hw, "threefry2x32", False, "step"),
        ("xla+hw+attnout", hw_out, "threefry2x32", False, "step"),
        ("xla+nodrop", mc, "threefry2x32", True, "step"),
        ("xla-fwd-only", mc, "threefry2x32", True, "fwd"),
        ("flash", flash, "threefry2x32", False, "step"),
        ("flash-fwd-only", flash, "threefry2x32", True, "fwd"),
        # round-3 MFU push: fused qkv projection + compute-dtype softmax
        ("attnout+qkv", qkv, "threefry2x32", False, "step"),
        ("attnout+sm16", sm16, "threefry2x32", False, "step"),
        ("attnout+qkv+sm16", best, "threefry2x32", False, "step"),
        ("best+nodrop", dataclasses.replace(mc, fused_qkv=True, attention_softmax_dtype="compute"),
         "threefry2x32", True, "step"),
        ("best-fwd-only", dataclasses.replace(mc, fused_qkv=True, attention_softmax_dtype="compute"),
         "threefry2x32", True, "fwd"),
        # embedding-grad scatter -> dense one-hot matmul
        ("sm16+onehot", dataclasses.replace(sm16, embedding_impl="onehot"),
         "threefry2x32", False, "step"),
        # remat policies: "attn" drops only the (B,h,L,L) logits/probs
        # residuals (recomputed in bwd, ~2% extra FLOPs, ~2.9 GB/step less
        # HBM residual traffic); dots/full are the memory-pressure options
        ("sm16+remat-attn", dataclasses.replace(sm16, remat="attn"),
         "threefry2x32", False, "step"),
        ("sm16+remat-dots", dataclasses.replace(sm16, remat="dots"),
         "threefry2x32", False, "step"),
        ("remat-attn+nodrop",
         dataclasses.replace(mc, attention_softmax_dtype="compute", remat="attn"),
         "threefry2x32", True, "step"),
    ]
    if args.variants:
        names = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in names]

    for name, mcfg, impl, det, kind in variants:
        model = ColbertModel(mcfg, cfg.multiview)
        key = key_for(impl)
        if kind == "step":
            fn = make_step(model, det)
            st, _ = fn(state, key)  # compile
            np.asarray(jax.tree.leaves(st.params)[0][:1])  # sync via host pull
            t0 = time.perf_counter()
            for i in range(args.steps):
                st, loss = fn(st, jax.random.fold_in(key, i))
            lf = float(loss)
            dt = (time.perf_counter() - t0) / args.steps
            tf = total_flops / dt / 1e12
        else:
            fn = jax.jit(make_loss(model, det))
            fn(state.params, key)
            float(fn(state.params, key))
            t0 = time.perf_counter()
            for i in range(args.steps):
                loss = fn(state.params, jax.random.fold_in(key, i))
            lf = float(loss)
            dt = (time.perf_counter() - t0) / args.steps
            tf = (total_flops / 3) / dt / 1e12
        print(f"{name:18s}: {dt*1e3:7.1f} ms/step  ex/s={B/dt:6.1f}  ~{tf:.0f} TF/s "
              f"({tf/197*100:.0f}% of v5e bf16 peak)  loss={lf:.4f}", flush=True)


if __name__ == "__main__":
    main()
