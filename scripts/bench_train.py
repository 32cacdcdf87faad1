"""Training-step throughput + MFU attribution (v5e).

Times the jitted SPMD train step at the reference operating point
(BERT-base bf16, 34 queries + 68 docs x 384, MaxSim + NLL + AdamW) and
bisects the gap to peak with targeted variants:

  * baseline        — the production step
  * no-dropout      — deterministic fwd (isolates threefry RNG cost)
  * rbg-rng         — run with JAX_DEFAULT_PRNG_IMPL=rbg (cheap TPU RNG)
  * fwd-only        — loss without grad (fwd/bwd split)

Wall clock over many steps, params pulled via a scalar reduce (tunnel
protocol).  Usage: python scripts/bench_train.py [--steps 30]
"""

from __future__ import annotations

import argparse
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
    cfg = ColbertConfig(
        model=ModelConfig(dtype="bfloat16"),
        multiview=MultiviewConfig(enabled=True, q_view=16, d_view=16),
        tokenizer=TokenizerConfig(vocab_path="unused", query_maxlen=Lq, doc_maxlen=Ld),
        train=TrainConfig(),
        mesh=MeshConfig(data=1, model=1),
    )
    model = ColbertModel(cfg.model, cfg.multiview)
    rng = np.random.default_rng(0)
    q_ids = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, Lq)), jnp.int32)
    d_ids = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B * group, Ld)), jnp.int32)
    q_attn, d_attn = jnp.ones_like(q_ids), jnp.ones_like(d_ids)
    q_act = jnp.ones((B, 16), jnp.int32)
    d_act = jnp.ones((B * group, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), q_ids, q_attn, d_ids, d_attn)["params"]
    state = make_train_state(model.apply, params, cfg.train, 1000)

    def loss_for(params, key, deterministic):
        Q = model.apply({"params": params}, q_ids, q_attn, deterministic=deterministic,
                        method=model.query, rngs=None if deterministic else {"dropout": jax.random.fold_in(key, 0)})
        D = model.apply({"params": params}, d_ids, d_attn, deterministic=deterministic,
                        method=model.doc, rngs=None if deterministic else {"dropout": jax.random.fold_in(key, 1)})
        scores = maxsim_xla(Q, D, q_act, d_act) / 0.05
        labels = jnp.arange(B, dtype=jnp.int32) * group
        return biencoder_nll_loss(scores, labels)

    def make_step(deterministic):
        def step(state, key):
            loss, grads = jax.value_and_grad(loss_for)(state.params, key, deterministic)
            return state.apply_gradients(grads=grads), loss
        return jax.jit(step, static_argnames=(), donate_argnums=(0,))

    fwd = jax.jit(lambda p, k: loss_for(p, k, True))

    # flops estimate: encoder fwd 2(q+d passes... tokens) * 2 * params_enc * 3 (fwd+bwd)
    n_enc = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) - cfg.model.vocab_size * cfg.model.hidden_size
    tokens = B * Lq + B * group * Ld
    flops_mm = 6 * n_enc * tokens
    L = cfg.model.num_layers
    flops_attn = 3 * 2 * 2 * cfg.model.hidden_size * (B * Lq**2 + B * group * Ld**2) * L / 1  # fwd+bwd
    total_flops = flops_mm + flops_attn

    results = {}
    key = jax.random.PRNGKey(1)
    for name, runner in (
        ("baseline", ("step", make_step(False))),
        ("no-dropout", ("step", make_step(True))),
        ("fwd-only", ("fwd", fwd)),
    ):
        kind, fn = runner
        st = state
        if kind == "step":
            st, _ = fn(st, key)  # compile
            jnp.asarray(0.0)
            t0 = time.perf_counter()
            for i in range(args.steps):
                st, loss = fn(st, jax.random.fold_in(key, i))
            float(loss)  # sync
            dt = (time.perf_counter() - t0) / args.steps
        else:
            fn(state.params, key)
            t0 = time.perf_counter()
            for i in range(args.steps):
                loss = fn(state.params, jax.random.fold_in(key, i))
            float(loss)
            dt = (time.perf_counter() - t0) / args.steps
        tf = total_flops / dt / 1e12 if kind == "step" else (total_flops / 3) / dt / 1e12
        results[name] = dt
        print(f"{name:12s}: {dt*1e3:7.1f} ms/step  ex/s={B/dt:6.1f}  ~{tf:.0f} TF/s "
              f"({tf/197*100:.0f}% of v5e bf16 peak)", flush=True)


if __name__ == "__main__":
    main()
