"""ColBERT retriever trainer: one jitted SPMD step, global in-batch negatives.

TPU-native redesign of the reference training engine (vendored HF Trainer +
DDP + NCCL all_gather splice, ``awutils/awtrainer.py``,
``training_utils.py:35-45``):

* The batch is sharded over the mesh's ``data`` axis; the score matrix
  ``maxsim(Q, D)`` couples every query with every doc in the GLOBAL batch,
  so XLA inserts the ICI all-gather inside the step — the reference's
  ``collection_qd_masks`` gradient-splice hack (``all_t[rank] = t``) is
  unnecessary: ``jax.grad`` differentiates through collectives correctly.
* bf16 compute, fp32 params/optimizer; no GradScaler needed (vs
  ``amp.py`` / ``awtrainer.py:1844-1858``).
* Eval + checkpoint every half epoch (``mytrainer_callbacks.py:31-35``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.models import ColbertModel
from colbert_tpu.models.sharding import param_shardings
from colbert_tpu.ops.maxsim import maxsim, maxsim_xla
from colbert_tpu.parallel.mesh import batch_sharding, make_mesh, put_global
from colbert_tpu.tokenization import ColbertTokenizer
from colbert_tpu.training.checkpoint import CheckpointManager
from colbert_tpu.training.dataset import RetrievalDataset, RetrievalSampler, TrainBatch
from colbert_tpu.training.losses import (
    biencoder_nll_loss,
    positive_ranks,
    reciprocal_ranks,
)
from colbert_tpu.training.train_state import TrainState, make_train_state
from colbert_tpu.utils.logging import Timers, get_logger

logger = get_logger("trainer")


@dataclass
class TrainLog:
    steps: List[Dict[str, float]] = field(default_factory=list)
    evals: List[Dict[str, float]] = field(default_factory=list)


class ColbertTrainer:
    def __init__(
        self,
        cfg: ColbertConfig,
        tokenizer: ColbertTokenizer,
        mesh=None,
        init_params: Optional[Any] = None,
        total_steps: Optional[int] = None,
    ):
        self.cfg = cfg
        self.tok = tokenizer
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.model = ColbertModel(cfg.model, cfg.multiview)
        # typed key so dropout bits use the configured PRNG (rbg = TPU
        # hardware RNG; threefry random-bit generation is scalar-ALU-bound)
        self.rng = jax.random.key(cfg.train.seed, impl={"threefry": "threefry2x32"}.get(cfg.train.rng_impl, cfg.train.rng_impl))
        self._total_steps = total_steps
        self._init_params = init_params
        self.state: Optional[TrainState] = None
        self.ckpt = CheckpointManager(cfg.train.checkpoint_dir, keep=cfg.train.keep_checkpoints)
        self.timers = Timers()
        self.log = TrainLog()
        self._compiled = {}

    # ---- setup ----

    def _init_state(self, total_steps: int) -> None:
        if self.state is not None:
            return
        B, Lq, Ld = 2, self.cfg.tokenizer.query_maxlen, self.cfg.tokenizer.doc_maxlen
        dummy_q = jnp.zeros((B, Lq), jnp.int32)
        dummy_d = jnp.zeros((B, Ld), jnp.int32)
        if self._init_params is not None:
            params = self._init_params
        else:
            params = self.model.init(
                self.rng, dummy_q, jnp.ones_like(dummy_q), dummy_d, jnp.ones_like(dummy_d)
            )["params"]
        # fill in any params missing from a converted checkpoint (e.g. the
        # projection head when loading a bare pretrained BERT)
        init_full = self.model.init(
            self.rng, dummy_q, jnp.ones_like(dummy_q), dummy_d, jnp.ones_like(dummy_d)
        )["params"]
        params = _merge_params(init_full, params)
        params = jax.tree.map(put_global, params, param_shardings(params, self.mesh))
        self.state = make_train_state(self.model.apply, params, self.cfg.train, total_steps)

    def _shard_batch(self, batch: TrainBatch):
        bs1 = batch_sharding(self.mesh, 2)
        arr = lambda a: put_global(a, bs1)
        return tuple(arr(a) for a in (batch.q_ids, batch.q_attn, batch.q_active, batch.d_ids, batch.d_attn, batch.d_active))

    # ---- jitted steps ----

    def _train_step_fn(self):
        model, T = self.model, self.cfg.train.score_temperature
        group = self.cfg.train.train_num_positives + self.cfg.train.train_num_negatives
        accum = max(1, self.cfg.train.grad_accum_steps)
        if accum > 1:
            bs = self.cfg.train.per_device_batch_size * self.mesh.shape["data"]
            logger.warning(
                "grad_accum_steps=%d: in-batch negatives stay within each "
                "micro-batch, so the softmax sees %d docs per query instead of "
                "the full batch's %d — a smaller negative pool than the same "
                "global batch without accumulation (loss definition changes; "
                "reference parity holds only at grad_accum_steps=1)",
                accum, (bs // accum) * group, bs * group,
            )

        def loss_for(params, rng, q_ids, q_attn, q_active, d_ids, d_attn, d_active):
            Q = model.apply(
                {"params": params}, q_ids, q_attn, deterministic=False,
                method=model.query, rngs={"dropout": jax.random.fold_in(rng, 0)},
            )
            D = model.apply(
                {"params": params}, d_ids, d_attn, deterministic=False,
                method=model.doc, rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
            scores = maxsim_xla(Q, D, q_active, d_active) / T
            labels = jnp.arange(scores.shape[0], dtype=jnp.int32) * group
            return biencoder_nll_loss(scores, labels)

        def step(state: TrainState, rng, q_ids, q_attn, q_active, d_ids, d_attn, d_active):
            if accum == 1:
                loss, grads = jax.value_and_grad(loss_for)(
                    state.params, rng, q_ids, q_attn, q_active, d_ids, d_attn, d_active
                )
                return state.apply_gradients(grads=grads), loss

            # in-batch negatives stay within each micro-batch (group-aligned split)
            micro = lambda a: a.reshape(accum, a.shape[0] // accum, *a.shape[1:])
            batches = (micro(q_ids), micro(q_attn), micro(q_active),
                       micro(d_ids), micro(d_attn), micro(d_active))

            def body(carry, inp):
                gacc, lacc, i = carry
                loss, grads = jax.value_and_grad(loss_for)(
                    state.params, jax.random.fold_in(rng, 100 + i), *inp
                )
                return (jax.tree.map(jnp.add, gacc, grads), lacc + loss, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, lsum, _), _ = jax.lax.scan(body, (zeros, 0.0, 0), batches)
            grads = jax.tree.map(lambda g: g / accum, gsum)
            return state.apply_gradients(grads=grads), lsum / accum

        return jax.jit(step, donate_argnums=(0,))

    def _eval_step_fn(self):
        model = self.model
        group = self.cfg.train.eval_num_positives + self.cfg.train.eval_num_negatives
        num_pos = self.cfg.train.eval_num_positives
        # fused Pallas MaxSim only on a single-device mesh: a pallas_call
        # does not SPMD-partition over a sharded batch; the XLA einsum does
        use_pallas = self.mesh.size == 1 and jax.default_backend() not in ("cpu", "gpu")

        def step(params, q_ids, q_attn, q_active, d_ids, d_attn, d_active, q_valid):
            Q = model.apply({"params": params}, q_ids, q_attn, method=model.query)
            D = model.apply({"params": params}, d_ids, d_attn, method=model.doc)
            # all-pairs scoring: the fused Pallas MaxSim on TPU (no (q,d,m,n)
            # HBM intermediate), XLA einsum elsewhere / for training (autodiff)
            scores = maxsim(Q, D, q_active, d_active, use_pallas=use_pallas)
            # pad rows (dev set smaller than the fixed global batch): their
            # doc columns must not perturb real queries' rankings
            doc_valid = jnp.repeat(q_valid, group)
            scores = jnp.where(doc_valid[None, :], scores, -jnp.inf)
            return (
                positive_ranks(scores, group, num_pos),
                reciprocal_ranks(scores, group, num_pos),
            )

        return jax.jit(step)

    # ---- public API ----

    def train(
        self,
        train_ds: RetrievalDataset,
        dev_ds: Optional[RetrievalDataset] = None,
        num_epochs: Optional[int] = None,
        resume: bool = False,
    ) -> TrainLog:
        c = self.cfg.train
        epochs = num_epochs if num_epochs is not None else c.num_epochs
        global_bs = c.per_device_batch_size * self.mesh.shape["data"]
        sampler = RetrievalSampler(train_ds, self.tok, c, global_bs, is_eval=False)
        steps_per_epoch = sampler.steps_per_epoch()
        total_steps = self._total_steps or max(1, steps_per_epoch * epochs)
        self._init_state(total_steps)

        start_step = 0
        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                target = {"params": self.state.params, "opt_state": self.state.opt_state, "step": 0}
                restored = self.ckpt.restore(latest, target)
                # restore can land leaves on a single device; re-put onto the
                # live state's shardings so the jitted step sees one layout.
                # Only NamedSharding leaves: committing scalars (e.g. optax
                # counters) to a single device makes jit layouts conflict.
                from jax.sharding import NamedSharding

                # non-NamedSharding leaves go through host to drop the
                # committed-device flag orbax attaches
                put = (
                    lambda r, t: jax.device_put(r, t.sharding)
                    if isinstance(getattr(t, "sharding", None), NamedSharding)
                    else jnp.asarray(np.asarray(r))
                )
                self.state = self.state.replace(
                    params=jax.tree.map(put, restored["params"], self.state.params),
                    opt_state=jax.tree.map(put, restored["opt_state"], self.state.opt_state),
                    step=latest,
                )
                start_step = latest
                logger.info("resumed from step %d", latest)

        train_step = self._compiled.setdefault("train", self._train_step_fn())
        eval_every = max(1, steps_per_epoch // max(1, c.evals_per_epoch))
        start_epoch = start_step // max(1, steps_per_epoch)
        gstep = start_epoch * steps_per_epoch
        running_loss, running_n = 0.0, 0
        t_start = time.perf_counter()
        for epoch in range(start_epoch, epochs):
            for batch in sampler.epoch(epoch):
                if gstep < start_step:
                    # deterministic dataloader fast-forward on resume
                    # (parity with awtrainer.py:1260-1295)
                    gstep += 1
                    continue
                rng = jax.random.fold_in(self.rng, gstep)
                trace_dir = os.environ.get("COLBERT_TPU_TRACE_DIR")
                if trace_dir and gstep == start_step + 5:
                    jax.profiler.start_trace(trace_dir)  # capture a steady-state step
                with self.timers.span("train_step"):
                    self.state, loss = train_step(self.state, rng, *self._shard_batch(batch))
                if trace_dir and gstep == start_step + 6:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    logger.info("wrote profiler trace to %s", trace_dir)
                gstep += 1
                loss_f = float(loss)
                if not np.isfinite(loss_f):
                    # parity with the reference's NaN assert (awtrainer.py:1320),
                    # but with actionable context
                    raise FloatingPointError(
                        f"non-finite loss {loss_f} at step {gstep} (epoch {epoch})"
                    )
                running_loss += loss_f
                running_n += 1
                if gstep % c.log_every == 0 or gstep == 1:
                    avg = running_loss / max(1, running_n)
                    rate = running_n * global_bs / (time.perf_counter() - t_start)
                    logger.info("step %d/%d loss=%.4f ex/s=%.1f", gstep, total_steps, avg, rate)
                    self.log.steps.append({"step": gstep, "loss": avg, "examples_per_s": rate})
                if gstep % eval_every == 0:
                    metrics = self.evaluate(dev_ds) if dev_ds is not None else {}
                    self.save(gstep, metrics)
        self._dump_log()
        return self.log

    def _dump_log(self) -> None:
        """Persist step/eval metrics as JSONL next to the checkpoints (the
        reference only printed metrics; SURVEY §5 'printed, not persisted')."""
        from colbert_tpu.utils.io import dump_jsonl

        rows = [{"kind": "step", **s} for s in self.log.steps] + [
            {"kind": "eval", **e} for e in self.log.evals
        ]
        dump_jsonl(rows, self.ckpt.dir / "train_log.jsonl")
        self.timers.dump(str(self.ckpt.dir / "timers.json"))

    def evaluate(self, dev_ds: RetrievalDataset) -> Dict[str, float]:
        c = self.cfg.train
        # fixed global batch (a multiple of the data axis by construction);
        # partial final batches are padded and the pad rows masked out —
        # device_put with P('data') requires divisibility
        n_data = self.mesh.shape["data"]
        global_bs = c.per_device_batch_size * n_data
        sampler = RetrievalSampler(dev_ds, self.tok, c, global_bs, is_eval=True, drop_last=False)
        group = c.eval_num_positives + c.eval_num_negatives
        eval_step = self._compiled.setdefault("eval", self._eval_step_fn())
        ranks, rrs = [], []
        for batch in sampler.epoch(0):
            n_real = batch.q_ids.shape[0]
            batch = _pad_batch(batch, global_bs, group)
            q_valid = np.zeros(global_bs, bool)
            q_valid[:n_real] = True
            r, rr = eval_step(
                self.state.params, *self._shard_batch(batch),
                put_global(q_valid, batch_sharding(self.mesh, 1)),
            )
            ranks += list(np.asarray(r)[:n_real])
            rrs += list(np.asarray(rr)[:n_real])
        metrics = {
            "eval_mean_positive_rank": float(np.mean(ranks)) if ranks else float("nan"),
            "eval_mrr": float(np.mean(rrs)) if rrs else float("nan"),
        }
        logger.info("eval: %s", metrics)
        self.log.evals.append(metrics)
        return metrics

    def evaluate_checkpoints(self, dev_ds: RetrievalDataset) -> Dict[int, Dict[str, float]]:
        """Evaluate EVERY saved checkpoint (parity with the reference's
        checkpoint-dir evaluation loop, ``colbert_trainer.py:52-71``)."""
        steps = self.ckpt.all_steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt.dir}")
        self._init_state(total_steps=max(steps))
        out: Dict[int, Dict[str, float]] = {}
        original = self.state
        for step in steps:
            restored = self.ckpt.restore(
                step, {"params": self.state.params, "opt_state": self.state.opt_state, "step": 0}
            )
            self.state = self.state.replace(params=restored["params"])
            out[step] = self.evaluate(dev_ds)
            logger.info("checkpoint-%d: %s", step, out[step])
        self.state = original
        return out

    def save(self, step: int, metrics: Optional[Dict[str, float]] = None) -> str:
        return self.ckpt.save(
            step,
            {"params": self.state.params, "opt_state": self.state.opt_state, "step": step},
            metadata={"metrics": metrics or {}, "config": self.cfg.to_dict()},
        )

    def load_params_for_inference(self, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.ckpt.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt.dir}")
        self._init_state(total_steps=1)
        restored = self.ckpt.restore(step, {"params": self.state.params, "opt_state": self.state.opt_state, "step": 0})
        return restored["params"]


def _pad_batch(batch: TrainBatch, global_bs: int, group: int) -> TrainBatch:
    """Pad a partial eval batch up to ``global_bs`` queries (and
    ``global_bs * group`` docs) with zero rows; callers mask the pad rows."""
    n = batch.q_ids.shape[0]
    if n == global_bs:
        return batch
    padq = lambda a: np.pad(a, ((0, global_bs - n), (0, 0)))
    padd = lambda a: np.pad(a, ((0, (global_bs - n) * group), (0, 0)))
    return TrainBatch(
        padq(batch.q_ids), padq(batch.q_attn), padq(batch.q_active),
        padd(batch.d_ids), padd(batch.d_attn), padd(batch.d_active),
    )


def _merge_params(full: Any, partial: Any) -> Any:
    """Overlay ``partial`` (possibly missing heads) onto freshly-init ``full``
    — the analogue of the reference's ``strict=False`` load
    (``colbert_model.py:109-114``)."""
    if isinstance(full, dict):
        out = {}
        for k, v in full.items():
            out[k] = _merge_params(v, partial[k]) if isinstance(partial, dict) and k in partial else v
        return out
    return partial if partial is not None else full
