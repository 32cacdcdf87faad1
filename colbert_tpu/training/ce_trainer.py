"""Cross-encoder reranker trainer + reranking inference.

Parity with the reference CE flow (``colbert/modeling/ce_model.py:56-101``,
``colbert/training/ce_trainer.py:21-123``):

* train: per question, 1 random positive + ``neg_num`` negatives sampled
  without replacement from ``hard_negative_ctxs[5:50]``; NLL over the
  per-question score row at column 0, temperature 1.
* dev: first positive + ``2*neg_num`` leading negatives; metric = true MRR.
* test/rerank: score the top ``eval_topk`` retrieval results per question
  and re-sort (``ce_trainer.py:97-123``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColbertConfig
from colbert_tpu.models import CrossEncoderModel
from colbert_tpu.models.sharding import param_shardings
from colbert_tpu.parallel.mesh import batch_sharding, make_mesh, put_global
from colbert_tpu.tokenization import ColbertTokenizer
from colbert_tpu.training.checkpoint import CheckpointManager
from colbert_tpu.training.dataset import RetrievalDataset
from colbert_tpu.training.losses import biencoder_nll_loss
from colbert_tpu.training.train_state import TrainState, make_train_state
from colbert_tpu.utils.logging import get_logger

logger = get_logger("ce_trainer")


class CETrainer:
    def __init__(
        self,
        cfg: ColbertConfig,
        tokenizer: ColbertTokenizer,
        mesh=None,
        init_params: Optional[Any] = None,
    ):
        self.cfg = cfg
        self.tok = tokenizer
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.model = CrossEncoderModel(cfg.ce_model)
        self.rng = jax.random.key(cfg.ce_train.seed, impl={"threefry": "threefry2x32"}.get(cfg.ce_train.rng_impl, cfg.ce_train.rng_impl))
        self.np_rng = np.random.default_rng(cfg.ce_train.seed)
        self._init_params = init_params
        self.state: Optional[TrainState] = None
        self.ckpt = CheckpointManager(cfg.ce_train.checkpoint_dir, keep=cfg.ce_train.keep_checkpoints)
        self._compiled: Dict[str, Any] = {}
        self.log: List[Dict[str, Any]] = []

    def _init_state(self, total_steps: int) -> None:
        if self.state is not None:
            return
        L = self.cfg.tokenizer.ce_maxlen
        dummy = jnp.zeros((2, L), jnp.int32)
        params = self._init_params or self.model.init(self.rng, dummy, jnp.ones_like(dummy))["params"]
        if self._init_params is not None:
            full = self.model.init(self.rng, dummy, jnp.ones_like(dummy))["params"]
            from colbert_tpu.training.trainer import _merge_params

            params = _merge_params(full, params)
        params = jax.tree.map(put_global, params, param_shardings(params, self.mesh))
        # reuse TrainConfig-shaped fields from CETrainConfig
        from colbert_tpu.config import TrainConfig

        tc = TrainConfig(
            learning_rate=self.cfg.ce_train.learning_rate,
            weight_decay=self.cfg.ce_train.weight_decay,
            max_grad_norm=self.cfg.ce_train.max_grad_norm,
        )
        self.state = make_train_state(self.model.apply, params, tc, total_steps)

    # ---- pair building (host) ----

    def _build_pairs(
        self, examples: Sequence[Dict[str, Any]], mode: str
    ) -> Tuple[np.ndarray, np.ndarray, int, Optional[np.ndarray]]:
        c = self.cfg.ce_train
        pairs: List[Tuple[str, str]] = []
        teacher: List[List[float]] = []
        group = 0
        for ex in examples:
            q = ex["question"]
            if mode == "distill":
                # bi-encoder distillation window (gen_distill_data): the
                # retriever's top candidates WITH teacher scores, positive
                # at column 0 — KL target + NLL anchor share one layout
                win = [(float(s), x) for s, x in ex["res_scored"][: c.distill_group]]
                if not win:
                    raise ValueError(
                        f"CE distill example has empty res_scored: "
                        f"question={ex['question']!r} (produce data with "
                        f"gen_distill_data / mine --distill-out)"
                    )
                while len(win) < c.distill_group:
                    # pad with a huge-negative teacher score so the teacher
                    # softmax puts ~0 mass on the duplicated slot (a real-score
                    # duplicate would double its KL weight)
                    win.append((-1e4, win[-1][1]))
                pairs += [(q, x) for _, x in win]
                teacher.append([s for s, _ in win])
                group = c.distill_group
                continue
            if mode == "test":
                cands = ex["retrieval_res"][: c.eval_topk]
                pairs += [(q, p) for p in cands]
                group = c.eval_topk
                continue
            negs = list(ex["hard_negative_ctxs"])
            if not negs:
                # the reference asserts len >= 18 (ce_model.py:60); fail with
                # the offending question instead of an IndexError on negs[-1]
                raise ValueError(
                    f"CE {mode} example has no hard_negative_ctxs: "
                    f"question={ex['question']!r}"
                )
            neg_num = c.neg_num * 2 if mode == "dev" else c.neg_num
            while len(negs) < max(neg_num, c.neg_pool_hi if mode == "train" else neg_num):
                negs.append(negs[-1])
            if mode == "train":
                pos = ex["positive_ctxs"][self.np_rng.integers(len(ex["positive_ctxs"]))]
                pool = negs[c.neg_pool_lo : c.neg_pool_hi]
                idx = self.np_rng.choice(len(pool), size=neg_num, replace=False)
                chosen = [pool[i] for i in idx]
            else:
                pos = ex["positive_ctxs"][0]
                chosen = negs[:neg_num]
            pairs += [(q, pos)] + [(q, n) for n in chosen]
            group = 1 + neg_num
        enc = self.tok.encode_ce_pairs(pairs)
        t = np.asarray(teacher, np.float32) if teacher else None
        return enc.input_ids, enc.attention_mask, group, t

    # ---- jitted steps ----

    def _train_step_fn(self):
        c = self.cfg.ce_train
        model, T = self.model, c.score_temperature
        accum = max(1, c.grad_accum_steps)
        w, Td = c.distill_weight, c.distill_temperature

        def loss_for(params, rng, ids, attn, group, teacher):
            logits = model.apply(
                {"params": params}, ids, attn, deterministic=False, rngs={"dropout": rng}
            )
            scores = logits.reshape(-1, group) / T
            labels = jnp.zeros((scores.shape[0],), jnp.int32)
            nll = biencoder_nll_loss(scores, labels)
            if w <= 0:
                return nll
            # bi-encoder distillation (ColBERTv2-style): KL from the
            # teacher's softmax over the same window, NLL anchor at col 0
            from colbert_tpu.training.losses import kl_loss

            return (1.0 - w) * nll + w * kl_loss(scores, teacher / Td)

        def step(state: TrainState, rng, ids, attn, group, teacher):
            if accum == 1:
                loss, grads = jax.value_and_grad(loss_for)(
                    state.params, rng, ids, attn, group, teacher
                )
                return state.apply_gradients(grads=grads), loss

            # CE loss is a per-question softmax over its own (1+neg) row, so
            # question-aligned micro-batching is loss-preserving (unlike the
            # retriever's in-batch negatives)
            micro = lambda a: a.reshape(accum, a.shape[0] // accum, *a.shape[1:])

            def body(carry, inp):
                gacc, lacc, i = carry
                mids, mattn, mt = inp
                loss, grads = jax.value_and_grad(loss_for)(
                    state.params, jax.random.fold_in(rng, 100 + i), mids, mattn, group, mt
                )
                return (jax.tree.map(jnp.add, gacc, grads), lacc + loss, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, lsum, _), _ = jax.lax.scan(
                body, (zeros, 0.0, 0), (micro(ids), micro(attn), micro(teacher))
            )
            grads = jax.tree.map(lambda g: g / accum, gsum)
            return state.apply_gradients(grads=grads), lsum / accum

        return jax.jit(step, static_argnames=("group",), donate_argnums=(0,))

    def _score_fn(self):
        model = self.model

        def score(params, ids, attn):
            return model.apply({"params": params}, ids, attn)

        return jax.jit(score)

    # ---- public API ----

    def train(
        self,
        train_ds: RetrievalDataset,
        dev_ds: Optional[RetrievalDataset] = None,
        num_epochs: Optional[int] = None,
        resume: bool = False,
    ):
        """Training loop at retriever-trainer parity: half-epoch eval+save
        cadence, bit-reproducible resume (params + optimizer + deterministic
        dataloader fast-forward), NaN guard, persisted JSONL metrics — the
        reference runs CE through the same vendored-Trainer machinery
        (``ce_trainer.py:21-40``, ``mytrainer_callbacks.py:31-35``)."""
        c = self.cfg.ce_train
        epochs = num_epochs if num_epochs is not None else c.num_epochs
        global_bs = c.per_device_batch_size * self.mesh.shape["data"]
        steps_per_epoch = max(1, len(train_ds) // global_bs)
        self._init_state(steps_per_epoch * epochs)

        start_step = 0
        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                target = {"params": self.state.params, "opt_state": self.state.opt_state, "step": 0}
                restored = self.ckpt.restore(latest, target)
                from jax.sharding import NamedSharding

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
                logger.info("CE resumed from step %d", latest)

        train_step = self._compiled.setdefault("train", self._train_step_fn())
        eval_every = max(1, steps_per_epoch // max(1, c.evals_per_epoch))
        bs2 = batch_sharding(self.mesh, 2)
        start_epoch = start_step // max(1, steps_per_epoch)
        gstep = start_epoch * steps_per_epoch
        logs = []
        # per-step RNG is derived from (seed, gstep): identical resampling on
        # resume.  The np_rng draws must also be replayed deterministically,
        # so pair sampling uses a fresh per-step generator.
        for epoch in range(start_epoch, epochs):
            order = np.random.default_rng(c.seed + epoch).permutation(len(train_ds))
            for s in range(steps_per_epoch):
                idxs = order[s * global_bs : (s + 1) * global_bs]
                if len(idxs) < global_bs:
                    break
                if gstep < start_step:
                    gstep += 1
                    continue
                self.np_rng = np.random.default_rng((c.seed, gstep))
                mode = "distill" if c.distill_weight > 0 else "train"
                ids, attn, group, teacher = self._build_pairs(
                    [train_ds[i] for i in idxs], mode
                )
                if teacher is None:
                    teacher = np.zeros((ids.shape[0] // group, group), np.float32)
                rng = jax.random.fold_in(self.rng, gstep)
                self.state, loss = train_step(
                    self.state, rng, put_global(ids, bs2), put_global(attn, bs2),
                    group, put_global(teacher, bs2),
                )
                gstep += 1
                loss_f = float(loss)
                if not np.isfinite(loss_f):
                    raise FloatingPointError(
                        f"non-finite CE loss {loss_f} at step {gstep} (epoch {epoch})"
                    )
                logs.append(loss_f)
                if gstep % c.log_every == 0 or gstep == 1:
                    logger.info("ce step %d loss=%.4f", gstep, float(np.mean(logs[-c.log_every:])))
                if gstep % eval_every == 0:
                    metrics = {"dev_mrr": self.evaluate(dev_ds)} if dev_ds is not None else {}
                    if metrics:
                        logger.info("ce step %d %s", gstep, metrics)
                    self.log.append({"step": gstep, "loss": loss_f, **metrics})
                    self.save(gstep, metrics)
        if gstep > start_step and self.ckpt.latest_step() != gstep:
            # final save: short runs (or tiny distill sets) can end between
            # eval-cadence saves and would otherwise leave no checkpoint for
            # the rerank stage
            self.save(gstep, {})
        self._dump_log()
        return logs

    def save(self, step: int, metrics: Optional[Dict[str, float]] = None) -> str:
        return self.ckpt.save(
            step,
            {"params": self.state.params, "opt_state": self.state.opt_state, "step": step},
            metadata={"metrics": metrics or {}, "config": self.cfg.to_dict()},
        )

    def load_params_for_inference(self, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.ckpt.latest_step()
        if step is None:
            raise FileNotFoundError(f"no CE checkpoints under {self.ckpt.dir}")
        self._init_state(total_steps=1)
        restored = self.ckpt.restore(
            step, {"params": self.state.params, "opt_state": self.state.opt_state, "step": 0}
        )
        return restored["params"]

    def _dump_log(self) -> None:
        from colbert_tpu.utils.io import dump_jsonl

        dump_jsonl(self.log, self.ckpt.dir / "ce_train_log.jsonl")

    def evaluate(self, dev_ds: RetrievalDataset) -> float:
        score_fn = self._compiled.setdefault("score", self._score_fn())
        rrs = []
        bs = max(1, self.cfg.ce_train.per_device_batch_size * self.mesh.shape["data"])
        for s in range(0, len(dev_ds), bs):
            exs = [dev_ds[i] for i in range(s, min(len(dev_ds), s + bs))]
            ids, attn, group, _ = self._build_pairs(exs, "dev")
            logits = np.asarray(score_fn(self.state.params, jnp.asarray(ids), jnp.asarray(attn)))
            scores = logits.reshape(len(exs), group)
            ranks = (np.argsort(-scores, axis=1) == 0).argmax(axis=1)
            rrs += list(1.0 / (ranks + 1.0))
        return float(np.mean(rrs))

    def rerank(self, question: str, candidates: Sequence[str], params: Optional[Any] = None, batch: int = 128) -> List[int]:
        """Return candidate indices re-sorted by CE score (descending)."""
        if params is None:
            params = self.state.params
        score_fn = self._compiled.setdefault("score", self._score_fn())
        scores = []
        for s in range(0, len(candidates), batch):
            chunk = candidates[s : s + batch]
            enc = self.tok.encode_ce_pairs([(question, p) for p in chunk])
            pad = batch - len(chunk)
            ids = np.pad(enc.input_ids, ((0, pad), (0, 0)))
            attn = np.pad(enc.attention_mask, ((0, pad), (0, 0)))
            out = np.asarray(score_fn(params, jnp.asarray(ids), jnp.asarray(attn)))[: len(chunk)]
            scores.append(out)
        scores = np.concatenate(scores)
        return list(np.argsort(-scores))
