"""Command-line driver — the five-stage pipeline of the reference's
``eval.sh`` (train / index / faiss / server / evaluate + traince) as one CLI:

    python -m colbert_tpu.cli train        --config conf.yaml --train-data t.json --dev-data d.json
    python -m colbert_tpu.cli train-ce     --config conf.yaml --train-data t.json
    python -m colbert_tpu.cli encode       --config conf.yaml --corpus corpus.tsv [--checkpoint-step N]
    python -m colbert_tpu.cli build-index  --config conf.yaml
    python -m colbert_tpu.cli serve        --config conf.yaml --corpus corpus.tsv
    python -m colbert_tpu.cli evaluate     --config conf.yaml --eval-data dev.json [--remote]
    python -m colbert_tpu.cli mine         --config conf.yaml --eval-data train.json --out out.json

Overrides: repeated ``--set key=value`` with dotted keys
(e.g. ``--set train.learning_rate=1e-5``).
"""

from __future__ import annotations

import argparse
import ast
import json
from typing import Any, Dict, List, Optional

from colbert_tpu.config import ColbertConfig, load_config
from colbert_tpu.utils.io import dump_json, load_json
from colbert_tpu.utils.logging import get_logger

logger = get_logger("cli")


def _host_fingerprint() -> str:
    """Hash of the host CPU's feature flags.  XLA:CPU AOT executables cached
    on one machine can SIGILL on another (the cache key does not fully cover
    CPU features — the loader only WARNS on mismatch), so a persistent cache
    shared across hosts (e.g. a home dir that outlives the machine) must be
    keyed per-CPU."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def _setup_jax_cache() -> None:
    """Persistent XLA compile cache — first-run compiles of the big jitted
    programs (train step, k-means, fused search) are minutes on TPU."""
    import os

    import jax

    cache = os.environ.get(
        "COLBERT_TPU_JAX_CACHE",
        os.path.expanduser(f"~/.cache/colbert_tpu_jax-{_host_fingerprint()}"),
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _parse_overrides(pairs: List[str]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for p in pairs:
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def _load_cfg(args) -> ColbertConfig:
    return load_config(args.config, _parse_overrides(args.set or []))


def _tokenizer(cfg: ColbertConfig):
    from colbert_tpu.tokenization import ColbertTokenizer

    return ColbertTokenizer(cfg.tokenizer, cfg.multiview)


def _load_corpus(path: str) -> List[str]:
    if path.endswith(".json"):
        return load_json(path)
    from colbert_tpu.evaluation import load_tsv_corpus

    return load_tsv_corpus([path])


def _retriever_params(cfg: ColbertConfig, tok, checkpoint_step: Optional[int], pretrain: Optional[str]):
    """Resolve retriever params: trained checkpoint > torch pretrain > error."""
    from colbert_tpu.training import ColbertTrainer

    trainer = ColbertTrainer(cfg, tok)
    if pretrain:
        from colbert_tpu.models.convert import colbert_params_from_torch

        return colbert_params_from_torch(pretrain, cfg.model)
    return trainer.load_params_for_inference(checkpoint_step)


def cmd_train(args) -> None:
    cfg = _load_cfg(args)
    tok = _tokenizer(cfg)
    from colbert_tpu.training import ColbertTrainer, RetrievalDataset

    init_params = None
    if args.pretrain:
        from colbert_tpu.models.convert import colbert_params_from_torch

        init_params = colbert_params_from_torch(args.pretrain, cfg.model)
    trainer = ColbertTrainer(cfg, tok, init_params=init_params)
    train_ds = RetrievalDataset.from_json(args.train_data)
    dev_ds = RetrievalDataset.from_json(args.dev_data) if args.dev_data else None
    trainer.train(train_ds, dev_ds=dev_ds, resume=args.resume)


def cmd_train_ce(args) -> None:
    cfg = _load_cfg(args)
    tok = _tokenizer(cfg)
    from colbert_tpu.training import CETrainer, RetrievalDataset

    init_params = None
    if args.pretrain:
        from colbert_tpu.models.convert import ce_params_from_torch

        init_params = ce_params_from_torch(args.pretrain, cfg.ce_model)
    elif cfg.ce_train.init_from_retriever:
        # no-pretraining analogue of the reference's macbert backbone: graft
        # the trained bi-encoder's BERT into the CE (heads stay fresh)
        retr = _retriever_params(cfg, tok, None, None)
        init_params = {"bert": retr["bert"]}
        logger.info("CE warm start: bert encoder from the latest retriever checkpoint")
    trainer = CETrainer(cfg, tok, init_params=init_params)
    train_ds = RetrievalDataset.from_json(args.train_data)
    dev_ds = RetrievalDataset.from_json(args.dev_data) if args.dev_data else None
    trainer.train(train_ds, dev_ds=dev_ds, resume=args.resume)


def cmd_encode(args) -> None:
    cfg = _load_cfg(args)
    tok = _tokenizer(cfg)
    from colbert_tpu.indexing import CollectionEncoder

    params = _retriever_params(cfg, tok, args.checkpoint_step, args.pretrain)
    texts = _load_corpus(args.corpus)
    CollectionEncoder(cfg, tok, params).encode_corpus(texts, cfg.index.index_path)


def cmd_build_index(args) -> None:
    cfg = _load_cfg(args)
    from colbert_tpu.indexing import IndexBuilder, IndexStorage

    storage = IndexStorage(cfg.index.index_path)
    IndexBuilder(cfg, storage).build()


def _make_service(cfg: ColbertConfig, args):
    from colbert_tpu.indexing import IndexStorage
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.serving import RetrievalService

    tok = _tokenizer(cfg)
    params = _retriever_params(cfg, tok, args.checkpoint_step, args.pretrain)
    storage = IndexStorage(cfg.index.index_path)
    searcher = ColbertSearcher(cfg, tok, params, storage)
    return RetrievalService(searcher, _load_corpus(args.corpus), cfg)


def cmd_serve(args) -> None:
    cfg = _load_cfg(args)
    from colbert_tpu.serving import RetrievalServer

    RetrievalServer(_make_service(cfg, args)).serve_forever()


def cmd_evaluate(args) -> None:
    cfg = _load_cfg(args)
    from colbert_tpu.serving import evaluate_retrieval

    if not args.remote and not args.corpus:
        raise SystemExit(
            "evaluate: --corpus is required when running locally "
            "(pass --remote to evaluate against a running server instead)"
        )
    eval_data = load_json(args.eval_data)
    if args.remote:
        from colbert_tpu.serving import RetrievalClient

        client = RetrievalClient(cfg.serve.host, cfg.serve.port, cfg.serve.authkey.encode())
        retrieve = lambda qs, k: client.retrieve(qs, topk=k, depth=cfg.serve.candidate_depth, nprobe=cfg.serve.nprobe)
    else:
        service = _make_service(cfg, args)
        retrieve = lambda qs, k: service.retrieve(qs, topk=k)
    if args.rerank_ce:
        # two-stage: retrieve -> cross-encoder rerank of the top eval_topk
        # (reference stage 6, ce_trainer.py:97-123)
        from colbert_tpu.training import CETrainer

        tok = _tokenizer(cfg)
        ce = CETrainer(cfg, tok)
        ce_params = ce.load_params_for_inference()
        base_retrieve = retrieve

        def retrieve(qs, k):  # noqa: F811
            rows = base_retrieve(qs, max(k, cfg.ce_train.eval_topk))
            out = []
            for q, row in zip(qs, rows):
                cands = [t for _, _, t in row]
                order = ce.rerank(q, cands[: cfg.ce_train.eval_topk], params=ce_params)
                reranked = [row[i] for i in order] + row[cfg.ce_train.eval_topk :]
                out.append(reranked[:k])
            return out

    metrics = evaluate_retrieval(retrieve, eval_data, topk=args.topk)
    print(json.dumps(metrics, indent=2))
    if args.out:
        dump_json(metrics, args.out, indent=2)


def cmd_mine(args) -> None:
    """Iterative hard-negative mining (``gen_iter_colbert_train_dev`` parity).

    ``--distill-out``: also write CE distillation data from the same
    retrieval pass (the retriever's top window WITH its scores,
    :func:`gen_distill_data`) — one retrieval serves both recipes."""
    cfg = _load_cfg(args)
    from colbert_tpu.evaluation import gen_distill_data, gen_iter_train_dev

    service = _make_service(cfg, args)
    data = load_json(args.eval_data)
    res = service.retrieve([t["question"] for t in data], topk=args.topk)
    for t, r in zip(data, res):
        t["res"] = r
    dump_json(gen_iter_train_dev(data, keep_old=args.keep_old, top=args.topk), args.out)
    logger.info("wrote %s", args.out)
    if args.distill_out:
        dist = gen_distill_data(data, group=cfg.ce_train.distill_group)
        dump_json(dist, args.distill_out)
        logger.info(
            "wrote %s (%d/%d questions kept: positive inside the top-%d window)",
            args.distill_out, len(dist), len(data), cfg.ce_train.distill_group,
        )


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(prog="colbert_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, corpus=False, data=False):
        p.add_argument("--config", default=None)
        p.add_argument("--set", action="append", metavar="KEY=VALUE")
        p.add_argument("--pretrain", default=None, help="torch checkpoint to convert")
        p.add_argument("--checkpoint-step", type=int, default=None)
        # multi-host (pod-slice) launch: run one process per host with the
        # same command + a distinct --process-id.  The analogue of the
        # reference's torch.distributed.launch (eval.sh:13).
        p.add_argument("--coordinator", default=None,
                       help="multi-host coordinator address host:port (pod launch)")
        p.add_argument("--num-processes", type=int, default=None)
        p.add_argument("--process-id", type=int, default=None)
        if corpus:
            p.add_argument("--corpus", required=True)
        if data:
            p.add_argument("--eval-data", required=True)

    p = sub.add_parser("train"); common(p)
    p.add_argument("--train-data", required=True); p.add_argument("--dev-data", default=None)
    p.add_argument("--resume", action="store_true"); p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-ce"); common(p)
    p.add_argument("--train-data", required=True); p.add_argument("--dev-data", default=None)
    p.add_argument("--resume", action="store_true"); p.set_defaults(fn=cmd_train_ce)

    p = sub.add_parser("encode"); common(p, corpus=True); p.set_defaults(fn=cmd_encode)
    p = sub.add_parser("build-index"); common(p); p.set_defaults(fn=cmd_build_index)
    p = sub.add_parser("serve"); common(p, corpus=True); p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("evaluate"); common(p, corpus=False, data=True)
    p.add_argument("--corpus", default=None)
    p.add_argument("--remote", action="store_true")
    p.add_argument("--rerank-ce", action="store_true", help="apply the cross-encoder second stage")
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("mine"); common(p, corpus=True, data=True)
    p.add_argument("--out", required=True)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--keep-old", type=int, default=10)
    p.add_argument("--distill-out", default=None,
                   help="also write CE distillation data (teacher-scored windows)")
    p.set_defaults(fn=cmd_mine)

    args = ap.parse_args(argv)
    if getattr(args, "coordinator", None):
        if args.num_processes is None or args.process_id is None:
            ap.error("--coordinator requires --num-processes and --process-id")
        from colbert_tpu.parallel.mesh import init_distributed

        # must run before any backend use: registers this process's devices
        # into the global mesh (reference analogue: init_dist() NCCL setup,
        # colbert/utils/distributed.py:19-26)
        init_distributed(args.coordinator, args.num_processes, args.process_id)
    _setup_jax_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
