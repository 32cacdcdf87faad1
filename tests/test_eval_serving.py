import numpy as np
import pytest

from colbert_tpu.evaluation import (
    eval_retrieval,
    gen_ce_data,
    gen_iter_train_dev,
    load_tsv_corpus,
    mrr_at_k,
    recall_at_k,
)


def test_eval_retrieval_semantics():
    data = [
        {  # positive at rank 2 -> mrr contribution 1/3... rank index 2 => 1/(2+1)
            "positive_ctxs": ["good"],
            "res": [(1, 9.0, "a"), (2, 8.0, "b"), (3, 7.0, "good"), (4, 6.0, "c")],
        },
        {  # positive at rank 0 -> 1.0
            "positive_ctxs": ["x"],
            "res": [(5, 9.0, "x"), (6, 8.0, "y")],
        },
        {  # not found
            "positive_ctxs": ["zz"],
            "res": [(7, 9.0, "w"), (8, 8.0, "v")],
        },
    ]
    m = eval_retrieval(data, topk=10, recall_topk=[2, 3])
    assert m["mrr@10"] == pytest.approx((1 / 3 + 1.0 + 0.0) / 3)
    assert m["recall@2"] == pytest.approx(1 / 3)
    assert m["recall@3"] == pytest.approx(2 / 3)


def test_id_metrics():
    ranked = np.asarray([[3, 1, 2], [9, 8, 7]])
    positives = [{1}, {5}]
    assert mrr_at_k(ranked, positives, k=3) == pytest.approx(0.25)
    assert recall_at_k(ranked, positives, 2) == pytest.approx(0.5)
    assert recall_at_k(ranked, positives, 3) == pytest.approx(0.5)


def test_tsv_corpus(tmp_path):
    p = tmp_path / "part-00"
    p.write_text("1\ttitleA\tpassage A\n2\ttitleB\tpassage B\n", encoding="utf8")
    texts = load_tsv_corpus([p])
    assert texts == ["passage A", "passage B"]


def test_hard_negative_mining():
    exs = [
        {
            "question": "q",
            "positive_ctxs": ["pos"],
            "hard_negative_ctxs": [f"old{i}" for i in range(15)],
            "res": [(i, 1.0, f"new{i}") for i in range(5)] + [(9, 0.5, "pos")],
        }
    ]
    ce = gen_ce_data(exs, top=6)
    assert "pos" not in ce[0]["hard_negative_ctxs"]
    assert len(ce[0]["hard_negative_ctxs"]) == 5

    it = gen_iter_train_dev(exs, keep_old=10, top=6)
    negs = it[0]["hard_negative_ctxs"]
    assert negs[:10] == [f"old{i}" for i in range(10)]
    assert "new0" in negs and "pos" in negs  # fresh retrievals appended (incl positives, like the reference)


def test_server_client_roundtrip(setup_service):
    service, server, port = setup_service
    from colbert_tpu.serving import RetrievalClient

    client = RetrievalClient(port=port, authkey=b"test")
    res = client.retrieve(["apple fruit", "ocean wave"], topk=3, depth=32, nprobe=8)
    assert len(res) == 2
    for row in res:
        assert 1 <= len(row) <= 3
        pid, score, text = row[0]
        assert isinstance(pid, int) and isinstance(text, str)
    # error path: malformed request must return an error, not kill the server
    from multiprocessing.connection import Client as MPClient

    with MPClient(("127.0.0.1", port), authkey=b"test") as conn:
        conn.send(("not-a-valid", "request"))
        out = conn.recv()
    assert isinstance(out, dict) and "error" in out
    # still alive
    res2 = client.retrieve(["piano music"], topk=2, depth=32, nprobe=8)
    assert len(res2) == 1


@pytest.fixture(scope="module")
def setup_service(tmp_path_factory):
    """Small service on a random port, backed by the e2e fixture pieces."""
    import jax
    import jax.numpy as jnp

    from colbert_tpu.config import (
        ColbertConfig, IndexConfig, MeshConfig, ModelConfig, MultiviewConfig,
        ServeConfig, TokenizerConfig,
    )
    from colbert_tpu.indexing import CollectionEncoder, IndexBuilder
    from colbert_tpu.models import ColbertModel
    from colbert_tpu.parallel import make_mesh
    from colbert_tpu.ranking import ColbertSearcher
    from colbert_tpu.serving import RetrievalServer, RetrievalService
    from colbert_tpu.tokenization import ColbertTokenizer, build_vocab, write_vocab
    from tests.test_end_to_end import corpus_texts, TOPICS

    texts = corpus_texts(30)
    vp = write_vocab(build_vocab(texts + TOPICS, max_size=4000), tmp_path_factory.mktemp("v") / "vocab.txt")
    cfg = ColbertConfig(
        model=ModelConfig(vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
                          intermediate_size=64, max_position_embeddings=64, dim=16, dtype="float32"),
        multiview=MultiviewConfig(enabled=True, q_view=4, d_view=4),
        tokenizer=TokenizerConfig(vocab_path=vp, query_maxlen=16, doc_maxlen=32),
        index=IndexConfig(pq_m=4, partitions=8, kmeans_iters=6, pq_kmeans_iters=5, num_parts=2),
        serve=ServeConfig(nprobe=8, candidate_depth=32, topk=5, max_candidates=30, query_batch_size=4),
        mesh=MeshConfig(data=4, model=2),
    )
    tok = ColbertTokenizer(cfg.tokenizer, cfg.multiview)
    model = ColbertModel(cfg.model, cfg.multiview)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids),
                        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))["params"]
    mesh = make_mesh(4, 2)
    enc = CollectionEncoder(cfg, tok, params, mesh=mesh)
    storage = enc.encode_corpus(texts, str(tmp_path_factory.mktemp("idx")), batch_size=8)
    IndexBuilder(cfg, storage).build(chunk=256)
    searcher = ColbertSearcher(cfg, tok, params, storage, mesh=mesh)
    service = RetrievalService(searcher, texts, cfg)

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = RetrievalServer(service, host="127.0.0.1", port=port, authkey=b"test")
    server.start_background()
    import time

    time.sleep(0.3)
    yield service, server, port
    server.stop()


def test_service_evaluate(setup_service):
    """The serving stack must faithfully serve what the model+index say.

    Self-retrieval recall is NOT a property a random-init 1-layer model has
    (all doc scores tie within ~5e-4, and host-numerics differences reorder
    ties across machines — diagnosed round 3: ANN == brute-force oracle
    exactly, but the oracle itself ranks the same few degenerate docs first
    for every query).  So assert the robust properties instead:
    (1) the service agrees with the same-process searcher exactly, and
    (2) evaluate_retrieval finds the ORACLE's top docs through the full
        client-side metric path.
    """
    import numpy as np

    from colbert_tpu.serving import evaluate_retrieval
    from tests.test_end_to_end import corpus_texts

    service, server, port = setup_service
    texts = corpus_texts(30)
    queries = [texts[i] for i in (0, 3, 7)]

    # (1) service == searcher, same process: exact agreement expected
    direct = service.searcher.search(queries, topk=5)
    served = service.retrieve(queries, topk=5)
    for j in range(len(queries)):
        got_pids = [pid for pid, _, _ in served[j]]
        want = [int(p) for p in direct.pids[j] if p >= 0]
        assert got_pids == want

    # (2) metric path: positives = the brute-force oracle's top-3 texts;
    # the service's top-5 must hit at least one for every query (robust to
    # tie reordering inside the degenerate score band)
    oracle = service.searcher.search_brute_force(queries, topk=3)
    eval_data = [
        {"question": q, "positive_ctxs": [texts[int(p)] for p in oracle.pids[j]]}
        for j, q in enumerate(queries)
    ]
    metrics = evaluate_retrieval(
        lambda qs, k: service.retrieve(qs, topk=k), eval_data, topk=5, batch=2, recall_topk=[5]
    )
    assert metrics["recall@5"] == 1.0


def test_pipelined_multi_batch_matches_sync(setup_service):
    """A request spanning several batches flows through the async
    search_tokens_device pipeline (inflight=3); results must equal the
    synchronous per-batch loop exactly."""
    service, _, _ = setup_service
    from tests.test_end_to_end import corpus_texts

    texts = corpus_texts(30)
    queries = [texts[i] for i in range(9)]  # query_batch_size=4 -> 3 batches
    assert service.cfg.serve.pipeline_inflight > 1
    piped = service.retrieve(queries, topk=5)
    assert len(piped) == 9
    # synchronous reference: the same padded batches through searcher.search
    bs = service.cfg.serve.query_batch_size
    want = []
    for lo in range(0, len(queries), bs):
        chunk = queries[lo : lo + bs]
        n_real = len(chunk)
        res = service.searcher.search(chunk + [""] * (bs - n_real), topk=5)
        for i in range(n_real):
            want.append([int(p) for p in res.pids[i] if p >= 0])
    got = [[pid for pid, _, _ in row] for row in piped]
    assert got == want


def test_concurrent_connections(setup_service):
    """An idle open connection must not block other clients (the reference
    serves strictly one connection at a time, dense_server_client.py:51-65)."""
    from multiprocessing.connection import Client as MPClient

    from colbert_tpu.serving import RetrievalClient

    service, server, port = setup_service
    first = MPClient(("127.0.0.1", port), authkey=b"test")  # held open, idle
    try:
        client = RetrievalClient(port=port, authkey=b"test")
        res = client.retrieve(["apple fruit"], topk=2, depth=32, nprobe=8)
        assert len(res) == 1 and len(res[0]) >= 1
        # the held connection still works afterwards
        first.send((["ocean wave"], 2, 32, 8))
        out = first.recv()
        assert isinstance(out, list) and len(out) == 1
    finally:
        first.close()


def test_merge_and_submission():
    from colbert_tpu.evaluation.dureader import make_submission, merge_to_reader_input

    exs = [{"question": "q1", "positive_ctxs": ["a"]}]
    res = [[(3, 1.5, "a"), (7, 1.0, "b")]]
    merged = merge_to_reader_input(exs, res)
    assert merged[0]["res"][0] == (3, 1.5, "a")
    # passage2id.map.json is keyed by str(corpus index), NOT passage text
    # (reference dense_server_client.py:100)
    sub = make_submission(merged, {"3": "P003", "7": "P007"}, topk=2)
    assert sub["q1"] == ["P003", "P007"]
    # unmapped pids are skipped, not emitted as None
    sub = make_submission(merged, {"3": "P003"}, topk=2)
    assert sub["q1"] == ["P003"]


def test_config_yaml_loads():
    from colbert_tpu.config import load_config

    cfg = load_config("configs/dureader.yaml")
    assert cfg.model.hidden_size == 768
    assert cfg.multiview.q_view == 16
    assert cfg.serve.nprobe == 128
    cfg2 = load_config("configs/dureader.yaml", {"train.learning_rate": 1e-4, "index.codec": "sq"})
    assert cfg2.train.learning_rate == 1e-4
    assert cfg2.index.codec == "sq"


def test_bad_authkey_does_not_kill_server(setup_service):
    """A client with a wrong authkey must be rejected without taking the
    server down (found by live-probing the socket surface)."""
    import multiprocessing
    from multiprocessing.connection import Client as MPClient

    service, server, port = setup_service
    with pytest.raises(multiprocessing.AuthenticationError):
        with MPClient(("127.0.0.1", port), authkey=b"wrong-key") as conn:
            conn.send("x")
            conn.recv()
    import time

    time.sleep(0.2)
    from colbert_tpu.serving import RetrievalClient

    client = RetrievalClient(port=port, authkey=b"test")
    res = client.retrieve(["apple fruit"], topk=2, depth=32, nprobe=8)
    assert len(res) == 1 and len(res[0]) >= 1
    # graceful shutdown (this is the last test touching the shared server)
    client.shutdown()
