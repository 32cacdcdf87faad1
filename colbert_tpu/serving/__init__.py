from colbert_tpu.serving.server import RetrievalService, RetrievalServer, RetrievalClient, evaluate_retrieval

__all__ = ["RetrievalService", "RetrievalServer", "RetrievalClient", "evaluate_retrieval"]
