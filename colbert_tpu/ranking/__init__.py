from colbert_tpu.ranking.searcher import ColbertSearcher

__all__ = ["ColbertSearcher"]
