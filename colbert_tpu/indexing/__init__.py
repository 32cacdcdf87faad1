from colbert_tpu.indexing.storage import IndexStorage
from colbert_tpu.indexing.encoder import CollectionEncoder
from colbert_tpu.indexing.builder import IndexBuilder
from colbert_tpu.indexing.flat import FlatIndex

__all__ = ["IndexStorage", "CollectionEncoder", "IndexBuilder", "FlatIndex"]
