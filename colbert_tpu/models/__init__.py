from colbert_tpu.models.bert import BertEncoder
from colbert_tpu.models.colbert import ColbertModel
from colbert_tpu.models.ce import CrossEncoderModel
from colbert_tpu.models.sharding import param_shardings

__all__ = ["BertEncoder", "ColbertModel", "CrossEncoderModel", "param_shardings"]
