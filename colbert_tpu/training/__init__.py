from colbert_tpu.training.losses import biencoder_nll_loss, listnet_loss, kl_loss
from colbert_tpu.training.dataset import RetrievalDataset, RetrievalSampler
from colbert_tpu.training.trainer import ColbertTrainer
from colbert_tpu.training.ce_trainer import CETrainer

__all__ = [
    "biencoder_nll_loss",
    "listnet_loss",
    "kl_loss",
    "RetrievalDataset",
    "RetrievalSampler",
    "ColbertTrainer",
    "CETrainer",
]
