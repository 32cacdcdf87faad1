from colbert_tpu.tokenization.tokenizer import ColbertTokenizer, TokenBatch
from colbert_tpu.tokenization.vocab import build_vocab, train_wordpiece, write_vocab

__all__ = ["ColbertTokenizer", "TokenBatch", "build_vocab", "train_wordpiece", "write_vocab"]
