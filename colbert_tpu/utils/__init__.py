from colbert_tpu.utils.logging import get_logger, print_message
from colbert_tpu.utils.io import load_json, dump_json, load_jsonl, dump_jsonl

__all__ = ["get_logger", "print_message", "load_json", "dump_json", "load_jsonl", "dump_jsonl"]
