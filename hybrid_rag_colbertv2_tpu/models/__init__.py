from .colbert import ColBERTConfig, ColBERTModel, ColBERTEncoder  # noqa: F401
from .tokenizer import ColBERTTokenizer  # noqa: F401
