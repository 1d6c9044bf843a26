from .text import (
    STOPWORDS,
    fingerprint64,
    langid_heuristic,
    quality_features,
    tokens_bpeish,
    tokens_ws,
)
from .vectors import cosine_similarity_exact, dot_exact, norm_exact

__all__ = [
    "STOPWORDS",
    "fingerprint64",
    "langid_heuristic",
    "quality_features",
    "tokens_bpeish",
    "tokens_ws",
    "cosine_similarity_exact",
    "dot_exact",
    "norm_exact",
]
