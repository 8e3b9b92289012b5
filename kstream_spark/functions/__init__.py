"""Reusable Column helpers (portable hashing, shingles, vector math)."""

from kstream_spark.functions.text import (content_hash, hash_str, token_count,
                                          word_shingles, words)
from kstream_spark.functions.vectors import as_double, cosine, dot, norm

__all__ = [
    "content_hash", "hash_str", "token_count", "word_shingles", "words",
    "as_double", "cosine", "dot", "norm",
]
