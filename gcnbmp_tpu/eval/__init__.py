"""Offline evaluation & analysis layer (reference SURVEY §2.7)."""

from gcnbmp_tpu.eval.evaluate import PairEvaluator, evaluate_dataset
from gcnbmp_tpu.eval.similarity import (
    continuous_jaccard_matrix,
    extended_jaccard_matrix,
    cosine_similarity_matrix,
)

__all__ = [
    "PairEvaluator",
    "evaluate_dataset",
    "continuous_jaccard_matrix",
    "extended_jaccard_matrix",
    "cosine_similarity_matrix",
]
