from .scoring import dense_scores, late_interaction_scores
from .metrics import ranks_from_scores, multi_target_ranks, recall_at_k, mrr, compute_metrics
from .search import Index, search_texts

__all__ = [
    "dense_scores",
    "late_interaction_scores",
    "ranks_from_scores",
    "multi_target_ranks",
    "recall_at_k",
    "mrr",
    "compute_metrics",
    "Index",
    "search_texts",
]
