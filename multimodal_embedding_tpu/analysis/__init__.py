from .failure import (
    analyze_query_complexity,
    get_category_from_caption,
    build_query_features,
    aggregate_failure_analysis,
)

__all__ = [
    "analyze_query_complexity",
    "get_category_from_caption",
    "build_query_features",
    "aggregate_failure_analysis",
]
