from .captions import get_all_captions
from .synthetic import synthetic_retrieval_dataset
from .coco import load_benchmark_dataset

__all__ = ["get_all_captions", "synthetic_retrieval_dataset", "load_benchmark_dataset"]
