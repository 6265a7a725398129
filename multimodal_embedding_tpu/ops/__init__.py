from .preprocess import (
    PreprocessConfig,
    pil_resize_matrix,
    make_preprocess_fn,
    preprocess_batch,
)
from .maxsim import maxsim_scores, maxsim_scores_ref

__all__ = [
    "PreprocessConfig",
    "pil_resize_matrix",
    "make_preprocess_fn",
    "preprocess_batch",
    "maxsim_scores",
    "maxsim_scores_ref",
]
