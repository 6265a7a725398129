from .bootstrap import bootstrap_benchmark, BootstrapOutput
from .ci import bootstrap_confidence_interval, permutation_test

__all__ = [
    "bootstrap_benchmark",
    "BootstrapOutput",
    "bootstrap_confidence_interval",
    "permutation_test",
]
