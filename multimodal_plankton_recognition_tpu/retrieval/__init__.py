from .encode import encode_dataset, encode_split, predict_classifier
from . import benchmark, results

__all__ = ["encode_dataset", "encode_split", "predict_classifier",
           "benchmark", "results"]
