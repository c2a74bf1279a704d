from .encode import encode_dataset, encode_split, predict_classifier
from . import benchmark, results
from .export import export_checkpoint, load_artifact

__all__ = ["encode_dataset", "encode_split", "predict_classifier",
           "benchmark", "results", "export_checkpoint", "load_artifact"]
