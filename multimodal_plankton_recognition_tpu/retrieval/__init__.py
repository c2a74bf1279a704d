from .encode import encode_dataset, encode_split
from . import benchmark

__all__ = ["encode_dataset", "encode_split", "benchmark"]
