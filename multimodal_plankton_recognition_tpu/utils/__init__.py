from .labels import LabelVocab
from .registry import Registry

__all__ = ["LabelVocab", "Registry"]
