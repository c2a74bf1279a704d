from . import losses, knn

__all__ = ["losses", "knn"]
