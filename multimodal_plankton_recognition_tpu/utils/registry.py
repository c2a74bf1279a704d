"""Minimal name -> constructor registry used for image backbones and
profile encoders (replaces the reference's dependence on ``timm.create_model``
string dispatch, reference: src/image_encoder.py:16)."""

from __future__ import annotations

from typing import Callable, Dict, Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str) -> None:
        self.kind = kind
        self._entries: Dict[str, Callable[..., T]] = {}

    def register(self, *names: str) -> Callable[[Callable[..., T]], Callable[..., T]]:
        def deco(fn: Callable[..., T]) -> Callable[..., T]:
            for name in names:
                if name in self._entries:
                    raise KeyError(f"{self.kind} {name!r} already registered")
                self._entries[name] = fn
            return fn

        return deco

    def create(self, name: str, /, **kwargs) -> T:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} {name!r}. Available: {sorted(self._entries)}"
            )
        return self._entries[name](**kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> list[str]:
        return sorted(self._entries)
