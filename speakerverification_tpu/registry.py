"""Explicit plugin registries.

The reference resolves models/losses/optimizers by dynamic ``importlib``
import of same-named files (reference: src/model.py:70-73, :82-88,
:178-183). That pattern is replaced with explicit registries keyed by the
same YAML names, so reference configs remain valid while imports stay
static and compile-time checkable (SURVEY.md §7 hard part (f)).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

__all__ = ["Registry", "MODELS", "LOSSES", "OPTIMIZERS", "SCHEDULERS"]


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str | None = None, aliases: tuple[str, ...] = ()):
        def deco(obj: Callable) -> Callable:
            key = name or obj.__name__
            for k in (key, *aliases):
                if k in self._entries:
                    raise KeyError(f"{self.kind} {k!r} already registered")
                self._entries[k] = obj
            return obj
        return deco

    def get(self, name: str) -> Any:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {known}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> list[str]:
        return sorted(self._entries)


MODELS = Registry("model")
LOSSES = Registry("loss")
OPTIMIZERS = Registry("optimizer")
SCHEDULERS = Registry("scheduler")
