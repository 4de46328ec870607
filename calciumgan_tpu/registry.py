"""Generic name->factory registry.

The reference keeps two copy-pasted registries
(``gan/models/registry.py:6-33``, ``gan/algorithms/registry.py:1-19``) whose
package ``__init__``s import modules that no longer exist (SURVEY.md §2.11.1).
Here a single reusable registry backs both, and registration happens at
package import with no stale side-effect imports.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def wrapper(obj: T) -> T:
            if name in self._entries:
                raise KeyError(f"duplicate {self.kind} name {name!r}")
            self._entries[name] = obj
            return obj
        return wrapper

    def get(self, name: str) -> T:
        if name not in self._entries:
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: "
                f"{sorted(self._entries)}")
        return self._entries[name]

    def names(self):
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries
