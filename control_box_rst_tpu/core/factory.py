"""String-keyed component registry.

Ref parity: corbo's singleton `Factory<Base>` + FACTORY_REGISTER_OBJECT macros
(ref: src/core/include/corbo-core/factory.h:68,95) give every pluggable
component a name → constructor registry used by the protobuf config layer.
Here the same idea is a plain dict-of-dicts keyed by category; components are
dataclass constructors, and configs are plain dicts (see core/config.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable


class Factory:
    """Global registry: category → name → constructor."""

    _registries: Dict[str, Dict[str, Callable[..., Any]]] = {}

    @classmethod
    def register(cls, category: str, name: str, ctor: Callable[..., Any]) -> None:
        cls._registries.setdefault(category, {})[name] = ctor

    @classmethod
    def create(cls, category: str, name: str, /, **kwargs: Any) -> Any:
        reg = cls._registries.get(category, {})
        if name not in reg:
            raise KeyError(
                f"unknown {category} {name!r}; registered: {sorted(reg)}"
            )
        return reg[name](**kwargs)

    @classmethod
    def names(cls, category: str) -> Iterable[str]:
        return sorted(cls._registries.get(category, {}))

    @classmethod
    def has(cls, category: str, name: str) -> bool:
        return name in cls._registries.get(category, {})


def register(category: str, name: str | None = None):
    """Decorator form: @register("system", "van_der_pol")."""

    def deco(ctor):
        Factory.register(category, name or ctor.__name__, ctor)
        return ctor

    return deco


create = Factory.create
