"""Pytree dataclass helpers.

Every configurable object in this framework is a frozen dataclass registered
as a JAX pytree: numeric fields are traced leaves, structural fields
(dimensions, flags, callables) are static metadata. This replaces the
reference's virtual-interface + protobuf config pattern
(ref: src/core/include/corbo-core/factory.h:68) with plain typed pytrees that
pass through `jit`/`vmap`/`grad` unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    """Mark a dataclass field as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T] | None = None, *, frozen: bool = True):
    """Decorator: make `cls` a frozen dataclass registered as a JAX pytree.

    Fields declared with `static_field()` become pytree metadata; all other
    fields are leaves. Adds a `replace` method (dataclasses.replace).
    """

    def wrap(c: type[_T]) -> type[_T]:
        c = dataclasses.dataclass(frozen=frozen)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        if not hasattr(c, "replace"):
            def _replace(self, **changes):
                return dataclasses.replace(self, **changes)
            c.replace = _replace  # type: ignore[attr-defined]
        return c

    if cls is None:
        return wrap
    return wrap(cls)
