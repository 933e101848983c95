"""Minimal pytree dataclass helper.

The engine represents the model and simulation state as frozen dataclasses
registered as JAX pytrees.  Array-valued fields are pytree leaves; fields
declared with ``static_field()`` are part of the treedef (hashable aux data),
which makes a ``Model`` usable as an argument to ``jax.jit`` with structural
metadata (sizes, index tables) baked into the compiled program.

TPU-native analog of the reference's plain Rust structs
(/root/reference/src/physics.rs:6-9) re-expressed as functional pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")

_STATIC_MARK = "__oct_static__"


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field stored in the pytree treedef (must be hashable)."""
    metadata = dict(kwargs.pop("metadata", ()) or {})
    metadata[_STATIC_MARK] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree node."""
    cls = dataclasses.dataclass(frozen=True)(cls)

    leaf_names = []
    static_names = []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC_MARK, False):
            static_names.append(f.name)
        else:
            leaf_names.append(f.name)

    def flatten_with_keys(obj):
        leaves = [(jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in leaf_names]
        static = tuple(getattr(obj, n) for n in static_names)
        return leaves, static

    def flatten(obj):
        return [getattr(obj, n) for n in leaf_names], tuple(
            getattr(obj, n) for n in static_names
        )

    def unflatten(static, leaves):
        kwargs = dict(zip(leaf_names, leaves))
        kwargs.update(zip(static_names, static))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(
        cls, flatten_with_keys, unflatten, flatten
    )

    def replace(self: _T, **updates: Any) -> _T:
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
