"""User-extension registry for reusable batch functions.

Models the reference's plugin registry surface (processors/registry.go
RegisterPlugin + Go plugin loading, plugin.go; the JS ``script``
processor's Register test hooks): users register named
``pa.Table → pa.Table`` functions once and reference them from pipeline
configs via the ``function`` processor.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

_FUNCTIONS: dict[str, Callable[[pa.Table], pa.Table]] = {}


def batch_function(name: str):
    """Decorator: register a named batch function."""

    def deco(fn: Callable[[pa.Table], pa.Table]):
        _FUNCTIONS[name] = fn
        return fn

    return deco


def get_batch_function(name: str) -> Callable[[pa.Table], pa.Table]:
    if name not in _FUNCTIONS:
        raise KeyError(
            f"unknown batch function {name!r}; registered: {sorted(_FUNCTIONS)}"
        )
    return _FUNCTIONS[name]


def list_batch_functions() -> list[str]:
    return sorted(_FUNCTIONS)


# the `function` processor: call a registered batch function from config
from ..processors.base import register  # noqa: E402


@register("function")
def function_processor(cfg: dict):
    fn = get_batch_function(cfg["name"])
    fn.name = f"function:{cfg['name']}"  # type: ignore[attr-defined]
    return fn
