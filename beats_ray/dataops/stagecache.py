"""Task-based stateful stages with a per-worker-process instance cache.

An actor pool (``map_batches(Cls, concurrency=...)``) is the right
shape for HEAVY per-actor state (models, big indexes) — but it costs
~1-1.5 s of pool spin-up per stage, which dominates short pipelines.
For LIGHT state (compiled regexes, small coefficient arrays, broadcast
refs) the better shape is a PLAIN TASK whose callable instantiates the
class once per worker process and reuses it across batches: fusable
with neighbors, no spin-up, same amortization.

``task_stage(Cls, **ctor_kwargs)`` returns a function suitable for
``ds.map_batches(fn)``. Constructor kwargs must be hashable (Ray
ObjectRefs are — broadcast state rides through unchanged).
"""

from __future__ import annotations

from collections import OrderedDict

_CACHE: OrderedDict = OrderedDict()
_CACHE_MAX = 32


def _instance(cls, ctor_items: tuple):
    key = (cls.__module__, cls.__qualname__, ctor_items)
    inst = _CACHE.get(key)
    if inst is None:
        while len(_CACHE) >= _CACHE_MAX:
            _CACHE.popitem(last=False)
        inst = cls(**dict(ctor_items))
        _CACHE[key] = inst
    else:
        _CACHE.move_to_end(key)
    return inst


def task_stage(cls, **ctor_kwargs):
    """A plain map_batches function wrapping ``cls(**ctor_kwargs)``,
    constructed once per worker process."""
    items = tuple(sorted(ctor_kwargs.items()))

    def run(batch):
        return _instance(cls, items)(batch)

    run.__name__ = f"task_{cls.__name__}"
    return run
