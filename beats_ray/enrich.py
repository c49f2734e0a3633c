"""Actor-pool enrichment stages — the broadcast small-side-join archetype.

Models the reference's stateful lookup processors (cache/cache.go:128,
dns/dns.go:80, translate_sid, add_docker/kubernetes/process_metadata —
SURVEY §2.3): a small keyed table held in worker memory, probed per
event. Here: the table is ``ray.put`` ONCE on the driver; each actor
resolves the ref in ``__init__`` (once per actor, NOT per batch) and
probes it vectorized with ``pc.index_in`` + ``pc.take`` per batch.

Usage::

    refs = broadcast_lookups()
    ds = ds.map_batches(LookupEnricher, fn_constructor_kwargs=refs,
                        batch_format="pyarrow", concurrency=(1, 8))
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from .fixtures import role_lookup_table, tool_lookup_table


def broadcast_lookups() -> dict:
    """ray.put the lookup tables once; returns constructor kwargs."""
    return {
        "tool_ref": ray.put(tool_lookup_table()),
        "role_ref": ray.put(role_lookup_table()),
    }


def _resolve(obj):
    return ray.get(obj) if isinstance(obj, ray.ObjectRef) else obj


def join_lookup(
    t: pa.Table,
    key_col: str,
    lookup: pa.Table,
    lookup_key: str,
    value_cols: list[str],
    prefix: str = "",
) -> pa.Table:
    """Vectorized broadcast hash-join of one small lookup table:
    index_in(keys, lookup_keys) → take(values). Null where no match
    (left join semantics)."""
    keys = t[key_col].combine_chunks() if key_col in t.column_names else None
    if keys is None:
        return t
    idx = pc.index_in(keys, value_set=lookup[lookup_key].combine_chunks())
    for vc_name in value_cols:
        vals = pc.take(lookup[vc_name].combine_chunks(), idx)
        name = f"{prefix}{vc_name}"
        if name in t.column_names:
            t = t.set_column(t.column_names.index(name), name, vals)
        else:
            t = t.append_column(name, vals)
    return t


class LookupEnricher:
    """Actor-pool stage: tool → {tool_category, risk_level}, role →
    {role_tag}. Setup once per actor in __init__ (reference pattern:
    session pool, script/javascript/javascript.go:188-201; watcher index,
    add_kubernetes_metadata)."""

    def __init__(self, tool_ref=None, role_ref=None):
        self.tool = _resolve(tool_ref) if tool_ref is not None else tool_lookup_table()
        self.role = _resolve(role_ref) if role_ref is not None else role_lookup_table()

    def __call__(self, t: pa.Table) -> pa.Table:
        t = join_lookup(t, "tool", self.tool, "tool", ["tool_category", "risk_level"])
        t = join_lookup(t, "role", self.role, "role", ["role_tag"])
        return t


# Task-based enrich: for SMALL lookup tables the actor pool's benefit
# (amortized setup) is outweighed by its cost (breaks operator fusion →
# an extra object-store hop for every block). A module-level cache gives
# the same load-once-per-worker-process semantics with plain tasks, so
# read→parse→enrich→route→write fuses into ONE operator. Use the actor
# pool when setup is genuinely heavy (models, remote indexes, caches
# with TTL — the dns/cache/translate_* class of processors).
# CAPPED LRU (shared with joins._resolve_ref's cache discipline): the
# worker process outlives the stage, so an uncapped dict keyed by ref
# identity would accumulate one resolved lookup pair per pipeline run
# for the worker's lifetime.
from collections import OrderedDict

_WORKER_CACHE: "OrderedDict" = OrderedDict()
_WORKER_CACHE_MAX = 8


def enrich_batch(t: pa.Table, tool_ref=None, role_ref=None) -> pa.Table:
    # cache key includes the ref identities: two pipelines sharing
    # worker processes with DIFFERENT broadcast tables must not see
    # each other's lookups
    key = ("lookups", str(tool_ref), str(role_ref))
    if key in _WORKER_CACHE:
        _WORKER_CACHE.move_to_end(key)
    else:
        while len(_WORKER_CACHE) >= _WORKER_CACHE_MAX:
            _WORKER_CACHE.popitem(last=False)
        _WORKER_CACHE[key] = (
            _resolve(tool_ref) if tool_ref is not None else tool_lookup_table(),
            _resolve(role_ref) if role_ref is not None else role_lookup_table(),
        )
    tool, role = _WORKER_CACHE[key]
    t = join_lookup(t, "tool", tool, "tool", ["tool_category", "risk_level"])
    t = join_lookup(t, "role", role, "role", ["role_tag"])
    return t
