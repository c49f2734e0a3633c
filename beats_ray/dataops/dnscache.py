"""Event-time replay of the reference dns processor's TTL lookup cache.

The reference (libbeat/processors/dns/cache.go:28-103,196-224) keeps
two caches in front of the resolver: a success cache whose entries
expire at lookup_time + max(record TTL, min_ttl)
(cache.go:219 ``r.TTL = max(r.TTL, minSuccessTTL)``), and a failure
cache expiring at lookup_time + failure TTL (cache.go:117). A cached
entry is valid while ``!now.After(expires)`` (cache.go:33) — the
boundary instant still hits.

Offline there is no live resolver (this container has no network), so
the zone is a config-fed table — the RESULT of every lookup is static.
What the cache model adds, and what this op replays in EVENT TIME, is
the hit/miss/expiry sequence per query key:

- the first event for a key is a MISS that installs an entry expiring
  at ``ts + ttl`` (success or failure TTL by whether the key resolves),
- events with ``ts <= expiry`` are HITs against that entry,
- the first event with ``ts > expiry`` is a fresh MISS that
  re-installs (the resolver answers identically — static zone).

The per-key chain is inherently sequential (each miss re-anchors the
expiry), so keys co-locate via one hash-bucket shuffle (map_buckets)
and each bucket replays in a single tight loop — the same distribution
shape as the token bucket (flows.token_bucket_limit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

# unique sentinel for "no previous key yet" — None is a legitimate
# (normalized-missing) key value and must not collide with it
_NO_KEY = object()


def _normalize_resolutions(resolutions: dict, success_ttl_s: int,
                           min_ttl_s: int) -> dict:
    """→ {query: (answer, success_ttl_us)} with the reference's min-TTL
    clamp applied (cache.go:219)."""
    out = {}
    for q, spec in (resolutions or {}).items():
        if isinstance(spec, dict):
            ans = str(spec["answer"])
            ttl = int(spec.get("ttl_s", success_ttl_s))
        else:
            ans = str(spec)
            ttl = int(success_ttl_s)
        out[str(q)] = (ans, max(ttl, int(min_ttl_s)) * 1_000_000)
    return out


def dns_cache_replay(events, key: str = "query", ts_col: str = "ts",
                     order_col: str = "event_id",
                     resolutions: dict | None = None,
                     success_ttl_s: int = 300, failure_ttl_s: int = 60,
                     min_ttl_s: int = 0, buckets: int = 32,
                     skew_aware: bool = False):
    """Annotate each event with its dns resolution + cache disposition.

    ``resolutions``: {query: answer} or {query: {"answer":..,
    "ttl_s":..}} — the offline zone. Keys absent from it fail
    (status NXDOMAIN) and are cached for ``failure_ttl_s``.

    Adds columns: ``answer`` (null on failure), ``status``
    (``OK``/``NXDOMAIN``), ``cache`` (``hit``/``miss``). Row set and
    order of other columns are preserved per bucket.
    """
    from .agg import map_buckets
    from .joins import _resolve_ref

    res = _normalize_resolutions(resolutions or {}, success_ttl_s, min_ttl_s)
    fail_ttl_us = int(failure_ttl_s) * 1_000_000
    res_ref = ray.put(res)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        table = _resolve_ref(res_ref)
        g = g.sort_values([key, ts_col, order_col], kind="mergesort")
        tus = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        # normalize keys to one canonical form: (a) missing → None —
        # via object dtype, since .where on a FLOAT column keeps NaN
        # and NaN != NaN would reset the chain every row; (b) non-str →
        # str, because the zone dict's keys were str()-coerced in
        # _normalize_resolutions (an int64 query column would otherwise
        # never match its own zone entry)
        canon = g[key].astype(object).where(pd.notna(g[key]), None).map(
            lambda v: v if v is None or isinstance(v, str) else str(v)
        )
        keys = canon.to_numpy()
        hit = np.zeros(len(g), dtype=bool)
        prev: object = _NO_KEY
        expiry = np.iinfo(np.int64).min
        ttl = 0
        for i in range(len(g)):
            kk = keys[i]
            if kk != prev:
                prev = kk
                entry = table.get(kk)
                ttl = entry[1] if entry is not None else fail_ttl_us
                expiry = np.iinfo(np.int64).min
            if tus[i] <= expiry:
                hit[i] = True
            else:
                expiry = tus[i] + ttl  # fresh lookup installs an entry
        out = g.copy()
        out["answer"] = canon.map(
            lambda q: table[q][0] if q in table else None
        ).to_numpy()
        out["status"] = np.where(canon.isin(table).to_numpy(),
                                 "OK", "NXDOMAIN")
        out["cache"] = np.where(hit, "hit", "miss")
        return out

    return map_buckets(events, key, per_bucket, buckets=buckets,
                       skew_aware=skew_aware)
