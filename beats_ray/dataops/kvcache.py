"""Cache processor — put / get / delete with TTL expiry.

The reference's cache processor (libbeat/processors/cache/cache.go:26-80,
Run :128) is a stateful per-event processor: ``put`` stores
``key → value`` with a TTL, ``get`` enriches later events from the
store, ``delete`` evicts. Event order defines state.

Batch re-expression: the operation stream is replayed in EVENT TIME —
for every get, the effective state is the latest put-or-delete for that
key at or before the get's timestamp; it is a hit iff that operation is
a put whose age (``get.ts - put.ts``) is within the TTL. That is an
AS-OF join of the get rows onto the put∪delete rows (one co-locating
key shuffle, vectorized ``merge_asof`` per bucket — dataops.joins), so
the cache state never lives in one process: exactly the distribution
strategy a 100 TB replay needs.

Misses resolve to the integer sentinel ``miss_value`` (avoids the
nullable-int vs float-NaN dtype drift between engines — FIXTURES
oracle-parity note).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def cache_put_get(ops, key: str = "k", value_col: str = "v",
                  op_col: str = "op", ts_col: str = "ts",
                  ttl_s: int | None = None, miss_value: int = -1,
                  buckets: int = 32, value_kind: str = "int"):
    """Replay a put/get/delete operation stream; returns one row per
    GET with the resolved ``cached`` value (or ``miss_value``) and a
    ``hit`` flag.

    ``ops`` columns: ``key``, ``ts_col``, ``op_col`` ('put'|'get'|
    'delete'), ``value_col`` (meaningful on puts). ``ttl_s=None`` means
    no expiry (reference: ttl 0 = keep forever). ``value_kind``:
    'int' (miss → integer sentinel, oracle-stable dtype) or 'str'
    (arbitrary values, miss → str(miss_value))."""
    if value_kind not in ("int", "str"):
        raise ValueError(f"value_kind must be 'int' or 'str', got {value_kind!r}")
    import pyarrow.compute as pc

    def pick_gets(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t[op_col], "get")).select([key, ts_col])

    def pick_state(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t[op_col], value_set=pa.array(["put", "delete"]))
        )
        # carry the state op's own timestamp as a VALUE column (epoch
        # seconds) — merge_asof keeps only the left's `on` column, and
        # the TTL check needs the put's time
        sec = pc.cast(
            pc.cast(t[ts_col].combine_chunks(), pa.timestamp("s"), safe=False),
            pa.int64(),
        )
        val = t[value_col].combine_chunks()
        if value_kind == "str" and not pa.types.is_string(val.type):
            # cast BEFORE the join: typed-null padding would promote an
            # int64 value column to float64 in the per-bucket pandas
            # frames and a cached 7 would resolve as "7.0" (Arrow's
            # int->string cast renders "7"). String-kind equal-ts ties
            # then break lexicographically — documented behaviour.
            val = pc.cast(val, pa.string())
        return pa.table(
            {
                key: t[key],
                ts_col: t[ts_col],
                "_state_op": t[op_col],
                "_state_v": val,
                "_state_ts_s": sec,
            }
        )

    # gets and state are TWO consumptions of ``ops``: materialize once
    # (object store, not driver) so a lazy upstream parse/enrich chain
    # doesn't execute twice (same rule as map_buckets' skew pre-count)
    ops = ops.materialize()
    gets = ops.map_batches(pick_gets, batch_format="pyarrow")
    state = ops.map_batches(pick_state, batch_format="pyarrow")

    from .joins import asof_join

    # deterministic equal-timestamp winner: largest (op, value) tuple —
    # 'put' > 'delete' lexicographically, then max value (mirrored in
    # the SQL oracle's QUALIFY row_number() tie-break)
    joined = asof_join(gets, state, key=key, ts_col=ts_col, buckets=buckets,
                       tie_cols=["_state_op", "_state_v"])

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        hit = df["_state_op"].eq("put").fillna(False)
        if ttl_s is not None:
            get_s = df[ts_col].astype("datetime64[s]").astype("int64")
            put_s = pd.to_numeric(df["_state_ts_s"], errors="coerce")
            age_ok = (get_s - put_s) <= ttl_s
            hit &= age_ok.fillna(False)
        k = df[key]
        if pd.api.types.is_numeric_dtype(k):
            # restore the int dtype the join's NaN padding promoted.
            # UNIFORMLY nullable Int64: a NULL get key (kept alive
            # through the shuffle by design, joins._bucket_of) must
            # stay null, and emitting int64 from null-free buckets but
            # Int64 from the one with nulls would give the result
            # Dataset mixed block schemas (trips schema-sensitive sinks
            # and Ray's block-schema dedup). Arrow-level consumers see
            # plain int64 either way.
            key_out = k.astype("Int64")
        else:
            key_out = k
        if value_kind == "int":
            cached = (
                pd.to_numeric(df["_state_v"].where(hit), errors="coerce")
                .fillna(miss_value)
                .astype("int64")
            )
        else:
            cached = (
                df["_state_v"].astype(object)
                .where(hit, str(miss_value))
                .astype(str)
            )
        return pd.DataFrame(
            {
                key: key_out,
                ts_col: df[ts_col],
                "cached": cached,
                "hit": hit.astype(bool),
            }
        )

    return joined.map_batches(resolve, batch_format="pandas")
