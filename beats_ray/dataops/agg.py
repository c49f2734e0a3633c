"""Aggregation helpers that keep shuffles narrow.

``grouped_count``: the partial-aggregate (combiner) pattern — count
inside ``map_batches`` (one row per key per batch), then a tiny global
``groupby().sum()``. The shuffle moves per-batch partials, never the
full-width rows (SURVEY §2.8 per-sink counts; guide: pre-aggregate
before groupby).

``hash_bucket`` + ``map_buckets``: the explicit hash-partition pattern —
co-locate all rows of a key into one of B buckets, then run ONE
vectorized pandas function per bucket (B python calls total) instead of
``map_groups``'s one call per distinct key (millions at scale).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..fixtures import fnv1a32


def grouped_count(ds, keys: list[str], name: str = "n"):
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys).to_pandas()
        g = (
            df.groupby(keys, as_index=False, dropna=False)
            .size()
            .rename(columns={"size": name})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum(name, alias_name=name))
    )


def hash_bucket(ds, key: str, buckets: int = 32, col: str = "_bucket"):
    """Add a stable hash-bucket column (FNV-1a of the key, hashed once
    per unique value per batch). Arrow-native so the downstream
    groupby's sort shuffle runs on Arrow blocks, not pandas object
    columns."""
    import pyarrow.compute as pc

    def add(t: pa.Table) -> pa.Table:
        keys = t[key].combine_chunks()
        uniq = pc.unique(keys)
        vals = pa.array(
            [fnv1a32(str(u)) % buckets for u in uniq.to_pylist()], pa.int64()
        )
        bucket = pc.take(vals, pc.index_in(keys, value_set=uniq))
        if col in t.column_names:
            return t.set_column(t.column_names.index(col), col, bucket)
        return t.append_column(col, bucket)

    return ds.map_batches(add, batch_format="pyarrow")


def key_histogram(ds, key: str, top: int = 20):
    """Hot-key detection (the skew probe): per-batch partial counts →
    tiny groupby → top-N heaviest keys. Use before choosing a
    partitioning strategy: keys whose volume exceeds a worker's memory
    need salting (decomposable aggs) or dedicated handling."""
    counts = grouped_count(ds, [key]).to_pandas()
    return (
        counts.sort_values(["n", key], ascending=[False, True])
        .head(top)
        .reset_index(drop=True)
    )


def map_buckets(ds, key: str, fn, buckets: int = 32):
    """Hash-partition by ``key`` and apply ``fn`` once per bucket
    (vectorized over all of the bucket's rows; the bucket column is
    stripped before fn). Skew note: buckets are balanced by hash, and a
    single hot KEY is still bounded by its own volume — salt the key
    upstream when one key exceeds a worker's memory."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return (
        hash_bucket(ds, key, buckets)
        .groupby("_bucket")
        .map_groups(run, batch_format="pandas")
    )
