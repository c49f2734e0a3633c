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

import numpy as np
import pandas as pd
import pyarrow as pa

from ..fixtures import fnv1a32


def grouped_count(ds, keys: list[str], name: str = "n"):
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial count (C++ hash aggregation, no pandas hop)
        g = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        # metadata-free schema: keeps Ray's schema dedup hashable
        return g.rename_columns([*keys, name]).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum(name, alias_name=name))
    )


def grouped_sum(ds, key: str, cols, buckets: int = 32,
                small_limit: int = 200_000):
    """Exact per-key sums of already-partial rows — replaces
    ``groupby(key).aggregate(Sum(...))`` whose sort-based exchange on a
    string key is pure fixed cost (the same rewrite that took
    hll_distinct 14.8 s -> 2.4 s). Adaptive: the partials are
    materialized once (they are blocks x distinct-per-block, far
    smaller than the corpus scan that produced them); if at most
    ``small_limit`` rows they merge in one driver pandas groupby (the
    rank-select histogram-partials convention), else ONE co-locating
    bucket pass (hash exchange on a small int column, merge inside the
    bucket task). ``small_limit=0`` forces the distributed path."""
    import ray.data as rd

    cols = [cols] if isinstance(cols, str) else list(cols)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, as_index=False)[cols].sum()

    parts = ds.materialize()
    if small_limit:
        head = parts.limit(small_limit + 1).to_pandas()
        if len(head) <= small_limit:
            if not len(head):
                return parts  # empty: keep the (possibly schemaless) ds
            return rd.from_pandas(merge(head))
    return map_buckets(parts, key, merge, buckets=buckets)


def pair_counts_within(ds, key: str, ts_col: str, window_us: int,
                       buckets: int = 16):
    """Per-key count of ordered row pairs with 0 < Δt ≤ ``window_us``
    — the time-bounded THETA self-join (burst/flood detection) WITHOUT
    materializing the quadratic pair table. One co-locating bucket
    pass; inside it each key's times land on a disjoint segment of one
    int64 axis (offset remap: offset > span + window) so a single pair
    of vectorized searchsorted sweeps counts partners for every key at
    once — no per-key Python loop however many keys share the bucket.
    Equal timestamps never pair (strict lower bound). Returns a
    Dataset[(key, n_pairs)] bounded by |keys| with n_pairs > 0."""
    import numpy as np

    def bursts(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.array([], "int64"),
                "n_pairs": pd.array([], "int64")}
        if not len(df):
            return pd.DataFrame(cols)
        df = df.sort_values([key, ts_col], kind="mergesort")
        ks = df[key].to_numpy()
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        new = np.concatenate([[True], ks[1:] != ks[:-1]])
        rank = np.cumsum(new) - 1
        rel = ts - ts.min()
        off = int(rel.max()) + 2 * window_us
        assert (rank[-1] + 1) < (2 ** 62) // off, "offset remap overflow"
        adj = rel + rank * off
        hi = np.searchsorted(adj, adj + window_us, side="right")
        lo = np.searchsorted(adj, adj, side="right")
        cnt = (hi - lo).astype(np.int64)
        g = (pd.DataFrame({key: ks, "n_pairs": cnt})
             .groupby(key, as_index=False)["n_pairs"].sum())
        g = g[g["n_pairs"] > 0]
        return g.astype({key: "int64", "n_pairs": "int64"})

    return map_buckets(ds, key, bursts, buckets=buckets)


def rolling_sum_per_key(ds, key: str, order: str, value: str,
                        window: int | None, out: str = "roll",
                        buckets: int = 32):
    """Per-key ordered rolling sum over the last ``window`` rows
    (current row inclusive — the ``ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW`` frame); ``window=None`` is the expanding frame
    (``ROWS UNBOUNDED PRECEDING`` — the per-key running total). One
    co-locating bucket pass keeps every key's rows together; inside
    the bucket the frame sorts once by (key, order) and pandas' C
    rolling/cumsum kernel does the rest — no per-key Python.
    Integer-exact when ``value`` is integer."""
    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order], kind="mergesort")
        grp = g.groupby(key, sort=False)[value]
        if window is None:
            r = grp.cumsum()
        else:
            r = (grp.rolling(window, min_periods=1).sum()
                 .reset_index(drop=True))
        g = g.reset_index(drop=True)
        g[out] = r.to_numpy(np.int64)
        return g

    return map_buckets(ds, key, roll, buckets=buckets)


def hash_bucket(ds, key: str, buckets: int = 32, col: str = "_bucket"):
    """Add a stable hash-bucket column (FNV-1a of the key, hashed once
    per unique value per batch). Arrow-native so the downstream
    groupby's sort shuffle runs on Arrow blocks, not pandas object
    columns."""
    import pyarrow.compute as pc

    def add(t: pa.Table) -> pa.Table:
        # strip pandas metadata: a pa.Schema carrying metadata is
        # UNHASHABLE (dict in the hash), which breaks Ray's schema
        # deduplication in the downstream sort reduce ("Failed to hash
        # the schemas" warnings, and at scale no block-schema dedup)
        t = t.replace_schema_metadata(None)
        keys = t[key].combine_chunks()
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            # adaptive vectorized FNV (unique-dedup when keys repeat,
            # byte-position kernel either way — no Python loop)
            from ..fixtures import fnv1a32_bucket

            bucket = fnv1a32_bucket(keys, buckets)
        else:
            uniq = pc.unique(keys)
            vals = pa.array(
                [fnv1a32(str(u)) % buckets for u in uniq.to_pylist()],
                pa.int64(),
            )
            bucket = pc.take(vals, pc.index_in(keys, value_set=uniq))
        if col in t.column_names:
            return t.set_column(t.column_names.index(col), col, bucket)
        return t.append_column(col, bucket)

    return ds.map_batches(add, batch_format="pyarrow")


def top_k_by(counts, value_col: str, key_col: str, k: int):
    """Distributed deterministic top-k over a counts Dataset: per-block
    top-k combiner (the sort's input shrinks to blocks×k rows) → global
    sort (value desc, key asc tie-break) → limit. The driver only ever
    sees k rows — never the full key space."""
    import pyarrow.compute as pc

    def block_topk(t: pa.Table) -> pa.Table:
        t = t.append_column("_neg", pc.negate(t[value_col]))
        idx = pc.sort_indices(
            t, sort_keys=[("_neg", "ascending"), (key_col, "ascending")]
        )[:k]
        return t.take(idx)

    return (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .sort(["_neg", key_col])
        .limit(k)
        .drop_columns(["_neg"])
    )


def key_histogram(ds, key: str, top: int = 20):
    """Hot-key detection (the skew probe): per-batch partial counts →
    tiny groupby → DISTRIBUTED top-N (top_k_by). Use before choosing a
    partitioning strategy: keys whose volume exceeds a worker's memory
    need salting (decomposable aggs) or dedicated handling."""
    return top_k_by(grouped_count(ds, [key]), "n", key, top).to_pandas()


def map_buckets(ds, key: str, fn, buckets: int = 32, skew_aware: bool = False,
                hot_factor: float = 4.0, small_limit: int = 0):
    """Hash-partition by ``key`` and apply ``fn`` once per bucket
    (vectorized over all of the bucket's rows; the bucket column is
    stripped before fn).

    ``skew_aware=True`` adds the north-rule hot-key repartitioning: a
    cheap pre-count finds keys whose volume exceeds ``hot_factor`` ×
    the expected per-bucket share; each hot key is assigned its OWN
    bucket (beyond the hash range) so a giant conversation neither
    straggles nor overflows a shared bucket. Per-key semantics are
    preserved exactly — a key's rows stay together (salting that SPLITS
    a key is only valid for decomposable aggregations, which
    grouped_count already handles via partials).

    ``small_limit`` (opt-in, default off) adds the bounded-collect
    convention for call sites whose input is known to be cheap to
    probe (materialized, or a thin column read): at most that many
    rows collect once and ``fn`` runs driver-side on the whole frame —
    valid because the contract on ``fn`` is only that a key's rows
    arrive together, which one frame trivially satisfies."""

    from .joins import coalesce_if_fragmented

    if small_limit:
        import ray.data as rd

        head = ds.limit(small_limit + 1).to_pandas()
        if len(head) <= small_limit:
            if not len(head):
                return ds  # schemaless-empty in, same out
            out = fn(head)
            return rd.from_pandas(out)

    # a materialized input that arrives as hundreds of tiny blocks
    # (row-wise pair lists, id sets) would explode the sort shuffle
    # below into map-blocks × reduce-partitions micro-tasks; lazy
    # inputs (tuned fat read blocks) pass through untouched
    ds = coalesce_if_fragmented(ds, 4 * buckets)

    if skew_aware:
        from ray.data.aggregate import Sum

        # the pre-count is a SECOND consumption of ``ds``: materialize
        # the input once (object store, not driver) so a lazy upstream
        # parse/enrich chain doesn't execute twice
        ds = ds.materialize()
        # materialize once (object store, not driver): consumed by both
        # the total and the hot-key filter
        counts = grouped_count(ds.select_columns([key]), [key]).materialize()
        # Dataset.aggregate returns None on an empty dataset
        agg_row = counts.aggregate(Sum("n", alias_name="total"))
        total = int(agg_row["total"]) if agg_row and agg_row.get("total") is not None else 0
        threshold = hot_factor * max(1, total // buckets)
        # only the HOT keys (few by definition) reach the driver; the
        # full per-key histogram stays distributed
        hot_df = counts.map_batches(
            lambda df: df[df["n"] > threshold], batch_format="pandas"
        ).to_pandas()
        # empty datasets yield a column-less frame (Ray drops schema)
        hot = sorted(hot_df[key].tolist()) if key in hot_df.columns else []
        hot_map = {k: buckets + i for i, k in enumerate(hot)}
    else:
        hot_map = {}

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    bucketed = hash_bucket(ds, key, buckets)
    if hot_map:
        import ray

        ref = ray.put(hot_map)

        def reroute(df: pd.DataFrame) -> pd.DataFrame:
            hm = ray.get(ref)
            df = df.copy()
            mask = df[key].isin(hm)
            if mask.any():
                df.loc[mask, "_bucket"] = df.loc[mask, key].map(hm)
            return df

        bucketed = bucketed.map_batches(reroute, batch_format="pandas")
    return bucketed.groupby("_bucket").map_groups(run, batch_format="pandas")
