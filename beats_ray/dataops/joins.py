"""Join strategies (guide: "Joins and lookups").

- ``broadcast_join``: small side ``ray.put`` once, probed per batch with
  a pandas merge — no shuffle. The add_*_metadata / cache / translate_*
  archetype generalized to arbitrary tables.
- ``bucket_hash_join``: both sides large — add ``bucket = hash(key)%B``
  to each side, co-locate per bucket (one shuffle each), merge matching
  buckets pairwise. The explicit partitioned hash join; B is the
  parallelism knob, hot keys can be salted upstream.
- ``semi_join`` / ``anti_join``: broadcast the key set, filter inside
  ``map_batches``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray

from ..fixtures import fnv1a32


def broadcast_join(big, small_df: pd.DataFrame, on: str | list[str],
                   how: str = "inner"):
    """Join a Dataset with a driver-side small DataFrame (broadcast)."""
    keys = [on] if isinstance(on, str) else list(on)
    ref = ray.put(small_df)

    class Probe:
        def __init__(self, ref):
            self.small = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=keys, how=how)

    return big.map_batches(
        Probe, fn_constructor_kwargs={"ref": ref}, batch_format="pandas",
        concurrency=(1, 4),
    )


def _with_bucket(ds, key: str, buckets: int, side: str):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if df[key].dtype == object:
            lut = {u: fnv1a32(str(u)) % buckets for u in df[key].unique()}
            df["_jb"] = df[key].map(lut).astype("int64")
        else:
            df["_jb"] = (df[key].astype("int64") % buckets).astype("int64")
        df["_side"] = side
        return df

    return ds.map_batches(add, batch_format="pandas")


def bucket_hash_join(left, right, left_on: str, right_on: str,
                     buckets: int = 32, how: str = "inner"):
    """Partitioned hash join of two Datasets: union the bucket-tagged
    sides, group by bucket (ONE co-locating shuffle total), and merge
    within each bucket. Column-name collisions get pandas suffixes."""
    l_tag = _with_bucket(left, left_on, buckets, "l")
    r_tag = _with_bucket(right, right_on, buckets, "r")
    both = l_tag.union(r_tag)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"].drop(columns=["_side", "_jb"]).dropna(axis=1, how="all")
        rg = g[g["_side"] == "r"].drop(columns=["_side", "_jb"]).dropna(axis=1, how="all")
        if lg.empty or rg.empty:
            if how == "inner":
                return pd.DataFrame()
            lg2 = lg.dropna(axis=0, how="all")
            return lg2 if how == "left" else pd.DataFrame()
        out = lg.merge(rg, left_on=left_on, right_on=right_on, how=how,
                       suffixes=("", "_r"))
        return out

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def asof_join(left, right, key: str, ts_col: str = "ts", buckets: int = 32,
              suffix: str = "_r"):
    """As-of (backward) join: each left row matches the latest right row
    with ``right.ts <= left.ts`` within the same ``key`` (guide: sort
    both sides by (key, ts) within buckets + ``pd.merge_asof`` per
    bucket). One co-locating shuffle on the key; per-bucket work is a
    single vectorized merge_asof. Equal timestamps match
    (allow_exact_matches, = DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``)."""
    l_tag = _with_bucket(left, key, buckets, "l")
    r_tag = _with_bucket(right, key, buckets, "r")
    both = l_tag.union(r_tag)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"].drop(columns=["_side", "_jb"]).dropna(axis=1, how="all")
        rg = g[g["_side"] == "r"].drop(columns=["_side", "_jb"]).dropna(axis=1, how="all")
        if lg.empty:
            return pd.DataFrame()
        if rg.empty:
            return lg
        lg = lg.sort_values(ts_col, kind="mergesort")
        rg = rg.sort_values(ts_col, kind="mergesort")
        return pd.merge_asof(
            lg, rg, on=ts_col, by=key, direction="backward", suffixes=("", suffix)
        )

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def semi_join(big, keys_df: pd.DataFrame, on: str, anti: bool = False):
    """Semi/anti join: broadcast the key SET and mask per batch."""
    key_set = set(keys_df[on].tolist())
    ref = ray.put(key_set)

    class Filter:
        def __init__(self, ref):
            self.keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mask = df[on].isin(self.keys)
            return df[~mask] if anti else df[mask]

    return big.map_batches(
        Filter, fn_constructor_kwargs={"ref": ref}, batch_format="pandas",
        concurrency=(1, 4),
    )
