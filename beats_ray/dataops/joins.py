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


# per-worker-process broadcast cache: plain TASKS (fusable, no actor
# pool spin-up — ~1s saved per stage on short pipelines) with ray.get
# amortized to once per worker per object. Bounded LRU-ish eviction.
_BCAST_CACHE: dict = {}


def _resolve_ref(ref):
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _BCAST_CACHE:
        if len(_BCAST_CACHE) >= 32:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def _probe_merge(df: pd.DataFrame, ref, keys, how) -> pd.DataFrame:
    return df.merge(_resolve_ref(ref), on=keys, how=how)


def broadcast_join(big, small_df: pd.DataFrame, on: str | list[str],
                   how: str = "inner"):
    """Join a Dataset with a driver-side small DataFrame (broadcast
    once via ray.put, probed map-side in fused tasks — no shuffle)."""
    keys = [on] if isinstance(on, str) else list(on)
    ref = ray.put(small_df)
    return big.map_batches(
        _probe_merge, fn_kwargs={"ref": ref, "keys": keys, "how": how},
        batch_format="pandas",
    )


def _bucket_of(series: pd.Series, buckets: int) -> pd.Series:
    """Type-canonical, null-safe bucket assignment: numeric values (and
    numeric-looking strings) bucket by value, everything else by FNV of
    the string — so equal keys bucket identically regardless of the
    dtype each side happened to arrive with. Null keys get a bucket too
    (they match nothing, but left-join rows must survive the shuffle)."""
    as_num = pd.to_numeric(series, errors="coerce")
    num_bucket = (as_num.fillna(-1).astype("int64") % buckets).astype("int64")
    non_num = as_num.isna() & series.notna()
    if non_num.any():
        lut = {u: fnv1a32(str(u)) % buckets for u in series[non_num].unique()}
        num_bucket = num_bucket.mask(non_num, series.map(lut)).astype("int64")
    return num_bucket


def _with_bucket(ds, key: str, buckets: int, side: str,
                 fill_cols: list[str] | None = None):
    """Tag side + bucket, and null-pad the OTHER side's columns so every
    block of the union carries the full combined schema (Ray's union
    does not align disjoint schemas; a bucket group otherwise lacks the
    absent side's columns entirely)."""
    fill = fill_cols or []

    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_jb"] = _bucket_of(df[key], buckets)
        df["_side"] = side
        for c in fill:
            if c not in df.columns:
                df[c] = None
        return df

    return ds.map_batches(add, batch_format="pandas")


def bucket_hash_join(left, right, left_on: str, right_on: str,
                     buckets: int = 32, how: str = "inner"):
    """Partitioned hash join of two Datasets: union the bucket-tagged
    sides, group by bucket (ONE co-locating shuffle total), and merge
    within each bucket. Column membership is threaded EXPLICITLY from
    the input schemas (guessing via dropna silently dropped legitimately
    all-null columns and broke one-sided buckets). Column-name
    collisions get pandas suffixes."""
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    l_tag = _with_bucket(left, left_on, buckets, "l", fill_cols=right_cols)
    r_tag = _with_bucket(right, right_on, buckets, "r", fill_cols=left_cols)
    both = l_tag.union(r_tag)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["_side"] == "l", left_cols]
        rg = g.loc[g["_side"] == "r", right_cols]
        # pandas merge keeps the full output schema even when a side is
        # empty, so one-sided buckets stay schema-stable
        return lg.merge(rg, left_on=left_on, right_on=right_on, how=how,
                        suffixes=("", "_r"))

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def asof_join(left, right, key: str, ts_col: str = "ts", buckets: int = 32,
              suffix: str = "_r"):
    """As-of (backward) join: each left row matches the latest right row
    with ``right.ts <= left.ts`` within the same ``key`` (guide: sort
    both sides by (key, ts) within buckets + ``pd.merge_asof`` per
    bucket). One co-locating shuffle on the key; per-bucket work is a
    single vectorized merge_asof. Equal timestamps match
    (allow_exact_matches, = DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``)."""
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    l_tag = _with_bucket(left, key, buckets, "l", fill_cols=right_cols)
    r_tag = _with_bucket(right, key, buckets, "r", fill_cols=left_cols)
    both = l_tag.union(r_tag)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["_side"] == "l", left_cols]
        rg = g.loc[g["_side"] == "r", right_cols]
        if lg.empty:
            return pd.DataFrame(columns=left_cols + [
                c + (suffix if c in left_cols else "")
                for c in right_cols if c not in (key, ts_col)
            ])
        if rg.empty:
            # schema-stable: manufacture the right side's columns as nulls
            out = lg.copy()
            for c in right_cols:
                if c in (key, ts_col):
                    continue
                out[c + (suffix if c in left_cols else "")] = None
            return out
        lg = lg.sort_values(ts_col, kind="mergesort")
        rg = rg.sort_values(ts_col, kind="mergesort")
        return pd.merge_asof(
            lg, rg, on=ts_col, by=key, direction="backward", suffixes=("", suffix)
        )

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def _semi_mask(df: pd.DataFrame, ref, on, anti) -> pd.DataFrame:
    mask = df[on].isin(_resolve_ref(ref))
    return df[~mask] if anti else df[mask]


def semi_join(big, keys_df: pd.DataFrame, on: str, anti: bool = False):
    """Semi/anti join: broadcast the key SET once, mask per batch in
    fused tasks (per-worker cache, no actor pool)."""
    ref = ray.put(set(keys_df[on].tolist()))
    return big.map_batches(
        _semi_mask, fn_kwargs={"ref": ref, "on": on, "anti": anti},
        batch_format="pandas",
    )
