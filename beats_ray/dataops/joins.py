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

from ..fixtures import fnv1a32_arrow


# per-worker-process broadcast cache: plain TASKS (fusable, no actor
# pool spin-up — ~1s saved per stage on short pipelines) with ray.get
# amortized to once per worker per object. True LRU (touch-on-hit) with
# a SMALL cap: cached payloads can be large (broadcast lookup tables),
# and unlike an actor pool the worker process outlives the stage — the
# cap bounds worker RSS growth across a long session.
from collections import OrderedDict

_BCAST_CACHE: OrderedDict = OrderedDict()
_BCAST_CACHE_MAX = 8


def _resolve_ref(ref):
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key in _BCAST_CACHE:
        _BCAST_CACHE.move_to_end(key)
        return _BCAST_CACHE[key]
    while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
        _BCAST_CACHE.popitem(last=False)
    val = ray.get(ref)
    _BCAST_CACHE[key] = val
    return val


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
        from ..fixtures import fnv1a32_arrow

        sub = series[non_num].map(str)
        hashes = fnv1a32_arrow(pa.array(sub, pa.string())) % buckets
        num_bucket = num_bucket.mask(
            non_num, pd.Series(hashes, index=sub.index)
        ).astype("int64")
    return num_bucket


def _arrow_types(ds) -> dict[str, "pa.DataType"]:
    """Best-effort Arrow type per column of a Dataset (handles both
    Arrow- and pandas-block schemas; object dtype ⇒ string)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    out: dict[str, pa.DataType] = {}
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    for name, dt in zip(sch.names, getattr(base, "types", [])):
        try:
            out[name] = pa.from_numpy_dtype(dt)
        except (pa.ArrowNotImplementedError, TypeError):
            out[name] = pa.string()
    return out


# ----- shared rows+state in-band machinery (stateful-stage contract) --
# The three stateful ops (token_bucket_limit, rate_limit,
# dedup_by_doc_id) share one continuity shape: seed state rows ride the
# SAME co-locating shuffle as their keys' events (typed-null padding +
# union), and emit_state="both" returns rows + flagged state from one
# pass. These helpers are the single implementation of that padding /
# packing / splitting logic.


def union_state_rows(events, state_ds, key: str, state_cols: list[str],
                     ev_types: dict):
    """Union ``state_ds`` (columns [key, *state_cols]) into ``events``
    with typed-Arrow null padding: each hash bucket then receives its
    own keys' seeds. Adds ``_st_<col>`` columns + a ``_state_row``
    flag."""
    import pyarrow.compute as pc

    ev_cols = list(ev_types)
    key_type = ev_types.get(key, pa.string())

    def pad_events(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        n = t.num_rows
        t = t.select(ev_cols)  # canonical order for union
        for c in state_cols:
            t = t.append_column(f"_st_{c}", pa.nulls(n, pa.int64()))
        return t.append_column(
            "_state_row", pa.array([False] * n, pa.bool_())
        )

    def pad_state(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays, names = [], []
        for c in ev_cols:
            if c == key:
                arrays.append(
                    pc.cast(t[key].combine_chunks(), key_type, safe=False)
                )
            else:
                arrays.append(pa.nulls(n, ev_types[c]))
            names.append(c)
        for c in state_cols:
            arrays.append(pc.cast(t[c].combine_chunks(), pa.int64()))
            names.append(f"_st_{c}")
        arrays.append(pa.array([True] * n, pa.bool_()))
        names.append("_state_row")
        return pa.table(dict(zip(names, arrays)))

    return events.map_batches(
        pad_events, batch_format="pyarrow"
    ).union(state_ds.map_batches(pad_state, batch_format="pyarrow"))


def take_state_rows(g: pd.DataFrame,
                    state_cols: list[str]) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Inside a per-bucket fn: split a ``union_state_rows`` frame into
    (state rows [key + _st_*], data-only frame) — each op builds its
    own seed mapping from the state rows (their key shapes differ)."""
    smask = g["_state_row"].fillna(False).astype(bool).to_numpy()
    srows = g[smask]
    g = g[~smask].drop(
        columns=[f"_st_{c}" for c in state_cols] + ["_state_row"]
    )
    return srows, g


def pack_rows_state(rows_df: pd.DataFrame, state_df: pd.DataFrame,
                    ev_types: dict, key: str, state_cols: list[str],
                    flag: str) -> pa.Table:
    """Build the emit_state="both" output: kept rows (typed, state
    columns null) + state rows (key + state columns, other event
    columns typed-null), flagged by ``flag``. Typed Arrow throughout —
    a pandas concat would float-promote int columns on the null-padded
    side."""
    ev_cols = list(ev_types)
    arrays = [
        pa.Array.from_pandas(rows_df[c], type=ev_types[c]) for c in ev_cols
    ]
    arrays += [pa.nulls(len(rows_df), pa.int64()) for _ in state_cols]
    arrays.append(pa.array([False] * len(rows_df), pa.bool_()))
    # state columns travel under a reserved ``_st_`` prefix so an event
    # schema that happens to contain e.g. a "tok" or "cnt" column is
    # never shadowed/dropped by dict(zip(...)) (same convention as
    # union_state_rows)
    names = ev_cols + [f"_st_{c}" for c in state_cols] + [flag]
    rows_t = pa.table(dict(zip(names, arrays)))
    sarrays = []
    for c in ev_cols:
        if c == key:
            sarrays.append(
                pa.Array.from_pandas(state_df[key], type=ev_types[key])
            )
        else:
            sarrays.append(pa.nulls(len(state_df), ev_types[c]))
    sarrays += [pa.array(state_df[c], pa.int64()) for c in state_cols]
    sarrays.append(pa.array([True] * len(state_df), pa.bool_()))
    state_t = pa.table(dict(zip(names, sarrays)))
    return pa.concat_tables([rows_t, state_t])


def split_rows_state(both, key: str, state_cols: list[str], flag: str):
    """Split an emit_state="both" Dataset into (rows, state). Cheap
    map_batches filters — run on a MATERIALIZED ``both`` so the stage
    executes once for the pair."""
    import pyarrow.compute as pc

    def rows_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.fill_null(t[flag], False)))
        return t.drop_columns([f"_st_{c}" for c in state_cols] + [flag])

    def state_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(t[flag], False))
        t = t.select([key, *(f"_st_{c}" for c in state_cols)])
        return t.rename_columns([key, *state_cols])

    return (
        both.map_batches(rows_part, batch_format="pyarrow"),
        both.map_batches(state_part, batch_format="pyarrow"),
    )


def _with_bucket(ds, key: str, buckets: int, side: str,
                 all_types: dict | None = None):
    """Tag side + bucket and emit a TYPED ARROW block carrying the full
    combined schema (other side's columns as typed nulls). Ray's union
    does not align disjoint schemas, and null-padding in pandas would
    turn every column to object dtype — making the downstream sort
    shuffle crawl; typed Arrow keeps it a C++ sort."""
    all_types = all_types or {}
    ordered = list(all_types)

    def add(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        jb = _bucket_of(df[key], buckets).to_numpy()
        arrays, names = [], []
        for c in ordered:
            typ = all_types[c]
            if c in df.columns:
                arrays.append(pa.Array.from_pandas(df[c], type=typ))
            else:
                arrays.append(pa.nulls(n, typ))
            names.append(c)
        arrays.append(pa.array(jb, pa.int64()))
        names.append("_jb")
        arrays.append(pa.array([side] * n, pa.string()))
        names.append("_side")
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(add, batch_format="pandas")


def _combined_types(left, right) -> dict:
    """Union schema (left types win on shared names)."""
    lt, rt = _arrow_types(left), _arrow_types(right)
    out = dict(rt)
    out.update(lt)
    # preserve left-first column order, then right-only columns
    ordered = {c: out[c] for c in lt}
    for c in rt:
        if c not in ordered:
            ordered[c] = out[c]
    return ordered


def coalesce_if_fragmented(ds, target: int):
    """Shrink a MATERIALIZED dataset's block count to ``target`` when it
    arrives fragmented (> target blocks). The sort shuffle behind every
    groupby costs ∝ map-blocks × reduce-partitions, so an input that
    arrives as hundreds of tiny blocks (a materialized pair list, an id
    set built row-wise) explodes it into tens of thousands of
    micro-tasks (measured 85s → 4.5s on a 9.9k-row join whose input
    arrived as 200 blocks). Lazy datasets pass through untouched — their
    block counts are unknown and the tuned read paths (16 fat blocks)
    must NOT be split. shuffle=False ⇒ cheap adjacent-block coalesce,
    not an exchange."""
    try:
        n = ds.num_blocks()
    except (AttributeError, ValueError, NotImplementedError):
        return ds
    if n > target:
        return ds.repartition(target, shuffle=False)
    return ds




def bucket_hash_join(left, right, left_on: str, right_on: str,
                     buckets: int = 32, how: str = "inner", post=None):
    """Partitioned hash join of two Datasets: union the bucket-tagged
    sides, group by bucket (ONE co-locating shuffle total), and merge
    within each bucket. Column membership is threaded EXPLICITLY from
    the input schemas (guessing via dropna silently dropped legitimately
    all-null columns and broke one-sided buckets). Column-name
    collisions get pandas suffixes.

    ``post``: optional DataFrame→DataFrame applied to each bucket's
    merged frame INSIDE the merge task. Because every join-key value
    lives in exactly one bucket, an aggregation grouped on the join key
    is EXACT here — fusing it avoids a second global shuffle (the
    groupby-after-join pattern costs another sort over the full join
    output; measured ~5 s of pure scheduling on a 105k-row join)."""
    left = coalesce_if_fragmented(left, 4 * buckets)
    right = coalesce_if_fragmented(right, 4 * buckets)
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    types = _combined_types(left, right)
    l_tag = _with_bucket(left, left_on, buckets, "l", all_types=types)
    r_tag = _with_bucket(right, right_on, buckets, "r", all_types=types)
    both = l_tag.union(r_tag)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["_side"] == "l", left_cols]
        rg = g.loc[g["_side"] == "r", right_cols]
        # pandas merge keeps the full output schema even when a side is
        # empty, so one-sided buckets stay schema-stable
        out = lg.merge(rg, left_on=left_on, right_on=right_on, how=how,
                       suffixes=("", "_r"))
        return post(out) if post is not None else out

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def asof_join(left, right, key: str, ts_col: str = "ts", buckets: int = 32,
              suffix: str = "_r", tie_cols: list | None = None):
    """As-of (backward) join: each left row matches the latest right row
    with ``right.ts <= left.ts`` within the same ``key`` (guide: sort
    both sides by (key, ts) within buckets + ``pd.merge_asof`` per
    bucket). One co-locating shuffle on the key; per-bucket work is a
    single vectorized merge_asof. Equal timestamps match
    (allow_exact_matches, = DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

    ``tie_cols``: when several right rows share the same (key, ts), the
    merge_asof winner would otherwise depend on nondeterministic block
    arrival order (mergesort preserves it). With ``tie_cols`` the right
    side is sorted by (ts, *tie_cols) and deduped to one row per
    (key, ts) keeping the LARGEST tie tuple — a stable, run-to-run and
    oracle-reproducible winner (SQL mirror: ``QUALIFY row_number()
    OVER (PARTITION BY key, ts ORDER BY tie DESC, ...) = 1``)."""
    left = coalesce_if_fragmented(left, 4 * buckets)
    right = coalesce_if_fragmented(right, 4 * buckets)
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    types = _combined_types(left, right)
    l_tag = _with_bucket(left, key, buckets, "l", all_types=types)
    r_tag = _with_bucket(right, key, buckets, "r", all_types=types)
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
        if tie_cols:
            # NULL tie values sort FIRST so keep='last' always prefers a
            # non-null winner — mirroring the oracle's ``ORDER BY tie
            # DESC`` (DuckDB defaults NULLS LAST on DESC, i.e. nulls
            # lose); pandas' default na_position='last' would let a
            # null tie value beat every real one
            rg = rg.sort_values(
                [ts_col, *tie_cols], kind="mergesort", na_position="first"
            )
            rg = rg.drop_duplicates([key, ts_col], keep="last")
        else:
            rg = rg.sort_values(ts_col, kind="mergesort")
        return pd.merge_asof(
            lg, rg, on=ts_col, by=key, direction="backward", suffixes=("", suffix)
        )

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def range_join(left, intervals, key: str, ts_col: str,
               start_col: str = "start_s", end_col: str = "end_s",
               buckets: int = 32, how: str = "inner",
               assume_disjoint: bool = True, suffix: str = "_r"):
    """Interval-containment join: each left row matches interval rows of
    the same ``key`` with ``start <= ts <= end`` (closed ends — an event
    on a window boundary belongs to the window). One co-locating shuffle
    on the key, like the other bucket joins.

    ``assume_disjoint=True`` (per-key non-overlapping intervals — session
    windows, maintenance windows): per bucket, ONE vectorized
    ``pd.merge_asof`` backward on the interval start picks the only
    candidate, and a containment filter on the end closes the range —
    no per-key Python. With ``assume_disjoint=False`` (overlapping
    intervals) the bucket falls back to a key-equi merge + containment
    filter, emitting EVERY containing interval (output is cross-of-
    containing, inherently |matches|-sized).

    ``how``: 'inner' drops uncontained left rows; 'left' keeps them with
    null interval columns."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    left = coalesce_if_fragmented(left, 4 * buckets)
    intervals = coalesce_if_fragmented(intervals, 4 * buckets)
    left_cols = list(left.schema().names)
    right_cols = list(intervals.schema().names)
    types = _combined_types(left, intervals)
    l_tag = _with_bucket(left, key, buckets, "l", all_types=types)
    r_tag = _with_bucket(intervals, key, buckets, "r", all_types=types)
    both = l_tag.union(r_tag)
    out_right = [c + (suffix if c in left_cols and c != key else "")
                 for c in right_cols if c != key]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["_side"] == "l", left_cols]
        rg = g.loc[g["_side"] == "r", right_cols]
        empty_cols = left_cols + out_right
        if lg.empty:
            return pd.DataFrame(columns=empty_cols)
        if rg.empty:
            if how == "inner":
                return pd.DataFrame(columns=empty_cols)
            out = lg.copy()
            for c in out_right:
                out[c] = None
            return out
        if assume_disjoint:
            lg = lg.sort_values(ts_col, kind="mergesort")
            rg = rg.sort_values(start_col, kind="mergesort")
            out = pd.merge_asof(
                lg, rg, left_on=ts_col, right_on=start_col, by=key,
                direction="backward", suffixes=("", suffix),
            )
            end = out[end_col + suffix if end_col in left_cols else end_col]
            contained = end.notna() & (out[ts_col] <= end)
        else:
            lg = lg.reset_index(drop=True)
            lg["_lpos"] = range(len(lg))
            out = lg.merge(rg, on=key, how="left", suffixes=("", suffix))
            sc = start_col + suffix if start_col in left_cols else start_col
            ec = end_col + suffix if end_col in left_cols else end_col
            contained = (out[sc].notna() & (out[sc] <= out[ts_col])
                         & (out[ts_col] <= out[ec]))
        if how == "inner":
            return (out[contained].reset_index(drop=True)
                    .drop(columns=["_lpos"], errors="ignore"))
        kept = out[contained]
        # left: each uncontained left ROW survives once with nulled
        # interval columns (row identity by position — duplicate left
        # rows each survive independently)
        if assume_disjoint:
            miss = out[~contained].copy()  # asof: one out row per left row
        else:
            hit_pos = set(out.loc[contained, "_lpos"])
            miss = lg[~lg["_lpos"].isin(hit_pos)].copy()
        for c in out_right:
            miss[c] = None
        res = pd.concat(
            [kept, miss[left_cols + ["_lpos"] + out_right]
             if "_lpos" in miss.columns else miss[left_cols + out_right]],
            ignore_index=True,
        )
        return res.drop(columns=["_lpos"], errors="ignore")

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def bucket_semi_join(left, keys, on: str, anti: bool = False,
                     buckets: int = 32):
    """Distributed semi/anti join: ``keys`` is a DATASET of join keys
    (column ``on``; duplicates allowed — membership is a set test).
    Both sides hash-bucket on the key (one co-locating shuffle); per
    bucket the left rows are masked by membership in that bucket's key
    set. NOTHING lands on the driver — the scale path for key sets that
    may be corpus-proportional (the drop-id set of a dup-heavy dedup),
    where ``semi_join``'s driver-side set broadcast would be unbounded."""
    left = coalesce_if_fragmented(left, 4 * buckets)
    keys = coalesce_if_fragmented(keys, 4 * buckets)
    left_cols = list(left.schema().names)
    keys = keys.select_columns([on])
    types = _combined_types(left, keys)
    l_tag = _with_bucket(left, on, buckets, "l", all_types=types)
    r_tag = _with_bucket(keys, on, buckets, "r", all_types=types)
    both = l_tag.union(r_tag)

    def mask(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["_side"] == "l", left_cols]
        kset = set(g.loc[g["_side"] == "r", on])
        m = lg[on].isin(kset)
        return lg[~m] if anti else lg[m]

    return both.groupby("_jb").map_groups(mask, batch_format="pandas")


def _semi_mask(t: pa.Table, ref, on, anti) -> pa.Table:
    import pyarrow.compute as pc

    vals = _resolve_ref(ref)
    if vals.type != t.schema.field(on).type:
        vals = vals.cast(t.schema.field(on).type)
    # null keys match nothing (pandas-isin semantics): semi drops them,
    # anti keeps them
    mask = pc.fill_null(pc.is_in(t[on], value_set=vals), False)
    return t.filter(pc.invert(mask) if anti else mask)


def semi_join(big, keys_df: pd.DataFrame, on: str, anti: bool = False):
    """Semi/anti join: broadcast the key SET once, mask per batch in
    fused tasks (per-worker cache, no actor pool). The mask is a
    zero-copy Arrow ``is_in`` filter — no pandas conversion, and empty
    results keep their typed schema (object-dtype empties broke Ray's
    block-size estimator)."""
    ref = ray.put(pa.array(pd.unique(keys_df[on].dropna())))
    return big.map_batches(
        _semi_mask, fn_kwargs={"ref": ref, "on": on, "anti": anti},
        batch_format="pyarrow",
    )
