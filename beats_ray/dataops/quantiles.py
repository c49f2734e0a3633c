"""Exact distributed quantiles over an integer column.

The naive route (global sort, then index) is an all-to-all shuffle of
the whole corpus for a handful of scalars.  :func:`exact_quantiles`
instead rank-selects each quantile with the same histogram-refinement
loop as ``selection.take_token_budget`` (the classic distributed
k-th-order-statistic pattern):

1. ONE scan aggregates row counts per value bin — a <=4096-row table;
2. the driver prefix-sums the tiny histogram and locates the bin that
   contains each target rank (all requested quantiles share the same
   top-level pass, and quantiles landing in the same bin share the
   refinement below it);
3. a bin is refined on its narrower value range until it is either a
   single value (answered exactly with no collect) or small enough to
   resolve with one bounded collect (``resolve_limit`` rows —
   ``np.partition``, not a sort).

Rank semantics match DuckDB ``quantile_disc``: the 1-based index is
``ceil(q * n)`` (clamped to >=1), verified empirically across n/q
boundary cases, so the whole computation has a value-level SQL oracle.
Each refinement pass scans only the previous boundary bin (<=1/nbins
of the prior pass in the uniform case); nothing row-sized ever reaches
the driver except the final bounded resolve.

``grouped_quantiles`` is the companion for per-group quantiles where
groups are numerous and each is small (the opposite shape): hash-bucket
co-location, then one vectorized ``np.partition`` per group — the
shuffle moves only (key, value) pairs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _bin_counts(ds, col: str, lo: int, width: int, nbins: int) -> np.ndarray:
    """One scan -> int64[nbins] row count per ``(col - lo) // width``
    bin; tiny and driver-side by design."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = ((df[col].to_numpy(np.int64) - lo) // width).clip(0, nbins - 1)
        c = np.bincount(b, minlength=nbins).astype(np.int64)
        nz = np.flatnonzero(c)
        return pd.DataFrame({"bin": nz, "cnt": c[nz]})

    # per-block partials are <= nbins rows each; merging them on the
    # driver with np.add.at is the same bounded volume a groupby would
    # shuffle, without paying a sort-based exchange for a 4096-cell grid
    out = np.zeros(nbins, dtype=np.int64)
    for part in ds.map_batches(
            partial,
            batch_format="pandas").iter_batches(batch_format="pandas"):
        np.add.at(out, part["bin"].to_numpy(np.int64),
                  part["cnt"].to_numpy(np.int64))
    return out


def _range_filter(sub, col: str, flo: int, fhi: int):
    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        c = df[col]
        return df[(c >= flo) & (c <= fhi)]

    return sub.map_batches(in_bin, batch_format="pandas")


def _resolve_ranks(sub, col: str, ranks: list[int], lo: int, hi: int,
                   counts: np.ndarray, width: int, nbins: int,
                   resolve_limit: int) -> dict[int, int]:
    """Map each 0-based rank (relative to ``sub`` in ascending order)
    to its value.  ``counts`` is the histogram of ``sub`` over
    [lo, hi] with ``width``-wide bins (computed by the caller so the
    top-level pass is shared across quantiles)."""
    cum = np.concatenate(([0], np.cumsum(counts)))
    out: dict[int, int] = {}
    by_bin: dict[int, list[int]] = {}
    for k in ranks:
        b = int(np.searchsorted(cum, k, side="right")) - 1
        by_bin.setdefault(b, []).append(k)
    small: list[int] = []
    for b, ks in by_bin.items():
        b_lo = lo + b * width
        b_hi = min(hi, b_lo + width - 1)
        inner = [k - int(cum[b]) for k in ks]
        if width == 1:
            for k in ks:
                out[k] = b_lo  # every row in the bin holds this value
            continue
        if int(counts[b]) <= resolve_limit:
            small.append(b)  # batched below: one pass for ALL of them
            continue
        inner_sub = _range_filter(sub, col, b_lo, b_hi)
        iw = max(1, (b_hi - b_lo + 1 + nbins - 1) // nbins)
        used = (b_hi - b_lo) // iw + 1
        icounts = _bin_counts(inner_sub, col, b_lo, iw, used)
        got = _resolve_ranks(inner_sub, col, inner, b_lo, b_hi,
                             icounts[:used], iw, nbins, resolve_limit)
        for k, ki in zip(ks, inner):
            out[k] = got[ki]
    # resolvable bins are collected in grouped passes (Σ counts ≤
    # resolve_limit per pass) instead of one dataset execution per bin
    # — with N requested ranks (ntile boundaries, multi-quantiles) the
    # per-bin route costs N full scans of pure scheduling
    group: list[int] = []
    gcnt = 0
    groups: list[list[int]] = []
    for b in small:
        if group and gcnt + int(counts[b]) > resolve_limit:
            groups.append(group)
            group, gcnt = [], 0
        group.append(b)
        gcnt += int(counts[b])
    if group:
        groups.append(group)
    for grp in groups:
        ranges = [(lo + b * width, min(hi, lo + b * width + width - 1))
                  for b in grp]

        def in_ranges(df: pd.DataFrame, _r=tuple(ranges)) -> pd.DataFrame:
            c = df[col].to_numpy(np.int64)
            m = np.zeros(len(df), dtype=bool)
            for flo, fhi in _r:
                m |= (c >= flo) & (c <= fhi)
            return df[m]

        vals = (sub.map_batches(in_ranges, batch_format="pandas")
                   .select_columns([col]).to_pandas()[col]
                   .to_numpy(np.int64))
        for b, (b_lo, b_hi) in zip(grp, ranges):
            ks = by_bin[b]
            inner = [k - int(cum[b]) for k in ks]
            bin_vals = vals[(vals >= b_lo) & (vals <= b_hi)]
            part = np.partition(bin_vals, sorted(set(inner)))
            for k, ki in zip(ks, inner):
                out[k] = int(part[ki])
    return out


def rank_select(ds, col: str, ranks: list[int], *, nbins: int = 4096,
                resolve_limit: int = 1_000_000,
                small_limit: int = 500_000) -> dict[int, int]:
    """Exact value at each 0-based ascending rank of integer ``col``.

    Adaptive: a column of at most ``small_limit`` rows collects once
    and resolves with one np.partition (the refinement loop's fixed
    per-round scan cost dwarfs a bounded collect); larger inputs run
    the distributed histogram-refinement loop. ``small_limit=0``
    forces the distributed path."""
    from ray.data.aggregate import Max, Min

    if small_limit:
        head = ds.limit(small_limit + 1).to_pandas()
        if len(head) <= small_limit:
            if not len(head):
                raise ValueError("rank_select over an empty dataset")
            v = head[col].dropna().to_numpy(np.int64)
            want = sorted({r for r in ranks if 0 <= r < len(v)})
            if want:
                v = np.partition(v, want)
            return {int(r): int(v[r]) for r in want}

    rng = ds.aggregate(Min(col, alias_name="lo"),
                       Max(col, alias_name="hi"))  # one fused scan
    if rng["lo"] is None:
        raise ValueError("rank_select over an empty dataset")
    lo, hi = int(rng["lo"]), int(rng["hi"])
    width = max(1, (hi - lo + 1 + nbins - 1) // nbins)
    used = (hi - lo) // width + 1
    counts = _bin_counts(ds, col, lo, width, used)
    return _resolve_ranks(ds, col, sorted(set(ranks)), lo, hi,
                          counts[:used], width, nbins, resolve_limit)


def quantile_rank(q: float, n: int) -> int:
    """0-based rank for quantile ``q`` of ``n`` rows — DuckDB
    ``quantile_disc`` semantics: 1-based index ceil(q*n), >= 1."""
    return max(1, math.ceil(q * n)) - 1


def exact_quantiles(ds, col: str, qs: list[float], *, nbins: int = 4096,
                    resolve_limit: int = 1_000_000) -> pa.Table:
    """(q VARCHAR, value int64) table of exact ``quantile_disc``-rule
    quantiles of integer column ``col``; one shared top-level scan plus
    O(log range) shrinking passes per distinct boundary bin."""
    from ray.data.aggregate import Count

    n = int(ds.aggregate(Count(col, alias_name="n"))["n"])
    if n == 0:
        return pa.table({"q": pa.array([], pa.string()),
                         "value": pa.array([], pa.int64())})
    ranks = {q: quantile_rank(q, n) for q in qs}
    got = rank_select(ds, col, list(ranks.values()), nbins=nbins,
                      resolve_limit=resolve_limit)
    return pa.table({
        "q": pa.array([f"{q:g}" for q in qs], pa.string()),
        "value": pa.array([got[ranks[q]] for q in qs], pa.int64()),
    })


def grouped_quantiles(ds, col: str, by: str, qs: list[float], *,
                      buckets: int = 32) -> "pa.Table":
    """Per-group exact quantiles (DuckDB ``quantile_disc`` rule) for
    MANY small groups: hash-bucket the (by, col) pairs so each group is
    co-located, then one vectorized pass per bucket sorting each group
    once and indexing every requested rank from it.  Output columns:
    ``by``, then ``q<label>`` per quantile.  Returns a Dataset."""
    from .agg import map_buckets

    labels = [f"q{f'{q:g}'.replace('.', '_')}" for q in qs]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(by, sort=False):
            v = np.sort(g[col].to_numpy(np.int64))
            n = len(v)
            rows.append((key, *(int(v[quantile_rank(q, n)]) for q in qs)))
        return pd.DataFrame(rows, columns=[by, *labels])

    narrow = ds.select_columns([by, col])
    return map_buckets(narrow, by, per_bucket, buckets)
