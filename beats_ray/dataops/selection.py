"""Budgeted selection — "keep the best documents until a token budget"
(the data-mix assembly step: rank the corpus by a quality signal and
cut at exactly B training tokens).

The cumulative sum over a global ordering is a prefix-scan;
materializing a global sort to compute it would be an all-to-all
shuffle of the whole corpus.  Instead :func:`take_token_budget` finds
the CUTOFF ROW with a histogram refinement loop (the
distributed-quantile pattern):

1. one scan aggregates (token-sum, row-count) per score bin — a
   <=4096-row table, nothing row-sized leaves the workers;
2. the driver prefix-sums the tiny histogram in rank order and finds
   the boundary bin that straddles the budget;
3. the boundary bin is refined — re-binned on its narrower score
   range, then (for one tied score value) on the tie-break key —
   until it is small enough to resolve exactly (``resolve_limit``
   rows, a bounded collect like the dedup tier's ``broadcast_limit``);
4. membership is then ONE vectorized filter pass:
   ``score > s_cut OR (score == s_cut AND key <= k_cut)``.

Ordering is (score DESC, key ASC), integers end to end, so the whole
selection replays in SQL as ``SUM(tokens) OVER (ORDER BY score DESC,
key) <= budget`` — a full value-level oracle.  Each refinement scans
only the previous boundary bin's rows (<= 1/nbins of the prior pass
in the uniform case), so the loop is O(log range) shrinking passes and
the kept set itself is never collected anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_I64_MIN = np.iinfo(np.int64).min


def _bin_sums(ds, col: str, tokens: str, lo: int, width: int,
              nbins: int) -> np.ndarray:
    """One scan -> [nbins, 2] (token_sum, row_count) per
    ``(col - lo) // width`` bin; tiny and driver-side by design."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = ((df[col].to_numpy(np.int64) - lo) // width).clip(0, nbins - 1)
        t = np.bincount(b, weights=df[tokens].to_numpy(np.int64),
                        minlength=nbins).astype(np.int64)
        c = np.bincount(b, minlength=nbins).astype(np.int64)
        nz = np.flatnonzero(c)
        return pd.DataFrame({"bin": nz, "tok": t[nz], "cnt": c[nz]})

    # per-block partials are <= nbins rows each; a driver-side
    # np.add.at merge moves the same bounded volume a groupby would
    # shuffle, minus the sort-based exchange (which costs tens of
    # seconds of fixed overhead for a 4096-cell grid)
    out = np.zeros((nbins, 2), dtype=np.int64)
    for part in ds.map_batches(
            partial,
            batch_format="pandas").iter_batches(batch_format="pandas"):
        b = part["bin"].to_numpy(np.int64)
        np.add.at(out[:, 0], b, part["tok"].to_numpy(np.int64))
        np.add.at(out[:, 1], b, part["cnt"].to_numpy(np.int64))
    return out


def _keep(ds, score: str, key: str, s_cut: int, k_cut: int | None):
    """score > s_cut, or score == s_cut and key <= k_cut (ties)."""
    import pyarrow.compute as pc

    def pick(t: pa.Table) -> pa.Table:
        s = t[score]
        mask = pc.greater(s, s_cut)
        if k_cut is not None:
            mask = pc.or_(mask, pc.and_(
                pc.equal(s, s_cut), pc.less_equal(t[key], k_cut)))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(pick, batch_format="pyarrow")


def _range_filter(sub, col: str, flo: int, fhi: int):
    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        c = df[col]
        return df[(c >= flo) & (c <= fhi)]

    return sub.map_batches(in_bin, batch_format="pandas")


def take_token_budget(ds, budget: int, *, score: str, tokens: str,
                      key: str, nbins: int = 4096,
                      resolve_limit: int = 1_000_000,
                      small_limit: int = 500_000):
    """Rows whose cumulative ``tokens`` in (``score`` DESC, ``key``
    ASC) order is <= ``budget`` — cumulative sum INCLUDING the row;
    ``score``/``tokens``/``key`` must be integer columns.

    Adaptive: when the corpus has at most ``small_limit`` rows, the
    three integer columns collect once and the cutoff resolves with
    one driver sort — the histogram loop's fixed per-pass scans cost
    more than the bounded collect. Larger inputs run the distributed
    histogram-refinement loop unchanged (``small_limit=0`` forces it).
    The returned cutoff feeds the same streaming ``_keep`` filter
    either way."""
    if budget <= 0:
        return _keep(ds, score, key, np.iinfo(np.int64).max, None)

    if small_limit:
        cols = list(dict.fromkeys((score, tokens, key)))
        head = ds.select_columns(cols).limit(small_limit + 1).to_pandas()
        if len(head) <= small_limit:
            if not len(head):
                return ds
            rows = head.sort_values([score, key], ascending=[False, True])
            csum = rows[tokens].to_numpy(np.int64).cumsum()
            kept = rows[csum <= int(budget)]
            if kept.empty:
                return _keep(ds, score, key, np.iinfo(np.int64).max, None)
            return _keep(ds, score, key, int(kept[score].iloc[-1]),
                         int(kept[key].iloc[-1]))

    from ray.data.aggregate import Max, Min

    rng = ds.aggregate(Min(score, alias_name="lo"),
                       Max(score, alias_name="hi"))  # one fused scan
    smin, smax = rng["lo"], rng["hi"]
    if smin is None:  # empty dataset
        return ds

    remaining = int(budget)
    sub, lo, hi = ds, int(smin), int(smax)

    while True:
        width = max(1, (hi - lo + 1 + nbins - 1) // nbins)
        used = (hi - lo) // width + 1
        sums = _bin_sums(sub, score, tokens, lo, width, used)
        cut_bin = None
        for b in range(used - 1, -1, -1):  # best (highest score) first
            tok = int(sums[b, 0])
            if tok <= remaining:
                remaining -= tok
                continue
            cut_bin = b
            break
        if cut_bin is None:
            # everything from `lo` up fits; worse bins were already cut
            return ds if sub is ds else _keep(ds, score, key, lo - 1, None)
        b_lo, b_hi = lo + cut_bin * width, min(hi, lo + cut_bin * width
                                               + width - 1)
        sub = _range_filter(sub, score, b_lo, b_hi)
        cnt_bin = int(sums[cut_bin, 1])
        if cnt_bin <= resolve_limit:
            rows = sub.select_columns(list(dict.fromkeys((score, tokens, key)))).to_pandas()
            rows = rows.sort_values([score, key], ascending=[False, True])
            csum = rows[tokens].to_numpy(np.int64).cumsum()
            kept = rows[csum <= remaining]
            if kept.empty:  # not even the bin's best row fits
                return _keep(ds, score, key, b_hi, None)
            return _keep(ds, score, key, int(kept[score].iloc[-1]),
                         int(kept[key].iloc[-1]))
        if width == 1:
            # one tied score value, still > resolve_limit rows: order
            # inside it is key ASC -> same loop over the key range
            return _tied_key(ds, sub, score, tokens, key, remaining,
                             b_lo, nbins, resolve_limit)
        lo, hi = b_lo, b_hi


def _tied_key(ds, sub, score, tokens, key, remaining, s_val, nbins,
              resolve_limit):
    from ray.data.aggregate import Max, Min

    rng = sub.aggregate(Min(key, alias_name="lo"),
                        Max(key, alias_name="hi"))
    lo, hi = int(rng["lo"]), int(rng["hi"])
    kmin = lo
    while True:
        width = max(1, (hi - lo + 1 + nbins - 1) // nbins)
        used = (hi - lo) // width + 1
        sums = _bin_sums(sub, key, tokens, lo, width, used)
        cut_bin = None
        for b in range(used):  # key ASC: lowest keys first
            tok = int(sums[b, 0])
            if tok <= remaining:
                remaining -= tok
                continue
            cut_bin = b
            break
        if cut_bin is None:  # the whole remaining key range fits
            return _keep(ds, score, key, s_val - 1, None) if lo == kmin \
                else _keep(ds, score, key, s_val, hi)
        b_lo, b_hi = lo + cut_bin * width, min(hi, lo + cut_bin * width
                                               + width - 1)
        sub = _range_filter(sub, key, b_lo, b_hi)
        if int(sums[cut_bin, 1]) <= resolve_limit:
            rows = sub.select_columns(list(dict.fromkeys((tokens, key)))).to_pandas()
            rows = rows.sort_values(key)
            csum = rows[tokens].to_numpy(np.int64).cumsum()
            kept = rows[csum <= remaining]
            if not kept.empty:
                return _keep(ds, score, key, s_val, int(kept[key].iloc[-1]))
            if b_lo - 1 >= kmin:  # keys before the bin were kept
                return _keep(ds, score, key, s_val, b_lo - 1)
            return _keep(ds, score, key, s_val, None)  # nothing tied fits
        lo, hi = b_lo, b_hi
