"""Multiline join — physical lines → logical events.

Models the reference's multiline parser (libbeat/reader/multiline/;
modes pattern/count/while_pattern, multiline_config.go:28-45): ordered
lines within a stream key are merged into events by a
continuation-detection rule.

Ray-Data re-expression (SURVEY §2.2): the stream key is
``(conv_id, turn_idx)`` with lines ordered by ``line_idx``; merging is a
keyed stateful op run via the explicit hash-partition pattern
(dataops.agg.map_buckets — one vectorized pandas pass per bucket, no
cross-batch carry state). Cross-batch multiline state is avoided BY
CONSTRUCTION: a key's lines are co-located before merging, which is the
documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..dataops.agg import map_buckets


def explode_lines(ds, text_col: str = "text"):
    """Split each row's text into physical lines with an ordinal —
    models the harvester's line framing (readfile/encode.go line
    splitting) over an already-framed corpus. Vectorized: one
    split+flatten per batch, no per-row Python."""

    def split(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t[text_col].combine_chunks(), "")
        parts = pc.split_pattern(text, pattern="\n")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(t)), lens)
        out = {}
        for name in t.column_names:
            if name == text_col:
                continue
            out[name] = pc.take(t[name].combine_chunks(), pa.array(idx))
        lens_np = np.asarray(lens, dtype=np.int64)
        total = int(lens_np.sum()) if len(lens_np) else 0
        starts = np.cumsum(lens_np) - lens_np
        out["line_idx"] = pa.array(
            np.arange(total) - np.repeat(starts, lens_np), pa.int64()
        )
        # strip ONE trailing \r (the CRLF terminator's leftover half
        # after the \n split — readfile/line.go strips a single
        # terminator; a bare rtrim would also eat content CRs in
        # "data\r\r\n")
        out["line"] = pc.replace_substring_regex(
            pc.list_flatten(parts), pattern=r"\r$", replacement="",
            max_replacements=1,
        )
        return pa.table(out)

    return ds.map_batches(split, batch_format="pyarrow")


def _merge_events(g: "pd.DataFrame", key_cols, event_id,
                  line_col: str) -> "pd.DataFrame":
    """Shared event-merge for all three multiline modes: ``g`` is
    sorted by (key_cols, order), so (key, event_id) groups are
    CONTIGUOUS runs — boundaries come from factorize-code diffs (nulls
    compare EQUAL, like SQL GROUP BY; a NaN != NaN diff would split
    every null-key line into its own event) and the line join is ONE
    Arrow C++ kernel (``binary_join`` over a ListArray) instead of a
    Python lambda per event (millions of calls at scale)."""
    n = len(g)
    eid = np.asarray(event_id, dtype=np.int64)
    new_grp = np.zeros(n, dtype=bool)
    if n:
        new_grp[0] = True
        for c in key_cols:
            codes = pd.factorize(g[c], use_na_sentinel=True)[0]
            new_grp[1:] |= codes[1:] != codes[:-1]
        new_grp[1:] |= eid[1:] != eid[:-1]
    starts = np.flatnonzero(new_grp)
    offsets = np.append(starts, n).astype(np.int32)
    lines = pa.array(g[line_col].astype(str), pa.string())
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), lines),
        "\n",
    )
    out = pd.DataFrame({c: g[c].to_numpy()[starts] for c in key_cols})
    out["event_id"] = eid[starts]
    out["text"] = joined.to_pandas().to_numpy()
    out["n_lines"] = np.diff(offsets).astype("int64")
    return out


def multiline_merge(
    lines_ds,
    pattern: str = r"^\s",
    negate: bool = False,
    match: str = "after",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_col: str = "line_idx",
    line_col: str = "line",
    max_lines: int = 500,
    buckets: int = 32,
    flush_pattern: str | None = None,
):
    """Pattern-mode multiline join (multiline/pattern.go semantics):

    - ``match="after"``: a line matching the pattern (XOR ``negate``)
      is a CONTINUATION of the previous event.
    - ``match="before"``: a matching line belongs to the FOLLOWING
      event (the event ends at the match).
    - ``flush_pattern``: a line matching it TERMINATES the current
      event (inclusive) — the next line starts a new event regardless
      of continuation state (pattern.go flushPattern).
    - ``max_lines``: lines beyond the cap still merge but the event is
      flagged (reference truncates + flags; we keep text and flag so no
      data is lost — tag-and-keep).

    Output: one row per event with ``text`` = joined lines, ``n_lines``,
    ``event_id`` (ordinal within the key), ``truncated`` flag.
    """
    if match not in ("after", "before"):
        # fail at build time, not inside a remote task
        raise ValueError(f"unknown match mode {match!r}")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, order_col], kind="mergesort")
        m = g[line_col].astype(str).str.contains(pattern, regex=True, na=False)
        if negate:
            m = ~m
        if match == "after":
            is_start = ~m
        else:  # "before" (validated eagerly above)
            # a match means "this line is followed by more": event starts
            # on the line after a non-matching line
            prev_m = m.groupby(
                [g[c] for c in key_cols]
            ).shift(1)
            is_start = ~prev_m.fillna(False).astype(bool)
        # first line of every key always starts an event
        first_of_key = ~g.duplicated(subset=list(key_cols), keep="first") == True  # noqa: E712
        if flush_pattern is not None:
            fm = g[line_col].astype(str).str.contains(
                flush_pattern, regex=True, na=False
            )
            # pattern.go order: the flush check runs BEFORE the
            # continuation predicate and only while a buffer is OPEN —
            # a buffer-opening line (readFirst: first of key, or the
            # line after an effective flush) is loaded WITHOUT a flush
            # check. An effective-flush line JOINS the current event
            # (added, then finalized) even when the predicate would
            # have broken before it; the next line opens fresh. The
            # open/closed recurrence is sequential only across
            # CONSECUTIVE flush-matching lines, so the loop below
            # touches flush rows only.
            fm_np = fm.to_numpy()
            first_np = first_of_key.to_numpy()
            eff = np.zeros(len(g), dtype=bool)
            for i in np.flatnonzero(fm_np):
                eff[i] = not (first_np[i] or (i > 0 and eff[i - 1]))
            eff_s = pd.Series(eff, index=g.index)
            eff_prev = (
                eff_s.groupby([g[c] for c in key_cols]).shift(1)
                .fillna(False).astype(bool)
            )
            is_start = eff_prev | (is_start & ~eff_s)
        is_start = is_start | first_of_key
        event_id = (
            is_start.astype("int64").groupby([g[c] for c in key_cols]).cumsum() - 1
        )
        merged = _merge_events(g, key_cols, event_id, line_col)
        merged["truncated"] = merged["n_lines"] > max_lines
        return merged

    return map_buckets(lines_ds, key_cols[0], per_bucket, buckets=buckets)


def multiline_while(
    lines_ds,
    pattern: str,
    negate: bool = False,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_col: str = "line_idx",
    line_col: str = "line",
    buckets: int = 32,
):
    """while_pattern mode (reader/multiline/while.go): CONSECUTIVE
    matching lines merge into one event; every non-matching line is its
    own single-line event."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, order_col], kind="mergesort")
        m = g[line_col].astype(str).str.contains(pattern, regex=True, na=False)
        if negate:
            m = ~m
        prev_m = m.groupby([g[c] for c in key_cols]).shift(1).fillna(False)
        # new event at: any non-matching line, or a matching line whose
        # predecessor (within the key) did not match
        is_start = (~m) | (m & ~prev_m.astype(bool))
        first_of_key = ~g.duplicated(subset=list(key_cols), keep="first")
        is_start = is_start | first_of_key
        event_id = (
            is_start.astype("int64").groupby([g[c] for c in key_cols]).cumsum() - 1
        )
        return _merge_events(g, key_cols, event_id, line_col)

    return map_buckets(lines_ds, key_cols[0], per_bucket, buckets=buckets)


def multiline_count(lines_ds, count: int, key_cols=("conv_id", "turn_idx"),
                    order_col: str = "line_idx", line_col: str = "line",
                    buckets: int = 32):
    """Count-mode multiline (counter.go): every ``count`` lines form one
    event."""
    if count < 1:
        # fail at build time, not as a ZeroDivisionError in a remote task
        raise ValueError(f"multiline count must be >= 1, got {count}")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, order_col], kind="mergesort")
        ord_in_key = g.groupby([g[c] for c in key_cols]).cumcount()
        event_id = (ord_in_key // count).astype("int64")
        return _merge_events(g, key_cols, event_id, line_col)

    return map_buckets(lines_ds, key_cols[0], per_bucket, buckets=buckets)
