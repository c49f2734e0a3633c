"""Sinks — the libbeat outputs layer as a fan-out writer registry.

Models outputs/outputs.go + the selector-driven routing (§2.7): the
router has already computed the ``sink`` column; this module writes each
sink in its configured format.

Single-pass design: the routed stream is written ONCE as
hive-partitioned Parquet (``sink=<name>/``) — the upstream pipeline is
never re-executed per sink. Non-Parquet sink formats (ndjson = the
fileout/logstash analogue, csv) are then converted by streaming ONLY
that sink's partition back through a cheap reader — proportional to the
sink's own data, not the input.

Per-sink knobs mirror the reference's output configs:
``max_rows_per_file`` ≈ fileout ``rotate_every_kb`` rotation
(fileout/config.go:30-44), doc-id dedup before write ≈ the ES ``_id``
duplicate-create path (elasticsearch/client.go:495-516).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow.parquet as pq

SINK_FORMATS = ("parquet", "ndjson", "csv", "console", "discard")


def write_routed(
    routed_ds,
    out_dir: str,
    sinks: dict[str, dict] | None = None,
    partition_cols: list[str] | None = None,
) -> dict:
    """Write the routed stream; returns per-sink metrics
    {sink: {rows, files, format}} (the observable contract of the
    pipeline metrics observer, outputs/metrics.go:32-99)."""
    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    sinks = sinks or {}
    partition_cols = partition_cols or ["sink"]
    routed_ds.write_parquet(str(out), partition_cols=partition_cols)

    metrics: dict[str, dict] = {}
    for sink_dir in sorted(out.glob("sink=*")):
        name = sink_dir.name.split("=", 1)[1]
        cfg = sinks.get(name, {})
        fmt = cfg.get("format", "parquet")
        # one directory walk serves rows AND file count (footer
        # metadata was previously read twice and the tree walked three
        # times per sink)
        files = sorted(sink_dir.rglob("*.parquet"))
        rows = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
        n_files = len(files)
        if fmt in ("ndjson", "csv"):
            n_files = _convert_sink(sink_dir, fmt, cfg, rows=rows)
        elif fmt == "console":
            _console_sink(sink_dir, cfg)
        elif fmt == "discard":
            shutil.rmtree(sink_dir)
            n_files = 0
        metrics[name] = {"rows": rows, "files": n_files, "format": fmt}
    return metrics


def _convert_sink(sink_dir: Path, fmt: str, cfg: dict,
                  rows: int | None = None) -> int:
    """Stream one sink's parquet partition into ndjson/csv files —
    reads only this sink's data (no upstream re-execution).
    ``rows``: precomputed row count (write_routed already read the
    footers — don't read them again)."""
    import ray.data as rd

    files = sorted(str(p) for p in sink_dir.rglob("*.parquet"))
    if not files:
        return 0
    ds = rd.read_parquet(files)
    conv_dir = sink_dir / f"_{fmt}"
    max_rows = cfg.get("max_rows_per_file")
    if max_rows:
        # rotation cap (fileout rotate_every_kb analogue): Ray's json/csv
        # writers have no max-rows knob, so split into enough blocks that
        # each output file stays under the cap (one file per block)
        if rows is None:
            rows = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
        ds = ds.repartition(max(1, -(-rows // max_rows)))
    if fmt == "ndjson":
        ds.write_json(str(conv_dir))
    else:
        ds.write_csv(str(conv_dir))
    for p in files:
        Path(p).unlink()
    return len(list(conv_dir.iterdir()))


def _console_sink(sink_dir: Path, cfg: dict) -> None:
    """Console output (outputs/console) — prints a bounded sample."""
    limit = cfg.get("limit", 5)
    shown = 0
    for p in sorted(sink_dir.rglob("*.parquet")):
        # stream row-group batches: never load a whole file onto the
        # driver to print a handful of rows
        pf = pq.ParquetFile(p)
        for batch in pf.iter_batches(batch_size=max(limit - shown, 1)):
            for row in batch.slice(0, limit - shown).to_pylist():
                print(row)
                shown += 1
            if shown >= limit:
                break
        if shown >= limit:
            break


def dead_letter_route(routed_ds, max_text_bytes: int | None = None,
                      required: tuple[str, ...] = (),
                      text_col: str = "text",
                      dead_sink: str = "dead_letter"):
    """ES dead-letter-index semantics (outputs/elasticsearch/
    dead_letter_index.go): documents the sink REJECTS (size cap /
    missing required field ≈ mapping error) re-route to the dead-letter
    sink with the failure reason and the original target preserved —
    the event itself is never dropped. Vectorized validation per batch;
    size is measured in BYTES (strlen/binary_length — the bulk-request
    cap is a byte budget, not a codepoint count)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def route(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            # empty blocks are routine (filters/anti-joins upstream);
            # typed empties keep the schema stable — pa.array([]) is
            # null-typed and crashes pc.invert
            return t.append_column(
                "dead_letter.reason", pa.nulls(0, pa.string())
            ).append_column(
                "dead_letter.original_sink", pa.nulls(0, pa.string())
            )
        bad = pa.array([False] * n)
        reason = pa.nulls(n, pa.string())
        # reason precedence: missing required field, then size cap —
        # checked in that order so the first matching reason wins
        for col in required:
            missing = (
                pc.is_null(t[col].combine_chunks())
                if col in t.column_names
                else pa.array([True] * n)
            )
            reason = pc.if_else(
                pc.and_(missing, pc.invert(bad)),
                pa.array([f"missing_field:{col}"] * n), reason,
            )
            bad = pc.or_(bad, missing)
        if max_text_bytes is not None and text_col in t.column_names:
            # a batch without the text column has nothing to size-check
            # (the required-field path above handles missing columns)
            text = pc.fill_null(t[text_col].combine_chunks(), "")
            over = pc.greater(pc.binary_length(text), max_text_bytes)
            reason = pc.if_else(
                pc.and_(over, pc.invert(bad)),
                pa.array(["doc_too_large"] * n), reason,
            )
            bad = pc.or_(bad, over)
        orig = t["sink"].combine_chunks()
        t = t.set_column(
            t.column_names.index("sink"), "sink",
            pc.if_else(bad, pa.array([dead_sink] * n), orig),
        )
        t = t.append_column(
            "dead_letter.reason", reason
        ).append_column(
            "dead_letter.original_sink",
            pc.if_else(bad, orig, pa.nulls(n, pa.string())),
        )
        return t

    return routed_ds.map_batches(route, batch_format="pyarrow")


def dedup_by_doc_id(routed_ds, id_col: str = "meta.doc_id", buckets: int = 32,
                    seen_state=None, emit_state: bool = False,
                    ts_col: str = "ts"):
    """Exact doc-id dedup before the sink write — the ES duplicate-create
    detection re-expressed (fingerprint → _id → create op counts
    ``duplicates``). Deterministic survivor: first by (conv_id,
    turn_idx) order within the id group.

    Streaming continuity: ``seen_state`` carries ids already written by
    previous event-time segments — their rows drop entirely (the ES
    index already holds the doc, so `create` rejects them). It is either
    a pandas DataFrame [id_col, last_us] (small state: broadcast set,
    no extra shuffle) or a ray Dataset with the same columns — the
    SCALE path: the seen-id set is corpus-proportional (distinct ids
    within the TTL horizon), so it anti-joins distributed
    (``bucket_semi_join``) and never lands on the driver.
    ``emit_state=True`` returns THIS segment's new state rows (id,
    first-seen event time in µs) instead of the rows; the caller merges
    them with the carried state and applies its TTL/GC horizon (the
    streaming runner does both)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray as _ray

    from .dataops.agg import map_buckets
    from .dataops.joins import _arrow_types, _resolve_ref, bucket_semi_join

    # emit_state="both": survivors AND this segment's new state rows in
    # one pass (state rows flagged ``_dd_state``, typed null padding) —
    # halves the streaming runner's per-window dedup executions
    emit_both = emit_state == "both"
    both_types = _arrow_types(routed_ds) if emit_both else None
    seen_ref = None
    if seen_state is not None:
        if isinstance(seen_state, pd.DataFrame):
            if len(seen_state):
                seen_ref = _ray.put(set(seen_state[id_col].tolist()))
        else:  # Dataset state: distributed anti join, ids stay sharded
            routed_ds = bucket_semi_join(
                routed_ds, seen_state.select_columns([id_col]),
                on=id_col, anti=True, buckets=buckets,
            )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        if seen_ref is not None:
            seen = _resolve_ref(seen_ref)
            g = g[~g[id_col].isin(seen)]
        # STABLE sort (mergesort) + ts tie-breaker: the deterministic-
        # survivor guarantee must not depend on post-shuffle row order
        # when (conv_id, turn_idx) tie or are absent (default quicksort
        # left ties in run-dependent order — rerun-vs-oracle flake)
        sort_cols = [
            c for c in ("conv_id", "turn_idx", ts_col) if c in g.columns
        ]
        g = g.sort_values(sort_cols or [id_col], kind="mergesort")
        g = g.drop_duplicates(id_col, keep="first")
        if not emit_state:
            return g
        if ts_col in g.columns:
            last_us = (
                g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
            )
        else:  # no event-time column: state carries a zero timestamp
            last_us = np.zeros(len(g), dtype="int64")
        if not emit_both:
            return pd.DataFrame({id_col: g[id_col].to_numpy(),
                                 "last_us": last_us})
        # "both": survivors + state rows in one typed Arrow table.
        # Survivors ARE the new-id rows (one per id, first occurrence),
        # so the state part mirrors them with only (id, last_us) set.
        from .dataops.joins import pack_rows_state

        state_df = pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "last_us": last_us}
        )
        return pack_rows_state(
            g, state_df, both_types, id_col, ["last_us"], "_dd_state"
        )

    return map_buckets(routed_ds, id_col, keep_first, buckets=buckets)


def dd_split(both, id_col: str):
    """Split a ``dedup_by_doc_id(..., emit_state="both")`` output into
    (survivor-rows Dataset, state Dataset)."""
    from .dataops.joins import split_rows_state

    return split_rows_state(both, id_col, ["last_us"], "_dd_state")
