"""Micro-batch streaming mode — the reference's continuous operation
re-expressed.

Filebeat never stops: harvesters tail files, the registrar checkpoints
offsets, pipeline metrics accumulate for the life of the process
(SURVEY §3.1). The batch-engine analogue is EVENT-TIME MICRO-BATCHES:
the corpus is processed window by window (``window_s`` of event time),
each window is a bounded flagship run with its own lineage record, and
run-length state (per-sink delivered totals — the pipeline observer,
outputs/metrics.go:32-99) lives in a singleton state ACTOR that
survives across windows. Ray Data has no watermarks (guide: streaming-
shaped workloads); ordered windows + an actor for cross-window state is
the idiomatic shape.

Scale note: each window run filters the input by ts; at production
scale the corpus is ts-partitioned (dt=.../hour=...) so a window's read
prunes to its own files instead of scanning everything — the filter is
then a no-op guard. (The bench corpus is conv-hash-partitioned, so the
scan-and-filter path is what gets exercised here.)

Restart/resume: completed windows are recorded like partitions
(state/lineage pattern); a resumed run replays only missing windows and
rebuilds the counters from lineage — at-least-once, effectively-once.

Config ``stages:`` (keyed rate limit / token bucket / dedup) run per
WINDOW in this mode: keyed state resets at window boundaries. That is
exact whenever the window length is at least the stage's state horizon
(rate-limit window, bucket refill time); batch mode (CheckpointRunner)
replays the whole stream, so its stage state is global. Cross-window
carried state would need the StreamState-actor pattern extended to
per-key snapshots — documented trade-off, not silent.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import timezone
from pathlib import Path

import pyarrow.compute as pc

import ray


@ray.remote
class StreamState:
    """Run-length counters (per-sink delivered totals + window log).
    One instance per streaming job — the metrics-observer/registrar
    singleton; updates arrive as per-window partial dicts."""

    def __init__(self):
        self.per_sink: dict[str, int] = {}
        self.windows_done: list[int] = []

    def add_window(self, window_id: int, sink_counts: dict[str, int]) -> None:
        for sink, n in sink_counts.items():
            self.per_sink[sink] = self.per_sink.get(sink, 0) + int(n)
        self.windows_done.append(window_id)

    def totals(self) -> dict:
        return {
            "rows_routed": dict(sorted(self.per_sink.items())),
            "windows_done": sorted(self.windows_done),
        }


class MicroBatchRunner:
    """Process transcript files as ordered event-time windows."""

    def __init__(self, out_dir: str, window_s: int = 3600):
        self.out_dir = Path(out_dir)
        self.window_s = window_s
        self.lineage_dir = self.out_dir / "_stream_lineage"
        self.lineage_dir.mkdir(parents=True, exist_ok=True)

    def _done_windows(self) -> dict[int, dict]:
        done = {}
        for f in sorted(self.lineage_dir.glob("window-*.json")):
            rec = json.loads(f.read_text())
            done[rec["window_id"]] = rec
        return done

    def run(self, input_files: list[str], config: dict | None = None) -> dict:
        import ray.data as rd

        from .pipeline import build_dataset

        # window bounds from parquet ROW-GROUP STATISTICS — metadata
        # only, no column scan (a 100 TB corpus must not be read on the
        # driver just to find its time range). Per-FILE ranges are kept
        # so each window reads only the files whose ts range overlaps it
        # (the same pruning a dt=/hour= partitioned layout gives free).
        import pyarrow.parquet as pq

        def _stat_us(dt) -> int:
            # parquet stats decode to tz-NAIVE datetimes; .timestamp()
            # would interpret them in the HOST's local timezone and
            # shift every window bound by the UTC offset — treat as UTC,
            # matching the pc.min(...).value (epoch micros) fallback
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1_000_000)

        file_ranges: list[tuple[str, int, int]] = []
        for f in input_files:
            pf = pq.ParquetFile(f)
            ts_idx = pf.schema_arrow.names.index("ts")
            f_lo = f_hi = None
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(ts_idx).statistics
                if st is None or not st.has_min_max:
                    # stats missing → ONE fallback scan of this file's ts
                    # column covers every row group; stop looping
                    t = pq.read_table(f, columns=["ts"])
                    mn, mx = pc.min(t["ts"]).value, pc.max(t["ts"]).value
                    f_lo = mn if f_lo is None else min(f_lo, mn)
                    f_hi = mx if f_hi is None else max(f_hi, mx)
                    break
                mn, mx = _stat_us(st.min), _stat_us(st.max)
                f_lo = mn if f_lo is None else min(f_lo, mn)
                f_hi = mx if f_hi is None else max(f_hi, mx)
            if f_lo is not None:
                file_ranges.append((f, f_lo, f_hi))
        lo = min(r[1] for r in file_ranges)
        hi = max(r[2] for r in file_ranges)
        w_us = self.window_s * 1_000_000
        first_w, last_w = lo // w_us, hi // w_us

        state = StreamState.remote()
        done = self._done_windows()
        # resume: rebuild counters from completed-window lineage
        for rec in done.values():
            state.add_window.remote(rec["window_id"], rec["sink_counts"])

        # cross-window carried state for token_bucket stages: the
        # reference's bucket map survives across batches; here each
        # window seeds from the previous window's persisted per-key
        # state (GC'd to in-flight keys) so a bucket never resets at a
        # window boundary. State replays on the RAW windowed input
        # after any PRECEDING stages (parse/enrich don't drop rows or
        # touch the key/ts/order columns, so the row set matches the
        # in-pipeline stage's input exactly).
        import pandas as pd

        from .dataops.flows import token_bucket_limit
        from .pipeline import apply_stages, token_bucket_stage_kwargs

        stages_cfg = (config or {}).get("stages", [])
        tb_idx = [
            i for i, s in enumerate(stages_cfg)
            if isinstance(s, dict) and next(iter(s)) == "token_bucket"
        ]
        tb_state: dict[int, pd.DataFrame] = {}
        if tb_idx and done:
            last_done = max(done)
            for i in tb_idx:
                f = self.lineage_dir / f"state-w{last_done}-s{i}.parquet"
                if f.exists():
                    tb_state[i] = pq.read_table(f).to_pandas()

        for w in range(first_w, last_w + 1):
            if w in done:
                continue
            lo_ts, hi_ts = w * w_us, (w + 1) * w_us
            # file-level ts pruning: only files whose [min,max] range
            # overlaps this window are read at all (row-group stats
            # already collected above — no extra IO)
            win_files = [
                f for f, f_lo, f_hi in file_ranges
                if f_lo < hi_ts and f_hi >= lo_ts
            ]
            if not win_files:
                continue
            ds = rd.read_parquet(win_files)
            ds = ds.map_batches(
                lambda t, lo_ts=lo_ts, hi_ts=hi_ts: t.filter(
                    pc.and_(
                        pc.greater_equal(pc.cast(t["ts"], "int64"), lo_ts),
                        pc.less(pc.cast(t["ts"], "int64"), hi_ts),
                    )
                ),
                batch_format="pyarrow",
            )
            routed = build_dataset(
                ds, config, num_parts=len(win_files), stage_state=tb_state
            )
            win_dir = self.out_dir / f"window={w}"
            # idempotent re-run: a window that wrote output but never
            # committed its lineage (crash in between) must be wiped,
            # or append-mode write_parquet would duplicate its rows
            if win_dir.exists():
                shutil.rmtree(win_dir)
            routed.write_parquet(str(win_dir), partition_cols=["sink"])
            # advance + persist carried token-bucket state BEFORE the
            # window's lineage commit (resume reloads it atomically
            # with the window)
            if tb_idx:
                import pyarrow as _pa

                prev_ds = ds
                next_state: dict[int, pd.DataFrame] = {}
                for i, spec in enumerate(stages_cfg):
                    (name, cfg_i), = spec.items()
                    if name == "token_bucket":
                        kw = token_bucket_stage_kwargs(cfg_i or {})
                        st = token_bucket_limit(
                            prev_ds, initial_state=tb_state.get(i),
                            emit_state=True, **kw,
                        ).to_pandas()
                        next_state[i] = st
                        tmp_f = self.lineage_dir / f".state-w{w}-s{i}.tmp"
                        pq.write_table(
                            _pa.Table.from_pandas(st, preserve_index=False),
                            tmp_f,
                        )
                        os.replace(
                            tmp_f,
                            self.lineage_dir / f"state-w{w}-s{i}.parquet",
                        )
                    if i + 1 <= max(tb_idx):
                        prev_ds = apply_stages(
                            prev_ds, [spec], stage_state={0: tb_state.get(i)}
                            if name == "token_bucket" and i in tb_state
                            else None,
                        )
                tb_state.update(next_state)
            from .state.lineage import _sink_rows

            counts = _sink_rows(win_dir)
            ray.get(state.add_window.remote(w, counts))
            tmp = self.lineage_dir / f".window-{w}.json.tmp"
            tmp.write_text(
                json.dumps(
                    {
                        "window_id": w,
                        "sink_counts": counts,
                        # observable pruning record: which files this
                        # window actually read (tests assert on it)
                        "files_read": sorted(win_files),
                    },
                    sort_keys=True,
                )
            )
            os.replace(tmp, self.lineage_dir / f"window-{w}.json")

        return ray.get(state.totals.remote())
