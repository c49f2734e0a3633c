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

Config ``stages:`` in this mode: the STATEFUL stages carry state
ACROSS windows — each window seeds from the previous window's
persisted state (written atomically with the window's lineage,
replayed on the same parse+enrich row set the in-pipeline stage saw)
— so streaming equals the single-batch replay; a backfilled
out-of-order window conservatively replays fresh (never seeded with
future state). Per stage:

- ``token_bucket``: per-key (tok, last_us), GC'd to in-flight keys
  exactly like the reference's bucket-map gc (full == fresh).
- ``dedup``: the seen-id set (id, first-seen µs) — the reference's
  ES-side create-dedup, which is cross-batch by nature (the index
  holds every written _id). An optional stage ``ttl_s`` bounds the
  carried set with window-granular expiry (an id expires at the first
  window boundary past first_seen + ttl); without it the state grows
  with distinct ids, exactly like the ES index does.
- ``rate_limit``: admitted counts for rate windows that SPAN the
  micro-batch boundary (key, win, cnt); fully-ended windows GC. Exact
  across boundaries when ``order_col`` order is consistent with
  micro-batch order within a key (event-ordered streams).
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
        state = StreamState.remote()
        done = self._done_windows()
        # resume: rebuild counters from completed-window lineage
        for rec in done.values():
            state.add_window.remote(rec["window_id"], rec["sink_counts"])

        if not file_ranges:
            # empty corpus / all-empty files: a quiet stream tick on a
            # not-yet-populated directory returns the resumed totals
            # instead of crashing min() on an empty sequence
            return ray.get(state.totals.remote())

        lo = min(r[1] for r in file_ranges)
        hi = max(r[2] for r in file_ranges)
        w_us = self.window_s * 1_000_000
        first_w, last_w = lo // w_us, hi // w_us

        # cross-window carried state for STATEFUL stages (token_bucket:
        # per-key bucket map; dedup: seen-id set — the reference's
        # bucket map / ES-side create-dedup survive across batches);
        # each window seeds from the IMMEDIATELY PREVIOUS window's
        # persisted state so the stage never resets at a window
        # boundary. The state replay runs on the PRE-STAGE composition
        # (parse+enrich, build_pre_stage) plus any preceding stages —
        # exactly the rows the in-pipeline stage saw, including the
        # effect of row-dropping processors.
        import pandas as pd

        from .dataops.flows import rate_limit, token_bucket_limit
        from .pipeline import (
            STATEFUL_STAGES,
            apply_stages,
            build_pre_stage,
            dedup_stage_kwargs,
            rate_limit_stage_kwargs,
            token_bucket_stage_kwargs,
        )
        from .sinks import dedup_by_doc_id

        stages_cfg = (config or {}).get("stages", [])
        # validate the FULL stage list eagerly (checks.go behaviour):
        # the stateful window path applies stages itself with
        # skip_stages=True, so apply_stages' own validation never runs
        # — without this a malformed entry would silently drop every
        # stage after it instead of raising
        from .pipeline import STAGE_REGISTRY

        for s in stages_cfg:
            if not isinstance(s, dict) or len(s) != 1:
                raise ValueError(
                    f"stage spec must be a single-key mapping like "
                    f"'- rate_limit: {{k: 3}}', got: {s!r}"
                )
            sname = next(iter(s))
            if sname not in STAGE_REGISTRY:
                raise ValueError(
                    f"unknown stage {sname!r}; available: "
                    f"{sorted(STAGE_REGISTRY)}"
                )
        stage_names = [next(iter(s)) for s in stages_cfg]
        tb_idx = [
            i for i, n in enumerate(stage_names) if n in STATEFUL_STAGES
        ]
        tb_state: dict[int, pd.DataFrame] = {}
        state_from: int | None = None  # window whose END state tb_state is

        def _dedup_gc(ds, cfg_i: dict, hi_ts: int):
            # TTL horizon (window-granular: an id expires at the first
            # window BOUNDARY past last_us + ttl); no ttl ⇒ the state is
            # the reference's unbounded ES-side create-dedup. Dataset
            # filter — the seen-id state is corpus-proportional and
            # never lands on the driver.
            ttl_s = cfg_i.get("ttl_s")
            if ttl_s is None or ds is None:
                return ds
            cut = int(ttl_s) * 1_000_000
            return ds.map_batches(
                lambda df, cut=cut, hi=hi_ts: df[df["last_us"] + cut > hi],
                batch_format="pandas",
            )

        def _persist_state_ds(ds, w: int, i: int):
            """Write a carried-state Dataset (dedup: (id, last_us);
            token_bucket: (key, tok, last_us)) as the window's state
            DIRECTORY — a distributed many-shard write; the rename is
            the commit. Crash-safe swap: any previous attempt's dir is
            renamed ASIDE (not deleted) before the new dir moves into
            place, so a crash between the two steps leaves the aside
            copy for ``_load_state`` to fall back on — never a silent
            loss that would re-admit already-written duplicates."""
            tmp = self.lineage_dir / f".state-w{w}-s{i}.tmpdir"
            final = self.lineage_dir / f"state-w{w}-s{i}"
            aside = self.lineage_dir / f"state-w{w}-s{i}-old"
            shutil.rmtree(tmp, ignore_errors=True)
            # coalesce to ~128 MB shards before writing: the state
            # pipeline's shuffles leave ~buckets tiny blocks, the next
            # window reads them as that many micro-blocks, and its
            # joins inherit the fragmentation — per-window overhead
            # then grows with the chain instead of staying flat
            ds = ds.materialize()
            size_mb = (ds.size_bytes() or 0) / 1e6
            target = max(1, int(size_mb // 128) + 1)
            try:
                frag = ds.num_blocks() > 2 * target
            except (AttributeError, ValueError):
                frag = False
            if frag:
                ds = ds.repartition(target, shuffle=False)
            ds.write_parquet(str(tmp))
            # an all-expired (empty) state writes no files — possibly
            # not even the directory; an empty/missing state dir reads
            # as fresh, which for dedup is exactly right
            tmp.mkdir(exist_ok=True)
            # commit marker: lets the loader tell "committed EMPTY
            # state" apart from "crashed before commit" — without it a
            # crash after the final rename but before the aside cleanup
            # made an empty committed dir fall back to the STALE aside
            # copy (re-dropping rows whose dedup ids had TTL-expired)
            (tmp / "_COMMITTED").touch()
            shutil.rmtree(aside, ignore_errors=True)
            if final.is_dir():
                os.rename(final, aside)
            os.rename(tmp, final)
            shutil.rmtree(aside, ignore_errors=True)
            # read the PERSISTED copy back (lazy): keeping the in-memory
            # lineage would re-execute the merge chain every next window
            return rd.read_parquet(str(final)) if any(
                Path(final).glob("*.parquet")
            ) else None

        def _gc_state_dirs(w: int):
            """Drop state for windows < w-1: ``_load_state`` only ever
            seeds from the immediately previous window, so older state
            can never be read again (a deeper backfill replays fresh by
            design) — without this an endless stream accumulates one
            state dir per window per stage forever."""
            import re

            pat = re.compile(r"^state-w(-?\d+)-s\d+")
            for p in self.lineage_dir.iterdir():
                m = pat.match(p.name)
                if m is None or int(m.group(1)) >= w - 1:
                    continue
                if p.is_dir():
                    shutil.rmtree(p, ignore_errors=True)
                else:  # legacy single-file .parquet state
                    p.unlink(missing_ok=True)

        def _load_state(prev_w: int):
            out: dict[int, object] = {}
            for i in tb_idx:
                d = self.lineage_dir / f"state-w{prev_w}-s{i}"
                aside = self.lineage_dir / f"state-w{prev_w}-s{i}-old"
                f = self.lineage_dir / f"state-w{prev_w}-s{i}.parquet"
                committed = d.is_dir() and (
                    (d / "_COMMITTED").exists() or any(d.glob("*.parquet"))
                )
                if not committed:
                    # crash fell between the persist swap's two renames:
                    # the aside copy is the last committed state. (A
                    # committed-but-EMPTY dir carries the _COMMITTED
                    # marker and must NOT fall back — it legitimately
                    # means "all state expired".)
                    if aside.is_dir() and any(aside.glob("*.parquet")):
                        d = aside
                if d.is_dir() and any(d.glob("*.parquet")):
                    out[i] = rd.read_parquet(str(d))  # state Dataset
                elif f.exists():
                    # legacy single-file token-bucket state
                    out[i] = pq.read_table(f).to_pandas()
            return out

        def _as_state_ds(st):
            """Normalize carried state to a Dataset (legacy single-file
            states load as DataFrames) so every stage takes the
            distributed seed path; empty state reads as fresh."""
            if st is None or not isinstance(st, pd.DataFrame):
                return st
            return rd.from_pandas(st) if len(st) else None

        import time as _time

        for w in range(first_w, last_w + 1):
            if w in done:
                continue
            w_t0 = _time.perf_counter()
            if tb_idx and state_from != w - 1:
                # not a sequential continuation (resume gap or a
                # BACKFILLED window): seed only from window w-1's
                # persisted state file — NEVER from a later window,
                # whose future timestamps would produce negative
                # refills. A backfilled window with no w-1 state
                # replays fresh (conservative; later windows are not
                # recomputed).
                tb_state = _load_state(w - 1)
                state_from = w - 1 if tb_state else None
            lo_ts, hi_ts = w * w_us, (w + 1) * w_us
            # file-level ts pruning: only files whose [min,max] range
            # overlaps this window are read at all (row-group stats
            # already collected above — no extra IO)
            win_files = [
                f for f, f_lo, f_hi in file_ranges
                if f_lo < hi_ts and f_hi >= lo_ts
            ]
            if not win_files:
                # a QUIET window: carried bucket state rolls forward
                # (GC: keys fully refilled by the window end drop) and
                # is persisted — even when empty — so the per-window
                # state-file chain stays unbroken for resume
                if tb_idx:
                    rolled: dict[int, object] = {}
                    for i in tb_idx:
                        (name, cfg_i), = stages_cfg[i].items()
                        st = _as_state_ds(tb_state.get(i))
                        if st is None:
                            # empty state == fresh: nothing to roll,
                            # and a missing state dir reads as fresh
                            continue
                        if name == "dedup":
                            st = _dedup_gc(st, cfg_i or {}, hi_ts)
                        elif name == "rate_limit":
                            # drop rate windows that END before the
                            # quiet window's end — they can never
                            # receive another event
                            rkw = rate_limit_stage_kwargs(cfg_i or {})
                            wu = rkw["window_s"] * 1_000_000
                            st = st.map_batches(
                                lambda df, wu=wu, hi=hi_ts: df[
                                    (df["win"] + 1) * wu > hi
                                ],
                                batch_format="pandas",
                            )
                        else:
                            # token_bucket: drop keys whose bucket will
                            # have fully refilled by the window end
                            # (reference gc: full == fresh) — a
                            # vectorized Dataset filter, nothing on the
                            # driver
                            kw = token_bucket_stage_kwargs(cfg_i or {})
                            unit = kw["per_s"] * 1_000_000
                            cap = (kw["burst"] if kw["burst"] is not None
                                   else kw["limit_n"]) * unit
                            ln = kw["limit_n"]
                            st = st.map_batches(
                                lambda df, cap=cap, ln=ln, hi=hi_ts: df[
                                    df["tok"] + ln * (hi - df["last_us"]) < cap
                                ],
                                batch_format="pandas",
                            )
                        st = _persist_state_ds(st, w, i)
                        if st is not None:
                            rolled[i] = st
                    tb_state = rolled
                    state_from = w
                    _gc_state_dirs(w)
                continue
            # size the read's block count from the window's actual bytes
            # (~128 MB targets): Ray's default parallelism splits a tiny
            # window into ~2×CPUs micro-blocks and every downstream
            # stage then pays per-block scheduling ∝ blocks × buckets
            # (measured 4.5 s → 0.6 s parse+enrich on a 2k-row window)
            total_mb = sum(os.path.getsize(f) for f in win_files) / 1e6
            n_blocks = max(len(win_files), int(total_mb // 128) + 1)
            ds = rd.read_parquet(win_files, override_num_blocks=n_blocks)
            ds = ds.map_batches(
                lambda t, lo_ts=lo_ts, hi_ts=hi_ts: t.filter(
                    pc.and_(
                        pc.greater_equal(pc.cast(t["ts"], "int64"), lo_ts),
                        pc.less(pc.cast(t["ts"], "int64"), hi_ts),
                    )
                ),
                batch_format="pyarrow",
            )
            # ONE parse+enrich execution AND one execution per stateful
            # stage per window: each stateful stage runs in
            # ``emit_state="both"`` mode — allowed rows and final state
            # come out of the SAME pass (state rows flagged in-band),
            # the materialized output is split by two cheap filters, the
            # rows feed the next stage / routing and the state persists.
            # The previous design ran every stateful stage twice (once
            # in-pipeline for rows, once as a replay for state) —
            # measured ~2× the per-window wall at micro-batch sizes.
            pre_ds = build_pre_stage(ds, config)
            if tb_idx:
                from .dataops.flows import tb_split
                from .sinks import dd_split

                cur = pre_ds.materialize()
                next_state: dict[int, object] = {}
                for i, spec in enumerate(stages_cfg):
                    (name, cfg_i), = spec.items()  # validated at run start
                    if name == "dedup":
                        dkw = dedup_stage_kwargs(cfg_i or {})
                        prev_st = _as_state_ds(tb_state.get(i))
                        both = dedup_by_doc_id(
                            cur, seen_state=prev_st,
                            emit_state="both", **dkw,
                        ).materialize()
                        cur, seg = dd_split(both, dkw["id_col"])
                        # seg = this window's NEW ids (carried ids'
                        # rows were dropped before the survivor pass);
                        # everything stays distributed — the seen-id
                        # state is corpus-proportional
                        st = seg if prev_st is None else prev_st.union(seg)
                        st = _dedup_gc(st, cfg_i or {}, hi_ts)
                        st = _persist_state_ds(st, w, i)
                        if st is not None:
                            next_state[i] = st
                    elif name == "token_bucket":
                        # fully distributed carry: seeds bucket-join
                        # onto the pass, quiet keys roll forward inside
                        # the buckets, GC at the window-end horizon —
                        # nothing key-proportional lands on the driver
                        kw = token_bucket_stage_kwargs(cfg_i or {})
                        both = token_bucket_limit(
                            cur,
                            initial_state=_as_state_ds(tb_state.get(i)),
                            emit_state="both", gc_horizon_us=hi_ts, **kw,
                        ).materialize()
                        cur, seg = tb_split(both, kw["key"])
                        st = _persist_state_ds(seg, w, i)
                        if st is not None:
                            next_state[i] = st
                    elif name == "rate_limit":
                        # boundary-spanning (key, rate-window) admitted
                        # counts carry forward; fully-ended windows GC
                        from .dataops.flows import rl_split

                        rkw = rate_limit_stage_kwargs(cfg_i or {})
                        both = rate_limit(
                            cur,
                            initial_state=_as_state_ds(tb_state.get(i)),
                            emit_state="both", gc_horizon_us=hi_ts, **rkw,
                        ).materialize()
                        cur, seg = rl_split(both, rkw["key_col"])
                        st = _persist_state_ds(seg, w, i)
                        if st is not None:
                            next_state[i] = st
                    else:
                        cur = apply_stages(cur, [spec])
                routed = build_dataset(
                    cur, config, num_parts=len(win_files),
                    pre_staged=True, skip_stages=True,
                )
            else:
                routed = build_dataset(
                    pre_ds, config, num_parts=len(win_files),
                    pre_staged=True,
                )
            win_dir = self.out_dir / f"window={w}"
            # idempotent re-run: a window that wrote output but never
            # committed its lineage (crash in between) must be wiped,
            # or append-mode write_parquet would duplicate its rows
            if win_dir.exists():
                shutil.rmtree(win_dir)
            routed.write_parquet(str(win_dir), partition_cols=["sink"])
            if tb_idx:
                tb_state = next_state
                state_from = w
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
                        # per-window wall: the long-chain probe asserts
                        # this stays flat across 100 windows
                        "wall_s": round(_time.perf_counter() - w_t0, 3),
                    },
                    sort_keys=True,
                )
            )
            os.replace(tmp, self.lineage_dir / f"window-{w}.json")
            if tb_idx:
                _gc_state_dirs(w)

        return ray.get(state.totals.remote())
