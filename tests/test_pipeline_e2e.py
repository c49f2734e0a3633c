"""End-to-end flagship pipeline tests (SURVEY §5 plan items c+d):
deterministic corpus → parse→enrich→route → assert per-sink counts,
routed-row sets, per-turn text equality under (conv_id, turn_idx) sort —
all against an INDEPENDENT pure-pandas oracle — plus the kill/resume
effectively-once test."""

import glob
import json
import re

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from beats_ray.pipeline import build_dataset
from beats_ray.state import CheckpointRunner


# ---------- independent oracle (pure pandas, no engine code) ----------

DISSECT_RE = re.compile(
    r'^level=(?P<level>.*?) ts=(?P<ts>.*?) tool=(?P<tool>.*?)'
    r' status=(?P<status>.*?) msg="(?P<msg>.*?)"'
)
SYSLOG_RE = re.compile(r"^<(\d{1,3})>")


def oracle(df: pd.DataFrame) -> pd.DataFrame:
    def parse_row(text: str):
        kind, event, err = "none", None, None
        if DISSECT_RE.match(text):
            kind = "dissect"
        else:
            looks_json = text[:1] in "{["
            obj = None
            if looks_json:
                try:
                    obj = json.loads(text)
                    if not isinstance(obj, dict):
                        obj, err = None, "failed to decode json"
                except json.JSONDecodeError:
                    err = "failed to decode json"
            if obj is not None:
                kind, event = "ndjson", obj.get("event")
            elif SYSLOG_RE.match(text):
                kind = "syslog"
            elif text.startswith("Exception in thread "):
                kind = "multiline"
            else:
                kind = "none"
                if err is None:
                    err = "no parser matched"
        return kind, event, err

    parsed = df["text"].map(parse_row)
    df = df.assign(
        kind=parsed.map(lambda t: t[0]),
        event=parsed.map(lambda t: t[1]),
        err=parsed.map(lambda t: t[2]),
    )
    err_route = df["text"].str.contains(r"level=error|<\d+>", regex=True)
    sink = pd.Series("default", index=df.index)
    m = ~err_route & (df["event"] == "tool_call")
    sink[m] = "tool_events"
    m2 = ~err_route & (df["event"] != "tool_call").fillna(True) & (
        df["role"] == "assistant"
    ) & df["err"].isna()
    sink[m2] = "assistant"
    sink[err_route] = "errors"
    return df.assign(sink=sink)


@pytest.fixture(scope="module")
def routed(sf0001_dir):
    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))
    ds = rd.read_parquet(files)
    out = build_dataset(ds, num_parts=8, enrich_concurrency=(1, 2)).to_pandas()
    golden = oracle(
        pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    )
    return out, golden


def test_per_sink_counts_match_oracle(routed):
    out, golden = routed
    got = out.groupby("sink").size().to_dict()
    want = golden.groupby("sink").size().to_dict()
    assert got == want


def test_routed_row_sets_match_oracle(routed):
    out, golden = routed
    for sink in ["errors", "tool_events", "assistant", "default"]:
        got = set(
            map(tuple, out.loc[out["sink"] == sink, ["conv_id", "turn_idx"]].values)
        )
        want = set(
            map(
                tuple,
                golden.loc[golden["sink"] == sink, ["conv_id", "turn_idx"]].values,
            )
        )
        assert got == want, f"sink {sink}: row sets differ"


def test_text_equality_under_stable_sort(routed):
    out, golden = routed
    a = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = golden.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a["text"].equals(b["text"])
    assert len(a) == len(b)  # tag-and-keep: no silent row loss


def test_parse_kind_distribution(routed):
    out, golden = routed
    got = out.groupby("parsed.kind").size().to_dict()
    want = golden.groupby("kind").size().to_dict()
    assert got == want


def test_enrichment_joined(routed):
    out, _ = routed
    bash = out[out["tool"] == "bash"]
    assert (bash["tool_category"] == "shell").all()
    assert (bash["risk_level"] == "high").all()
    assert (out.loc[out["role"] == "assistant", "role_tag"] == "model").all()
    assert out["tool_category"].notna().all()


def test_error_rows_tagged_not_dropped(routed):
    out, golden = routed
    got_err = out["error.message"].notna().sum()
    want_err = golden["err"].notna().sum()
    assert got_err == want_err > 0


# ---------- checkpoint / resume (FIXTURES.md §7) ----------


def test_resume_effectively_once(sf0001_dir, tmp_path):
    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))

    # single-shot reference run
    ref = CheckpointRunner(str(tmp_path / "ref"))
    m_ref = ref.run(files)
    assert m_ref["partitions_done"] == len(files)
    assert m_ref["rows_in"] == m_ref["rows_out"]

    # run 1: only first 3 partitions get lineage
    cr = CheckpointRunner(str(tmp_path / "out"))
    cr.run(files[:3])
    # run 2: crash AFTER writing but BEFORE checkpointing the rest
    with pytest.raises(RuntimeError, match="simulated crash"):
        cr.run(files, fail_after_write=True)
    # run 3: resume — must clean incomplete partitions and finish
    m = cr.run(files)
    assert m["partitions_done"] == len(files)
    assert m["rows_routed"] == m_ref["rows_routed"]

    # re-run on complete state is a no-op (timing fields excluded)
    m2 = cr.run(files)
    drop = lambda d: {k: v for k, v in d.items() if k not in ("wall_s", "rows_per_sec")}
    assert drop(m2) == drop(m)

    # output rows = input rows exactly once
    total = 0
    for pf in (tmp_path / "out").rglob("*.parquet"):
        total += pq.ParquetFile(pf).metadata.num_rows
    assert total == m_ref["rows_in"]


def test_lineage_attempt_counter(sf0001_dir, tmp_path):
    """Attempts increment across crash/retry (registrar-style audit)."""
    import json as _json

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:2]
    cr = CheckpointRunner(str(tmp_path / "att"))
    with pytest.raises(RuntimeError):
        cr.run(files, fail_after_write=True)
    cr.run(files)
    rec = _json.loads((tmp_path / "att" / "_lineage" / "part-00000.json").read_text())
    assert rec["attempt"] == 2  # first try crashed, second succeeded


def test_task_failure_retry_at_least_once(sf0001_dir, tmp_path):
    """A transform that fails on its first attempt per block must be
    retried by Ray and the pipeline must still produce exactly the
    right rows (task-level at-least-once; partition-level handled by
    lineage)."""
    import os

    import pyarrow as pa

    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir, exist_ok=True)

    def flaky(t: pa.Table) -> pa.Table:
        first = t["conv_id"][0].as_py()
        tag = f"{first}-{t.num_rows}"
        marker = os.path.join(marker_dir, tag)
        if not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("x")
            raise RuntimeError(f"injected failure for block {tag}")
        return t

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:2]
    expect = rd.read_parquet(files).count()
    # Ray retries SYSTEM failures by default; transient USER exceptions
    # need retry_exceptions — the engine's pattern for flaky stages
    # (network lookups etc.), mirroring the reference's batch-retry TTL
    got = rd.read_parquet(files).map_batches(
        flaky, batch_format="pyarrow", batch_size=None,
        retry_exceptions=True,
    ).count()
    assert got == expect
    assert len(os.listdir(marker_dir)) > 0  # failures actually happened


def test_streaming_microbatch_equals_batch(sf0001_dir, tmp_path):
    """Micro-batch streaming totals must equal the single-shot batch
    counts; resume replays only missing windows."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.stream import MicroBatchRunner

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:3]

    batch_counts = {
        r["sink"]: int(r["n"])
        for r in grouped_count(
            build_dataset(rd.read_parquet(files), num_parts=8), ["sink"]
        ).iter_rows()
    }

    runner = MicroBatchRunner(str(tmp_path / "stream"), window_s=1800)
    totals = runner.run(files)
    assert totals["rows_routed"] == batch_counts
    assert len(totals["windows_done"]) > 3  # genuinely micro-batched

    # resume over complete state: nothing re-run, identical totals
    totals2 = MicroBatchRunner(str(tmp_path / "stream"), window_s=1800).run(files)
    assert totals2["rows_routed"] == batch_counts


def test_unrouted_sink_keeps_rows(ray_session):
    """Rules without a fallback: unmatched rows go to the observable
    _unrouted sink (Beats' dropped-count, keep-and-observe)."""
    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "user", "tool": "none", "text": "match-me"},
        {"conv_id": "c", "turn_idx": 1, "role": "user", "tool": "none", "text": "nope"},
    ]
    cfg = {"processors": [],
           "routes": [{"name": "hits", "when": {"contains": {"text": "match"}}}]}
    out = build_dataset(rd.from_items(rows), config=cfg, num_parts=1,
                        enrich=False).to_pandas()
    assert sorted(out["sink"]) == ["_unrouted", "hits"]


def test_incremental_commit_crash_keeps_committed(sf0001_dir, tmp_path):
    """Per-group commits: a crash in group k must NOT force groups <k
    to be reprocessed on resume (their attempt counter stays 1)."""
    import json as _json

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:6]
    cr = CheckpointRunner(str(tmp_path / "inc"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        cr.run(files, commit_every=1, fail_group=3)
    # groups 0-2 committed before the crash; 3 written but uncommitted
    done = sorted(
        p.name for p in (tmp_path / "inc" / "_lineage").glob("part-*.json")
    )
    assert done == ["part-00000.json", "part-00001.json", "part-00002.json"]

    m = cr.run(files, commit_every=1)
    assert m["partitions_done"] == len(files)
    for i in range(6):
        rec = _json.loads(
            (tmp_path / "inc" / "_lineage" / f"part-0000{i}.json").read_text()
        )
        # 0-2 committed first try; 3 crashed once then succeeded; 4-5
        # were never attempted before the crash
        assert rec["attempt"] == (2 if i == 3 else 1), (i, rec)


def _ts_split_corpus(tmp_path, n_files=3, rows_per_file=40):
    """Tiny transcript corpus where each FILE covers a disjoint
    one-hour ts range (the dt=/hour= layout a production corpus has)."""
    import pyarrow as pa

    from beats_ray.schema import TRANSCRIPT_SCHEMA

    files = []
    base = pd.Timestamp("2024-05-01 00:00:00")
    for k in range(n_files):
        ts = [base + pd.Timedelta(hours=k, seconds=30 + i * 10)
              for i in range(rows_per_file)]
        tbl = pa.table(
            {
                "conv_id": pa.array([f"c{k}-{i % 4}" for i in range(rows_per_file)]),
                "turn_idx": pa.array(list(range(rows_per_file)), pa.int32()),
                "role": pa.array(["user"] * rows_per_file),
                "text": pa.array([f"hello {i}" for i in range(rows_per_file)]),
                "tool": pa.array(["none"] * rows_per_file),
                "ts": pa.array(ts, pa.timestamp("us")),
            },
            schema=TRANSCRIPT_SCHEMA,
        )
        f = str(tmp_path / f"part-{k:05d}.parquet")
        pq.write_table(tbl, f)
        files.append(f)
    return files


def test_stream_window_file_pruning(ray_session, tmp_path):
    """Each streaming window must read ONLY the files whose ts range
    overlaps it (file-level pruning from row-group stats)."""
    import json as _json

    from beats_ray.stream import MicroBatchRunner

    files = _ts_split_corpus(tmp_path)
    out = tmp_path / "stream_prune"
    totals = MicroBatchRunner(str(out), window_s=3600).run(files)
    assert sum(totals["rows_routed"].values()) == 3 * 40

    recs = [
        _json.loads(p.read_text())
        for p in sorted((out / "_stream_lineage").glob("window-*.json"))
    ]
    assert len(recs) == 3
    for rec in recs:
        # hour-aligned corpus: every window maps to exactly one file
        assert len(rec["files_read"]) == 1, rec
    read_sets = [rec["files_read"][0] for rec in recs]
    assert sorted(read_sets) == files


def test_stream_tz_independent(ray_session, tmp_path):
    """Window enumeration from parquet stats must treat stat datetimes
    as UTC — under a non-UTC host TZ no edge rows may be dropped."""
    import os
    import time as _time

    from beats_ray.stream import MicroBatchRunner

    files = _ts_split_corpus(tmp_path, n_files=2)
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        totals = MicroBatchRunner(
            str(tmp_path / "stream_tz"), window_s=3600
        ).run(files)
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
    assert sum(totals["rows_routed"].values()) == 2 * 40


def test_config_stages_surface(sf0001_dir, tmp_path):
    """`stages:` in the YAML config applies keyed dataset-level ops
    (rate limit / token bucket / dedup) between enrich and routing —
    the Beats processor-chain positions for these, re-expressed."""
    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:2]
    base = build_dataset(rd.read_parquet(files), num_parts=4).count()

    cfg = {
        "processors": [],
        "stages": [{"rate_limit": {"k": 2, "window_s": 60}}],
        "routes": [{"name": "default"}],
    }
    limited = build_dataset(rd.read_parquet(files), config=cfg, num_parts=4)
    n = limited.count()
    assert 0 < n < base  # the limiter actually dropped rows

    # unknown stage name fails eagerly on the driver
    bad = {"processors": [], "stages": [{"nope": {}}], "routes": [{"name": "d"}]}
    with pytest.raises(ValueError, match="unknown stage"):
        build_dataset(rd.read_parquet(files), config=bad, num_parts=4)


def test_cli_config_with_stages(sf0001_dir, tmp_path):
    """The CLI drives a stages-bearing YAML end to end."""
    import json as _json
    import subprocess
    import sys

    cfg = tmp_path / "rl.yaml"
    cfg.write_text(
        "processors: []\n"
        "stages:\n"
        "  - rate_limit: {k: 2, window_s: 60}\n"
        "routes:\n"
        "  - name: default\n"
    )
    out_dir = tmp_path / "cli_out"
    r = subprocess.run(
        [sys.executable, "-m", "beats_ray",
         "--input", sf0001_dir + "/part-0000*.parquet",
         "--out", str(out_dir), "--config", str(cfg), "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = _json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["rows_out"] < metrics["rows_in"]


def test_stream_with_stages(ray_session, tmp_path):
    """Micro-batch streaming composes with config `stages:` — each
    window's build_dataset applies the keyed rate limit."""
    files = _ts_split_corpus(tmp_path, n_files=2)
    from beats_ray.stream import MicroBatchRunner

    cfg = {
        "processors": [],
        "stages": [{"rate_limit": {"k": 1, "window_s": 3600}}],
        "routes": [{"name": "default"}],
    }
    totals = MicroBatchRunner(
        str(tmp_path / "stream_stages"), window_s=3600
    ).run(files, config=cfg)
    # 2 files x 4 conversations x 1 kept turn per (conv, hour-window)
    assert sum(totals["rows_routed"].values()) == 2 * 4


def test_stream_token_bucket_carries_state(ray_session, tmp_path):
    """Continuous-operation contract: a token bucket whose refill
    horizon exceeds the window length must NOT reset at window
    boundaries — streaming with carried state equals the single batch
    replay exactly."""
    import pyarrow as pa

    from beats_ray.schema import TRANSCRIPT_SCHEMA
    from beats_ray.stream import MicroBatchRunner

    # two hour-files, SAME conversations in both: with 1 token per 2h
    # and burst 1, each conv's hour-1 event must be DENIED (bucket only
    # half-refilled) — a window-local bucket would wrongly allow it
    files = []
    base = pd.Timestamp("2024-05-01 00:00:00")
    for k in range(2):
        rows = {
            "conv_id": [f"c{i}" for i in range(4)],
            "turn_idx": pa.array([k] * 4, pa.int32()),
            "role": ["user"] * 4,
            "text": [f"hello {k}-{i}" for i in range(4)],
            "tool": ["none"] * 4,
            "ts": pa.array(
                [base + pd.Timedelta(hours=k, minutes=10)] * 4,
                pa.timestamp("us"),
            ),
        }
        f = str(tmp_path / f"part-{k:05d}.parquet")
        pq.write_table(pa.table(rows, schema=TRANSCRIPT_SCHEMA), f)
        files.append(f)

    cfg = {
        "processors": [],
        "stages": [{"token_bucket": {"key": "conv_id", "limit_n": 1,
                                     "per_s": 7200, "burst": 1,
                                     "order": "turn_idx"}}],
        "routes": [{"name": "default"}],
    }
    batch_kept = build_dataset(rd.read_parquet(files), config=cfg,
                               num_parts=2).count()
    assert batch_kept == 4  # hour-1 events all denied in one replay

    totals = MicroBatchRunner(str(tmp_path / "tbs"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals["rows_routed"].values()) == batch_kept

    # resume keeps the carried-state invariant (no reprocessing drift)
    totals2 = MicroBatchRunner(str(tmp_path / "tbs"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals2["rows_routed"].values()) == batch_kept


def _tb_corpus(tmp_path, spec):
    """files: list of (hour, [(conv, minute, text)])"""
    import pyarrow as pa

    from beats_ray.schema import TRANSCRIPT_SCHEMA

    base = pd.Timestamp("2024-05-01 00:00:00")
    files = []
    for k, rows_spec in spec:
        rows = {
            "conv_id": [c for c, _, _ in rows_spec],
            "turn_idx": pa.array(list(range(len(rows_spec))), pa.int32()),
            "role": ["user"] * len(rows_spec),
            "text": [t for _, _, t in rows_spec],
            "tool": ["none"] * len(rows_spec),
            "ts": pa.array(
                [base + pd.Timedelta(hours=k, minutes=m)
                 for _, m, _ in rows_spec],
                pa.timestamp("us"),
            ),
        }
        f = str(tmp_path / f"part-{k:05d}.parquet")
        pq.write_table(pa.table(rows, schema=TRANSCRIPT_SCHEMA), f)
        files.append(f)
    return files


def test_stream_token_bucket_quiet_window_carries(ray_session, tmp_path):
    """A key with NO events in the middle window must keep its
    mid-refill bucket (review regression: quiet keys were dropped from
    the emitted state, resetting their bucket)."""
    from beats_ray.stream import MicroBatchRunner

    # c0: events at 00:10 and 02:10 — with 1 token / 3h, burst 1, the
    # 02:10 event must be DENIED (only ~2/3 refilled). c1 keeps every
    # window non-empty.
    files = _tb_corpus(tmp_path, [
        (0, [("c0", 10, "a"), ("c1", 20, "b")]),
        (1, [("c1", 10, "c")]),
        (2, [("c0", 10, "d"), ("c1", 20, "e")]),
    ])
    cfg = {
        "processors": [],
        "stages": [{"token_bucket": {"key": "conv_id", "limit_n": 1,
                                     "per_s": 10800, "burst": 1,
                                     "order": "turn_idx"}}],
        "routes": [{"name": "default"}],
    }
    batch_kept = build_dataset(rd.read_parquet(files), config=cfg,
                               num_parts=2).count()
    totals = MicroBatchRunner(str(tmp_path / "tbq"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals["rows_routed"].values()) == batch_kept


def test_stream_token_bucket_with_dropping_processor(ray_session, tmp_path):
    """Rows dropped by the processor chain must not consume tokens in
    the carried-state replay (review regression: the state pass ran on
    RAW input, diverging from the in-pipeline stage)."""
    from beats_ray.stream import MicroBatchRunner

    # c0 hour-0 has a DROPPED event at 00:05 and a kept one at 00:10;
    # if the dropped one consumed a token, hour-1's 01:10 event (refill
    # 1h of a 2h bucket from 00:10) would classify differently
    files = _tb_corpus(tmp_path, [
        (0, [("c0", 5, "DROPME"), ("c0", 10, "keep1"), ("c1", 10, "x")]),
        (1, [("c0", 10, "keep2"), ("c1", 20, "y")]),
    ])
    cfg = {
        "processors": [
            {"drop_event": {}, "when": {"contains": {"text": "DROPME"}}},
        ],
        "stages": [{"token_bucket": {"key": "conv_id", "limit_n": 1,
                                     "per_s": 7200, "burst": 1,
                                     "order": "turn_idx"}}],
        "routes": [{"name": "default"}],
    }
    batch_kept = build_dataset(rd.read_parquet(files), config=cfg,
                               num_parts=2).count()
    totals = MicroBatchRunner(str(tmp_path / "tbd"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals["rows_routed"].values()) == batch_kept


def test_stream_token_bucket_single_parse_pass(ray_session, tmp_path,
                                               monkeypatch):
    """With a token_bucket stage, each window's parse+enrich executes
    ONCE: the materialized pre-stage feeds both the routed output and
    the carried-state replay. Counted by rows actually flowing through
    ParseStage on workers — before the fix the replay re-executed the
    whole chain, doubling the count."""
    import ray

    import beats_ray.pipeline as bp
    from beats_ray.stream import MicroBatchRunner

    @ray.remote
    class ParseRowCounter:
        def __init__(self):
            self.n = 0

        def inc(self, k):
            self.n += int(k)

        def get(self):
            return self.n

    counter = ParseRowCounter.options(
        name="parse_row_counter", namespace="tb_single_pass"
    ).remote()
    ray.get(counter.get.remote())  # ensure registered before tasks run

    orig = bp.ParseStage

    class CountingParse(orig):
        def __call__(self, t):
            # blocking get: the count is fully applied before the task
            # finishes, so the driver's final read can't race it
            ray.get(ray.get_actor(
                "parse_row_counter", namespace="tb_single_pass"
            ).inc.remote(t.num_rows))
            return super().__call__(t)

    monkeypatch.setattr(bp, "ParseStage", CountingParse)

    files = _tb_corpus(tmp_path, [
        (0, [("c0", 5, "a"), ("c0", 10, "b"), ("c1", 10, "c")]),
        (1, [("c0", 10, "d"), ("c1", 20, "e")]),
    ])
    n_rows = 5
    cfg = {
        "processors": [],
        "stages": [{"token_bucket": {"key": "conv_id", "limit_n": 1,
                                     "per_s": 7200, "burst": 1,
                                     "order": "turn_idx"}}],
        "routes": [{"name": "default"}],
    }
    MicroBatchRunner(str(tmp_path / "tb1p"), window_s=3600).run(
        files, config=cfg
    )
    assert ray.get(counter.get.remote()) == n_rows


def test_parse_stage_handles_fully_dropped_block(ray_session):
    """classify_kind must survive an empty block (drop_event emptied
    it) — untyped pa.array([]) used to infer null type and crash."""
    rows = [{"conv_id": "c", "turn_idx": 0, "role": "user",
             "tool": "none", "text": "gone"}]
    cfg = {
        "processors": [{"drop_event": {}, "when": {"has_fields": ["text"]}}],
        "routes": [{"name": "default"}],
    }
    out = build_dataset(rd.from_items(rows), config=cfg, num_parts=1,
                        enrich=False)
    assert out.count() == 0


def test_stream_dedup_carries_seen_ids(ray_session, tmp_path):
    """Cross-window dedup: the seen-id set survives window boundaries
    (the ES index holds every written _id across batches), so a doc id
    already written in an earlier window is dropped — streaming equals
    the single-batch replay."""
    from beats_ray.stream import MicroBatchRunner

    files = _tb_corpus(tmp_path, [
        (0, [("c0", 10, "a"), ("c1", 20, "b")]),
        (1, [("c0", 10, "dup"), ("c2", 20, "c")]),
        (2, [("c1", 10, "dup"), ("c0", 20, "dup")]),
    ])
    cfg = {
        "processors": [],
        "stages": [{"dedup": {"field": "conv_id"}}],
        "routes": [{"name": "default"}],
    }
    batch_kept = build_dataset(rd.read_parquet(files), config=cfg,
                               num_parts=2).count()
    assert batch_kept == 3  # c0, c1, c2 exactly once

    totals = MicroBatchRunner(str(tmp_path / "dd"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals["rows_routed"].values()) == batch_kept

    # resume: no reprocessing drift
    totals2 = MicroBatchRunner(str(tmp_path / "dd"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals2["rows_routed"].values()) == batch_kept


def test_stream_dedup_ttl_expiry(ray_session, tmp_path):
    """Stage ttl_s bounds the carried seen-id set with window-granular
    expiry: an id expires at the first window BOUNDARY past
    first_seen + ttl and may then be written again."""
    from beats_ray.stream import MicroBatchRunner

    files = _tb_corpus(tmp_path, [
        (0, [("c0", 10, "a"), ("c1", 20, "b")]),
        (1, [("c0", 10, "dup-alive"), ("c1", 20, "dup-alive")]),
        (2, [("c0", 10, "expired-rewrite")]),
    ])
    cfg = {
        "processors": [],
        "stages": [{"dedup": {"field": "conv_id", "ttl_s": 3600}}],
        "routes": [{"name": "default"}],
    }
    # w0: both new (2). w1: both seen and alive (0). w2: c0 expired at
    # the 2h boundary (first_seen 00:10 + 1h < 02:00) -> rewritten (1).
    totals = MicroBatchRunner(str(tmp_path / "ddttl"), window_s=3600).run(
        files, config=cfg
    )
    assert sum(totals["rows_routed"].values()) == 3


def test_stream_dedup_quiet_window_gc(ray_session, tmp_path):
    """A QUIET window still advances the ttl horizon: state rolls
    forward through it and expires on schedule."""
    from beats_ray.stream import MicroBatchRunner

    files = _tb_corpus(tmp_path, [
        (0, [("c0", 10, "a")]),
        (2, [("c0", 10, "again")]),
    ])
    # ttl 2h: c0 (first seen 00:10) is still alive at the 2h boundary
    # (00:10+2h > 02:00) -> the hour-2 rewrite is DROPPED
    cfg_long = {
        "processors": [],
        "stages": [{"dedup": {"field": "conv_id", "ttl_s": 7200}}],
        "routes": [{"name": "default"}],
    }
    totals = MicroBatchRunner(str(tmp_path / "ddq1"), window_s=3600).run(
        files, config=cfg_long
    )
    assert sum(totals["rows_routed"].values()) == 1

    # ttl 1h: expired during the quiet window's GC -> rewrite kept
    cfg_short = {
        "processors": [],
        "stages": [{"dedup": {"field": "conv_id", "ttl_s": 3600}}],
        "routes": [{"name": "default"}],
    }
    totals = MicroBatchRunner(str(tmp_path / "ddq2"), window_s=3600).run(
        files, config=cfg_short
    )
    assert sum(totals["rows_routed"].values()) == 2


def _rl_corpus(tmp_path, spec):
    """files: list of (hour, [(conv, minute, global_turn_idx)]) — like
    _tb_corpus but with EXPLICIT turn_idx so order is globally
    consistent across micro-batches (the rate-limit carry contract)."""
    import pyarrow as pa

    from beats_ray.schema import TRANSCRIPT_SCHEMA

    base = pd.Timestamp("2024-05-01 00:00:00")
    files = []
    for k, rows_spec in spec:
        rows = {
            "conv_id": [c for c, _, _ in rows_spec],
            "turn_idx": pa.array([i for _, _, i in rows_spec], pa.int32()),
            "role": ["user"] * len(rows_spec),
            "text": [f"t{i}" for _, _, i in rows_spec],
            "tool": ["none"] * len(rows_spec),
            "ts": pa.array(
                [base + pd.Timedelta(hours=k, minutes=m)
                 for _, m, _ in rows_spec],
                pa.timestamp("us"),
            ),
        }
        f = str(tmp_path / f"part-{k:05d}.parquet")
        pq.write_table(pa.table(rows, schema=TRANSCRIPT_SCHEMA), f)
        files.append(f)
    return files


def test_rate_limit_state_carry_matches_batch(ray_session):
    """flows-level: splitting a stream at a micro-batch boundary and
    seeding segment 2 with segment 1's emitted counts must admit
    exactly the rows a single batch run admits — for both DataFrame
    and Dataset state."""
    import ray.data as rd

    from beats_ray.dataops.flows import rate_limit, rl_split

    base = pd.Timestamp("2024-05-01 00:00:00")
    rows = []
    # 2h rate window [00:00, 02:00): conv a has 2+2 events across the
    # hourly boundary, conv b has 3+0, conv c has 0+2
    for conv, minute, idx in [
        ("a", 10, 0), ("a", 50, 1), ("b", 5, 2), ("b", 6, 3), ("b", 7, 4),
        ("a", 70, 5), ("a", 80, 6), ("c", 61, 7), ("c", 62, 8),
    ]:
        rows.append({"conv_id": conv, "turn_idx": idx,
                     "ts": base + pd.Timedelta(minutes=minute)})
    df = pd.DataFrame(rows)
    seg1 = df[df["ts"] < base + pd.Timedelta(hours=1)]
    seg2 = df[df["ts"] >= base + pd.Timedelta(hours=1)]
    kw = dict(k=3, window_s=7200, key_col="conv_id", order_col="turn_idx",
              buckets=4)

    batch = rate_limit(rd.from_pandas(df), **kw).to_pandas()
    hi1 = int((base.tz_localize("UTC")
               + pd.Timedelta(hours=1)).timestamp() * 1e6)

    # Dataset-state path via "both"
    both1 = rate_limit(rd.from_pandas(seg1), emit_state="both",
                       gc_horizon_us=hi1, **kw).materialize()
    rows1, st1 = rl_split(both1, "conv_id")
    out2 = rate_limit(rd.from_pandas(seg2), initial_state=st1, **kw)
    got = pd.concat([rows1.to_pandas()[["conv_id", "turn_idx"]],
                     out2.to_pandas()[["conv_id", "turn_idx"]]])
    want = batch[["conv_id", "turn_idx"]]
    assert (
        sorted(map(tuple, got.to_numpy().tolist()))
        == sorted(map(tuple, want.to_numpy().tolist()))
    )

    # DataFrame-state path
    st_df = rate_limit(rd.from_pandas(seg1), emit_state=True,
                       gc_horizon_us=hi1, **kw).to_pandas()
    out2b = rate_limit(rd.from_pandas(seg2), initial_state=st_df,
                       **kw).to_pandas()
    assert (
        sorted(out2b["turn_idx"].tolist())
        == sorted(out2.to_pandas()["turn_idx"].tolist())
    )


def test_stream_rate_limit_carries_across_windows(ray_session, tmp_path):
    """Runner-level: a 2h rate window spanning hourly micro-batches
    admits k rows TOTAL across both, equal to the batch replay (the
    round-3 gap: the k-per-window rate limit was window-local)."""
    import ray.data as rd

    from beats_ray.pipeline import build_dataset
    from beats_ray.stream import MicroBatchRunner

    files = _rl_corpus(tmp_path, [
        (0, [("c0", 10, 0), ("c0", 20, 1), ("c1", 30, 2)]),
        (1, [("c0", 10, 3), ("c0", 20, 4), ("c1", 30, 5)]),
        # hour 2 = a NEW 2h rate window: c0 admits again
        (2, [("c0", 10, 6)]),
    ])
    cfg = {
        "processors": [],
        "stages": [{"rate_limit": {"key": "conv_id", "k": 2,
                                   "window_s": 7200, "buckets": 4}}],
        "routes": [{"name": "default"}],
    }
    batch_kept = build_dataset(rd.read_parquet(files), config=cfg,
                               num_parts=2).count()
    totals = MicroBatchRunner(str(tmp_path / "rlq"), window_s=3600).run(
        files, config=cfg
    )
    stream_kept = sum(totals["rows_routed"].values())
    # batch: c0 keeps 2 of 4 in window 0 + 1 in window 1; c1 keeps 2
    assert batch_kept == 5
    assert stream_kept == batch_kept
