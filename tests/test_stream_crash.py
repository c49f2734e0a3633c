"""Crash-injection tests for the streaming state swap (stream.py
_persist_state_ds aside-rename) and lineage commit ordering — the
effectively-once contract under faults at the exact points the
crash-safe design claims to cover."""

import os
import shutil
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from beats_ray.pipeline import build_dataset
from beats_ray.schema import TRANSCRIPT_SCHEMA
from beats_ray.stream import MicroBatchRunner


def _corpus(tmp_path, spec):
    """files: list of (hour, [(conv, minute, text)]) — same shape as
    test_pipeline_e2e._tb_corpus."""
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


_DEDUP_SPEC = [
    (0, [("c0", 10, "a"), ("c1", 20, "b")]),
    (1, [("c0", 10, "dup"), ("c2", 20, "c")]),
    (2, [("c1", 10, "dup"), ("c0", 20, "dup")]),
]
_DEDUP_CFG = {
    "processors": [],
    "stages": [{"dedup": {"field": "conv_id"}}],
    "routes": [{"name": "default"}],
}
_TB_SPEC = [
    (0, [("c0", 10, "a"), ("c1", 10, "b"), ("c2", 10, "c"), ("c3", 10, "d")]),
    (1, [("c0", 10, "deny"), ("c1", 10, "deny"),
         ("c2", 10, "deny"), ("c3", 10, "deny")]),
]
_TB_CFG = {
    "processors": [],
    "stages": [{"token_bucket": {"key": "conv_id", "limit_n": 1,
                                 "per_s": 7200, "burst": 1,
                                 "order": "turn_idx"}}],
    "routes": [{"name": "default"}],
}


class _InjectedCrash(RuntimeError):
    pass


@pytest.mark.parametrize("spec,cfg", [(_DEDUP_SPEC, _DEDUP_CFG),
                                      (_TB_SPEC, _TB_CFG)],
                         ids=["dedup", "token_bucket"])
def test_crash_mid_state_swap_effectively_once(ray_session, tmp_path,
                                               monkeypatch, spec, cfg):
    """Kill the runner at BOTH crash points the swap design names:
    (1) after window 0's state persist but before its lineage commit,
    then on retry (2) between the two renames of the aside swap —
    ``os.rename(final, aside)`` has happened, ``os.rename(tmp, final)``
    has not. A final un-faulted run must equal the single-batch replay
    exactly (effectively-once), for dedup and token_bucket state."""
    files = _corpus(tmp_path, spec)
    batch_kept = build_dataset(rd.read_parquet(files), config=cfg,
                               num_parts=2).count()
    out = tmp_path / "stream"
    lineage = out / "_stream_lineage"
    # window ids are event-time epoch-hours, not 0-based
    w0 = int(pd.Timestamp("2024-05-01 00:00:00").timestamp() // 3600)

    # fault 1: state-w0 committed, window-0.json never written
    real_replace = os.replace

    def replace_crash(src, dst, *a, **kw):
        if str(dst).endswith("window-{w0}.json".format(w0=w0)):
            raise _InjectedCrash("crash before lineage commit")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", replace_crash)
    with pytest.raises(_InjectedCrash):
        MicroBatchRunner(str(out), window_s=3600).run(files, config=cfg)
    monkeypatch.setattr(os, "replace", real_replace)
    state_final = lineage / f"state-w{w0}-s0"
    assert state_final.is_dir()  # persist committed before the crash
    assert not (lineage / f"window-{w0}.json").exists()

    # fault 2: retry reprocesses window 0; its persist finds the
    # committed final dir and starts the swap — crash right after the
    # aside rename, before the new dir moves into place
    real_rename = os.rename

    def rename_crash(src, dst, *a, **kw):
        real_rename(src, dst, *a, **kw)
        if str(dst).endswith(f"state-w{w0}-s0-old"):
            raise _InjectedCrash("crash between the two swap renames")

    monkeypatch.setattr(os, "rename", rename_crash)
    with pytest.raises(_InjectedCrash):
        MicroBatchRunner(str(out), window_s=3600).run(files, config=cfg)
    monkeypatch.setattr(os, "rename", real_rename)
    # verify the injection really produced the torn state
    assert not state_final.exists()
    aside = lineage / f"state-w{w0}-s0-old"
    assert aside.is_dir() and any(aside.glob("*.parquet"))

    # un-faulted restart: must converge to exactly the batch answer
    totals = MicroBatchRunner(str(out), window_s=3600).run(files, config=cfg)
    assert sum(totals["rows_routed"].values()) == batch_kept
    assert totals["windows_done"] == [w0 + w for w, _ in spec]

    # idempotent re-run on the healed dir: still exact
    totals2 = MicroBatchRunner(str(out), window_s=3600).run(files, config=cfg)
    assert sum(totals2["rows_routed"].values()) == batch_kept


def test_state_loader_falls_back_to_aside(ray_session, tmp_path):
    """The read side of the swap: a window whose predecessor's state
    dir is torn (final gone mid-swap, aside intact) must seed from the
    aside copy — dropping it would re-admit already-written duplicates.
    Constructed directly on disk (the torn layout a mid-swap crash
    leaves when the predecessor window's lineage was already
    committed), then proven load-bearing by deleting the aside and
    watching the duplicate come back. Two windows only: the per-window
    GC (correctly) removes state dirs older than w-1, so a longer run
    leaves no w0 state to tear."""
    files = _corpus(tmp_path, _DEDUP_SPEC[:2])
    out = tmp_path / "stream"
    lineage = out / "_stream_lineage"
    w0 = int(pd.Timestamp("2024-05-01 00:00:00").timestamp() // 3600)
    totals = MicroBatchRunner(str(out), window_s=3600).run(
        files, config=_DEDUP_CFG
    )
    kept_ref = sum(totals["rows_routed"].values())
    assert kept_ref == 3  # w0: c0,c1 new; w1: c0 dup dropped, c2 kept

    def tear(state_dir: Path):
        aside = Path(str(state_dir) + "-old")
        shutil.rmtree(aside, ignore_errors=True)
        os.rename(state_dir, aside)

    # tear w0's state and force w1 to reprocess
    snapshot = tmp_path / "snap"
    shutil.copytree(out, snapshot)
    tear(lineage / f"state-w{w0}-s0")
    (lineage / f"window-{w0+1}.json").unlink()
    shutil.rmtree(lineage / f"state-w{w0+1}-s0", ignore_errors=True)
    totals = MicroBatchRunner(str(out), window_s=3600).run(
        files, config=_DEDUP_CFG
    )
    assert sum(totals["rows_routed"].values()) == kept_ref  # aside used

    # control: same tear but aside ALSO lost → w1 replays fresh and the
    # c0 duplicate is re-admitted (shows the fallback carried the test)
    shutil.rmtree(out)
    shutil.copytree(snapshot, out)
    tear(lineage / f"state-w{w0}-s0")
    shutil.rmtree(lineage / f"state-w{w0}-s0-old")
    (lineage / f"window-{w0+1}.json").unlink()
    shutil.rmtree(lineage / f"state-w{w0+1}-s0", ignore_errors=True)
    totals = MicroBatchRunner(str(out), window_s=3600).run(
        files, config=_DEDUP_CFG
    )
    assert sum(totals["rows_routed"].values()) == kept_ref + 1
