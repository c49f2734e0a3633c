"""FileTailer — the filestream harvester loop: append-only reads from
per-inode offsets, rotation/truncation handling, write-then-commit
crash ordering (registry semantics of filebeat's filestream input)."""

import os

import pytest

from beats_ray.sources.tailer import FileTailer


def _texts(ds):
    df = ds.to_pandas()
    return df["text"].tolist() if "text" in df.columns else []


def _tailer(tmp_path, **kw):
    return FileTailer(str(tmp_path / "logs" / "*.log"),
                      str(tmp_path / "state"), **kw)


def _append(tmp_path, name, text):
    d = tmp_path / "logs"
    d.mkdir(exist_ok=True)
    with open(d / name, "a", encoding="utf-8") as f:
        f.write(text)


def test_poll_reads_only_appended_bytes(ray_session, tmp_path):
    _append(tmp_path, "a.log", "one\ntwo\n")
    t = _tailer(tmp_path)
    assert _texts(t.poll()) == ["one", "two"]
    t.commit()
    assert _texts(t.poll()) == []  # nothing new
    t.commit()
    _append(tmp_path, "a.log", "three\n")
    assert _texts(t.poll()) == ["three"]


def test_unterminated_tail_waits_for_newline(ray_session, tmp_path):
    _append(tmp_path, "a.log", "done\npart")
    t = _tailer(tmp_path)
    assert _texts(t.poll()) == ["done"]
    t.commit()
    _append(tmp_path, "a.log", "ial\n")
    assert _texts(t.poll()) == ["partial"]  # reassembled at the cut


def test_per_line_offsets_match_file_positions(ray_session, tmp_path):
    _append(tmp_path, "a.log", "aa\nbbbb\nc\n")
    t = _tailer(tmp_path)
    df = t.poll().to_pandas().sort_values("log.offset")
    assert df["log.offset"].tolist() == [0, 3, 8]
    assert df["text"].tolist() == ["aa", "bbbb", "c"]


def test_rotation_keeps_offset_with_inode(ray_session, tmp_path):
    """Rename a.log -> a.log.1 and create a fresh a.log: the rotated
    file's remainder is still read under its inode, the fresh file
    starts at 0 (filestream prospector identity semantics)."""
    _append(tmp_path, "a.log", "before-rotate\n")
    t = FileTailer(str(tmp_path / "logs" / "a.log*"),
                   str(tmp_path / "state"))
    assert _texts(t.poll()) == ["before-rotate"]
    t.commit()
    _append(tmp_path, "a.log", "tail-of-old\n")
    os.rename(tmp_path / "logs" / "a.log", tmp_path / "logs" / "a.log.1")
    _append(tmp_path, "a.log", "first-of-new\n")
    got = sorted(_texts(t.poll()))
    assert got == ["first-of-new", "tail-of-old"]


def test_truncation_restarts_at_zero(ray_session, tmp_path):
    _append(tmp_path, "a.log", "long line number one\n")
    t = _tailer(tmp_path)
    t.poll()
    t.commit()
    # copytruncate-style rotation: same inode, size drops below offset
    with open(tmp_path / "logs" / "a.log", "w", encoding="utf-8") as f:
        f.write("fresh\n")
    assert _texts(t.poll()) == ["fresh"]


def test_crash_before_commit_redelivers(ray_session, tmp_path):
    """Poll-then-crash (no commit): a new tailer over the same state
    dir re-reads the window — at-least-once, like the socket WAL."""
    _append(tmp_path, "a.log", "w1\nw2\n")
    t = _tailer(tmp_path)
    assert _texts(t.poll()) == ["w1", "w2"]
    # no commit — simulate a crash by just abandoning the instance
    t2 = _tailer(tmp_path)
    assert _texts(t2.poll()) == ["w1", "w2"]
    t2.commit()
    t3 = _tailer(tmp_path)
    assert _texts(t3.poll()) == []


def test_poll_window_to_parquet_write_then_commit(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    _append(tmp_path, "a.log", "x\ny\n")
    t = _tailer(tmp_path)
    out = str(tmp_path / "out")
    assert t.poll_window_to_parquet(out, 1) == 2
    _append(tmp_path, "a.log", "z\n")
    assert t.poll_window_to_parquet(out, 2) == 1
    texts = []
    for f in sorted(glob.glob(out + "/window-*/*.parquet")):
        texts += pq.read_table(f, columns=["text"])["text"].to_pylist()
    assert sorted(texts) == ["x", "y", "z"]


def test_latin1_tailing_and_utf16_rejected(ray_session, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_bytes("caf\xe9\n".encode("latin-1"))
    t = _tailer(tmp_path, encoding="iso8859-1")
    assert _texts(t.poll()) == ["café"]
    with pytest.raises(ValueError, match="utf-16"):
        _tailer(tmp_path, encoding="utf-16le")


def test_tail_pipeline_end_to_end_syslog_routing(ray_session, tmp_path):
    """The full filebeat-equivalent loop: tail → syslog parse → route
    by severity → per-sink parquet → offset commit, across two poll
    windows."""
    import glob

    import pyarrow.parquet as pq

    from beats_ray.sources.tailer import tail_pipeline

    _append(tmp_path, "sys.log",
            "<11>May  1 00:00:01 h1 app: disk failing\n"   # sev 3 err
            "<30>May  1 00:00:02 h2 cron: job done\n")     # sev 6 info
    t = _tailer(tmp_path)
    out = str(tmp_path / "out")
    processors = [{"syslog": {}}]
    rules = [
        {"name": "alerts", "when": {"range": {"syslog.severity": {"lte": 3}}}},
        {"name": "archive", "default": "archive"},
    ]
    assert tail_pipeline(t, out, 1, processors, rules) == 2
    _append(tmp_path, "sys.log",
            "<10>May  1 00:00:03 h1 app: oom killed\n")    # sev 2 crit
    assert tail_pipeline(t, out, 2, processors, rules) == 1
    # crash-free third cycle: nothing new
    assert tail_pipeline(t, out, 3, processors, rules) == 0

    by_sink = {}
    for f in glob.glob(out + "/window-*/**/*.parquet", recursive=True):
        sink = [p for p in f.split("/") if p.startswith("sink=")][0][5:]
        tb = pq.read_table(f, columns=["syslog.msg"])
        by_sink.setdefault(sink, []).extend(tb["syslog.msg"].to_pylist())
    assert sorted(by_sink["alerts"]) == ["disk failing", "oom killed"]
    assert by_sink["archive"] == ["job done"]


def test_over_window_line_forces_progress(tmp_path):
    """Regression: a single line longer than the poll window left the
    offset wedged at the same position forever (cut=0 each poll). The
    window is now force-cut into oversized rows so the tail always
    advances."""
    from beats_ray.sources.tailer import _read_appended

    p = tmp_path / "big.log"
    p.write_bytes(b"x" * 100 + b"\nnext\n")
    data, start, end = _read_appended(str(p), 0, limit=50)
    assert data == b"x" * 50 and end == 50
    data, _, end = _read_appended(str(p), 50, limit=50)
    assert data == b"x" * 50 and end == 100
    data, _, end = _read_appended(str(p), 100, limit=50)
    assert data == b"\nnext\n" and end == 106
    # a normal unterminated tail below the limit still waits
    with open(p, "ab") as f:
        f.write(b"partial")
    data, _, end = _read_appended(str(p), 106, limit=50)
    assert data == b"" and end == 106


def test_over_window_line_rides_through_poll(ray_session, tmp_path):
    """The force-cut window flows through poll() as ordinary rows with
    correct offsets (no terminator on the final forced row)."""
    from beats_ray.sources.tailer import FileTailer

    p = tmp_path / "wedge.log"
    p.write_bytes(b"y" * 70 + b"\ntail\n")
    t = FileTailer(str(p), str(tmp_path / "state"), max_poll_bytes=40)
    rows = t.poll().to_pandas().sort_values("log.offset")
    t.commit()
    assert rows["text"].tolist()[0] == "y" * 40
    assert rows["log.offset"].tolist()[0] == 0
    # the next poll drains the rest of the wedged line AND "tail"
    rows2 = t.poll().to_pandas().sort_values("log.offset")
    t.commit()
    assert rows2["text"].tolist() == ["y" * 30, "tail"]
    # fully drained: the steady-state poll is empty
    assert t.poll().count() == 0


def test_ebcdic_tailing_rejected(tmp_path):
    """Regression: EBCDIC charmaps encode LF as 0x25 — a 0x0A
    byte-offset cut never finds a boundary, so the tailer silently
    emitted nothing forever. It must refuse the config instead."""
    import pytest

    from beats_ray.sources.tailer import FileTailer

    p = tmp_path / "host.log"
    p.write_bytes("two\nlines\n".encode("cp037"))
    with pytest.raises(ValueError, match="0x0A"):
        FileTailer(str(p), str(tmp_path / "state"), encoding="ebcdic-037")
