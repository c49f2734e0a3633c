"""Sources — the Filebeat harvester re-expressed over Ray Data readers.

The reference's filestream input (filebeat/input/filestream/
input.go:457-535) composes a per-file reader chain:
EncodeReader (charset + line split) → StripNewline → Filemeta (inject
log.file.path + offset) → parsers → LimitReader (max_bytes truncate +
flag). Here, ``ray.data.read_text`` does the line framing (one row per
line, file-parallel like the harvester pool); the rest of the chain is
vectorized batch transforms. File identity/offset state (the registry)
lives in beats_ray.state.lineage instead of per-row Private cursors.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

from ..processors.actions import bytes_truncate
from ..processors.base import add_flag


def line_reader_chain(ds, max_bytes: int = 10 * 1024 * 1024):
    """StripNewline + LimitReader over a text-line Dataset
    (readfile/strip_newline.go; readfile/limit.go — default max_bytes
    10MiB, parser.go:40; over-long lines are truncated + flagged
    ``truncated``, never dropped)."""

    def chain(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        # strip exactly ONE line terminator (readfile/line.go frames a
        # single \n / \r\n per line) — utf8_rtrim("\r\n") would also
        # eat CR/LF characters that are genuinely part of the content:
        # "data\r\r\n" must become "data\r", not "data"
        text = pc.replace_substring_regex(
            text, pattern=r"(?:\r\n|\n|\r)$", replacement="",
            max_replacements=1,
        )
        too_long = pc.greater(pc.binary_length(text), max_bytes)
        text = pc.if_else(too_long, bytes_truncate(text, max_bytes), text)
        idx = t.column_names.index("text")
        t = t.set_column(idx, "text", text)
        return add_flag(t, too_long, "truncated")

    return ds.map_batches(chain, batch_format="pyarrow")


def read_log_lines(paths: list[str] | str, max_bytes: int = 10 * 1024 * 1024,
                   include_path: bool = True):
    """Read newline-delimited log files → one row per line with
    ``log.file.path`` metadata (readfile/metafields.go:45-95). One read
    task per file ≈ one harvester per file."""
    import ray.data as rd

    ds = rd.read_text(paths, include_paths=include_path)
    if include_path:
        ds = ds.map_batches(
            lambda t: t.rename_columns(
                ["text" if c == "text" else "log.file.path" if c == "path" else c
                 for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return line_reader_chain(ds, max_bytes=max_bytes)


def read_ndjson_logs(paths: list[str] | str, expected: dict[str, str],
                     max_bytes: int = 10 * 1024 * 1024):
    """NDJSON source: log lines → typed columns via the ndjson parser
    (reader/readjson/json.go semantics; schema pinned by ``expected``)."""
    from ..processors import build_processor

    ds = read_log_lines(paths, max_bytes=max_bytes, include_path=True)
    proc = build_processor(
        {
            "decode_json_fields": {
                "fields": ["text"],
                "target": "",
                "expected": expected,
                "add_error_key": True,
            }
        }
    )
    return ds.map_batches(proc, batch_format="pyarrow")


def write_ndjson_fixture(sf: float, root: str = "/tmp/beats_ray_fixtures") -> str:
    """Materialize the transcript corpus as rotating NDJSON log files
    (one file per hash partition — the rotated-file layout the
    reference's load generator writes, filebeat/tests/load/load.py).
    Deterministic + cached; used by source round-trip tests."""
    import pyarrow.parquet as pq

    from ..fixtures import ensure_transcripts

    src = Path(ensure_transcripts(sf, root))
    out = Path(root) / f"sf{sf:g}" / "ndjson_logs"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("part-*.parquet")):
        tbl = pq.read_table(f)
        rows = tbl.to_pylist()
        with open(out / (f.stem + ".log"), "w", encoding="utf-8") as fh:
            for r in rows:
                r["ts"] = r["ts"].isoformat()
                fh.write(json.dumps(r, ensure_ascii=False, sort_keys=True))
                fh.write("\n")
    done.write_text("ok")
    return str(out)
