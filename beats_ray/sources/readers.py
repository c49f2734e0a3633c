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
        # a BOM prefix on ANY line is removed (EncodeReader.Next,
        # readfile/encode.go:62-70 — per line, all encodings; a
        # mid-line U+FEFF is content and stays)
        text = pc.replace_substring_regex(
            text, pattern="^\ufeff", replacement="", max_replacements=1,
        )
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


# filebeat ``encoding:`` option → Python codec (the reference's
# registry, readfile/encoding/encoding.go:35-101: plain/utf-8 validate,
# gbk shadows htmlindex, iso8859-* charmaps, cp* codepages, utf-16
# with BOM policies from readfile/encoding/utf16.go:43-55). Python's
# codec library covers the same charmaps natively, so this table only
# carries the name mapping + the BOM policy:
#   bom = None     decode as-is (golang IgnoreBOM: a BOM present in a
#          plain utf-8/utf-16le/be stream is NOT stripped — parity)
#   bom = ("bom", fallback)  utf-16 BOM sniff: consume FF FE / FE FF,
#          fall back to the given endianness when absent (utf16.go:
#          BigEndian for utf-16be-bom, LittleEndian for utf-16le-bom,
#          error for utf-16-bom with no BOM)
_ENCODINGS: dict[str, tuple[str, object]] = {
    "nop": ("utf-8", None),
    "plain": ("utf-8", None),
    "utf-8": ("utf-8", None),
    "utf8": ("utf-8", None),
    "unicode-1-1-utf-8": ("utf-8", None),
    "gbk": ("gbk", None),
    # htmlindex fallback names the reference resolves (FindEncoding)
    "big5": ("big5", None),
    "euc-kr": ("euc-kr", None),
    "euc-jp": ("euc-jp", None),
    "shift_jis": ("shift-jis", None),
    **{f"windows{n}": (f"cp{n}", None)
       for n in (874, 1250, 1251, 1252, 1253, 1254, 1255, 1256, 1257,
                 1258)},
    **{f"iso8859-{n}": (f"iso8859-{n}", None)
       for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 13, 14, 15, 16)},
    **{f"cp{n}": (f"cp{n}", None)
       for n in (437, 850, 852, 855, 858, 860, 862, 863, 865, 866)},
    "ebcdic-037": ("cp037", None),
    "ebcdic-1040": ("cp1140", None),
    # ebcdic-1047 omitted: Python ships no cp1047 codec (cp037/cp1140
    # cover the reference's other two EBCDIC pages)
    "koi8r": ("koi8-r", None),
    "koi8u": ("koi8-u", None),
    "macintosh": ("mac-roman", None),
    "macintosh-cyrillic": ("mac-cyrillic", None),
    "utf-16le": ("utf-16-le", None),
    "utf-16be": ("utf-16-be", None),
    "utf-16-bom": ("utf-16", ("bom", None)),
    "utf-16le-bom": ("utf-16", ("bom", "utf-16-le")),
    "utf-16be-bom": ("utf-16", ("bom", "utf-16-be")),
}


def resolve_encoding(name: str) -> tuple[str, object]:
    """Normalize a filebeat ``encoding:`` value → (python codec, bom
    policy). Same normalization as encoding.go FindEncoding (lowercase;
    unknown names are a config error, not a silent fallback)."""
    key = (name or "plain").strip().lower()
    if key not in _ENCODINGS:
        raise ValueError(f"unknown encoding: {name!r}")
    return _ENCODINGS[key]


def _decode_file(data: bytes, codec: str, bom) -> tuple[str, bool]:
    """Whole-buffer charset decode → (text, had_errors). Invalid byte
    sequences become U+FFFD and flag the file (EncodeReader semantics:
    golang transform.Reader substitutes the replacement rune and the
    stream keeps flowing — never a dropped line)."""
    if isinstance(bom, tuple):  # utf-16 BOM sniff (utf16.go:82-115)
        fallback = bom[1]
        if data[:2] == b"\xff\xfe":
            codec, data = "utf-16-le", data[2:]
        elif data[:2] == b"\xfe\xff":
            codec, data = "utf-16-be", data[2:]
        elif fallback is not None:
            codec = fallback
        else:
            # utf-16-bom requires a BOM (ErrUnsupportedSourceTypeBOM /
            # unknownEndianness): tag EVERY line of the file — the
            # endianness is unknowable, so no line is trustworthy
            return data.decode("utf-8", "replace"), "all"
        bom = None
    try:
        return data.decode(codec), False
    except UnicodeDecodeError:
        return data.decode(codec, "replace"), "lines"


def _decoded_lines_table(t: pa.Table, codec: str, bom) -> pa.Table:
    """One binary-file row → line rows (text, log.file.path[,
    error.message]). The split happens AFTER decode, so multi-byte
    terminators (utf-16 ``\\n\\x00``) frame correctly — the reference
    scans for the charset-encoded terminator (readfile/line.go);
    decode-then-split is the same framing."""
    texts: list[str] = []
    paths: list[str] = []
    errs: list[str | None] = []
    for data, path in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
        text, bad = _decode_file(data or b"", codec, bom)
        lines = text.split("\n")
        if lines and lines[-1] == "":
            lines.pop()  # trailing terminator, not an empty final line
        texts.extend(lines)
        paths.extend([path] * len(lines))
        if bad == "all":
            errs.extend(
                ["decode error: BOM required but missing"] * len(lines)
            )
        elif bad:
            # a strict decode failed somewhere in this file: tag the
            # lines carrying a replacement char (the mangled ones)
            errs.extend(
                "decode error: invalid bytes for configured encoding"
                if "�" in ln else None
                for ln in lines
            )
        else:
            errs.extend([None] * len(lines))
    return pa.table({
        "text": pa.array(texts, pa.string()),
        "log.file.path": pa.array(paths, pa.string()),
        "error.message": pa.array(errs, pa.string()),
    })


def read_log_lines(paths: list[str] | str, max_bytes: int = 10 * 1024 * 1024,
                   include_path: bool = True, encoding: str = "plain"):
    """Read newline-delimited log files → one row per line with
    ``log.file.path`` metadata (readfile/metafields.go:45-95). One read
    task per file ≈ one harvester per file.

    ``encoding``: filebeat's ``encoding:`` option (EncodeReader,
    readfile/encode.go + encoding/encoding.go). Every charset — utf-8
    included — reads whole files as binary (the file stays the
    parallelism unit, exactly one harvester's worth of sequential bytes
    per task) and decodes + line-splits per file. NOT ``read_text``:
    its datasource hard-raises on the first invalid utf-8 byte, killing
    the job, where the reference's utf8 decoder (encoding/mixed.go)
    substitutes U+FFFD and keeps flowing — decode-error rows are tagged
    via error.message, never dropped and never fatal."""
    import ray.data as rd

    codec, bom = resolve_encoding(encoding)
    ds = rd.read_binary_files(paths, include_paths=True)
    ds = ds.map_batches(
        lambda t: _decoded_lines_table(t, codec, bom),
        batch_format="pyarrow",
    )
    if not include_path:
        ds = ds.drop_columns(["log.file.path"])
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
