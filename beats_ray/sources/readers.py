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


def _sniff_bom(head: bytes, bom) -> tuple[str | None, bytes, bool]:
    """Resolve a utf-16 BOM policy against the file's first bytes →
    (codec or None, remaining head bytes, bom_missing_error).
    utf16.go:82-115: consume FF FE / FE FF; fall back to the policy's
    endianness when absent; utf-16-bom with no BOM is an error."""
    fallback = bom[1]
    if head[:2] == b"\xff\xfe":
        return "utf-16-le", head[2:], False
    if head[:2] == b"\xfe\xff":
        return "utf-16-be", head[2:], False
    if fallback is not None:
        return fallback, head, False
    return None, head, True


class _MultiStream:
    """Incremental decompressor that restarts across concatenated
    members: RFC 1952 allows a .gz file to be several gzip members
    back-to-back (``cat a.gz b.gz``, logrotate append modes), and bz2 /
    xz have the same multi-stream convention. A raw decompressobj stops
    at the first member's end and silently strands the rest in
    ``unused_data`` — stdlib ``gzip.open`` restarts, so do we. Trailing
    bytes that do not parse as a new member (e.g. logrotate's zero
    padding) end the stream, matching ``gzip``'s own tolerance."""

    def __init__(self, factory):
        self._factory = factory
        self._d = factory()
        self._done = False

    def decompress(self, data: bytes) -> bytes:
        if self._done:
            return b""
        out = []
        while True:
            try:
                out.append(self._d.decompress(data))
            except Exception:
                # bad header on a restarted member: trailing garbage,
                # not a member boundary — stop like stdlib gzip does
                self._done = True
                break
            if not self._d.eof:
                break
            data = self._d.unused_data
            if not data:
                break
            self._d = self._factory()
        return b"".join(out)

    @property
    def eof(self) -> bool:
        return self._done or self._d.eof


def _sniff_decompressor(head: bytes):
    """Magic-sniff a compressed rotated log → incremental decompressor
    (or None for plain). gzip/bz2/xz — the archive formats log rotation
    tools actually emit; each streams O(chunk), and the charset decoder
    downstream sees plain bytes (compress → charset → lines, every
    layer incremental). Multi-member archives restart mid-stream via
    _MultiStream."""
    if head[:2] == b"\x1f\x8b":
        import zlib

        return _MultiStream(lambda: zlib.decompressobj(wbits=47))
    if head[:3] == b"BZh":
        import bz2

        return _MultiStream(bz2.BZ2Decompressor)
    if head[:6] == b"\xfd7zXZ\x00":
        import lzma

        return _MultiStream(lzma.LZMADecompressor)
    return None


def _iter_file_line_tables(path: str, codec: str, bom, chunk_bytes: int,
                           rows_per_batch: int = 65536):
    """Stream ONE file as line tables with BOUNDED memory: chunked
    reads + an incremental charset decoder (multi-byte sequences and
    terminators split across chunk boundaries decode correctly), lines
    emitted every ``rows_per_batch``. gzip/bz2/xz-rotated files
    (magic-sniffed) stream through an incremental decompressor first —
    decompress → charset → lines, every layer O(chunk). A strict shadow decoder detects
    invalid input without disturbing the replace-mode stream — from the
    first bad chunk on, lines carrying U+FFFD are tagged via
    error.message (EncodeReader semantics: substitute and keep flowing,
    never drop, never die). A multi-GB file costs one task
    O(chunk_bytes), not O(file)."""
    import codecs as _codecs

    bad_all = False
    with open(path, "rb") as f:
        head = f.read(6)
        gz = _sniff_decompressor(head)
        if gz is not None:
            head = gz.decompress(head)
        if isinstance(bom, tuple):
            while gz is not None and len(head) < 4 and not gz.eof:
                raw = f.read(chunk_bytes)
                if not raw:
                    break
                head += gz.decompress(raw)
            resolved, head, bad_all = _sniff_bom(head, bom)
            codec = resolved or "utf-8"
        dec = _codecs.getincrementaldecoder(codec)("replace")
        strict = _codecs.getincrementaldecoder(codec)("strict")
        had_error = bad_all
        pending = ""
        texts: list[str] = []
        errs: list[str | None] = []

        def table() -> pa.Table:
            t = pa.table({
                "text": pa.array(texts, pa.string()),
                "log.file.path": pa.array([path] * len(texts), pa.string()),
                "error.message": pa.array(errs, pa.string()),
            })
            texts.clear()
            errs.clear()
            return t

        def push(line: str) -> None:
            texts.append(line)
            if bad_all:
                errs.append("decode error: BOM required but missing")
            elif had_error and "�" in line:
                errs.append(
                    "decode error: invalid bytes for configured encoding")
            else:
                errs.append(None)

        final = False
        while not final:
            if head:
                chunk = head
                head = b""
            else:
                chunk = f.read(chunk_bytes)
                if gz is not None and chunk:
                    chunk = gz.decompress(chunk)
                    if not chunk and not gz.eof:
                        continue  # compressed bytes consumed, none out yet
            final = not chunk
            if strict is not None:
                try:
                    strict.decode(chunk, final)
                except UnicodeDecodeError:
                    had_error = True
                    strict = None  # replace-mode stream carries on
            pending += dec.decode(chunk, final)
            lines = pending.split("\n")
            # the last piece is unterminated: carry it into the next
            # chunk; at EOF a non-empty trailer is a real final line
            # and an empty one is just the trailing terminator
            pending = lines.pop()
            for ln in lines:
                push(ln)
            if final and pending:
                push(pending)
            if len(texts) >= rows_per_batch or (final and texts):
                yield table()


def _decoded_lines_stream(codec: str, bom, chunk_bytes: int = 8 << 20):
    """map_batches generator UDF over a paths dataset: one task per
    file block, each streaming its file's lines (see
    _iter_file_line_tables). Requires the path to be readable from the
    worker — the same locality contract as a filebeat harvester."""

    def gen(t: pa.Table):
        for path in t["path"].to_pylist():
            yield from _iter_file_line_tables(path, codec, bom, chunk_bytes)

    return gen


def read_log_lines(paths: list[str] | str, max_bytes: int = 10 * 1024 * 1024,
                   include_path: bool = True, encoding: str = "plain"):
    """Read newline-delimited log files → one row per line with
    ``log.file.path`` metadata (readfile/metafields.go:45-95). One read
    task per file ≈ one harvester per file.

    ``encoding``: filebeat's ``encoding:`` option (EncodeReader,
    readfile/encode.go + encoding/encoding.go). Every charset — utf-8
    included — streams files chunk-by-chunk through an incremental
    decoder (file = parallelism unit, exactly one harvester's worth of
    sequential bytes per task, O(chunk) memory however large the file).
    NOT ``read_text``: its datasource hard-raises on the first invalid
    utf-8 byte, killing the job, where the reference's utf8 decoder
    (encoding/mixed.go) substitutes U+FFFD and keeps flowing —
    decode-error rows are tagged via error.message, never dropped and
    never fatal."""
    import glob as _glob

    import ray.data as rd

    codec, bom = resolve_encoding(encoding)
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                sorted(str(q) for q in Path(p).rglob("*") if q.is_file())
            )
        elif any(ch in p for ch in "*?["):
            files.extend(sorted(_glob.glob(p)))
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no input files in {paths!r}")
    ds = rd.from_items(
        [{"path": f} for f in files], override_num_blocks=len(files)
    )
    ds = ds.map_batches(
        _decoded_lines_stream(codec, bom), batch_format="pyarrow"
    )
    if not include_path:
        ds = ds.drop_columns(["log.file.path"])
    return line_reader_chain(ds, max_bytes=max_bytes)


def read_ndjson_logs(paths: list[str] | str, expected: dict[str, str],
                     max_bytes: int = 10 * 1024 * 1024,
                     encoding: str = "plain"):
    """NDJSON source: log lines → typed columns via the ndjson parser
    (reader/readjson/json.go semantics; schema pinned by ``expected``).
    ``encoding`` threads through to the line reader (gzip-rotated files
    are sniffed by magic either way)."""
    from ..processors import build_processor

    ds = read_log_lines(paths, max_bytes=max_bytes, include_path=True,
                        encoding=encoding)
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
