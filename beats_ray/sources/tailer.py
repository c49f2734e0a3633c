"""File tailer — the filestream harvester's core loop, for real.

Reference: filebeat's filestream input (filebeat/input/filestream) tails
growing files with a REGISTRY of per-file byte offsets keyed by file
IDENTITY (device:inode, not path — a rotated file keeps its offset, the
fresh file under the old path starts at 0; internal/input-logfile store
+ fileProspector identity semantics), reads only appended bytes each
cycle, cuts at the last complete line, and commits offsets only after
the events are acknowledged downstream.

Ray-Data shape: ``poll()`` is a micro-batch — the driver stats the
matched files (metadata only), builds a read PLAN of (path, offset)
items, and a ``map_batches`` task per file reads its appended byte
range, cuts at the last ``\\n``, and emits decoded line rows
(``log.file.path`` + per-line ``log.offset``, the reference's metadata
fields). Offsets advance in the registry only on ``commit()`` — the
same write-then-ack ordering as the socket WAL, so a crash between
poll and commit re-reads the window (at-least-once; pair with the
fingerprint dedup sink for exactly-once effect). One tailer per
file-set per node; no cross-node state.

Charsets: any single-byte or UTF-8 ``encoding:`` works (the cut point
is a ``\\n`` byte, which never occurs inside a multi-byte UTF-8
sequence; GBK/Big5/Shift-JIS trail bytes are all ≥0x40). UTF-16 tailing
raises — its terminator is two bytes and a byte-offset cut could shear
a code unit — and so do the EBCDIC charmaps, whose LF byte is 0x25.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import pyarrow as pa

from .readers import line_reader_chain, resolve_encoding

_MAX_POLL_BYTES = 64 << 20  # per file per poll — backpressure bound


def _ident(st: os.stat_result) -> str:
    return f"{st.st_dev}:{st.st_ino}"


def _read_appended(path: str, offset: int,
                   limit: int = _MAX_POLL_BYTES) -> tuple[bytes, int, int]:
    """(complete-line bytes, start offset actually used, new offset).
    Truncation (size < offset) means the inode was reused/truncated —
    restart at 0, the reference prospector's rule."""
    st = os.stat(path)
    if st.st_size < offset:
        offset = 0
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(min(st.st_size - offset, limit))
    cut = data.rfind(b"\n") + 1  # leave the unterminated tail in place
    if cut == 0 and len(data) >= limit:
        # a single line longer than the whole poll window: with no
        # forced cut the offset never advances and this file is wedged
        # forever, re-reading the same window each poll. Emit the window
        # as one oversized unterminated line — downstream
        # line_reader_chain tags it ``truncated`` at max_bytes, the
        # reference line scanner's own rule for over-long lines.
        cut = len(data)
    return data[:cut], offset, offset + cut


class FileTailer:
    """Micro-batch tail over a glob of growing log files."""

    def __init__(self, pattern: str, state_dir: str,
                 encoding: str = "plain",
                 max_bytes: int = 10 * 1024 * 1024,
                 max_poll_bytes: int = _MAX_POLL_BYTES):
        codec, bom = resolve_encoding(encoding)
        if isinstance(bom, tuple) or codec.startswith("utf-16"):
            raise ValueError(
                "utf-16 tailing is not supported (two-byte terminators "
                "shear at byte-offset cuts); use a single-byte or utf-8 "
                "encoding"
            )
        if "\n".encode(codec) != b"\n":
            # EBCDIC charmaps encode LF as 0x25: a 0x0A byte-offset cut
            # would never find a line boundary and the tail would
            # silently emit nothing forever
            raise ValueError(
                f"encoding {encoding!r} does not terminate lines with "
                "the 0x0A byte, so byte-offset tailing cannot find line "
                "boundaries; read such files whole via read_log_lines"
            )
        self.pattern = pattern
        self.codec = codec
        self.max_bytes = max_bytes
        self.max_poll_bytes = max_poll_bytes
        self.state = Path(state_dir)
        self.state.mkdir(parents=True, exist_ok=True)
        self._reg_path = self.state / "registry.json"
        self.registry: dict[str, int] = (
            json.loads(self._reg_path.read_text())
            if self._reg_path.exists() else {}
        )
        self._pending: dict[str, int] = {}

    def _plan(self) -> list[dict]:
        """Stat every matched file → (path, identity, stored offset)."""
        import glob as _glob

        items = []
        for path in sorted(_glob.glob(self.pattern)):
            try:
                st = os.stat(path)
            except OSError:
                continue  # raced with rotation/unlink
            ident = _ident(st)
            items.append({
                "path": path,
                "ident": ident,
                # a rotated-away file keeps its offset under its inode;
                # the fresh file under the old path is a NEW inode → 0
                "offset": int(self.registry.get(ident, 0)),
                "size": st.st_size,
            })
        return items

    def poll(self):
        """Read everything appended since the last commit → line
        Dataset [text, log.file.path, log.offset(+truncated flag)].
        Offsets move to ``pending``; call ``commit()`` once the window
        is durably written downstream."""
        import ray.data as rd

        items = self._plan()
        # steady-state skip: a file whose size equals its committed
        # offset has nothing new — no Ray task for it (a mostly-idle
        # tail loop polls every second; size < offset = truncation and
        # MUST be read). Unchanged files keep their stored offset.
        changed = [i for i in items if i["size"] != i["offset"]]
        unchanged_pending = {
            i["ident"]: i["offset"] for i in items
            if i["size"] == i["offset"]
        }
        items = changed
        codec, max_bytes = self.codec, self.max_bytes
        poll_limit = self.max_poll_bytes

        def read_ranges(t: pa.Table):
            for path, ident, offset in zip(
                t["path"].to_pylist(), t["ident"].to_pylist(),
                t["offset"].to_pylist(),
            ):
                try:
                    data, start, end = _read_appended(path, offset,
                                                      poll_limit)
                except OSError:
                    continue  # unlinked mid-poll: next cycle catches up
                if not data:
                    yield pa.table({
                        "text": pa.array([], pa.string()),
                        "log.file.path": pa.array([], pa.string()),
                        "log.offset": pa.array([], pa.int64()),
                        "_ident": pa.array([], pa.string()),
                        "_end": pa.array([], pa.int64()),
                    })
                    continue
                parts = data.decode(codec, "replace").split("\n")
                if parts[-1] == "":
                    parts.pop()  # normal case: terminator-ended window
                # else: the force-cut oversized line (no newline in a
                # full poll window) rides as the final unterminated row
                lines = parts
                # per-line byte offsets (reference log.offset): start of
                # each line — exact for single-byte/utf-8 content; one
                # numpy newline scan, no per-line Python
                import numpy as np

                nl = np.flatnonzero(
                    np.frombuffer(data, np.uint8) == 0x0A
                )
                n = len(lines)
                offs = np.empty(n, np.int64)
                offs[0] = start
                offs[1:] = start + nl[: n - 1] + 1
                yield pa.table({
                    "text": pa.array(lines, pa.string()),
                    "log.file.path": pa.array([path] * n, pa.string()),
                    "log.offset": pa.array(offs, pa.int64()),
                    "_ident": pa.array([ident] * n, pa.string()),
                    "_end": pa.array([end] * n, pa.int64()),
                })

        if not items:
            self._pending = unchanged_pending
            empty = pa.table({
                "text": pa.array([], pa.string()),
                "log.file.path": pa.array([], pa.string()),
                "log.offset": pa.array([], pa.int64()),
            })
            return line_reader_chain(rd.from_arrow(empty),
                                     max_bytes=self.max_bytes)

        ds = rd.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(read_ranges, batch_format="pyarrow")
        # the window is micro-batch-sized by construction (poll cadence
        # × append rate, capped per file) — materializing lets the new
        # offsets be extracted without a second file read
        out = out.materialize()
        # per-file committed offsets: reduce inside each block (Arrow
        # group_by, one row per file per block) so the driver sees
        # blocks×files rows, never the 2M-line window itself (measured:
        # the row-wise driver iteration cost 10.7 s on a 2M-line poll;
        # this path is ~0.1 s)
        ends: dict[str, int] = {}
        meta = out.select_columns(["_ident", "_end"]).map_batches(
            lambda tb: tb.group_by("_ident").aggregate([("_end", "max")]),
            batch_format="pyarrow",
        )
        for batch in meta.iter_batches(batch_format="pyarrow"):
            for ident, end in zip(batch["_ident"].to_pylist(),
                                  batch["_end_max"].to_pylist()):
                ends[ident] = max(ends.get(ident, 0), int(end))
        # files with no new complete lines keep their stored offset
        self._pending = {
            i["ident"]: ends.get(i["ident"], i["offset"]) for i in items
        }
        self._pending.update(unchanged_pending)
        lines = out.drop_columns(["_ident", "_end"])
        return line_reader_chain(lines, max_bytes=self.max_bytes)

    def commit(self) -> None:
        """Persist the offsets of the last poll (atomic rename) — call
        AFTER the window's output is durably written."""
        self.registry.update(self._pending)
        self._pending = {}
        fd, tmp = tempfile.mkstemp(dir=self.state, suffix=".reg")
        with os.fdopen(fd, "w") as f:
            json.dump(self.registry, f)
        os.replace(tmp, self._reg_path)

    def poll_window_to_parquet(self, out_dir: str, window_id: int) -> int:
        """One tail window, crash-ordered: poll → write the window's
        parquet partition → ONLY THEN commit offsets. Returns rows."""
        ds = self.poll().materialize()
        n = ds.count()
        if n:
            ds.write_parquet(
                os.path.join(out_dir, f"window-{window_id:06d}")
            )
        self.commit()
        return n


def tail_pipeline(tailer: FileTailer, out_dir: str, window_id: int,
                  processors: list[dict] | None = None,
                  rules: list[dict] | None = None) -> int:
    """One full filebeat-equivalent cycle: poll appended lines →
    ordered processor chain (dissect/syslog/ndjson/... — any registered
    processor spec) → selector routing → per-sink parquet partitions →
    commit offsets. Write-then-commit ordering end to end: a crash
    anywhere re-polls the window (at-least-once). Processor and rule
    configs validate EAGERLY on the driver before any file is read.
    Returns rows written."""
    from ..processors import build_processor
    from ..routing import Router

    chain = [build_processor(spec) for spec in (processors or [])]
    router = Router(rules) if rules else None

    ds = tailer.poll()
    for proc in chain:
        ds = ds.map_batches(proc, batch_format="pyarrow", batch_size=None)
    if router is not None:
        ds = ds.map_batches(router, batch_format="pyarrow",
                            batch_size=None)
    ds = ds.materialize()
    n = ds.count()
    if n:
        ds.write_parquet(
            os.path.join(out_dir, f"window-{window_id:06d}"),
            partition_cols=["sink"] if router is not None else None,
        )
    tailer.commit()
    return n
