"""Charset decode in the line-reader chain — goldens mirroring the
reference's readfile/encode_test.go (per-line BOM stripping) and
readfile/encoding tests (charmap/utf-16/BOM-policy decode)."""

import pytest
import ray.data as rd

from beats_ray.sources.readers import read_log_lines, resolve_encoding


def _read(tmp_path, payload: bytes, encoding: str, name="f.log"):
    p = tmp_path / name
    p.write_bytes(payload)
    df = read_log_lines(str(p), encoding=encoding).to_pandas()
    return df


def test_latin1_lines(ray_session, tmp_path):
    df = _read(tmp_path, "caf\xe9 au lait\nn\xfc\xf1ez\n".encode("latin-1"),
               "iso8859-1")
    assert df["text"].tolist() == ["café au lait", "nüñez"]
    assert df["error.message"].isna().all()


def test_gbk_lines(ray_session, tmp_path):
    df = _read(tmp_path, "中文日志\n第二行\n".encode("gbk"), "gbk")
    assert df["text"].tolist() == ["中文日志", "第二行"]


def test_utf16le_frames_multibyte_terminators(ray_session, tmp_path):
    # the \n is 0A 00 in utf-16le — a byte-level splitter would shear
    # every code unit; decode-then-split must frame correctly
    df = _read(tmp_path, "alpha\nbeta\r\ngamma\n".encode("utf-16-le"),
               "utf-16le")
    assert df["text"].tolist() == ["alpha", "beta", "gamma"]


def test_utf16_bom_sniff_and_fallback(ray_session, tmp_path):
    # BOM present: endianness comes from the BOM, BOM is consumed
    be = "﻿big\nendian\n".encode("utf-16-be")
    df = _read(tmp_path, be, "utf-16le-bom", name="be.log")
    assert df["text"].tolist() == ["big", "endian"]
    # BOM absent: utf-16le-bom falls back to little-endian
    # (readfile/encoding/utf16.go:49-55)
    df = _read(tmp_path, "fall\nback\n".encode("utf-16-le"),
               "utf-16le-bom", name="le.log")
    assert df["text"].tolist() == ["fall", "back"]


def test_utf16_bom_required_without_bom_tags(ray_session, tmp_path):
    # utf-16-bom with no BOM is an error in the reference
    # (ErrUnsupportedSourceTypeBOM); here: rows tagged, not dropped
    df = _read(tmp_path, "no\nbom\n".encode("utf-16-le"), "utf-16-bom")
    assert df["error.message"].notna().any()


def test_invalid_bytes_tagged_not_dropped(ray_session, tmp_path):
    # invalid utf-8 must not kill the job (encoding/mixed.go: U+FFFD
    # substitution, stream keeps flowing) — the bad ROW is tagged, the
    # good rows are untouched
    payload = b"good line\nbad \xff\xfe\xff line\nanother good\n"
    df = _read(tmp_path, payload, "utf-8")
    assert len(df) == 3
    assert df["text"].tolist()[0] == "good line"
    assert df["text"].tolist()[2] == "another good"
    assert df["error.message"].notna().tolist() == [False, True, False]

    df = _read(tmp_path, "ok\n".encode("utf-16-le") + b"\x41",
               "utf-16le", name="bad16.log")
    assert df["text"].tolist()[0] == "ok"
    assert df["error.message"].notna().sum() == 1  # the mangled row only


def test_per_line_bom_stripping_matches_encode_reader(ray_session, tmp_path):
    # encode_test.go TestEncodeLines: a U+FEFF PREFIX is removed on
    # every line; mid-line and non-BOM lookalikes are content
    payload = ("﻿testing\n﻿multiline\n"
               "testing simple ﻿line\n"
               "￯testing simple line\n").encode("utf-8")
    df = _read(tmp_path, payload, "plain")
    assert df["text"].tolist() == [
        "testing", "multiline",
        "testing simple ﻿line",
        "￯testing simple line",
    ]


def test_unknown_encoding_is_config_error(ray_session):
    with pytest.raises(ValueError, match="unknown encoding"):
        resolve_encoding("klingon-8")


def test_encoding_names_resolve_to_real_codecs():
    """Every registry entry must name a codec Python can actually
    instantiate (catches alias typos for the long charmap tail)."""
    import codecs

    from beats_ray.sources.readers import _ENCODINGS

    for name, (codec, _bom) in _ENCODINGS.items():
        codecs.lookup(codec)


def test_crlf_and_final_unterminated_line(ray_session, tmp_path):
    df = _read(tmp_path, "a\r\nb\nc-no-newline".encode("cp1252"),
               "windows1252")
    assert df["text"].tolist() == ["a", "b", "c-no-newline"]


# ---------------------------------------------------- property tests
# The incremental decoder must survive ARBITRARY chunk boundaries —
# multi-byte sequences and terminators split anywhere. These drive the
# pure per-file generator directly (no Ray session), with chunk sizes
# small enough that every boundary case occurs.

from hypothesis import given, settings
from hypothesis import strategies as st

from beats_ray.sources.readers import _iter_file_line_tables

_ENCS = ["utf-8", "iso8859-1", "gbk", "windows1251", "euc-jp",
         "utf-16le", "utf-16be", "cp437"]


def _encodable(codec):
    def ok(s):
        try:
            s.encode(codec)
            return True
        except (UnicodeEncodeError, ValueError):
            return False
    return ok


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_roundtrip_any_chunk_boundary(tmp_path_factory, data):
    enc = data.draw(st.sampled_from(_ENCS))
    codec, bom = resolve_encoding(enc)
    line_st = st.text(
        alphabet=st.characters(
            blacklist_characters="\n\r﻿",
            blacklist_categories=("Cs",),
        ),
        max_size=24,
    ).filter(_encodable(codec)).filter(
        # the reader strips ONE trailing \r as part of \r\n framing and
        # a LEADING BOM per line — exclude those from line content
        lambda s: not s.endswith("\r")
    )
    lines = data.draw(st.lists(line_st, min_size=1, max_size=8))
    chunk = data.draw(st.integers(min_value=1, max_value=7))
    payload = ("\n".join(lines) + "\n").encode(codec)
    p = tmp_path_factory.mktemp("enc") / "f.log"
    p.write_bytes(payload)
    got = []
    for tbl in _iter_file_line_tables(str(p), codec, bom, chunk):
        got += tbl["text"].to_pylist()
        assert tbl["error.message"].null_count == len(tbl)
    assert got == lines


def test_gzip_rotated_log_streams_and_decodes(ray_session, tmp_path):
    """gzip → charset → lines, all incremental: a .gz latin-1 log
    decodes identically to its plain twin, via magic sniff (no
    extension contract)."""
    import gzip

    lines = ["café au lait", "naïve résumé", "plain ascii"]
    payload = ("\n".join(lines) + "\n").encode("iso8859-1")
    (tmp_path / "log.gz").write_bytes(gzip.compress(payload))
    df = read_log_lines(str(tmp_path / "log.gz"),
                        encoding="iso8859-1").to_pandas()
    assert df["text"].tolist() == lines
    assert df["error.message"].isna().all()


def test_gzip_with_utf16_bom_policy(ray_session, tmp_path):
    import gzip

    lines = ["utf sixteen", "ånother line"]
    payload = "﻿" + "\n".join(lines) + "\n"
    (tmp_path / "u16.gz").write_bytes(
        gzip.compress(payload.encode("utf-16-le"))
    )
    df = read_log_lines(str(tmp_path / "u16.gz"),
                        encoding="utf-16-bom").to_pandas()
    assert df["text"].tolist() == lines


def test_gzip_large_file_chunked(ray_session, tmp_path):
    """A multi-chunk gz file (content ≫ chunk) reassembles exactly."""
    import gzip

    lines = [f"line-{i}-" + "x" * (i % 97) for i in range(20000)]
    (tmp_path / "big.gz").write_bytes(
        gzip.compress(("\n".join(lines) + "\n").encode())
    )
    df = read_log_lines(str(tmp_path / "big.gz")).to_pandas()
    assert df["text"].tolist() == lines


def test_bz2_and_xz_rotated_logs(ray_session, tmp_path):
    """bz2/xz archives (the other formats logrotate emits) stream
    through the same incremental path as gzip — magic-sniffed."""
    import bz2
    import lzma

    lines = ["alpha", "beta מֿ unicode", "gamma"]
    payload = ("\n".join(lines) + "\n").encode()
    (tmp_path / "a.bz2").write_bytes(bz2.compress(payload))
    (tmp_path / "b.xz").write_bytes(lzma.compress(payload))
    for name in ("a.bz2", "b.xz"):
        df = read_log_lines(str(tmp_path / name)).to_pandas()
        assert df["text"].tolist() == lines, name
        assert df["error.message"].isna().all()


def test_multi_member_gzip_reads_every_member(tmp_path):
    """Regression: concatenated gzip members (RFC 1952 — what
    ``cat a.gz b.gz`` and logrotate append modes produce) previously
    ended the read at the first member's eof, silently dropping the
    rest of the file. bz2 and xz multi-stream files likewise."""
    import bz2
    import gzip
    import lzma

    from beats_ray.sources.readers import (
        _iter_file_line_tables,
        resolve_encoding,
    )

    codec, bom = resolve_encoding("plain")

    def read_all(path):
        out = []
        for t in _iter_file_line_tables(str(path), codec, bom, 8 << 20):
            out += t["text"].to_pylist()
        return out

    p = tmp_path / "multi.gz"
    p.write_bytes(gzip.compress(b"line1\nline2\n")
                  + gzip.compress(b"line3\nline4\n"))
    assert read_all(p) == ["line1", "line2", "line3", "line4"]

    p = tmp_path / "multi.bz2"
    p.write_bytes(bz2.compress(b"a\nb\n") + bz2.compress(b"c\n"))
    assert read_all(p) == ["a", "b", "c"]

    p = tmp_path / "multi.xz"
    p.write_bytes(lzma.compress(b"x\n") + lzma.compress(b"y\n"))
    assert read_all(p) == ["x", "y"]

    # logrotate-style trailing zero padding ends the stream cleanly
    # (stdlib gzip's own tolerance), it is not a member
    p = tmp_path / "padded.gz"
    p.write_bytes(gzip.compress(b"p1\np2\n") + b"\x00" * 512)
    assert read_all(p) == ["p1", "p2"]
