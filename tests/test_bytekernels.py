"""Byte-level numpy kernels vs the Python-regex reference semantics —
randomized cross-checks (the kernels claim EXACT equality by
construction; these tests are the proof obligation)."""

import re

import numpy as np
import pyarrow as pa
import pytest

from beats_ray.dataops import bytekernels as bk
from beats_ray.dataops.textstats import BPE_TOKEN, PUNCT_CLASS

_NON_WS = re.compile(r"[^ \t\n\f\r]+")
_BPE = re.compile(BPE_TOKEN)
_PUNCT = re.compile(PUNCT_CLASS)
_WORD = re.compile(r"[a-zà-ÿ]+")

# alphabet chosen to hit every boundary class: ASCII ws (incl \x0b,
# which is ws for Python \s but NOT for RE2), letters, digits, punct,
# 2-byte word chars (é), 2-byte non-word (ß U+00DF, just below à),
# 3-byte (—), 4-byte (😀), and the BOM char
_ALPHABET = list("ab z09.,!\t\n\r\f\x0b") + ["é", "ÿ", "à", "ß", "—", "😀", "ﬀ"]


def _random_texts(seed: int, n: int = 300) -> list[str]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(0, 40))
        out.append("".join(rng.choice(_ALPHABET, size=k)))
    out += ["", " ", "à", "ßà", "a", "é—é", "\x0b", "😀a😀"]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_counts_match_python_regex(seed):
    texts = _random_texts(seed)
    arr = pa.array(texts, pa.string())
    assert bk.ws_token_count(arr).tolist() == [
        len(_NON_WS.findall(t)) for t in texts
    ]
    assert bk.bpe_token_count(arr).tolist() == [
        len(_BPE.findall(t)) for t in texts
    ]
    assert bk.punct_count(arr).tolist() == [
        len(_PUNCT.findall(t)) for t in texts
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_word_tokens_match_findall(seed):
    texts = [t.lower() for t in _random_texts(seed)]
    arr = pa.array(texts, pa.string())
    tokens, row_ids = bk.word_tokens(arr)
    got: dict[int, list[bytes]] = {}
    for tok, rid in zip(tokens.to_pylist(), row_ids.tolist()):
        got.setdefault(rid, []).append(tok)
    for i, t in enumerate(texts):
        want = [w.encode() for w in _WORD.findall(t)]
        assert got.get(i, []) == want, (i, t)


def test_chunked_and_sliced_inputs():
    texts = ["a b", "  c", "", "d e f"]
    chunked = pa.chunked_array([texts[:2], texts[2:]])
    assert bk.ws_token_count(chunked).tolist() == [2, 1, 0, 3]
    sliced = pa.array(["xx yy", *texts]).slice(1)
    assert bk.ws_token_count(sliced).tolist() == [2, 1, 0, 3]


def test_runs_never_leak_across_rows():
    # row 1 ends in-class, row 2 starts in-class: two runs, not one
    arr = pa.array(["ab", "cd", "", "ef"])
    assert bk.ws_token_count(arr).tolist() == [1, 1, 0, 1]
    tokens, rows = bk.word_tokens(arr)
    assert tokens.to_pylist() == [b"ab", b"cd", b"ef"]
    assert rows.tolist() == [0, 1, 3]


def test_trailing_empty_rows_do_not_truncate_previous_row():
    """Regression: a trailing EMPTY row starts at len(buffer); clamping
    that index into reduceat silently ended the previous row's segment
    one byte early (["a.b.", ""] counted 1 punct, not 2), and
    word_tokens indexed out of bounds."""
    import pyarrow as pa

    from beats_ray.dataops.bytekernels import (
        punct_count,
        word_tokens,
        ws_token_count,
    )

    assert punct_count(pa.array(["a.b.", ""])).tolist() == [2, 0]
    assert ws_token_count(pa.array(["a b", ""])).tolist() == [2, 0]
    assert ws_token_count(pa.array(["x", "", ""])).tolist() == [1, 0, 0]
    toks, rows = word_tokens(pa.array(["one two", "", ""]))
    assert [bytes(t) for t in toks.to_pylist()] == [b"one", b"two"]
    assert rows.tolist() == [0, 0]
    # all-empty batch
    toks, rows = word_tokens(pa.array(["", ""]))
    assert len(toks) == 0 and len(rows) == 0


def test_sliced_arrays_stay_exact():
    """Regression: a zero-copy slice shares the full values buffer; the
    kernels previously let the last reduceat segment (and word-run
    markers) scan bytes belonging to rows OUTSIDE the slice — wrong
    counts and a shape crash in word_tokens."""
    import re

    import numpy as np
    import pyarrow as pa

    from beats_ray.dataops.bytekernels import (
        bpe_token_count,
        punct_count,
        word_tokens,
        ws_token_count,
    )

    arr = pa.array(["aa bb cc", "dd ee", "ff gg hh ii"])
    assert ws_token_count(arr.slice(0, 2)).tolist() == [3, 2]
    assert ws_token_count(arr.slice(1, 2)).tolist() == [2, 4]
    toks, rows = word_tokens(arr.slice(0, 2))
    assert toks.to_pylist() == [b"aa", b"bb", b"cc", b"dd", b"ee"]
    assert rows.tolist() == [0, 0, 0, 1, 1]
    assert punct_count(pa.array(["a.b.", ""]).slice(0, 1)).tolist() == [2]

    rng = np.random.default_rng(7)
    alphabet = list("ab .,\tà9")
    texts = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 20)))
        for _ in range(120)
    ]
    big = pa.array(texts)
    for _ in range(30):
        i = int(rng.integers(0, len(texts)))
        n = int(rng.integers(0, len(texts) - i))
        s = big.slice(i, n)
        window = texts[i: i + n]
        exp_ws = [len(re.findall(r"[^ \t\n\f\r]+", t)) for t in window]
        assert ws_token_count(s).tolist() == exp_ws
        exp_bpe = [
            len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]", t))
            for t in window
        ]
        assert bpe_token_count(s).tolist() == exp_bpe
        tk, rid = word_tokens(s)
        expected = [
            (j, m.encode())
            for j, t in enumerate(window)
            for m in re.findall(r"[a-zà-ÿ]+", t.lower())
        ]
        assert list(zip(rid.tolist(), tk.to_pylist())) == expected
