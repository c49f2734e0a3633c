"""Text analysis operators over the documents table: token counting,
quality scoring, language-ID, document fingerprinting.

All integer-valued outputs (counts, not ratios) so the DuckDB oracle
compares exactly; ratios are trivially derived downstream.
"""

from __future__ import annotations

import re
import string

import numpy as np
import pandas as pd
import pyarrow as pa

# Shared regex definitions — the DuckDB oracle inlines the same pattern
# strings, so their SEMANTICS must match across RE2 and Python `re`:
# RE2's \s is the ASCII [ \t\n\f\r] while Python's is unicode (adds
# \x0b, \xa0, …), so the token pattern spells the class out explicitly;
# RE2's \b is ASCII, so the Python side compiles with re.ASCII.
PUNCT_CLASS = "[" + re.escape(string.punctuation) + "]"
BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "it")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"


class TokenStats:
    """Stateful stage (cached task via stagecache): token/punct counts
    are byte-level numpy kernels over the raw Arrow values buffer
    (bytekernels — ~10× over the RE2 equivalents, exactly equal by
    construction); the stopword count stays an RE2 kernel because the
    ASCII ``\\b`` boundary is not a pure byte-class property."""

    def __init__(self):
        import pyarrow.compute as pc

        self.pc = pc

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import bytekernels as bk

        pc = self.pc
        text = pc.cast(pc.fill_null(t["text"].combine_chunks(), ""),
                       pa.string())
        i64 = pa.int64()
        counts = bk.token_stat_counts(text)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(text), i64),
                "n_ws_tokens": pa.array(counts["n_ws_tokens"], i64),
                "n_bpe_tokens": pa.array(counts["n_bpe_tokens"], i64),
                "n_punct": pa.array(counts["n_punct"], i64),
                "n_stopwords": pc.cast(pc.count_substring_regex(
                    pc.utf8_lower(text), pattern=STOPWORD_RE), i64),
            }
        )


def token_stats(docs):
    from .stagecache import task_stage

    # light state (compiled regexes) → fused task with per-worker
    # instance cache, not an actor pool (no ~1.5s spin-up per query)
    return docs.map_batches(task_stage(TokenStats), batch_format="pyarrow")


def quality_batch(t: pa.Table, min_chars: int = 50,
                  max_punct_ratio: float = 0.3) -> pa.Table:
    """Table-level quality kernel (shared by the standalone
    quality_score stage and fused pipelines like pipelines/curate.py)."""
    import pyarrow.compute as pc

    text = pc.cast(pc.fill_null(t["text"].combine_chunks(), ""),
                   pa.string())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
    n_punct = pc.cast(pc.count_substring_regex(
        text, pattern=PUNCT_CLASS), pa.int64()).to_numpy()
    n_stop = pc.cast(pc.count_substring_regex(
        pc.utf8_lower(text), pattern=STOPWORD_RE),
        pa.int64()).to_numpy()
    low = (n_chars < min_chars) | (n_punct > (n_chars * max_punct_ratio))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "quality": pa.array(
                np.where(low, "low", np.where(n_stop > 0, "high", "mid")),
                pa.string(),
            ),
        }
    )


def quality_score(docs, min_chars: int = 50, max_punct_ratio: float = 0.3):
    """Quality classification from the integer stats: short docs and
    punctuation-heavy docs are low quality (C4-style heuristics).
    Counts are Arrow RE2 kernels; the classification is numpy."""

    def score(t: pa.Table) -> pa.Table:
        return quality_batch(t, min_chars, max_punct_ratio)

    return docs.map_batches(score, batch_format="pyarrow")


# n-gram profiles for a tiny deterministic language-ID heuristic: score
# by stopword hits per language (public fastText/langid approach shrunk
# to a closed-world heuristic; no external model available offline).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "in", "for", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "una", "por", "con", "que"},
}


class LangId:
    """Language-ID stage, fully vectorized: tokenize (byte-level word
    runs over the raw Arrow buffer) → one hash probe of every token
    against the flat marker table (pc.index_in — the same vectorized
    probe archetype as the keyed-metadata processors) → per-(row, lang)
    hit counts via one bincount → argmax. No regex engine, no Python
    loop over rows or words; exactly the word-set formulation
    ``sum(w in markers for w in findall('[a-zà-ÿ]+', lower(text)))``."""

    def __init__(self):
        import pyarrow.compute as pc

        self.pc = pc
        self.langs = list(_LANG_MARKERS)
        # UNIQUE marker table (a marker like "la" belongs to several
        # languages; index_in maps duplicates to their first slot, so
        # membership is a (unique-marker × language) boolean matrix)
        uniq = sorted({m for marks in _LANG_MARKERS.values() for m in marks})
        self.marker_table = pa.array(
            [m.encode() for m in uniq], pa.large_binary()
        )
        self.membership = np.zeros((len(uniq), len(self.langs)), bool)
        pos = {m: i for i, m in enumerate(uniq)}
        for j, marks in enumerate(_LANG_MARKERS.values()):
            for m in marks:
                self.membership[pos[m], j] = True

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import bytekernels as bk

        pc = self.pc
        text = pc.utf8_lower(
            pc.cast(pc.fill_null(t["text"].combine_chunks(), ""),
                    pa.string())
        )
        tokens, row_ids = bk.word_tokens(text)
        nrows, nlang = t.num_rows, len(self.langs)
        hit = pc.fill_null(
            pc.index_in(tokens, value_set=self.marker_table), -1
        )
        hit_np = hit.to_numpy()  # zero-copy int32, -1 = no marker
        ok = hit_np != -1
        uniq_idx = hit_np[ok].astype(np.int64)
        rows_ok = row_ids[ok]
        nuniq = len(self.marker_table)
        # one bincount over (row, unique-marker), then a tiny matmul
        # into language space (a marker may belong to several languages)
        per_marker = np.bincount(
            rows_ok * nuniq + uniq_idx, minlength=nrows * nuniq
        ).reshape(nrows, nuniq)
        counts = per_marker @ self.membership.astype(np.int64)
        best = np.asarray(self.langs, dtype=object)[counts.argmax(axis=1)]
        # original tie rule: first language in declaration order with a
        # STRICTLY greater count; all-zero → unknown (argmax already
        # returns the first max, so only the zero case needs a mask)
        preds = np.where(counts.max(axis=1) > 0, best, "unknown")
        return pa.table(
            {"doc_id": t["doc_id"],
             "lang_pred": pa.array(preds, pa.string())}
        )


def lang_id(docs):
    from .stagecache import task_stage

    return docs.map_batches(task_stage(LangId), batch_format="pyarrow")


def doc_fingerprint(docs, prefix_len: int = 16):
    """Document fingerprint: md5-based content id (rolling-hash class;
    the md5 variant is oracle-checkable via DuckDB md5())."""
    import hashlib

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()[:prefix_len]
                    for t in df["text"].fillna("")
                ],
            }
        )

    return docs.map_batches(fp, batch_format="pandas")


def windowed_top_terms(turns, k: int = 5, window: str = "h",
                       text_col: str = "text", ts_col: str = "ts"):
    """Trending terms: top-``k`` ws-tokens of lower(text) per tumbling
    time window (count desc, term asc). Per-batch partial counts
    shrink the shuffle to distinct (window, term) pairs; ONE
    co-locating shuffle on the window finishes — windows are bounded
    by the time span, never by corpus size. Output
    (w_start, term, n)."""
    import pyarrow.compute as pc

    from .agg import map_buckets

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pa.table({"t": pa.array(df[text_col].fillna(""), pa.string())})
        words = pc.split_pattern_regex(
            pc.utf8_lower(t["t"].combine_chunks()), pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = np.asarray(pc.list_flatten(words).to_pandas(), dtype=object)
        w = np.repeat(df[ts_col].dt.floor(window).to_numpy(), lens)
        nonblank = flat != ""
        out = pd.DataFrame({"w_start": w[nonblank], "term": flat[nonblank]})
        return out.groupby(["w_start", "term"], as_index=False).size() \
                  .rename(columns={"size": "n"})

    partials = turns.select_columns([ts_col, text_col]).map_batches(
        partial, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["w_start", "term"], as_index=False)["n"].sum()
        g = g.sort_values(["w_start", "n", "term"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("w_start", sort=False).head(k)
        top["n"] = top["n"].astype("int64")
        return top

    return map_buckets(partials, "w_start", finish, buckets=16)


def word_freq_spectrum(docs, text_col: str = "text"):
    """Zipf/Good-Turing frequency spectrum: for each corpus word
    frequency f, how many distinct words occur exactly f times. Two
    bounded shuffles — term counts (distinct-vocab keys), then the
    regroup by count value (≲ O(√total-tokens) distinct frequencies).
    The spectrum's head (n₁, n₂, …) is the Good-Turing smoothing input
    and the whole curve is the standard corpus-health diagnostic.
    Output Dataset[(freq, n_terms)], both int64."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .agg import grouped_count, grouped_sum

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        flat = pc.list_flatten(
            pc.split_pattern_regex(text, pattern=r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "term": pc.cast(vc.field("values"), pa.string()),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = grouped_sum(
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "term", "c",
    )
    spectrum = grouped_count(counts, ["c"], name="n_terms")
    return spectrum.map_batches(
        lambda t: pa.table({"freq": t["c"], "n_terms": t["n_terms"]}),
        batch_format="pyarrow",
    )
