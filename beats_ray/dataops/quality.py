"""Corpus quality filtering — C4-style rule cleaning and a
fit-then-score n-gram coverage model.

- ``c4_line_filter``: the C4 cleaning rules re-expressed per document:
  a LINE survives iff it ends in terminal punctuation and has at least
  ``min_words`` words; a DOCUMENT is dropped entirely when it contains
  any blocklisted phrase (lorem ipsum / javascript / curly braces —
  the public C4 heuristics). Output keeps integer evidence (line
  counts) plus the cleaned text, so the SQL oracle compares exactly.
- ``bigram_coverage``: the two-pass "fit on the corpus, then score the
  corpus" archetype: pass 1 aggregates bigram counts and keeps the
  top-``model_k`` as the model (distributed top-k — the model, not the
  vocabulary, is driver-sized); pass 2 broadcasts the model and scores
  every document by how many of its bigrams the model covers. Integer
  outputs (n_bigrams, n_in_model) so coverage ratios derive downstream
  without float-compare risk.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import ws_tokens

C4_BLOCKLIST = ("lorem ipsum", "javascript", "{")
# terminal punctuation followed only by ASCII whitespace — the RE2 \s
# class, so the SQL oracle's '[.!?"]\s*$' matches identically
_C4_END_RE = re.compile(r'[.!?"][ \t\n\f\r]*$')


def c4_line_filter(docs, text_col: str = "text", min_words: int = 5):
    """Per-doc C4 cleaning: returns (doc_id, n_lines, n_kept, blocked,
    clean_text). ``blocked`` docs keep their counts but an empty
    clean_text (tag-and-keep, never silently dropped)."""

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        n_lines, n_kept, blocked, out_text = [], [], [], []
        for text in df[text_col].fillna(""):
            low = text.lower()
            is_blocked = any(b in low for b in C4_BLOCKLIST)
            lines = text.split("\n")
            kept = [
                ln
                for ln in lines
                if _C4_END_RE.search(ln)
                and len(ws_tokens(ln)) >= min_words
            ]
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            blocked.append(is_blocked)
            out_text.append("" if is_blocked else "\n".join(kept))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_lines": pd.array(n_lines, dtype="int64"),
                "n_kept": pd.array(n_kept, dtype="int64"),
                "blocked": pd.array(blocked, dtype="bool"),
                "clean_text": out_text,
            }
        )

    return docs.map_batches(clean, batch_format="pandas")


IDF_SCALE = 1_000_000


def fit_df_model(docs, text_col: str = "text", model_k: int = 10_000):
    """Document-frequency model: the ``model_k`` most document-frequent
    lowercased ws-tokens (the CountVectorizer max_features rule).
    Distributed: per-batch DISTINCT (doc, term) fold → grouped count →
    top-k (df desc, term asc); the driver holds only the k-row model."""

    from .agg import grouped_sum, top_k_by

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        # distinct per doc, then per-batch partial df
        terms: dict[str, int] = {}
        for ws in words.to_pylist():
            for w in set(ws):
                if w:
                    terms[w] = terms.get(w, 0) + 1
        return pa.table({"term": pa.array(list(terms), pa.string()),
                         "df": pa.array(list(terms.values()), pa.int64())})

    counts = grouped_sum(
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "term", "df",
    )
    model = top_k_by(counts, "df", "term", model_k).to_pandas()
    if "term" not in model.columns:
        model = pd.DataFrame({"term": pd.Series(dtype="string"),
                              "df": pd.Series(dtype="int64")})
    return model


def tfidf_top_terms(docs, text_col: str = "text", model_k: int = 10_000):
    """Per-document top TF-IDF term over a bounded broadcast
    vocabulary — the second fit-then-score archetype beside
    :func:`bigram_coverage`.  The idf is carried as the INTEGER
    ``floor(1e6 · ln(N/df))`` so scores compare exactly in SQL (DuckDB
    ln/FLOOR is bit-identical to CPython libm on this stack — proven
    exhaustively in the sketch tests); each doc's winner (score desc,
    term asc tie-break) is decided inside its own batch row, so scoring
    needs NO shuffle at all: the model ships once via ray.put, documents
    never move. Output: (doc_id, term, tf, df, score); docs with no
    in-model term produce no row (the oracle's join does the same)."""
    import math

    n_docs = int(docs.count())
    model = fit_df_model(docs, text_col=text_col, model_k=model_k)
    idf = {
        t: math.floor(IDF_SCALE * math.log(n_docs / d))
        for t, d in zip(model["term"], model["df"])
    }
    dfs = dict(zip(model["term"], (int(d) for d in model["df"])))
    ref = ray.put((idf, dfs))

    def score(df: pd.DataFrame, ref) -> pd.DataFrame:
        from .joins import _resolve_ref

        idf, dfs = _resolve_ref(ref)
        out = {"doc_id": [], "term": [], "tf": [], "df": [], "score": []}
        for doc_id, text in zip(df["doc_id"], df[text_col].fillna("")):
            counts: dict[str, int] = {}
            for w in ws_tokens(text.lower()):
                if w in idf:
                    counts[w] = counts.get(w, 0) + 1
            if not counts:
                continue
            # (score desc, term asc) — deterministic winner
            best_score = max(c * idf[t] for t, c in counts.items())
            term = min(t for t, c in counts.items()
                       if c * idf[t] == best_score)
            out["doc_id"].append(int(doc_id))
            out["term"].append(term)
            out["tf"].append(counts[term])
            out["df"].append(dfs[term])
            out["score"].append(counts[term] * idf[term])
        return pd.DataFrame({
            "doc_id": pd.array(out["doc_id"], dtype="int64"),
            "term": pd.array(out["term"], dtype=object),
            "tf": pd.array(out["tf"], dtype="int64"),
            "df": pd.array(out["df"], dtype="int64"),
            "score": pd.array(out["score"], dtype="int64"),
        })

    return docs.map_batches(score, fn_kwargs={"ref": ref},
                            batch_format="pandas")


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs, text_col: str = "text", min_words: int = 50,
                 max_words: int = 100_000, min_stop_hits: int = 2):
    """Gopher-style document quality rules (Rae et al. 2021, the
    public heuristics) — per doc: word count in [min,max], mean word
    length in [3,10], symbol-to-word ratio ('#'/'...') <= 0.1, <=90% of
    lines bullet-started, <=30% ellipsis-ended, >=80% of words contain
    an alphabetic char, >=2 of the 8 required stop words present.

    Every metric is a pyarrow.compute C++ kernel over the raw text —
    counting kernels, never a tokenize-and-explode — and every rule is
    an INTEGER comparison (``3*n_words <= n_word_chars`` instead of a
    float mean), so the SQL oracle compares exactly. Output keeps the
    evidence counters alongside the verdict (tag-and-keep; filtering is
    the caller's one-line follow-up)."""

    def score(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t[text_col].combine_chunks(), "")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_ws = pc.count_substring_regex(
            text, "[ \t\n\f\r]").to_numpy(zero_copy_only=False)
        n_words = pc.count_substring_regex(
            text, "[^ \t\n\f\r]+").to_numpy(zero_copy_only=False)
        # one non-overlapping match per ws-token that contains an
        # alphabetic char (greedy tails pin matches to token bounds)
        n_alpha = pc.count_substring_regex(
            text, "[^ \t\n\f\r]*[A-Za-z][^ \t\n\f\r]*"
        ).to_numpy(zero_copy_only=False)
        n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
        n_ell = pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
        n_nl = pc.count_substring(text, "\n").to_numpy(zero_copy_only=False)
        n_bullet = pc.count_substring_regex(
            text, r"(?m)^[-*]").to_numpy(zero_copy_only=False)
        n_ell_end = pc.count_substring_regex(
            text, r"(?m)\.\.\.$").to_numpy(zero_copy_only=False)
        low = pc.utf8_lower(text)
        stop_hits = np.zeros(len(text), dtype=np.int64)
        for w in GOPHER_STOPWORDS:
            # presence, not count: ws-delimited exact token match
            hit = pc.match_substring_regex(
                low, rf"(?:^|[ \t\n\f\r]){w}(?:[ \t\n\f\r]|$)")
            stop_hits += hit.to_numpy(zero_copy_only=False).astype(np.int64)
        n_word_chars = (n_chars - n_ws).astype(np.int64)
        n_words = n_words.astype(np.int64)
        n_lines = (n_nl + 1).astype(np.int64)
        n_alpha = n_alpha.astype(np.int64)
        ok = (
            (n_words >= min_words) & (n_words <= max_words)
            & (3 * n_words <= n_word_chars) & (n_word_chars <= 10 * n_words)
            & (10 * (n_hash + n_ell).astype(np.int64) <= n_words)
            & (10 * n_bullet.astype(np.int64) <= 9 * n_lines)
            & (10 * n_ell_end.astype(np.int64) <= 3 * n_lines)
            & (5 * n_alpha >= 4 * n_words)
            & (stop_hits >= min_stop_hits)
        )
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_word_chars": pa.array(n_word_chars, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_alpha_words": pa.array(n_alpha, pa.int64()),
            "n_stop_hits": pa.array(stop_hits, pa.int64()),
            "gopher_ok": pa.array(ok),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def fit_bigram_model(docs, text_col: str = "text", model_k: int = 10_000):
    """Pass 1: top-``model_k`` corpus bigrams by count (deterministic
    count-desc, bigram-asc tie-break). Distributed: per-batch Arrow
    partial counts → global sum → top_k_by; the driver holds only the
    k-row model."""

    from .agg import grouped_sum, top_k_by

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        grams = []
        for ws in words.to_pylist():
            ws = [w for w in ws if w]
            grams.extend(
                f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
            )
        flat = pa.table({"bigram": pa.array(grams, pa.string())})
        g = flat.group_by(["bigram"]).aggregate([([], "count_all")])
        return g.rename_columns(["bigram", "n"])

    counts = grouped_sum(
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "bigram", "n",
    )
    model = top_k_by(counts, "n", "bigram", model_k).to_pandas()
    if "bigram" not in model.columns:
        # no doc had >= 2 tokens: an empty Dataset's to_pandas() loses
        # column names — return a typed empty model so scoring reads an
        # empty vocabulary instead of raising KeyError
        model = pd.DataFrame({"bigram": pd.Series(dtype="string"),
                              "n": pd.Series(dtype="int64")})
    return model


def bigram_coverage(docs, text_col: str = "text", model_k: int = 10_000):
    """Pass 2: broadcast the fitted model and score every doc —
    (doc_id, n_bigrams, n_in_model). The model ships once via ray.put;
    documents never shuffle."""
    model = fit_bigram_model(docs, text_col=text_col, model_k=model_k)
    ref = ray.put(frozenset(model["bigram"].tolist()))

    def score(df: pd.DataFrame, ref) -> pd.DataFrame:
        from .joins import _resolve_ref

        vocab = _resolve_ref(ref)
        n_bi, n_in = [], []
        for text in df[text_col].fillna(""):
            # SAME tokenizer as the fit pass (Arrow RE2 \s+) — a
            # unicode-aware split here would score docs against a model
            # that tokenized them differently
            ws = ws_tokens(text.lower())
            grams = [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]
            n_bi.append(len(grams))
            n_in.append(sum(1 for g in grams if g in vocab))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_bigrams": pd.array(n_bi, dtype="int64"),
                "n_in_model": pd.array(n_in, dtype="int64"),
            }
        )

    return docs.map_batches(score, fn_kwargs={"ref": ref}, batch_format="pandas")
