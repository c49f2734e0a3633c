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


def fit_bigram_model(docs, text_col: str = "text", model_k: int = 10_000):
    """Pass 1: top-``model_k`` corpus bigrams by count (deterministic
    count-desc, bigram-asc tie-break). Distributed: per-batch Arrow
    partial counts → global sum → top_k_by; the driver holds only the
    k-row model."""
    from ray.data.aggregate import Sum

    from .agg import top_k_by

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

    counts = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
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
