"""Text normalization + repetition scoring + contamination screening —
training-data curation stages.

- ``normalize_text``: unicode NFC + lowercase + whitespace collapse
  (deterministic canonical form; the pre-step for exact dedup). Oracle:
  DuckDB ``nfc_normalize``/``lower``/``regexp_replace`` — identical
  chain.
- ``repetition_score``: fraction of the document covered by its single
  most-frequent word — the cheap "degenerate repetition" quality signal
  (Gopher/C4-style rules); integer counts so the oracle compares exact.
- ``contamination_screen``: n-gram overlap of each document against a
  broadcast probe set (benchmark texts): the semi-join-on-ngram-hashes
  archetype — the probe set ships once via ``ray.put``, documents never
  shuffle.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import word_shingles, ws_tokens


def normalize_text(ds, field: str = "text", target: str = "norm_text"):
    def norm(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t[field].combine_chunks(), "")
        col = pc.utf8_normalize(col, form="NFC")
        col = pc.utf8_lower(col)
        col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
        # trim ONLY the ASCII space the \s+ collapse can leave at the
        # edges — utf8_trim_whitespace also strips NBSP/\x0b etc. that
        # the oracle chain (RE2 \s+ collapse, then DuckDB trim() =
        # spaces only) keeps, silently diverging the dedup keys
        col = pc.utf8_trim(col, characters=" ")
        if target in t.column_names:
            return t.set_column(t.column_names.index(target), target, col)
        return t.append_column(target, col)

    return ds.map_batches(norm, batch_format="pyarrow")


def repetition_score(docs, field: str = "text"):
    """Per doc: total word count and the count of the most frequent
    word (top_word_n / n_words = repetition ratio). Vectorized per
    batch via pandas explode + double groupby — no python per row."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        words = (
            df[field]
            .fillna("")
            .str.lower()
            .map(ws_tokens)  # ASCII \s class — oracle parity
        )
        # group by ROW POSITION, not doc_id: duplicate-id rows (normal
        # PRE-dedup) must score independently — pooling by doc_id made
        # the output batch-boundary-dependent and broke the row-wise
        # oracle comparison
        ridx = np.arange(len(df))
        lens = words.str.len().to_numpy()
        exploded = pd.DataFrame(
            {"_r": np.repeat(ridx, lens),
             "w": words.explode().dropna().to_numpy()}
        )
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        if exploded.empty:
            out["n_words"] = pd.array([0] * len(df), dtype="int64")
            out["top_word_n"] = pd.array([0] * len(df), dtype="int64")
            return out
        per_word = exploded.groupby(["_r", "w"]).size()
        agg = per_word.groupby("_r").agg(["sum", "max"]).rename(
            columns={"sum": "n_words", "max": "top_word_n"}
        )
        agg = agg.reindex(ridx).fillna(0)
        out["n_words"] = agg["n_words"].astype("int64").to_numpy()
        out["top_word_n"] = agg["top_word_n"].astype("int64").to_numpy()
        return out

    return docs.map_batches(score, batch_format="pandas")


class ContaminationScreen:
    """Probe stage (cached task): the broadcast probe n-gram set
    resolves once per worker."""

    def __init__(self, probe_ref, k: int = 3):
        self.probe = (
            ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        )
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_grams, n_hits = [], []
        for text in df["text"].fillna(""):
            sh = word_shingles(text, self.k)
            n_grams.append(len(sh))
            n_hits.append(len(sh & self.probe))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_ngrams": pd.array(n_grams, dtype="int64"),
                "n_probe_hits": pd.array(n_hits, dtype="int64"),
            }
        )


def contamination_screen(docs, probe_texts: list[str], k: int = 3,
                         threshold: float = 0.5):
    """Flag documents whose word-k-gram overlap with the probe corpus
    (e.g. an eval benchmark) exceeds ``threshold``. The threshold is
    applied with exact integer cross-multiplication (hits*q >=
    max(n,1)*p for threshold p/q) so the SQL oracle compares exactly —
    no float boundary flips."""
    from .dedup import threshold_fraction

    p, q = threshold_fraction(threshold)
    probe: set[int] = set()
    for t in probe_texts:
        probe |= word_shingles(t, k)
    ref = ray.put(probe)
    from .stagecache import task_stage

    scored = docs.map_batches(
        task_stage(ContaminationScreen, probe_ref=ref, k=k),
        batch_format="pandas",
    )

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["contaminated"] = (
            df["n_probe_hits"] * q >= df["n_ngrams"].clip(lower=1) * p
        )
        return df

    return scored.map_batches(flag, batch_format="pandas")
