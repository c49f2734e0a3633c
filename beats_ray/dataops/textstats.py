"""Text analysis operators over the documents table: token counting,
quality scoring, language-ID, document fingerprinting.

All integer-valued outputs (counts, not ratios) so the DuckDB oracle
compares exactly; ratios are trivially derived downstream.
"""

from __future__ import annotations

import re
import string

from .dedup import ws_tokens

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
    """Stateful stage (cached task via stagecache): regexes compiled
    once per worker, vectorized pandas str ops per batch."""

    def __init__(self):
        self.punct = re.compile(PUNCT_CLASS)
        self.bpe = re.compile(BPE_TOKEN)
        # re.ASCII: \b must mean RE2's ASCII word boundary, or accented
        # text diverges from the oracle ("theé": RE2 matches, a
        # unicode \b does not)
        self.stop = re.compile(STOPWORD_RE, re.ASCII)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": text.str.len().astype("int64"),
                "n_ws_tokens": text.map(
                    lambda t: len(ws_tokens(t))
                ).astype("int64"),
                "n_bpe_tokens": text.str.count(self.bpe).astype("int64"),
                "n_punct": text.str.count(self.punct).astype("int64"),
                "n_stopwords": text.str.lower().str.count(self.stop).astype("int64"),
            }
        )
        return out


def token_stats(docs):
    from .stagecache import task_stage

    # light state (compiled regexes) → fused task with per-worker
    # instance cache, not an actor pool (no ~1.5s spin-up per query)
    return docs.map_batches(task_stage(TokenStats), batch_format="pandas")


def quality_score(docs, min_chars: int = 50, max_punct_ratio: float = 0.3):
    """Quality classification from the integer stats: short docs and
    punctuation-heavy docs are low quality (C4-style heuristics)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        n_punct = text.str.count(PUNCT_CLASS).astype("int64")
        n_stop = text.str.lower().str.count(STOPWORD_RE).astype("int64")
        low = (n_chars < min_chars) | (n_punct > (n_chars * max_punct_ratio))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_punct": n_punct,
                "n_stopwords": n_stop,
                "quality": np.where(low, "low", np.where(n_stop > 0, "high", "mid")),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


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
    """Language-ID stage: marker sets built once per worker (cached
    task)."""

    def __init__(self):
        self.word = re.compile(r"[a-zà-ÿ]+")
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in df["text"].fillna(""):
            words = self.word.findall(text.lower())
            best, best_n = "unknown", 0
            for lang, marks in self.markers.items():
                n = sum(1 for w in words if w in marks)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": preds})


def lang_id(docs):
    from .stagecache import task_stage

    return docs.map_batches(task_stage(LangId), batch_format="pandas")


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
