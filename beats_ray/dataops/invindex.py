"""Inverted-index construction — the retrieval-side data product a
training/eval pipeline builds from a corpus (term → posting list).

Shape: per-batch DISTINCT (term, doc) fold (the only pass that sees
raw text) → ONE hash-partition shuffle on term (``map_buckets``, so a
bucket holds every pair of its terms and the per-bucket pandas pass is
one vectorized groupby — never a Python call per term) → per-term
df + bounded posting list.  Document-frequency bounds drop the
stopword band (df > max_df) and the hapax tail (df < min_df) — the
classic index-pruning rule — and posting lists are capped at
``max_postings`` smallest doc ids (deterministic), so no output row is
ever unbounded: a 100-TB corpus with a hot term emits one row with a
capped list, not a multi-GB cell.

Postings are emitted as a comma-joined string (doc-id ascending) so
the whole artifact has a value-level SQL oracle (string_agg ... ORDER
BY) without list-encoding ambiguity between Arrow and DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def inverted_index(docs, text_col: str = "text", min_df: int = 1,
                   max_df: int | None = None, max_postings: int = 20,
                   buckets: int = 32):
    """(term, df, postings) per surviving lowercased ws-token.
    ``df`` counts documents (not occurrences); ``postings`` is the
    ``max_postings`` smallest doc ids, comma-joined."""
    from .agg import map_buckets

    def fold(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        ids = t["doc_id"].to_pylist()
        pairs: set[tuple[str, int]] = set()
        for doc_id, ws in zip(ids, words.to_pylist()):
            for w in ws:
                if w:
                    pairs.add((w, int(doc_id)))
        terms = pa.array([p[0] for p in pairs], pa.string())
        dids = pa.array([p[1] for p in pairs], pa.int64())
        return pa.table({"term": terms, "doc_id": dids})

    pairs = docs.select_columns(["doc_id", text_col]) \
                .map_batches(fold, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a term are in this bucket: global dedup is local
        df = df.drop_duplicates(["term", "doc_id"]) \
               .sort_values(["term", "doc_id"])
        g = df.groupby("term", sort=False)
        sizes = g["doc_id"].transform("size")          # vectorized df
        keep = sizes >= min_df
        if max_df is not None:
            keep &= sizes <= max_df
        df, sizes = df[keep], sizes[keep]
        if df.empty:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype=object)})
        rank = df.groupby("term", sort=False).cumcount()  # vectorized
        top = df[rank < max_postings]
        posts = (top.assign(_s=top["doc_id"].astype(str))
                 .groupby("term", sort=False)["_s"].agg(",".join))
        dfs = df.groupby("term", sort=False)["doc_id"].size()
        return pd.DataFrame({
            "term": posts.index.astype(object),
            "df": dfs.loc[posts.index].to_numpy(np.int64),
            "postings": posts.to_numpy(object),
        })

    return map_buckets(pairs, "term", per_bucket, buckets)
