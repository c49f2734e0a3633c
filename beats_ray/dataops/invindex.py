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


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson/Lucene form, idf = ln((N-df+.5)/(df+.5)+1))
# — the eval-side op of the retrieval tier: score a SMALL query set
# against the whole corpus. Fit pass computes the bounded constants
# (N, Σdl, per-query-term df — at most |query vocab| rows move);
# scoring broadcasts them and is one shuffle-free pass; the grouped
# top-k uses per-block prefilter + one tiny finish. Per-(term,doc)
# scores are floored to integer micro-units BEFORE the per-doc sum —
# both sides run the identical double expression, so the SQL oracle
# is bit-exact (the house tfidf/unigram-LM contract).
# ---------------------------------------------------------------------------

BM25_SCALE = 1_000_000


def _tok_matrix(t: pa.Table, text_col: str, terms: list[str]):
    """Per-batch (tf matrix [docs x terms], dl vector) over the
    ws-token stream of lower(text) — Arrow split, numpy bincount."""
    text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
    words = pc.split_pattern_regex(text, pattern=r"\s+")
    lens = pc.list_value_length(words).to_numpy().astype(np.int64)
    flat = np.asarray(pc.list_flatten(words).to_pandas(), dtype=object)
    docidx = np.repeat(np.arange(len(lens)), lens)
    nonblank = flat != ""
    flat, docidx = flat[nonblank], docidx[nonblank]
    n = len(lens)
    dl = np.bincount(docidx, minlength=n).astype(np.int64)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    if len(flat):
        tindex = {w: j for j, w in enumerate(terms)}
        uniq, inv = np.unique(flat, return_inverse=True)
        code = np.fromiter((tindex.get(w, -1) for w in uniq),
                           dtype=np.int64, count=len(uniq))[inv]
        hit = code >= 0
        np.add.at(tf, (docidx[hit], code[hit]), 1)
    return tf, dl


def bm25_topk(docs, queries: dict[str, str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` documents per query by BM25. ``queries`` maps
    query_id → query text (ws-tokenized, lowercased; duplicate terms
    in a query count once). Returns Dataset[(query_id, doc_id,
    score_um)] — score_um the integer micro-unit sum of per-term
    floored BM25 contributions; only documents matching ≥1 query term
    compete. Ties break doc_id ascending."""
    import math

    import ray

    from .dedup import ws_tokens
    from .joins import _resolve_ref
    from .stagecache import task_stage

    qterms = {qid: sorted(set(ws_tokens(q.lower())))
              for qid, q in queries.items()}
    terms = sorted({t for ts in qterms.values() for t in ts})

    def fit_partial(t: pa.Table) -> pa.Table:
        tf, dl = _tok_matrix(t, text_col, terms)
        row = {"n": [len(dl)], "dls": [int(dl.sum())]}
        for j, term in enumerate(terms):
            row[f"df_{j}"] = [int((tf[:, j] > 0).sum())]
        return pa.table(row)

    stats = (docs.select_columns([text_col])
             .map_batches(fit_partial, batch_format="pyarrow")
             .to_pandas().sum())
    n_docs = int(stats["n"])
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = int(stats["dls"]) / n_docs
    idf = np.array([
        math.log((n_docs - int(stats[f"df_{j}"]) + 0.5)
                 / (int(stats[f"df_{j}"]) + 0.5) + 1.0)
        for j in range(len(terms))
    ])

    class _Score:
        def __init__(self, ref):
            self.idf = _resolve_ref(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            tf, dl = _tok_matrix(t, text_col, terms)
            den_dl = k1 * (1.0 - b + b * dl / avgdl)   # [docs]
            ids = t[id_col].to_numpy()
            out_q, out_d, out_s = [], [], []
            # per-(term,doc) floor BEFORE the per-doc sum — the oracle
            # contract (sum of floors, not floor of sums)
            per_term = np.zeros_like(tf)
            for j in range(len(terms)):
                tfj = tf[:, j]
                with np.errstate(invalid="ignore", divide="ignore"):
                    s = np.floor(1000000.0 * self.idf[j]
                                 * (tfj * (k1 + 1.0)) / (tfj + den_dl))
                per_term[:, j] = np.where(tfj > 0, s, 0).astype(np.int64)
            for qid, ts in qterms.items():
                cols = [terms.index(x) for x in ts]
                match = (tf[:, cols] > 0).any(axis=1)
                if not match.any():
                    continue
                sc = per_term[:, cols].sum(axis=1)[match]
                order = np.lexsort((ids[match], -sc))[:k]  # block top-k
                out_q.append(np.full(len(order), qid, dtype=object))
                out_d.append(ids[match][order])
                out_s.append(sc[order])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.string()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "score_um": pa.array([], pa.int64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.string()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "score_um": pa.array(np.concatenate(out_s), pa.int64()),
            })

    ref = ray.put(idf)
    cands = docs.select_columns([id_col, text_col]).map_batches(
        task_stage(_Score, ref=ref), batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["query_id", "score_um", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby("query_id", sort=False).head(k)

    # candidates are ≤ blocks×k per query — the finish is one tiny
    # grouped pass (single group key space = |queries|)
    return cands.groupby("query_id").map_groups(
        finish, batch_format="pandas")
