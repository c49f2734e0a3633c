"""BM25 ranked retrieval — cross-check against a scalar reference
implementation on randomized corpora, plus ranking-sanity cases."""

import math

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.invindex import bm25_topk


def _scalar_bm25(df: pd.DataFrame, queries: dict[str, str], k: int,
                 k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Independent per-row reference: same formula, same float op
    order, floor per (term, doc) before the per-doc sum."""
    import re

    tok = re.compile(r"\S+")
    docs = {int(r.doc_id): tok.findall(str(r.text).lower())
            for r in df.itertuples()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    rows = []
    for qid, q in queries.items():
        terms = sorted(set(tok.findall(q.lower())))
        scored = []
        for did, toks in docs.items():
            s, matched = 0, False
            dl = len(toks)
            for t in terms:
                tf = toks.count(t)
                if tf == 0:
                    continue
                matched = True
                dfc = sum(1 for ts in docs.values() if t in ts)
                idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
                s += math.floor(1000000.0 * idf * (tf * (k1 + 1.0))
                                / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            if matched:
                scored.append((did, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for did, s in scored[:k]:
            rows.append({"query_id": qid, "doc_id": did, "score_um": s})
    return pd.DataFrame(rows)


def _mk_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["scan", "sort", "merge", "join", "fast", "slow", "agg",
             "zzz", "qq"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 20)))
             for _ in range(n)]
    texts[0] = ""
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("seed", [21, 22])
def test_bm25_vs_scalar_reference(ray_session, seed):
    import ray.data as rd

    df = _mk_corpus(seed, 90)
    queries = {"a": "fast sort", "b": "merge join agg", "c": "missing"}
    got = (bm25_topk(rd.from_pandas(df).repartition(5), queries, k=7)
           .to_pandas().sort_values(["query_id", "doc_id"])
           .reset_index(drop=True))
    want = (_scalar_bm25(df, queries, k=7)
            .sort_values(["query_id", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "score_um": "int64"}),
        want.astype({"doc_id": "int64", "score_um": "int64"}),
    )


def test_bm25_ranking_sanity(ray_session):
    """More query-term hits → higher score; rarer term outweighs a
    common one at equal tf; non-matching docs never appear."""
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["rare common pad", "common pad pad", "pad pad pad",
                 "rare rare common"],
    })
    out = (bm25_topk(rd.from_pandas(df), {"q": "rare common"}, k=10)
           .to_pandas().set_index("doc_id"))
    assert 2 not in out.index  # no query term
    assert out.loc[3, "score_um"] > out.loc[0, "score_um"]  # more hits
    assert out.loc[0, "score_um"] > out.loc[1, "score_um"]  # rare > common
