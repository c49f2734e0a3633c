"""Inverted-index build — randomized cross-check against the DuckDB
string_agg replay over a zipf-ish synthetic vocabulary, plus df-bound
and posting-cap edges."""

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.invindex import inverted_index


def _sql_replay(df: pd.DataFrame, min_df: int, max_df, cap: int):
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    hi = max_df if max_df is not None else 10**9
    return con.execute(rf"""
        WITH tok AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(
                lower(coalesce(text, '')), '\s+'), x -> x <> '')) AS term
            FROM documents)
        ), d AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df
          FROM tok GROUP BY term
          HAVING COUNT(*) BETWEEN {min_df} AND {hi}
        ), ranked AS (
          SELECT t.term, t.doc_id,
                 row_number() OVER (PARTITION BY t.term
                                    ORDER BY t.doc_id) AS rn
          FROM tok t JOIN d USING (term)
        ), posts AS (
          SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
                                  ORDER BY doc_id) AS postings
          FROM ranked WHERE rn <= {cap} GROUP BY term
        )
        SELECT d.term, d.df, posts.postings
        FROM d JOIN posts USING (term) ORDER BY term""").fetchdf()


def _corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # zipf-ish: common terms + a long tail, mixed case, dup tokens
    common = ["The", "and", "ERROR", "ok"]
    tail = [f"t{i}" for i in range(60)]
    texts = [
        " ".join(list(rng.choice(common, rng.integers(0, 5)))
                 + list(rng.choice(tail, rng.integers(0, 6))))
        for _ in range(n)
    ]
    texts[0] = ""  # empty doc
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("min_df,max_df,cap", [
    (1, None, 1000),   # full index, uncapped postings
    (2, 40, 3),        # both bounds + tight cap
    (5, None, 20),
])
def test_randomized_vs_sql_replay(ray_session, min_df, max_df, cap):
    import ray.data as rd

    df = _corpus(13, 150)
    got = (inverted_index(rd.from_pandas(df).repartition(5),
                          min_df=min_df, max_df=max_df,
                          max_postings=cap, buckets=8)
           .to_pandas().sort_values("term").reset_index(drop=True))
    ora = _sql_replay(df, min_df, max_df, cap)
    assert got["term"].tolist() == ora["term"].tolist()
    assert got["df"].tolist() == ora["df"].tolist()
    assert got["postings"].tolist() == ora["postings"].tolist()


def test_df_counts_docs_not_occurrences(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.array([7, 9], np.int64),
                       "text": ["a a a", "a b"]})
    got = (inverted_index(rd.from_pandas(df), min_df=1, buckets=2)
           .to_pandas().sort_values("term").reset_index(drop=True))
    assert got["term"].tolist() == ["a", "b"]
    assert got["df"].tolist() == [2, 1]
    assert got["postings"].tolist() == ["7,9", "9"]
