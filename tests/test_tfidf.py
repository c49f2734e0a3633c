"""TF-IDF top terms — randomized cross-check against the DuckDB
fit+score replay, plus tie-break and no-model-term edge cases."""

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.quality import fit_df_model, tfidf_top_terms


def _sql_replay(df: pd.DataFrame, k: int) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(rf"""
        WITH w AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                        '\s+'), x -> x <> '') AS ws
          FROM documents
        ), tok AS (
          SELECT doc_id, unnest(ws) AS term FROM w
        ), tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, term
        ), dfm AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM tok GROUP BY term ORDER BY df DESC, term LIMIT {k}
        ), scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfm.df,
                 tf.tf * CAST(FLOOR(1000000 * ln(
                   CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                   / dfm.df)) AS BIGINT) AS score
          FROM tf JOIN dfm USING (term)
        )
        SELECT doc_id, term, tf, df, score FROM scored
        QUALIFY row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) = 1
        ORDER BY doc_id""").fetchdf()


def _mk_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "rare1", "rare2", "THE",
             "the", "x", "1", ""]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(n)]
    texts[0] = ""          # empty doc -> no output row
    texts[1] = "   \t\n "  # ws-only doc -> no output row
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("seed,k", [(1, 500), (2, 4), (3, 1)])
def test_randomized_vs_sql_replay(ray_session, seed, k):
    import ray.data as rd

    df = _mk_corpus(seed, 120)
    got = (tfidf_top_terms(rd.from_pandas(df).repartition(4), model_k=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ora = _sql_replay(df, k)
    for c in ["doc_id", "term", "tf", "df", "score"]:
        assert got[c].tolist() == ora[c].tolist(), (seed, k, c)


def test_fit_df_model_distinct_per_doc(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a a a b", "a b b", "c"],
    })
    m = fit_df_model(rd.from_pandas(df), model_k=10)
    got = dict(zip(m["term"], m["df"]))
    assert got == {"a": 2, "b": 2, "c": 1}  # df counts DOCS, not tokens


def test_tie_break_is_term_asc(ray_session):
    import ray.data as rd

    # 'b' and 'a' same tf and same df -> same score -> 'a' wins
    df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                       "text": ["b a", "a b unique"]})
    got = (tfidf_top_terms(rd.from_pandas(df), model_k=10)
           .to_pandas().sort_values("doc_id"))
    assert got["term"].iloc[0] == "a"
    assert got["term"].iloc[1] == "unique"  # rarest wins when present
