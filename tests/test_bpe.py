"""BPE train + apply — engine fit vs the independent list-splice
replica on randomized corpora, apply vs a DuckDB recursive-CTE
replay, and merge-semantics edge cases."""

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.bpe import (
    bpe_apply_ntok,
    bpe_token_counts,
    fit_bpe,
)


def _mk_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["low", "lower", "lowest", "newer", "wider", "aaa",
             "abab", "xy"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 15)))
             for _ in range(n)]
    texts[0] = ""
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("seed,k", [(31, 10), (32, 25)])
def test_fit_matches_independent_replica(ray_session, tmp_path, seed, k):
    import ray.data as rd

    import __ray_entry__ as entry

    df = _mk_corpus(seed, 120)
    pq = tmp_path / "docs.parquet"
    df.to_parquet(pq)
    got = fit_bpe(rd.from_pandas(df).repartition(4), n_merges=k)
    want = entry._bpe_merges_replica(str(pq), n_merges=k, vocab_k=5000)
    assert got == want


def test_apply_merge_semantics():
    """Leftmost non-overlapping, fixpoint per merge, rank order."""
    # aaaa under (a,a): (aa)(aa) -> then (aa,aa): (aaaa) = 1 token
    assert bpe_apply_ntok("aaaa", [("a", "a")]) == 2
    assert bpe_apply_ntok("aaaa", [("a", "a"), ("aa", "aa")]) == 1
    # aaa: leftmost pair wins -> (aa)(a)
    assert bpe_apply_ntok("aaa", [("a", "a")]) == 2
    # abab: both pairs merge in one rank (fixpoint)
    assert bpe_apply_ntok("abab", [("a", "b")]) == 2
    # merges apply in rank order: (a,b) first consumes the chars
    assert bpe_apply_ntok("ab", [("a", "b"), ("b", "a")]) == 1
    assert bpe_apply_ntok("", []) == 0
    assert bpe_apply_ntok("x", []) == 1


def test_token_counts_vs_sql_replay(ray_session):
    import duckdb
    import ray.data as rd

    df = _mk_corpus(33, 80)
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("a", "a")]
    got = (bpe_token_counts(rd.from_pandas(df).repartition(4), merges)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    vals = ", ".join(f"({i}, ' {a} {b} ', ' {a}{b} ')"
                     for i, (a, b) in enumerate(merges))
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(rf"""
        WITH RECURSIVE
        m(mi, pat, rep) AS (VALUES {vals}),
        w AS (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
        words AS (SELECT DISTINCT word FROM tok),
        sp AS (SELECT word,
                      ' ' || array_to_string(string_split(word, ''), ' ')
                          || ' ' AS s
               FROM words),
        bpe(word, s, mi) AS (
          SELECT word, s, 0 FROM sp
          UNION ALL
          SELECT b.word,
                 CASE WHEN replace(b.s, m.pat, m.rep) <> b.s
                      THEN replace(b.s, m.pat, m.rep) ELSE b.s END,
                 CASE WHEN replace(b.s, m.pat, m.rep) <> b.s
                      THEN b.mi ELSE b.mi + 1 END
          FROM bpe b JOIN m ON m.mi = b.mi
          WHERE b.mi < {len(merges)}
        ),
        nt AS (SELECT word,
                      CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS ntok
               FROM bpe WHERE mi = {len(merges)}),
        per AS (SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                       CAST(SUM(nt.ntok) AS BIGINT) AS n_bpe_tokens
                FROM tok JOIN nt USING (word) GROUP BY 1)
        SELECT d.doc_id,
               CAST(COALESCE(per.n_words, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(per.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"n_words": "int64", "n_bpe_tokens": "int64"}),
        want.astype({"n_words": "int64", "n_bpe_tokens": "int64"}),
    )


def test_fit_compression_monotone(ray_session):
    """More merges never increase the corpus token count, and the
    learned merges compress the fit corpus below char count."""
    import ray.data as rd

    df = _mk_corpus(34, 60)
    ds = rd.from_pandas(df)
    m5 = fit_bpe(ds, n_merges=5)
    m20 = fit_bpe(ds, n_merges=20)
    assert m20[:5] == m5  # merge list is a prefix chain
    tot5 = bpe_token_counts(ds, m5).to_pandas()["n_bpe_tokens"].sum()
    tot20 = bpe_token_counts(ds, m20).to_pandas()["n_bpe_tokens"].sum()
    tot0 = bpe_token_counts(ds, []).to_pandas()["n_bpe_tokens"].sum()
    assert tot20 <= tot5 <= tot0
