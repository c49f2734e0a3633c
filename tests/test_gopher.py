"""Gopher-rule quality screen — adversarial cross-check against the
DuckDB list-lambda replay (the oracle_sql body), plus targeted cases
for each rule and the overlap/boundary semantics the kernels rely on."""

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.quality import GOPHER_STOPWORDS, gopher_rules

GOOD = ("the quick brown fox jumps over a lazy dog and then it sat "
        "down to rest because it had covered quite some distance " * 3)

CASES = [
    GOOD,                                    # passes everything
    "",                                       # empty
    None,                                     # null text
    "word " * 19,                             # below min_words
    "the and of " * 40,                       # short words: mean len < 3
    "supercalifragilistic " * 60,             # mean len > 10, no stopword
    GOOD + " ## # ## # # # # # # # # # # #",  # symbol ratio
    "\n".join(["- the bullet item of note"] * 10),      # all bullet lines
    "\n".join(["the line trails off..."] * 10),         # all ellipsis-end
    GOOD + " " + "1234 5678 " * 40,           # alpha-word ratio fails
    "....... the of ... .... " + GOOD,        # overlapping-dots counting
    "xthe thex the, (the) THE \t the\nof",    # stopword boundary forms
    "the\n\n\nof and it is\n",                # empty lines
    "- the\n* of\nplain the line\n-no space bullet",
    "a the of ééé " + GOOD,    # non-ASCII chars (utf8 len)
]


def _sql_replay(df: pd.DataFrame, min_words: int, min_stop: int):
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    stop_sum = " + ".join(
        f"CAST(list_contains(list_transform(words, x -> lower(x)), '{w}') AS BIGINT)"
        for w in GOPHER_STOPWORDS)
    return con.execute(rf"""
        WITH base AS (
          SELECT doc_id, coalesce(text, '') AS text,
            list_filter(string_split_regex(coalesce(text, ''),
              '[ \t\n\f\r]+'), x -> x <> '') AS words,
            string_split(coalesce(text, ''), chr(10)) AS lines
          FROM documents
        ), m AS (
          SELECT doc_id,
            CAST(len(words) AS BIGINT) AS n_words,
            CAST(length(regexp_replace(text, '[ \t\n\f\r]', '', 'g'))
                 AS BIGINT) AS n_word_chars,
            CAST(len(lines) AS BIGINT) AS n_lines,
            CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                 AS BIGINT) AS n_alpha_words,
            CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
                 AS n_hash,
            CAST((length(text) - length(replace(text, '...', ''))) // 3
                 AS BIGINT) AS n_ellipsis,
            CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*]')))
                 AS BIGINT) AS n_bullet,
            CAST(len(list_filter(lines, x -> regexp_matches(x, '\.\.\.$')))
                 AS BIGINT) AS n_ell_end,
            {stop_sum} AS n_stop_hits
          FROM base)
        SELECT doc_id, n_words, n_word_chars, n_lines, n_alpha_words,
               n_stop_hits,
               (n_words BETWEEN {min_words} AND 100000
                AND n_word_chars BETWEEN 3 * n_words AND 10 * n_words
                AND 10 * (n_hash + n_ellipsis) <= n_words
                AND 10 * n_bullet <= 9 * n_lines
                AND 10 * n_ell_end <= 3 * n_lines
                AND 5 * n_alpha_words >= 4 * n_words
                AND n_stop_hits >= {min_stop}) AS gopher_ok
        FROM m ORDER BY doc_id""").fetchdf()


@pytest.mark.parametrize("min_words,min_stop", [(50, 2), (20, 1), (1, 1)])
def test_adversarial_vs_sql_replay(ray_session, min_words, min_stop):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(len(CASES), dtype=np.int64),
                       "text": CASES})
    got = (gopher_rules(rd.from_pandas(df).repartition(3),
                        min_words=min_words, min_stop_hits=min_stop)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ora = _sql_replay(df, min_words, min_stop)
    for c in ora.columns:
        assert got[c].tolist() == ora[c].tolist(), c


def test_rule_verdicts(ray_session):
    """Each crafted case trips the rule it targets."""
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(len(CASES), dtype=np.int64),
                       "text": CASES})
    got = (gopher_rules(rd.from_pandas(df), min_words=20, min_stop_hits=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ok = got["gopher_ok"].tolist()
    assert ok[0] is True or ok[0] == True          # GOOD passes
    assert not any(ok[1:10])                        # every trap fails
    # stopword boundary forms: 'xthe'/'thex'/'the,' don't count,
    # bare/cased/ws-delimited do
    row = got.iloc[11]
    assert row["n_stop_hits"] == 2                  # 'the' and 'of'


def test_randomized_vs_sql_replay(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    vocab = ["the", "of", "and", "fox", "12", "#", "...", "-x",
             "supercal", "aéb", "", "\t"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 120)))
        + ("\n" + " ".join(rng.choice(vocab, 5)) if rng.random() < 0.5 else "")
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    got = (gopher_rules(rd.from_pandas(df).repartition(4),
                        min_words=5, min_stop_hits=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ora = _sql_replay(df, 5, 1)
    for c in ora.columns:
        assert got[c].tolist() == ora[c].tolist(), c
