"""Unigram-LM scoring and global line dedup — randomized cross-checks
against DuckDB replays, plus edge cases (empty docs, OOV-only docs,
tiny vocab, blank-line preservation)."""

import math

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.lm import LM_SCALE, fit_unigram_lm, unigram_nll
from beats_ray.dataops.textnorm import dedup_lines_global


def _mk_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "rare1", "rare2", "THE",
             "the", "x", "1"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(n)]
    texts[0] = ""          # empty doc -> (0, 0, 0)
    texts[1] = "   \t\n "  # ws-only doc -> (0, 0, 0)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _nll_sql_replay(df: pd.DataFrame, k: int) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(rf"""
        WITH w AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                        '\s+'), x -> x <> '') AS ws
          FROM documents
        ), tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
        cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                FROM tok GROUP BY term),
        vocab AS (SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT {k}),
        consts AS (
          SELECT (SELECT COALESCE(SUM(c), 0) FROM cnt)
               + (SELECT COUNT(*) FROM vocab) + 1 AS denom
        ), nll AS (
          SELECT t.doc_id,
                 CAST(FLOOR(1000000 * ln(
                   CAST((SELECT denom FROM consts) AS DOUBLE)
                   / (COALESCE(v.c, 0) + 1))) AS BIGINT) AS wnll
          FROM tok t LEFT JOIN vocab v USING (term)
        ), per AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(wnll) AS BIGINT) AS nll_sum
          FROM nll GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(per.nll_sum, 0) AS BIGINT) AS nll_sum,
               CAST(CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0
                    ELSE per.nll_sum // per.n_tokens END AS BIGINT) AS avg_nll
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""").fetchdf()


@pytest.mark.parametrize("seed,k", [(1, 5000), (2, 4), (3, 1)])
def test_unigram_nll_vs_sql_replay(ray_session, seed, k):
    import ray.data as rd

    df = _mk_corpus(seed, 120)
    got = (unigram_nll(rd.from_pandas(df).repartition(4), model_k=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _nll_sql_replay(df, k)
    pd.testing.assert_frame_equal(
        got.astype({"n_tokens": "int64", "nll_sum": "int64",
                    "avg_nll": "int64"}),
        want.astype({"n_tokens": "int64", "nll_sum": "int64",
                     "avg_nll": "int64"}),
    )


def test_unigram_fit_totals_and_oov(ray_session):
    """The smoothing denominator counts EVERY token; OOV words cost
    exactly floor(1e6·ln(T+V+1))."""
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a b", "b c", "zzz"],  # 7 tokens, 4 distinct
    })
    model, total = fit_unigram_lm(rd.from_pandas(df), model_k=2)
    assert total == 7
    # top-2 by (count desc, term asc): a(3), b(2)
    assert list(model["term"]) == ["a", "b"]
    denom = 7 + 2 + 1
    out = (unigram_nll(rd.from_pandas(df), model_k=2).to_pandas()
           .set_index("doc_id"))
    oov = math.floor(LM_SCALE * math.log(denom))
    a_nll = math.floor(LM_SCALE * math.log(denom / 4))
    b_nll = math.floor(LM_SCALE * math.log(denom / 3))
    assert out.loc[2, "nll_sum"] == oov  # zzz is OOV
    assert out.loc[0, "nll_sum"] == 3 * a_nll + b_nll
    assert out.loc[0, "avg_nll"] == (3 * a_nll + b_nll) // 4


def _dedup_sql_replay(df: pd.DataFrame) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("t0", df)
    return con.execute("""
        WITH t AS (SELECT conv_id, turn_idx, coalesce(text, '') AS text
                   FROM t0),
        l AS (
          SELECT conv_id, turn_idx,
                 unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS li
          FROM t
        ),
        h AS (SELECT *, ('0x'||substr(md5(line),1,16))::UBIGINT AS lh,
                     line <> '' AS nb FROM l),
        r AS (SELECT *, row_number() OVER (PARTITION BY nb, lh
                     ORDER BY conv_id, turn_idx, li) AS rn FROM h),
        m AS (SELECT *, (NOT nb) OR rn = 1 AS keep FROM r)
        SELECT conv_id, turn_idx,
               coalesce(string_agg(line, chr(10) ORDER BY li)
                        FILTER (WHERE keep), '') AS dedup_text,
               count(*) FILTER (WHERE NOT keep) AS n_dropped
        FROM m GROUP BY conv_id, turn_idx
        ORDER BY conv_id, turn_idx""").fetchdf()


def _mk_liny_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    pool = ["shared banner", "", "tail line", "mid", "dup dup"]
    rows = []
    for i in range(n):
        doc = []
        for _ in range(int(rng.integers(0, 6))):
            if rng.random() < 0.3:
                doc.append(f"unique {int(rng.integers(0, n * 3))}")
            else:
                doc.append(pool[int(rng.integers(0, len(pool)))])
        rows.append({"conv_id": f"c{i % 7:03d}", "turn_idx": i,
                     "text": "\n".join(doc)})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("seed", [11, 12])
def test_dedup_lines_global_vs_sql(ray_session, seed):
    import ray.data as rd

    df = _mk_liny_corpus(seed, 60)
    got = (dedup_lines_global(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    want = _dedup_sql_replay(df)
    pd.testing.assert_frame_equal(
        got.astype({"n_dropped": "int64"}),
        want.astype({"n_dropped": "int64"}),
    )


def test_dedup_lines_keeps_blanks_and_first(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "turn_idx": [0, 1, 0],
        "text": ["x\n\ny", "x\n\nz\ny", "y\nx"],
    })
    out = (dedup_lines_global(rd.from_pandas(df))
           .to_pandas().set_index(["conv_id", "turn_idx"]).sort_index())
    # first occurrences: a/0 keeps everything (x first, y first)
    assert out.loc[("a", 0), "dedup_text"] == "x\n\ny"
    assert out.loc[("a", 0), "n_dropped"] == 0
    # a/1: x dup, blank kept, z first, y dup
    assert out.loc[("a", 1), "dedup_text"] == "\nz"
    assert out.loc[("a", 1), "n_dropped"] == 2
    # b/0: both dups -> empty doc survives as ''
    assert out.loc[("b", 0), "dedup_text"] == ""
    assert out.loc[("b", 0), "n_dropped"] == 2


def _dsir_sql_replay(df: pd.DataFrame, buckets: int) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(rf"""
        WITH w AS (
          SELECT doc_id, lang,
            list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                        '\s+'), x -> x <> '') AS ws
          FROM documents
        ), tok AS (
          SELECT doc_id, lang, unnest(ws) AS t,
                 generate_subscripts(ws, 1) AS i
          FROM w
        ), feat AS (
          SELECT doc_id, lang, t AS f FROM tok
          UNION ALL
          SELECT a.doc_id, a.lang, a.t || ' ' || b.t AS f
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ), hb AS (
          SELECT doc_id, lang,
                 CAST(('0x'||substr(md5(f),1,16))::UBIGINT % {buckets}
                      AS BIGINT) AS b
          FROM feat
        ), cnt AS (
          SELECT b, CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct,
                 CAST(COUNT(*) AS BIGINT) AS cr
          FROM hb GROUP BY b
        ), tot AS (
          SELECT COALESCE(SUM(ct), 0) AS tt, COALESCE(SUM(cr), 0) AS tr
          FROM cnt
        ), lam AS (
          SELECT b, CAST(FLOOR(1000000 * ln(
                   CAST((ct + 1) * (tr + {buckets}) AS DOUBLE)
                   / ((cr + 1) * (tt + {buckets})))) AS BIGINT) AS lam
          FROM cnt, tot
        ), per AS (
          SELECT hb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                 CAST(SUM(lam.lam) AS BIGINT) AS dsir_um
          FROM hb JOIN lam USING (b) GROUP BY hb.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(per.n_feats, 0) AS BIGINT) AS n_feats,
               CAST(COALESCE(per.dsir_um, 0) AS BIGINT) AS dsir_um
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""").fetchdf()


def _mk_lang_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["the", "of", "der", "und", "data", "le", "la", "x1", "zz"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 25)))
             for _ in range(n)]
    texts[0] = ""
    langs = rng.choice(["en", "de", "fr"], n, p=[0.5, 0.3, 0.2])
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts, "lang": langs})


@pytest.mark.parametrize("seed,buckets", [(5, 1024), (6, 16)])
def test_dsir_weights_vs_sql_replay(ray_session, seed, buckets):
    import ray.data as rd

    from beats_ray.dataops.lm import dsir_weights

    df = _mk_lang_corpus(seed, 100)
    got = (dsir_weights(rd.from_pandas(df).repartition(4), buckets=buckets)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _dsir_sql_replay(df, buckets)
    pd.testing.assert_frame_equal(
        got.astype({"n_feats": "int64", "dsir_um": "int64"}),
        want.astype({"n_feats": "int64", "dsir_um": "int64"}),
    )


def test_dsir_direction(ray_session):
    """Target-slice-typical docs must outscore off-target docs: an
    all-'en-marker' doc vs an all-'de-marker' doc with en as target."""
    import ray.data as rd

    from beats_ray.dataops.lm import dsir_weights

    rows = ([{"doc_id": i, "text": "the of the of", "lang": "en"}
             for i in range(20)]
            + [{"doc_id": 100 + i, "text": "der und der und", "lang": "de"}
               for i in range(20)])
    out = (dsir_weights(rd.from_pandas(pd.DataFrame(rows)), buckets=4096)
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "dsir_um"] > out.loc[100, "dsir_um"]


# ------------------------------------------------------------------ NB


def _mk_labeled_corpus(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    pos_vocab = ["clean", "prose", "alpha", "beta", "the", "a"]
    neg_vocab = ["spam", "zzz", "alpha", "buy", "now", "the"]
    labels = rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15])
    texts = [
        " ".join(rng.choice(pos_vocab if l == "en" else neg_vocab,
                            rng.integers(0, 25)))
        for l in labels
    ]
    texts[0] = ""          # empty doc -> prior only
    texts[1] = "   \t "    # ws-only doc -> prior only
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts, "lang": labels})


def _nb_sql_replay(df: pd.DataFrame, k: int) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(rf"""
        WITH d0 AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
                 list_filter(regexp_split_to_array(
                   lower(coalesce(text, '')), '\s+'), x -> x <> '') AS ws
          FROM documents
        ), tok AS (
          SELECT doc_id, is_pos, unnest(ws) AS term FROM d0
        ), cnt AS (
          SELECT term, CAST(SUM(is_pos) AS BIGINT) AS cp,
                 CAST(SUM(1 - is_pos) AS BIGINT) AS cn
          FROM tok GROUP BY term
        ), vocab AS (
          SELECT term, cp, cn FROM cnt
          ORDER BY cp + cn DESC, term LIMIT {k}
        ), consts AS (
          SELECT (SELECT COALESCE(SUM(cp), 0) FROM cnt)
               + (SELECT COUNT(*) FROM vocab) + 1 AS dp,
                 (SELECT COALESCE(SUM(cn), 0) FROM cnt)
               + (SELECT COUNT(*) FROM vocab) + 1 AS dn,
                 CAST(FLOOR(1000000 * ln(
                   CAST((SELECT COALESCE(SUM(is_pos), 0) FROM d0) + 1
                        AS DOUBLE)
                   / ((SELECT COALESCE(SUM(1 - is_pos), 0) FROM d0) + 1)))
                   AS BIGINT) AS prior
        ), wt AS (
          SELECT t.doc_id,
                 CAST(FLOOR(1000000 * ln(
                   CAST((COALESCE(v.cp, 0) + 1)
                        * (SELECT dn FROM consts) AS DOUBLE)
                   / ((COALESCE(v.cn, 0) + 1)
                      * (SELECT dp FROM consts)))) AS BIGINT) AS w_um
          FROM tok t LEFT JOIN vocab v USING (term)
        ), per AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(w_um) AS BIGINT) AS s
          FROM wt GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST((SELECT prior FROM consts) + COALESCE(per.s, 0)
                    AS BIGINT) AS nb_um,
               CAST(CASE WHEN (SELECT prior FROM consts)
                              + COALESCE(per.s, 0) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS pred
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""").fetchdf()


@pytest.mark.parametrize("seed,k", [(11, 5000), (12, 4), (13, 1)])
def test_nb_classify_vs_sql_replay(ray_session, seed, k):
    import ray.data as rd

    from beats_ray.dataops.lm import nb_classify

    df = _mk_labeled_corpus(seed, 150)
    got = (nb_classify(rd.from_pandas(df).repartition(5), model_k=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _nb_sql_replay(df, k)
    cols = {"n_tokens": "int64", "nb_um": "int64", "pred": "int64"}
    pd.testing.assert_frame_equal(got.astype(cols), want.astype(cols))


def test_nb_fit_counts_and_direction(ray_session):
    """Hand-checkable fit: per-class token counts, doc-count prior,
    and the log-odds sign separates the class-exclusive words."""
    import ray.data as rd

    from beats_ray.dataops.lm import fit_nb_classifier, nb_classify

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["good good fine", "good stuff", "bad bad junk", ""],
        "lang": ["en", "en", "de", "de"],
    })
    model, tp, tn, np_docs, nn_docs = fit_nb_classifier(
        rd.from_pandas(df), model_k=100)
    assert (tp, tn, np_docs, nn_docs) == (5, 3, 2, 2)
    m = model.set_index("term")
    assert m.loc["good", "cp"] == 3 and m.loc["good", "cn"] == 0
    assert m.loc["bad", "cp"] == 0 and m.loc["bad", "cn"] == 2
    out = (nb_classify(rd.from_pandas(df), model_k=100)
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "nb_um"] > 0 and out.loc[0, "pred"] == 1
    assert out.loc[2, "nb_um"] < 0 and out.loc[2, "pred"] == 0
    # empty doc carries the prior alone: ln((2+1)/(2+1)) = 0
    assert out.loc[3, "nb_um"] == 0 and out.loc[3, "n_tokens"] == 0


def test_nb_null_label_counts_negative(ray_session):
    """NULL labels fall to the negative class on both sides."""
    import ray.data as rd

    from beats_ray.dataops.lm import fit_nb_classifier

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["x y", "x"],
        "lang": pd.array(["en", None], dtype="string"),
    })
    _, tp, tn, np_docs, nn_docs = fit_nb_classifier(
        rd.from_pandas(df), model_k=10)
    assert (tp, tn, np_docs, nn_docs) == (2, 1, 1, 1)


# ------------------------------------------------------------------ bigram


def _bigram_sql_replay(df: pd.DataFrame, uk: int, bk: int) -> pd.DataFrame:
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
          SELECT doc_id, unnest(ws) AS t, generate_subscripts(ws, 1) AS i
          FROM w
        ), cnt AS (
          SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY t
        ), vocab AS (
          SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT {uk}
        ), pair AS (
          SELECT a.doc_id, a.t AS w1, a.t || ' ' || b.t AS bg
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ), bcnt AS (
          SELECT bg, w1, CAST(COUNT(*) AS BIGINT) AS c12
          FROM pair GROUP BY bg, w1
        ), bvocab AS (
          SELECT bg, c12 FROM bcnt
          WHERE w1 IN (SELECT term FROM vocab)
          ORDER BY c12 DESC, bg LIMIT {bk}
        ), nllp AS (
          SELECT p.doc_id,
                 CAST(FLOOR(1000000 * ln(
                   CAST(COALESCE(v.c, 0)
                        + (SELECT COUNT(*) FROM vocab) + 1 AS DOUBLE)
                   / (COALESCE(bv.c12, 0) + 1))) AS BIGINT) AS nll
          FROM pair p
          LEFT JOIN vocab v ON p.w1 = v.term
          LEFT JOIN bvocab bv ON p.bg = bv.bg
        ), per AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(nll) AS BIGINT) AS s
          FROM nllp GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(per.s, 0) AS BIGINT) AS nll2_sum,
               CAST(CASE WHEN COALESCE(per.n_bigrams, 0) = 0 THEN 0
                    ELSE per.s // per.n_bigrams END AS BIGINT) AS avg_nll2
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""").fetchdf()


@pytest.mark.parametrize("seed,uk,bk", [(21, 5000, 50000), (22, 4, 6),
                                        (23, 1, 1)])
def test_bigram_nll_vs_sql_replay(ray_session, seed, uk, bk):
    import ray.data as rd

    from beats_ray.dataops.lm import bigram_nll

    df = _mk_corpus(seed, 120)
    got = (bigram_nll(rd.from_pandas(df).repartition(4), model_k=uk,
                      bigram_k=bk)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _bigram_sql_replay(df, uk, bk)
    cols = {"n_bigrams": "int64", "nll2_sum": "int64", "avg_nll2": "int64"}
    pd.testing.assert_frame_equal(got.astype(cols), want.astype(cols))


def test_bigram_fit_and_hand_values(ray_session):
    """Hand-checkable fit: bigram counts never cross doc boundaries,
    contexts outside the unigram vocab are excluded, and a seen pair
    is cheaper than an unseen pair under the same context."""
    import ray.data as rd

    from beats_ray.dataops.lm import LM_SCALE, bigram_nll, fit_bigram_lm

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b", "b a", "a zzz", ""],
        # doc0: "a b"×2, "b a"×1; doc1: "b a"; doc2: "a zzz"
    })
    uni, bi = fit_bigram_lm(rd.from_pandas(df), model_k=2, bigram_k=10)
    assert list(uni["term"]) == ["a", "b"]  # zzz falls out of top-2
    m = bi.set_index("bigram")["c"]
    assert m["a b"] == 2 and m["b a"] == 2 and m["a zzz"] == 1
    out = (bigram_nll(rd.from_pandas(df), model_k=2, bigram_k=10)
           .to_pandas().set_index("doc_id"))
    v = 2
    ab = math.floor(LM_SCALE * math.log((4 + v + 1) / 3))  # c1(a)=4, c12=2
    ba = math.floor(LM_SCALE * math.log((3 + v + 1) / 3))  # c1(b)=3, c12=2
    azzz = math.floor(LM_SCALE * math.log((4 + v + 1) / 2))
    assert out.loc[0, "nll2_sum"] == 2 * ab + ba
    assert out.loc[1, "nll2_sum"] == ba
    assert out.loc[2, "nll2_sum"] == azzz
    assert out.loc[3, ["n_bigrams", "nll2_sum", "avg_nll2"]].tolist() == [0, 0, 0]
    assert azzz > ab  # rarer continuation costs more


def test_bigram_oov_context(ray_session):
    """A bigram whose context fell out of the unigram vocab scores
    the flat OOV-context value ln(V+1) — never a probability > 1."""
    import ray.data as rd

    from beats_ray.dataops.lm import LM_SCALE, bigram_nll

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["x x x y y", "qq ww qq ww qq ww qq ww"],
    })
    # model_k=2 keeps {qq, ww} (counts 4, 4); x (3) and y (2) are OOV
    out = (bigram_nll(rd.from_pandas(df), model_k=2, bigram_k=100)
           .to_pandas().set_index("doc_id"))
    oov_ctx = math.floor(LM_SCALE * math.log(2 + 1))
    assert out.loc[0, "nll2_sum"] == 4 * oov_ctx


# ------------------------------------------------------------------ CCNet


def _ccnet_sql_replay(df: pd.DataFrame, k: int) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(rf"""
        WITH w AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                        '\s+'), x -> x <> '') AS ws
          FROM documents
        ), tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
        cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                FROM tok GROUP BY term),
        vocab AS (SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT {k}),
        consts AS (
          SELECT (SELECT COALESCE(SUM(c), 0) FROM cnt)
               + (SELECT COUNT(*) FROM vocab) + 1 AS denom
        ), nll AS (
          SELECT t.doc_id,
                 CAST(FLOOR(1000000 * ln(
                   CAST((SELECT denom FROM consts) AS DOUBLE)
                   / (COALESCE(v.c, 0) + 1))) AS BIGINT) AS wnll
          FROM tok t LEFT JOIN vocab v USING (term)
        ), per AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(wnll) AS BIGINT) AS nll_sum
          FROM nll GROUP BY doc_id
        ), scored AS (
          SELECT d.doc_id,
                 CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                 CAST(CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0
                      ELSE per.nll_sum // per.n_tokens END AS BIGINT)
                   AS avg_nll
          FROM documents d LEFT JOIN per USING (doc_id)
        ), ne AS (SELECT avg_nll FROM scored WHERE n_tokens > 0),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ne),
        b1 AS (SELECT avg_nll AS v FROM ne ORDER BY avg_nll
               LIMIT 1 OFFSET GREATEST(((SELECT n FROM nn) + 2) // 3 - 1, 0)),
        b2 AS (SELECT avg_nll AS v FROM ne ORDER BY avg_nll
               LIMIT 1
               OFFSET GREATEST((2 * (SELECT n FROM nn) + 2) // 3 - 1, 0))
        SELECT doc_id, avg_nll,
               CASE WHEN n_tokens = 0 THEN 'empty'
                    WHEN avg_nll <= (SELECT v FROM b1) THEN 'head'
                    WHEN avg_nll <= (SELECT v FROM b2) THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored ORDER BY doc_id""").fetchdf()


@pytest.mark.parametrize("seed,n", [(31, 120), (32, 123), (33, 40)])
def test_ccnet_buckets_vs_sql_replay(ray_session, seed, n):
    # n=123 has a non-empty count divisible by 3 risk either way —
    # the integer tercile rank must agree exactly with the replay
    import ray.data as rd

    from beats_ray.dataops.lm import ccnet_ppl_buckets

    df = _mk_corpus(seed, n)
    got = (ccnet_ppl_buckets(rd.from_pandas(df).repartition(4), model_k=50)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _ccnet_sql_replay(df, 50)
    got["avg_nll"] = got["avg_nll"].astype("int64")
    want["avg_nll"] = want["avg_nll"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_ccnet_bucket_shares(ray_session):
    """Terciles split the non-empty docs roughly evenly; empty docs
    land in their own bucket."""
    import ray.data as rd

    from beats_ray.dataops.lm import ccnet_ppl_buckets

    df = _mk_corpus(41, 90)
    out = (ccnet_ppl_buckets(rd.from_pandas(df), model_k=5000)
           .to_pandas())
    shares = out["bucket"].value_counts()
    assert shares.get("empty", 0) == int((df["text"].str.strip() == "").sum())
    ne = len(out) - shares.get("empty", 0)
    for b in ("head", "middle", "tail"):
        assert shares.get(b, 0) <= ne // 3 + 2  # near-even split


def test_word_freq_spectrum_identity(ray_session):
    """Σ f·n_f equals the corpus token count, and the spectrum matches
    a pandas replica on a randomized corpus."""
    import ray.data as rd

    from beats_ray.dataops.textstats import word_freq_spectrum

    df = _mk_corpus(51, 80)
    got = (word_freq_spectrum(rd.from_pandas(df).repartition(4))
           .to_pandas().sort_values("freq").reset_index(drop=True))
    toks = df["text"].str.lower().str.split().explode().dropna()
    cnt = toks.value_counts()
    want = (cnt.value_counts().rename_axis("freq").rename("n_terms")
            .reset_index().sort_values("freq").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"freq": "int64", "n_terms": "int64"}),
        want.astype({"freq": "int64", "n_terms": "int64"}))
    assert int((got["freq"] * got["n_terms"]).sum()) == len(toks)
