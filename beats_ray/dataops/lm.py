"""Language-model scoring ops — the perplexity-filter and
importance-resampling archetypes.

CCNet/Gopher-class pipelines bucket documents by language-model
perplexity and keep the fluent tail. Re-expressed fit-then-score:

- ``fit_unigram_lm``: pass 1 folds per-batch token counts (Arrow RE2
  split, value_counts — no per-row Python), ONE grouped sum, then a
  distributed top-``model_k`` picks the vocabulary (count desc, term
  asc). The driver holds only the k-row model; the total token count
  (OOV mass included) rides the same materialized counts Dataset.
- ``unigram_nll``: add-one smoothing over the bounded vocab,
  p(w) = (c_w + 1) / (T + V + 1), OOV → 1 / (T + V + 1). Per-word
  negative log-likelihood is carried as the INTEGER
  ``floor(1e6 · ln((T+V+1)/(c_w+1)))`` micro-nats (same exactness
  contract as tfidf's idf — DuckDB ln/FLOOR is bit-identical to
  CPython libm on this stack), so per-doc sums and the integer-div
  average compare exactly in SQL. Scoring broadcasts the model once
  (``ray.put``) and is fully vectorized: tokens flatten to one numpy
  array per batch, the dict probe runs once per DISTINCT term, sums
  come from ``np.add.at`` on the doc index — documents never move.

No reference analogue (libbeat has no LM); this is the training-data
tier beside quality.py's tfidf/bigram models.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

LM_SCALE = 1_000_000


def fit_unigram_lm(docs, text_col: str = "text", model_k: int = 10_000):
    """Corpus unigram counts → (model DataFrame[term, c], total_tokens).

    ``total_tokens`` counts EVERY token (in- and out-of-vocabulary) so
    the smoothing denominator is corpus-exact however small ``model_k``
    is. One grouped shuffle total; the counts Dataset is materialized
    once and feeds both the top-k and the total."""

    from .agg import grouped_sum, top_k_by

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({
            "term": vc.field("values"),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = grouped_sum(
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "term", "c",
    ).materialize()
    total = counts.sum("c") or 0
    model = top_k_by(counts, "c", "term", model_k).to_pandas()
    if "term" not in model.columns:
        model = pd.DataFrame({"term": pd.Series(dtype="string"),
                              "c": pd.Series(dtype="int64")})
    return model, int(total)


class _NllScore:
    """Broadcast-apply scorer (cached task): the term→micro-nat map
    resolves once per worker; per batch the probe runs once per
    distinct term and everything else is numpy."""

    def __init__(self, ref, text_col: str, id_col: str, oov: int):
        from .joins import _resolve_ref

        self.nll = _resolve_ref(ref)
        self.text_col = text_col
        self.id_col = id_col
        self.oov = oov

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[self.text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        arr = np.asarray(flat.to_pandas(), dtype=object)
        docidx = np.repeat(np.arange(len(lens)), lens)
        nonblank = arr != ""
        arr = arr[nonblank]
        docidx = docidx[nonblank]
        n_tok = np.bincount(docidx, minlength=len(lens)).astype(np.int64)
        nll_sum = np.zeros(len(lens), dtype=np.int64)
        if len(arr):
            uniq, inv = np.unique(arr, return_inverse=True)
            get = self.nll.get
            oov = self.oov
            u_nll = np.fromiter((get(w, oov) for w in uniq),
                                dtype=np.int64, count=len(uniq))
            np.add.at(nll_sum, docidx, u_nll[inv])
        avg = np.where(n_tok > 0, nll_sum // np.maximum(n_tok, 1), 0)
        return pa.table({
            "doc_id": t[self.id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "nll_sum": pa.array(nll_sum, pa.int64()),
            "avg_nll": pa.array(avg.astype(np.int64), pa.int64()),
        })


def unigram_nll(docs, text_col: str = "text", id_col: str = "doc_id",
                model_k: int = 10_000):
    """Score every document under a corpus-fit add-one-smoothed unigram
    LM. Returns Dataset[(doc_id, n_tokens, nll_sum, avg_nll)] — all
    int64 micro-nats; empty documents score (0, 0, 0)."""
    from .stagecache import task_stage

    model, total = fit_unigram_lm(docs, text_col=text_col, model_k=model_k)
    vocab_n = len(model)
    denom = total + vocab_n + 1
    nll = {
        t: math.floor(LM_SCALE * math.log(denom / (int(c) + 1)))
        for t, c in zip(model["term"], model["c"])
    }
    oov = math.floor(LM_SCALE * math.log(denom))
    ref = ray.put(nll)
    return docs.select_columns([id_col, text_col]).map_batches(
        task_stage(_NllScore, ref=ref, text_col=text_col, id_col=id_col,
                   oov=oov),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing — the head/middle/tail split (Wenzek et
# al. 2020): score every doc under the corpus LM, find the tercile
# boundaries of avg-NLL with the exact distributed rank-select (no
# global sort), tag each doc. Tercile RANKS are computed in integer
# math — 1-based ceil(n/3) = (n+2)//3 — on both sides, because
# ceil(q·n) with the double q=1/3 disagrees with ceil(n/3.0) whenever
# 3 | n. Docs with no tokens get their own 'empty' bucket.
# ---------------------------------------------------------------------------


def ccnet_ppl_buckets(docs, text_col: str = "text", id_col: str = "doc_id",
                      model_k: int = 10_000):
    """Per-doc CCNet bucket tags: Dataset[(doc_id, avg_nll, bucket)]
    with bucket ∈ {head, middle, tail, empty} — head = fluent tercile
    (lowest avg NLL), boundary ties fall to the lower bucket."""
    from .quantiles import rank_select

    scored = unigram_nll(docs, text_col=text_col, id_col=id_col,
                         model_k=model_k).materialize()
    ne = scored.map_batches(
        lambda t: t.filter(pc.greater(t["n_tokens"], 0)).select(["avg_nll"]),
        batch_format="pyarrow",
    )
    n = ne.count()
    if n:
        r1 = (n + 2) // 3 - 1            # 0-based rank of ceil(n/3)
        r2 = (2 * n + 2) // 3 - 1        # 0-based rank of ceil(2n/3)
        got = rank_select(ne, "avg_nll", sorted({r1, r2}))
        b1, b2 = int(got[r1]), int(got[r2])
    else:
        b1 = b2 = 0

    def tag(t: pa.Table) -> pa.Table:
        nll = t["avg_nll"].to_numpy(zero_copy_only=False)
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
        bucket = np.where(
            ntok == 0, "empty",
            np.where(nll <= b1, "head",
                     np.where(nll <= b2, "middle", "tail")))
        return pa.table({
            "doc_id": t["doc_id"],
            "avg_nll": t["avg_nll"],
            "bucket": pa.array(bucket.astype(object), pa.string()),
        })

    return scored.map_batches(tag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bigram LM scoring — the conditional extension of the unigram
# perplexity filter (CCNet's KenLM n-gram scoring, honest bounded-vocab
# version). p(w2|w1) = (c12 + 1) / (c1 + V + 1): add-one smoothing
# with the CONTEXT's corpus-exact unigram count and the unigram vocab
# size V. Both models are bounded top-k tables; the bigram vocab is
# restricted to contexts inside the unigram vocab so c12 ≤ c1 always
# (probabilities never exceed 1). Per-pair NLL is the integer
# floor(1e6·ln((c1+V+1)/(c12+1))) micro-nat (house exactness
# contract); docs with <2 tokens score (0, 0, 0).
# ---------------------------------------------------------------------------


def fit_bigram_lm(docs, text_col: str = "text", model_k: int = 10_000,
                  bigram_k: int = 50_000):
    """Two bounded models in two grouped shuffles: the unigram
    top-``model_k`` (term → corpus count) and the adjacent-bigram
    top-``bigram_k`` ("w1 w2" → count; ws-tokens cannot contain
    whitespace so the joined string is unambiguous), bigrams filtered
    to contexts present in the unigram vocab. Returns
    (uni DataFrame[term, c], bi DataFrame[bigram, c])."""

    from .agg import grouped_sum, top_k_by

    uni, _total = fit_unigram_lm(docs, text_col=text_col, model_k=model_k)

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        arr = np.asarray(pc.list_flatten(words).to_pandas(), dtype=object)
        docidx = np.repeat(np.arange(len(lens)), lens)
        nonblank = arr != ""
        arr = arr[nonblank]
        docidx = docidx[nonblank]
        if len(arr) > 1:
            adj = docidx[1:] == docidx[:-1]
            bi = np.char.add(np.char.add(arr[:-1].astype(str), " "),
                             arr[1:].astype(str))[adj]
        else:
            bi = np.empty(0, dtype=object)
        if not len(bi):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(bi, return_counts=True)
        return pa.table({"bigram": pa.array(u.astype(object), pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    counts = grouped_sum(
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "bigram", "c",
    )
    vocab = set(uni["term"])

    def in_vocab(t: pa.Table) -> pa.Table:
        bs = np.asarray(t["bigram"].to_pandas(), dtype=object)
        keep = np.fromiter((b.split(" ", 1)[0] in vocab for b in bs),
                           dtype=bool, count=len(bs))
        return t.filter(pa.array(keep))

    bi = (top_k_by(counts.map_batches(in_vocab, batch_format="pyarrow"),
                   "c", "bigram", bigram_k).to_pandas())
    if "bigram" not in bi.columns:
        bi = pd.DataFrame({"bigram": pd.Series(dtype="string"),
                           "c": pd.Series(dtype="int64")})
    return uni, bi


class _BigramNllScore:
    """Broadcast-apply scorer: bigram→NLL probes once per distinct
    adjacent pair; misses fall back to the context's count (unigram
    dict), then to the global OOV-context value."""

    def __init__(self, ref, text_col: str, id_col: str, oov_ctx: int):
        from .joins import _resolve_ref

        self.bi_nll, self.ctx_nll = _resolve_ref(ref)
        self.text_col = text_col
        self.id_col = id_col
        self.oov_ctx = oov_ctx

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[self.text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        arr = np.asarray(pc.list_flatten(words).to_pandas(), dtype=object)
        docidx = np.repeat(np.arange(len(lens)), lens)
        nonblank = arr != ""
        arr = arr[nonblank]
        docidx = docidx[nonblank]
        n_tok = np.bincount(docidx, minlength=len(lens)).astype(np.int64)
        n_bi = np.maximum(n_tok - 1, 0)
        s = np.zeros(len(lens), dtype=np.int64)
        if len(arr) > 1:
            adj = docidx[1:] == docidx[:-1]
            bi = np.char.add(np.char.add(arr[:-1].astype(str), " "),
                             arr[1:].astype(str))[adj]
            bdoc = docidx[:-1][adj]
            if len(bi):
                uniq, inv = np.unique(bi, return_inverse=True)
                bget = self.bi_nll.get
                cget = self.ctx_nll.get
                oov = self.oov_ctx

                def nll_of(b):
                    v = bget(b)
                    if v is None:
                        v = cget(b.split(" ", 1)[0], oov)
                    return v

                u_nll = np.fromiter((nll_of(b) for b in uniq),
                                    dtype=np.int64, count=len(uniq))
                np.add.at(s, bdoc, u_nll[inv])
        avg = np.where(n_bi > 0, s // np.maximum(n_bi, 1), 0)
        return pa.table({
            "doc_id": t[self.id_col],
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "nll2_sum": pa.array(s, pa.int64()),
            "avg_nll2": pa.array(avg.astype(np.int64), pa.int64()),
        })


def bigram_nll(docs, text_col: str = "text", id_col: str = "doc_id",
               model_k: int = 10_000, bigram_k: int = 50_000):
    """Score every document under the corpus-fit add-one bigram LM.
    Returns Dataset[(doc_id, n_bigrams, nll2_sum, avg_nll2)] — int64
    micro-nats; docs with fewer than two tokens score (0, 0, 0)."""
    from .stagecache import task_stage

    uni, bi = fit_bigram_lm(docs, text_col=text_col, model_k=model_k,
                            bigram_k=bigram_k)
    v = len(uni)
    c1 = {t: int(c) for t, c in zip(uni["term"], uni["c"])}
    ctx_nll = {t: math.floor(LM_SCALE * math.log(c + v + 1))
               for t, c in c1.items()}
    oov_ctx = math.floor(LM_SCALE * math.log(v + 1))
    bi_nll = {}
    for b, c12 in zip(bi["bigram"], bi["c"]):
        w1 = b.split(" ", 1)[0]
        bi_nll[b] = math.floor(LM_SCALE * math.log(
            (c1[w1] + v + 1) / (int(c12) + 1)))
    ref = ray.put((bi_nll, ctx_nll))
    return docs.select_columns([id_col, text_col]).map_batches(
        task_stage(_BigramNllScore, ref=ref, text_col=text_col,
                   id_col=id_col, oov_ctx=oov_ctx),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Naive-Bayes document classifier — the fastText-class quality-filter
# archetype (the GPT-3 pipeline scored CommonCrawl against a
# WebText-trained classifier and kept the high-scoring tail). Binary
# multinomial NB over ws-tokens: fit = per-class token counts in ONE
# grouped shuffle (the per-class doc counts ride the same shuffle as a
# sentinel "" row, free because blank tokens are filtered), model =
# bounded top-k vocabulary, scoring = broadcast per-term integer
# micro-nat log-odds + prior. w_um(t) =
# floor(1e6·ln((cp+1)·(Tn+V+1) / ((cn+1)·(Tp+V+1)))) — exact-int
# products, one double division, ln, floor: the op sequence DuckDB
# replays bit-identically (house exactness contract).
# ---------------------------------------------------------------------------


def fit_nb_classifier(docs, text_col: str = "text", label_col: str = "lang",
                      positive_value: str = "en", model_k: int = 10_000):
    """Per-class token counts → (model DataFrame[term, cp, cn],
    Tp, Tn, Np, Nn). Totals count EVERY token of each class (the
    smoothing denominators are corpus-exact however small ``model_k``);
    Np/Nn are per-class document counts for the prior."""

    from .agg import grouped_sum, top_k_by

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        is_pos = pc.fill_null(
            pc.equal(t[label_col].combine_chunks(), positive_value), False)
        terms, cps, cns = [], [], []
        for mask, pos in ((is_pos, True), (pc.invert(is_pos), False)):
            flat = pc.list_flatten(words.filter(mask))
            flat = flat.filter(pc.not_equal(flat, ""))
            vc = flat.value_counts()
            c = pc.cast(vc.field("counts"), pa.int64())
            z = pa.array(np.zeros(len(vc), dtype=np.int64))
            terms.append(vc.field("values"))
            cps.append(c if pos else z)
            cns.append(z if pos else c)
        # sentinel row: per-class DOCUMENT counts (blank terms were
        # filtered above, so "" cannot collide with a real token)
        n_pos = pc.sum(is_pos).as_py() or 0
        terms.append(pa.array([""], pa.string()))
        cps.append(pa.array([n_pos], pa.int64()))
        cns.append(pa.array([len(t) - n_pos], pa.int64()))
        return pa.table({
            "term": pa.concat_arrays(
                [pc.cast(a, pa.string()) for a in terms]),
            "cp": pa.concat_arrays(cps),
            "cn": pa.concat_arrays(cns),
        })

    counts = grouped_sum(
        docs.select_columns([text_col, label_col])
        .map_batches(partial, batch_format="pyarrow"),
        "term", ["cp", "cn"],
    ).materialize()

    def only_docs(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["term"], ""))

    def drop_docs(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["term"], ""))

    doc_row = counts.map_batches(only_docs, batch_format="pyarrow").to_pandas()
    np_docs = int(doc_row["cp"].sum()) if len(doc_row) else 0
    nn_docs = int(doc_row["cn"].sum()) if len(doc_row) else 0
    toks = counts.map_batches(drop_docs, batch_format="pyarrow")

    def with_total(t: pa.Table) -> pa.Table:
        return t.append_column("c", pc.add(t["cp"], t["cn"]))

    toks = toks.map_batches(with_total, batch_format="pyarrow").materialize()
    tp = (toks.sum("cp") or 0)
    tn = (toks.sum("cn") or 0)
    model = top_k_by(toks, "c", "term", model_k).drop_columns(["c"]).to_pandas()
    if "term" not in model.columns:
        model = pd.DataFrame({"term": pd.Series(dtype="string"),
                              "cp": pd.Series(dtype="int64"),
                              "cn": pd.Series(dtype="int64")})
    return model, int(tp), int(tn), np_docs, nn_docs


class _NbScore:
    """Broadcast-apply scorer (cached task): term→log-odds micro-nats
    resolves once per worker; the probe runs once per distinct term."""

    def __init__(self, ref, text_col: str, id_col: str, oov: int,
                 prior: int):
        from .joins import _resolve_ref

        self.w = _resolve_ref(ref)
        self.text_col = text_col
        self.id_col = id_col
        self.oov = oov
        self.prior = prior

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[self.text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        arr = np.asarray(flat.to_pandas(), dtype=object)
        docidx = np.repeat(np.arange(len(lens)), lens)
        nonblank = arr != ""
        arr = arr[nonblank]
        docidx = docidx[nonblank]
        n_tok = np.bincount(docidx, minlength=len(lens)).astype(np.int64)
        s = np.full(len(lens), self.prior, dtype=np.int64)
        if len(arr):
            uniq, inv = np.unique(arr, return_inverse=True)
            get = self.w.get
            oov = self.oov
            u_w = np.fromiter((get(w, oov) for w in uniq),
                              dtype=np.int64, count=len(uniq))
            np.add.at(s, docidx, u_w[inv])
        return pa.table({
            "doc_id": t[self.id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "nb_um": pa.array(s, pa.int64()),
            "pred": pa.array((s > 0).astype(np.int64), pa.int64()),
        })


def nb_classify(docs, text_col: str = "text", id_col: str = "doc_id",
                label_col: str = "lang", positive_value: str = "en",
                model_k: int = 10_000):
    """Fit a binary multinomial NB on (label == positive_value) and
    score every document: Dataset[(doc_id, n_tokens, nb_um, pred)] —
    nb_um the integer micro-nat posterior log-odds (prior included),
    pred = 1 iff nb_um > 0. Empty docs carry the prior alone."""
    from .stagecache import task_stage

    model, tp, tn, np_docs, nn_docs = fit_nb_classifier(
        docs, text_col=text_col, label_col=label_col,
        positive_value=positive_value, model_k=model_k)
    v = len(model)
    dp, dn = tp + v + 1, tn + v + 1
    w = {
        t: math.floor(LM_SCALE * math.log(
            (int(cp) + 1) * dn / ((int(cn) + 1) * dp)))
        for t, cp, cn in zip(model["term"], model["cp"], model["cn"])
    }
    oov = math.floor(LM_SCALE * math.log(dn / dp))
    prior = math.floor(LM_SCALE * math.log(
        (np_docs + 1) / (nn_docs + 1)))
    ref = ray.put(w)
    return docs.select_columns([id_col, text_col]).map_batches(
        task_stage(_NbScore, ref=ref, text_col=text_col, id_col=id_col,
                   oov=oov, prior=prior),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# DSIR — data selection via hashed-n-gram importance resampling
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling"). Features are unigrams + adjacent bigrams of the
# ws-token stream, hashed md5-64 into a FIXED number of buckets, so
# both distributions are bounded vectors however large the corpus:
# the fit is one ≤buckets-key grouped shuffle, the per-bucket
# log-ratio table broadcasts once, and scoring is a probe + add.
# lam_b = floor(1e6·ln((ct_b+1)·(Tr+B) / ((cr_b+1)·(Tt+B)))) in
# integer micro-nats — exact-int products, one double division, ln,
# floor: the same op sequence DuckDB runs, so the oracle is
# bit-identical (the house tfidf/unigram exactness contract).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024


def _feature_rows(df, text_col: str, buckets: int):
    """Per-row hashed feature buckets WITH multiplicity: (doc index,
    bucket) numpy pair for every unigram and adjacent bigram of
    lower(text). md5 runs once per DISTINCT feature string."""
    from .dedup import _stable_hash64, ws_tokens

    toks = df[text_col].fillna("").str.lower().map(ws_tokens)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = np.asarray([w for ws in toks for w in ws], dtype=object)
    docidx = np.repeat(np.arange(len(lens)), lens)
    if len(flat):
        same_doc = docidx[1:] == docidx[:-1]
        bi = np.char.add(np.char.add(flat[:-1].astype(str), " "),
                         flat[1:].astype(str))[same_doc].astype(object)
        feats = np.concatenate([flat, bi])
        fdoc = np.concatenate([docidx, docidx[:-1][same_doc]])
    else:
        feats, fdoc = flat, docidx
    if not len(feats):
        return (np.empty(0, dtype=np.int64),) * 2
    uniq, inv = np.unique(feats, return_inverse=True)
    ub = np.fromiter((_stable_hash64(f) % buckets for f in uniq),
                     dtype=np.int64, count=len(uniq))
    return fdoc, ub[inv]


def fit_dsir(docs, text_col: str = "text", target_col: str = "lang",
             target_value: str = "en", buckets: int = DSIR_BUCKETS):
    """Hashed feature counts for the TARGET slice and the RAW corpus
    in one pass: Dataset → per-batch (bucket, ct, cr) partials → one
    co-locating ≤buckets-key shuffle → the bounded table."""
    from .agg import map_buckets

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        fdoc, fb = _feature_rows(df, text_col, buckets)
        if not len(fb):
            return pd.DataFrame({"b": pd.array([], dtype="int64"),
                                 "ct": pd.array([], dtype="int64"),
                                 "cr": pd.array([], dtype="int64")})
        is_t = (df[target_col] == target_value).to_numpy()[fdoc]
        cr = np.bincount(fb, minlength=buckets)
        ct = np.bincount(fb[is_t], minlength=buckets)
        nz = np.flatnonzero(cr)
        return pd.DataFrame({"b": nz, "ct": ct[nz].astype("int64"),
                             "cr": cr[nz].astype("int64")})

    partials = docs.select_columns([text_col, target_col]).map_batches(
        partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("b", as_index=False)[["ct", "cr"]].sum()

    return map_buckets(partials, "b", combine, buckets=8).to_pandas()


class _DsirScore:
    """Broadcast-apply scorer: lam is a dense length-``buckets`` int64
    vector (tiny), so scoring is hash-probe + fancy-index + add."""

    def __init__(self, ref, text_col: str, id_col: str, buckets: int):
        from .joins import _resolve_ref

        self.lam = _resolve_ref(ref)
        self.text_col = text_col
        self.id_col = id_col
        self.buckets = buckets

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fdoc, fb = _feature_rows(df, self.text_col, self.buckets)
        n = len(df)
        n_feats = np.bincount(fdoc, minlength=n).astype(np.int64)
        dsir_um = np.zeros(n, dtype=np.int64)
        if len(fb):
            np.add.at(dsir_um, fdoc, self.lam[fb])
        return pd.DataFrame({
            "doc_id": df[self.id_col].to_numpy(),
            "n_feats": n_feats,
            "dsir_um": dsir_um,
        })


def dsir_weights(docs, text_col: str = "text", id_col: str = "doc_id",
                 target_col: str = "lang", target_value: str = "en",
                 buckets: int = DSIR_BUCKETS):
    """Score every document's importance weight toward the target
    slice: Dataset[(doc_id, n_feats, dsir_um)], dsir_um the integer
    micro-nat sum of per-feature log ratios (empty docs → (0, 0))."""
    from .stagecache import task_stage

    cnt = fit_dsir(docs, text_col=text_col, target_col=target_col,
                   target_value=target_value, buckets=buckets)
    tt = int(cnt["ct"].sum()) if len(cnt) else 0
    tr = int(cnt["cr"].sum()) if len(cnt) else 0
    # buckets unseen in the fit get the (ct=0, cr=0) smoothed value —
    # unreachable when scoring the fit corpus itself (raw counts cover
    # every feature), but correct for scoring external text
    default = math.floor(LM_SCALE * math.log(
        (tr + buckets) / (tt + buckets)))
    lam = np.full(buckets, default, dtype=np.int64)
    for b, ct, cr in zip(cnt.get("b", []), cnt.get("ct", []),
                         cnt.get("cr", [])):
        lam[int(b)] = math.floor(LM_SCALE * math.log(
            (int(ct) + 1) * (tr + buckets)
            / ((int(cr) + 1) * (tt + buckets))))
    ref = ray.put(lam)
    return docs.select_columns([id_col, text_col]).map_batches(
        task_stage(_DsirScore, ref=ref, text_col=text_col, id_col=id_col,
                   buckets=buckets),
        batch_format="pandas",
    )
