"""Unigram language-model scoring — the perplexity-filter archetype.

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
    from ray.data.aggregate import Sum

    from .agg import top_k_by

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

    counts = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
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
