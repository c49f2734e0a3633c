"""BPE tokenizer training and application — the tokenization stage of
a training-data pipeline (Sennrich et al. 2016 byte-pair encoding).

Re-expressed fit-then-score, the house two-pass shape:

- ``fit_bpe``: pass 1 folds per-batch word counts (Arrow RE2 split +
  value_counts), ONE grouped shuffle, and a distributed top-``vocab_k``
  picks the fit vocabulary (count desc, word asc) — the driver holds
  only the bounded word-frequency table and runs the classic merge
  loop on it (count adjacent symbol pairs weighted by word frequency,
  take the most frequent — ties break on the lexicographically
  smallest pair — merge everywhere, repeat). Fitting on the top-k
  words is the standard bounded-state concession (same as the bigram
  coverage and unigram-LM fits); merges are what training learns, and
  rare-tail words barely move pair counts.
- ``bpe_token_counts``: apply a merge list to every document and
  return per-doc token counts under the learned vocabulary. The merge
  list broadcasts once; application is per DISTINCT word per batch
  (np.unique collapses repeats) with a per-worker memo, so a hot
  vocabulary costs one merge replay per worker however many tokens
  repeat it. Application is the leftmost fixpoint of each merge in
  rank order on the space-joined symbol string — exactly the loop a
  DuckDB recursive CTE replays with chained ``replace`` steps, so the
  oracle matches token-for-token.

No reference analogue (libbeat does not tokenize); this sits beside
lm.py in the training-data tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _merge_syms(syms: tuple, pair: tuple) -> tuple:
    """One merge applied leftmost-first across a symbol tuple."""
    out, i, n = [], 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def fit_bpe(docs, n_merges: int = 20, vocab_k: int = 5000,
            text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus's top-``vocab_k``
    words (ws-token split of lower(text), counted WITH multiplicity).
    Returns the ordered merge list; stops early when no adjacent pair
    remains."""

    from .agg import grouped_sum, top_k_by

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    counts = grouped_sum(
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow"),
        "word", "c",
    )
    top = top_k_by(counts, "c", "word", vocab_k).to_pandas()
    if "word" not in top.columns or not len(top):
        return []
    vocab = {tuple(str(w)): int(c)
             for w, c in zip(top["word"], top["c"])}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            merged = _merge_syms(syms, best)
            new_vocab[merged] = new_vocab.get(merged, 0) + c
        vocab = new_vocab
    return merges


def bpe_apply_ntok(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of one word under a merge list: leftmost fixpoint
    of each merge in rank order on the space-joined symbol string —
    the exact loop the SQL oracle's recursive CTE replays."""
    if not word:
        return 0
    s = " " + " ".join(word) + " "
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        while pat in s:
            s = s.replace(pat, rep)
    return s.count(" ") - 1


class _BpeCount:
    """Broadcast-apply counter: merges resolve once per worker; per
    batch the merge replay runs once per DISTINCT word (memoized
    across batches, capacity-capped)."""

    def __init__(self, ref, text_col: str, id_col: str):
        from .joins import _resolve_ref

        self.merges = _resolve_ref(ref)
        self.text_col = text_col
        self.id_col = id_col
        self.memo: dict[str, int] = {}

    def _ntok(self, w: str) -> int:
        got = self.memo.get(w)
        if got is None:
            if len(self.memo) > 500_000:   # bound worker memory
                self.memo.clear()
            got = self.memo[w] = bpe_apply_ntok(w, self.merges)
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t[self.text_col].combine_chunks(),
                                          ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = np.asarray(pc.list_flatten(words).to_pandas(), dtype=object)
        docidx = np.repeat(np.arange(len(lens)), lens)
        nonblank = flat != ""
        flat, docidx = flat[nonblank], docidx[nonblank]
        n = len(lens)
        n_words = np.bincount(docidx, minlength=n).astype(np.int64)
        n_bpe = np.zeros(n, dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            u_ntok = np.fromiter((self._ntok(w) for w in uniq),
                                 dtype=np.int64, count=len(uniq))
            np.add.at(n_bpe, docidx, u_ntok[inv])
        return pa.table({
            "doc_id": t[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        })


def bpe_token_counts(docs, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id"):
    """Dataset[(doc_id, n_words, n_bpe_tokens)] under ``merges`` —
    empty documents count (0, 0)."""
    from .stagecache import task_stage

    ref = ray.put(list(merges))
    return docs.select_columns([id_col, text_col]).map_batches(
        task_stage(_BpeCount, ref=ref, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
