"""Text normalization + repetition scoring + contamination screening —
training-data curation stages.

- ``normalize_text``: unicode NFC + lowercase + whitespace collapse
  (deterministic canonical form; the pre-step for exact dedup). Oracle:
  DuckDB ``nfc_normalize``/``lower``/``regexp_replace`` — identical
  chain.
- ``repetition_score``: fraction of the document covered by its single
  most-frequent word — the cheap "degenerate repetition" quality signal
  (Gopher/C4-style rules); integer counts so the oracle compares exact.
- ``contamination_screen``: n-gram overlap of each document against a
  broadcast probe set (benchmark texts): the semi-join-on-ngram-hashes
  archetype — the probe set ships once via ``ray.put``, documents never
  shuffle.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import word_shingles, ws_tokens


def normalize_text(ds, field: str = "text", target: str = "norm_text"):
    def norm(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t[field].combine_chunks(), "")
        col = pc.utf8_normalize(col, form="NFC")
        col = pc.utf8_lower(col)
        col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
        # trim ONLY the ASCII space the \s+ collapse can leave at the
        # edges — utf8_trim_whitespace also strips NBSP/\x0b etc. that
        # the oracle chain (RE2 \s+ collapse, then DuckDB trim() =
        # spaces only) keeps, silently diverging the dedup keys
        col = pc.utf8_trim(col, characters=" ")
        if target in t.column_names:
            return t.set_column(t.column_names.index(target), target, col)
        return t.append_column(target, col)

    return ds.map_batches(norm, batch_format="pyarrow")


def repetition_score(docs, field: str = "text"):
    """Per doc: total word count and the count of the most frequent
    word (top_word_n / n_words = repetition ratio). Vectorized per
    batch via pandas explode + double groupby — no python per row."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        words = (
            df[field]
            .fillna("")
            .str.lower()
            .map(ws_tokens)  # ASCII \s class — oracle parity
        )
        # group by ROW POSITION, not doc_id: duplicate-id rows (normal
        # PRE-dedup) must score independently — pooling by doc_id made
        # the output batch-boundary-dependent and broke the row-wise
        # oracle comparison
        ridx = np.arange(len(df))
        lens = words.str.len().to_numpy()
        exploded = pd.DataFrame(
            {"_r": np.repeat(ridx, lens),
             "w": words.explode().dropna().to_numpy()}
        )
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        if exploded.empty:
            out["n_words"] = pd.array([0] * len(df), dtype="int64")
            out["top_word_n"] = pd.array([0] * len(df), dtype="int64")
            return out
        per_word = exploded.groupby(["_r", "w"]).size()
        agg = per_word.groupby("_r").agg(["sum", "max"]).rename(
            columns={"sum": "n_words", "max": "top_word_n"}
        )
        agg = agg.reindex(ridx).fillna(0)
        out["n_words"] = agg["n_words"].astype("int64").to_numpy()
        out["top_word_n"] = agg["top_word_n"].astype("int64").to_numpy()
        return out

    return docs.map_batches(score, batch_format="pandas")


def lexical_diversity(docs, field: str = "text"):
    """Type-token-ratio inputs per doc: total words, DISTINCT words,
    and hapax words (frequency exactly 1) — the lexical-diversity
    quality signal (low distinct/total = TEMPLATED text; high hapax
    share = natural prose). Same tokenization as repetition_score
    (lowercased ASCII-\\s split) so the two signals compose; vectorized
    per batch via explode + double groupby, no Python per row."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        words = df[field].fillna("").str.lower().map(ws_tokens)
        ridx = np.arange(len(df))
        lens = words.str.len().to_numpy()
        exploded = pd.DataFrame(
            {"_r": np.repeat(ridx, lens),
             "w": words.explode().dropna().to_numpy()}
        )
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        cols = ("n_words", "n_distinct", "n_hapax")
        if exploded.empty:
            for c in cols:
                out[c] = pd.array([0] * len(df), dtype="int64")
            return out
        per = exploded.groupby(["_r", "w"]).size()
        g = per.groupby("_r")
        agg = pd.DataFrame(
            {"n_words": g.sum(), "n_distinct": g.size(),
             "n_hapax": per[per == 1].groupby("_r").size()}
        ).reindex(ridx).fillna(0)
        for c in cols:
            out[c] = agg[c].astype("int64").to_numpy()
        return out

    return docs.map_batches(score, batch_format="pandas")


class ContaminationScreen:
    """Probe stage (cached task): the broadcast probe n-gram set
    resolves once per worker."""

    def __init__(self, probe_ref, k: int = 3):
        self.probe = (
            ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        )
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_grams, n_hits = [], []
        for text in df["text"].fillna(""):
            sh = word_shingles(text, self.k)
            n_grams.append(len(sh))
            n_hits.append(len(sh & self.probe))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_ngrams": pd.array(n_grams, dtype="int64"),
                "n_probe_hits": pd.array(n_hits, dtype="int64"),
            }
        )


def contamination_screen(docs, probe_texts: list[str], k: int = 3,
                         threshold: float = 0.5):
    """Flag documents whose word-k-gram overlap with the probe corpus
    (e.g. an eval benchmark) exceeds ``threshold``. The threshold is
    applied with exact integer cross-multiplication (hits*q >=
    max(n,1)*p for threshold p/q) so the SQL oracle compares exactly —
    no float boundary flips."""
    from .dedup import threshold_fraction

    p, q = threshold_fraction(threshold)
    probe: set[int] = set()
    for t in probe_texts:
        probe |= word_shingles(t, k)
    ref = ray.put(probe)
    from .stagecache import task_stage

    scored = docs.map_batches(
        task_stage(ContaminationScreen, probe_ref=ref, k=k),
        batch_format="pandas",
    )

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["contaminated"] = (
            df["n_probe_hits"] * q >= df["n_ngrams"].clip(lower=1) * p
        )
        return df

    return scored.map_batches(flag, batch_format="pandas")


# ------------------------------------------------------- boilerplate lines
#
# RefinedWeb/CCNet-style boilerplate removal: a LINE (newline-split,
# raw-byte identity) that occurs in >= ``min_docs`` DISTINCT documents
# is boilerplate (cookie banners, repeated stack-trace frames, nav
# chrome); every occurrence is removed from every document. Two passes:
#
#   1. count  — (line-hash, doc-id) pairs, ONE co-locating shuffle
#      bucketed by hash; exactness comes from the per-bucket pair dedup
#      (a document may span batches, so within-batch dedup is only a
#      volume optimization, never the correctness mechanism).
#   2. apply  — the surviving hash set is frequency-bounded
#      (<= total_lines / min_docs), so it normally broadcasts once via
#      ``ray.put``; above ``broadcast_limit`` the fully distributed
#      path explodes to lines, left-joins on the hash (one shuffle) and
#      regroups per document (one shuffle) — nothing id-sized on the
#      driver either way.
#
# Line hash = first 8 md5 bytes big-endian (``_stable_hash64``), which
# the SQL oracle reproduces as ('0x'||substr(md5(line),1,16))::UBIGINT —
# bit-exact parity, collisions identical on both sides.


def _hash_lines_once(lines: "pd.Series") -> "pd.Series":
    """md5-64 each DISTINCT line once per batch, then map back."""
    import numpy as np

    from .dedup import _stable_hash64

    uniq = pd.unique(lines)
    lut = {line: _stable_hash64(line) for line in uniq}
    return lines.map(lut).astype("uint64")


def _explode_lines(df: pd.DataFrame, text_col: str, keep_cols: list[str],
                   with_idx: bool = False) -> pd.DataFrame:
    """Vectorized doc→line explode keeping ``keep_cols`` (str.split +
    np.repeat — no Python per row)."""
    import numpy as np

    texts = df[text_col].fillna("")
    lines = texts.str.split("\n")
    lens = lines.str.len().to_numpy()
    out = pd.DataFrame(
        {c: np.repeat(df[c].to_numpy(), lens) for c in keep_cols}
    )
    out["line"] = lines.explode().to_numpy()
    if with_idx:
        # per-row 0..len-1 ordinal, vectorized
        out["_li"] = np.arange(len(out)) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
    return out


def boilerplate_line_hashes(corpus, text_col: str = "text",
                            id_col: str = "conv_id", min_docs: int = 20,
                            buckets: int = 64):
    """Pass 1: Dataset[(lh uint64)] of line hashes present in >=
    ``min_docs`` distinct documents. Blank lines ('') never qualify."""
    import numpy as np

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = _explode_lines(df, text_col, [id_col])
        sub = sub[sub["line"] != ""]
        sub = sub.drop_duplicates()  # volume only; exact dedup is per bucket
        out = pd.DataFrame({"_id": sub[id_col].to_numpy()})
        out["lh"] = _hash_lines_once(sub["line"]).to_numpy()
        # int64 bucket key — uniform dtype across stages (arrow-stable)
        out["_bb"] = (out["lh"] % np.uint64(buckets)).astype("int64")
        return out

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop_duplicates(["lh", "_id"]).groupby("lh").size()
        c = c[c >= min_docs]
        return pd.DataFrame({"lh": c.index.to_numpy(dtype="uint64")})

    tagged = corpus.map_batches(pairs, batch_format="pandas")
    return tagged.groupby("_bb").map_groups(
        count_distinct, batch_format="pandas"
    )


class _LineClean:
    """Broadcast-apply stage (cached task): the sorted boilerplate-hash
    array resolves once per worker; membership is one vectorized
    searchsorted over the batch's DISTINCT lines."""

    def __init__(self, bad_ref, text_col: str, keys: tuple):
        import numpy as np

        arr = ray.get(bad_ref) if isinstance(bad_ref, ray.ObjectRef) else bad_ref
        self.bad = np.asarray(arr, dtype="uint64")
        self.text_col = text_col
        self.keys = list(keys)

    def _members(self, hashes):
        import numpy as np

        if len(self.bad) == 0:
            return np.zeros(len(hashes), dtype=bool)
        idx = np.searchsorted(self.bad, hashes)
        idx = np.clip(idx, 0, len(self.bad) - 1)
        return self.bad[idx] == hashes

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .dedup import _stable_hash64

        texts = df[self.text_col].fillna("")
        split = texts.str.split("\n").tolist()
        # batch-distinct membership: hash each distinct nonblank line
        # once, one searchsorted for the whole batch
        uniq = list({l for ls in split for l in ls if l != ""})
        hs = np.fromiter(
            (_stable_hash64(l) for l in uniq), dtype="uint64", count=len(uniq)
        )
        is_bad = dict(zip(uniq, self._members(hs)))
        out_text, out_n = [], []
        for ls in split:
            kept = [l for l in ls if l == "" or not is_bad[l]]
            out_text.append("\n".join(kept))
            out_n.append(len(ls) - len(kept))
        res = df[self.keys].copy()
        res["clean_text"] = out_text
        res["n_removed"] = pd.array(out_n, dtype="int64")
        return res


def remove_boilerplate_lines(corpus, text_col: str = "text",
                             keys: tuple = ("conv_id", "turn_idx"),
                             id_col: str = "conv_id", min_docs: int = 20,
                             broadcast_limit: int = 100_000,
                             buckets: int = 64):
    """Remove corpus-wide boilerplate lines from every document. Returns
    Dataset[(*keys, clean_text, n_removed)] — one row per input row,
    fully-emptied documents kept with clean_text ''."""
    import numpy as np

    from .joins import _bucket_of, bucket_hash_join
    from .stagecache import task_stage

    bad = boilerplate_line_hashes(
        corpus, text_col=text_col, id_col=id_col,
        min_docs=min_docs, buckets=buckets,
    ).materialize()  # frequency-bounded: <= total_lines / min_docs
    if bad.count() <= broadcast_limit:
        pdf = bad.to_pandas()
        arr = np.sort(pdf["lh"].to_numpy(dtype="uint64")) if len(pdf) else (
            np.empty(0, dtype="uint64")
        )
        ref = ray.put(arr)
        return corpus.map_batches(
            task_stage(_LineClean, bad_ref=ref, text_col=text_col,
                       keys=tuple(keys)),
            batch_format="pandas",
        )

    # distributed apply: explode → left join on hash → regroup per doc
    key_cols = list(keys)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = _explode_lines(df, text_col, key_cols, with_idx=True)
        out["lh"] = _hash_lines_once(out["line"]).to_numpy()
        # blank lines are never boilerplate: poison their hash so the
        # join can't mark them (hash 0 could legitimately collide)
        out.loc[out["line"] == "", "lh"] = np.uint64(0)
        out["_blank"] = (out["line"] == "").to_numpy()
        return out

    lines = corpus.map_batches(explode, batch_format="pandas")
    marks = bad.map_batches(
        lambda df: df.assign(_bp=np.int64(1)), batch_format="pandas"
    )
    flagged = bucket_hash_join(lines, marks, left_on="lh", right_on="lh",
                               how="left", buckets=buckets)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket-wide sort, then grouped agg — no per-group loop
        g = g.sort_values([*key_cols, "_li"], kind="mergesort")
        g = g.assign(_rm=g["_bp"].notna() & ~g["_blank"])
        grp = g.groupby(key_cols, sort=False)
        n_rem = grp["_rm"].sum().astype("int64")
        joined = g.loc[~g["_rm"]].groupby(key_cols, sort=False)["line"].agg(
            "\n".join
        )
        out = n_rem.reset_index(name="n_removed")
        out["clean_text"] = (
            joined.reindex(n_rem.index).fillna("").to_numpy()
        )
        return out[key_cols + ["clean_text", "n_removed"]]

    tagged = flagged.map_batches(
        lambda df: df.assign(_kb=_bucket_of(df[key_cols[0]], buckets)),
        batch_format="pandas",
    )
    return tagged.groupby("_kb").map_groups(reassemble, batch_format="pandas")


def dedup_lines_global(corpus, text_col: str = "text",
                       keys: tuple = ("conv_id", "turn_idx"),
                       buckets: int = 64):
    """Corpus-GLOBAL exact line dedup: each distinct non-blank line
    survives only at its FIRST occurrence in ``(*keys, line_idx)``
    order — the paragraph-dedup step of C4/RefinedWeb-class cleanups
    (Raffel et al. 2020 dedup "three-sentence spans" simplified to line
    granularity), complementing :func:`remove_boilerplate_lines` which
    drops only frequency-qualified lines everywhere. Blank lines are
    document structure and always survive.

    The winner set is corpus-sized (one per distinct line) so no
    broadcast path exists; the whole op is TWO co-locating shuffles:
    (1) explode → group by line-hash bucket, one bucket-wide sort picks
    every line's global winner and marks each exploded row keep/drop;
    (2) regroup by document, reassemble kept lines in order. Line
    identity is the md5-64 hash (``_stable_hash64``), which the SQL
    oracle mirrors as ('0x'||substr(md5(line),1,16))::UBIGINT — hash
    collisions land identically on both sides. Blank lines are ranked
    in a separate (_blank, lh) partition exactly like the oracle's
    (nb, lh) window, so a real line hashing like '' cannot cross-mark.

    Returns Dataset[(*keys, dedup_text, n_dropped)] — one row per input
    row; fully-deduped documents keep ``dedup_text ''``."""
    import numpy as np

    from .joins import _bucket_of

    key_cols = list(keys)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = _explode_lines(df, text_col, key_cols, with_idx=True)
        out["lh"] = _hash_lines_once(out["line"]).to_numpy()
        out["_blank"] = (out["line"] == "").to_numpy()
        out["_bb"] = (out["lh"] % np.uint64(buckets)).astype("int64")
        return out

    lines = corpus.map_batches(explode, batch_format="pandas")

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket-wide sort; first row per (_blank, lh) in
        # (*keys, _li) order is the global winner
        g = g.sort_values(["_blank", "lh", *key_cols, "_li"],
                          kind="mergesort")
        first = ~g.duplicated(["_blank", "lh"])
        g["_keep"] = g["_blank"].to_numpy() | first.to_numpy()
        return g.drop(columns=["_bb"])

    marked = lines.groupby("_bb").map_groups(mark, batch_format="pandas")

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, "_li"], kind="mergesort")
        g = g.assign(_rm=~g["_keep"])
        n_rem = g.groupby(key_cols, sort=False)["_rm"].sum().astype("int64")
        joined = g.loc[g["_keep"]].groupby(key_cols, sort=False)["line"].agg(
            "\n".join
        )
        out = n_rem.reset_index(name="n_dropped")
        out["dedup_text"] = joined.reindex(n_rem.index).fillna("").to_numpy()
        return out[key_cols + ["dedup_text", "n_dropped"]]

    tagged = marked.map_batches(
        lambda df: df.assign(_kb=_bucket_of(df[key_cols[0]], buckets)),
        batch_format="pandas",
    )
    return tagged.groupby("_kb").map_groups(reassemble, batch_format="pandas")


def word_info(docs, field: str = "text"):
    """Per-doc word-entropy information content in integer micro-nats:
    Dataset[(doc_id, n_words, info_um)] with
    info_um = Σ_w floor((10⁶·c_w)·ln(T/c_w)) over the doc's distinct
    words (c_w = word count, T = total words) — i.e. 10⁶·T·H(doc), the
    Shannon information of the doc's unigram distribution. The
    templated/degenerate-text signal entropy-based quality filters
    threshold on. Same ws_tokens tokenizer as lexical_diversity.

    Exactness: ln evaluates once per DISTINCT (T, c) pair via
    ``math.log`` (the same libm ``ln`` DuckDB calls — numpy's SIMD log
    can differ in the last ulp, which a floor would amplify); T/c is an
    exact int÷int double under 2⁵³ and (10⁶·c) promotes exactly, so
    the SQL replay reproduces every term bit-for-bit. Empty docs score
    (0, 0)."""
    import math

    import numpy as np

    from .dedup import ws_tokens

    def score(df: pd.DataFrame) -> pd.DataFrame:
        words = df[field].fillna("").str.lower().map(ws_tokens)
        ridx = np.arange(len(df))
        lens = words.str.len().to_numpy()
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        exploded = pd.DataFrame(
            {"_r": np.repeat(ridx, lens),
             "w": words.explode().dropna().to_numpy()})
        if exploded.empty:
            out["n_words"] = pd.array([0] * len(df), dtype="int64")
            out["info_um"] = pd.array([0] * len(df), dtype="int64")
            return out
        per = exploded.groupby(["_r", "w"]).size()
        rows = per.index.get_level_values("_r").to_numpy()
        c = per.to_numpy(np.int64)
        t_per_doc = per.groupby("_r").sum()
        t = t_per_doc.reindex(rows).to_numpy(np.int64)
        pairs = np.stack([t, c], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        terms = np.array(
            [math.floor((1_000_000 * int(cc)) * math.log(int(tt) / int(cc)))
             for tt, cc in uniq], dtype=np.int64)
        info = pd.Series(terms[inv]).groupby(rows).sum()
        out["n_words"] = (t_per_doc.reindex(ridx).fillna(0)
                          .astype("int64").to_numpy())
        out["info_um"] = info.reindex(ridx).fillna(0).astype("int64").to_numpy()
        return out

    return docs.map_batches(score, batch_format="pandas")
