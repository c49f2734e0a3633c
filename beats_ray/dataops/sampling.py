"""Deterministic sampling, dataset splits, and sequence packing —
training-data assembly stages.

- ``hash_sample``: keep a fraction of rows by content-stable hash
  threshold (md5 of ``salt:key``) — the reproducible "sample 1% of the
  corpus" op. No RNG state, no coordination: any worker decides any
  row independently, so it scales embarrassingly and re-runs
  identically.
- ``hash_split``: named train/val/test splits from cumulative ranges of
  the same hash — every doc lands in exactly one split, stable across
  runs and cluster sizes.
- ``pack_sequences``: greedy fixed-budget packing of documents into
  training sequences (bins) — per hash-bucket replay in doc_id order
  (deterministic), the batch analogue of a packing dataloader. A doc
  exceeding the budget gets its own bin.

All three are exactly reproducible in SQL (md5 hashing + recursive-CTE
packing replay), so each has a full value-level oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _stable_hash, threshold_fraction

_HASH_SPACE = 1 << 32


def _key_hash(series: pd.Series, salt: str) -> np.ndarray:
    return np.fromiter(
        (_stable_hash(f"{salt}:{v}") for v in series.astype(str)),
        dtype=np.uint64,
        count=len(series),
    )


def _lt_threshold(p: int, q: int) -> int:
    """Exact uint32 cutoff for ``h*q < p*2^32``: h < thr. Computed in
    arbitrary-precision Python int so huge denominators (e.g. the
    Fraction of 1/3's float repr) can never overflow the vectorized
    comparison."""
    return (p * _HASH_SPACE - 1) // q + 1 if p > 0 else 0


def _ge_threshold(p: int, q: int) -> int:
    """Exact uint32 cutoff for ``h*q >= p*2^32``: h >= thr."""
    return (p * _HASH_SPACE + q - 1) // q


def hash_sample(ds, fraction: float, key: str = "doc_id",
                salt: str = "sample"):
    """Deterministic fraction sample: keep rows with
    ``md5_32(salt:key) < fraction * 2^32`` (exact integer cutoff
    precomputed in big-int math — equivalent to ``h*q < p*2^32`` but
    immune to uint64 wraparound for any fraction)."""
    p, q = threshold_fraction(fraction)
    thr = np.uint64(min(_lt_threshold(p, q), _HASH_SPACE))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash(df[key], salt)
        return df[h < thr]

    return ds.map_batches(pick, batch_format="pandas")


def stratified_sample(ds, rates: dict[str, float], stratum: str,
                      key: str = "doc_id", salt: str = "stratified",
                      default_fraction: float = 0.0):
    """Per-stratum deterministic sampling — the corpus-mixing op
    (down-sample the dominant language/source, keep more of the rare
    ones): each stratum value gets its own exact hash cutoff, rows of
    unlisted strata fall back to ``default_fraction``.  Same
    content-stable md5 threshold as :func:`hash_sample`, so any worker
    decides any row independently at any cluster size, and the whole
    selection is SQL-replayable (a CASE over the same cutoffs)."""
    def thr_of(f: float) -> np.uint64:
        p, q = threshold_fraction(f)
        return np.uint64(min(_lt_threshold(p, q), _HASH_SPACE))

    cuts = {s: thr_of(f) for s, f in rates.items()}
    dflt = thr_of(default_fraction)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash(df[key], salt)
        cut = (df[stratum].map(cuts).fillna(dflt)
               .to_numpy(dtype=np.uint64))
        return df[h < cut]

    return ds.map_batches(pick, batch_format="pandas")


def mix_corpora(parts: dict[str, tuple], key: str = "doc_id",
                salt: str = "mix"):
    """Weighted corpus mixing with epoch upsampling — the final
    assembly step of a training mix ("2 epochs of books, 0.3 of web"):
    ``parts`` maps source name -> (dataset, target_rows).  Each corpus
    contributes ``target // n`` whole epochs plus a hash-sampled
    fractional epoch (same md5 family as :func:`hash_sample`, salted
    per source so fractions are independent), tagged with ``source``
    and ``epoch`` columns.  Row counts hit the target up to the
    sampling approximation of the fractional epoch; membership is
    per-row deterministic, so the whole mix replays in SQL
    (``range(epochs+1)`` cross join + the hash predicate on the last
    epoch) and re-runs identically at any cluster size."""
    import ray.data as rd

    out = []
    for name, (ds, target) in parts.items():
        n = ds.count()
        if n == 0 or target <= 0:
            continue
        epochs, rem = divmod(int(target), n)
        frac = rem / n

        def tag(df: pd.DataFrame, name=name) -> pd.DataFrame:
            df = df.copy()
            df["source"] = name
            return df

        tagged = ds.map_batches(tag, batch_format="pandas")
        for e in range(epochs):
            def add_epoch(df: pd.DataFrame, e=e) -> pd.DataFrame:
                df = df.copy()
                df["epoch"] = np.int64(e)
                return df

            out.append(tagged.map_batches(add_epoch,
                                          batch_format="pandas"))
        if rem:
            def add_last(df: pd.DataFrame, e=epochs) -> pd.DataFrame:
                df = df.copy()
                df["epoch"] = np.int64(e)
                return df

            out.append(hash_sample(tagged, frac, key=key,
                                   salt=f"{salt}:{name}")
                       .map_batches(add_last, batch_format="pandas"))
    if not out:
        raise ValueError("mix_corpora: no non-empty part")
    ds0 = out[0]
    return ds0.union(*out[1:]) if len(out) > 1 else ds0


def hash_split(ds, ratios: dict[str, float], key: str = "doc_id",
               salt: str = "split"):
    """Assign each row to one named split by cumulative hash ranges.
    ``ratios`` must sum to 1 (e.g. {"train": .8, "val": .1, "test": .1});
    boundaries are exact integer products so the SQL oracle lands every
    row identically."""
    names = list(ratios)
    bounds = []
    from fractions import Fraction

    acc = Fraction(0)
    for n in names:
        lo = acc
        acc = acc + Fraction(str(ratios[n]))
        bounds.append((n, lo, acc))
    if acc != 1:
        raise ValueError(f"ratios must sum to 1, got {float(acc)}")

    # precompute exact uint32 cutoffs in big-int math (no vectorized
    # multiply → no overflow for any ratio denominator)
    cuts = [
        (
            n,
            np.uint64(min(_ge_threshold(lo.numerator, lo.denominator),
                          _HASH_SPACE)),
            np.uint64(min(_lt_threshold(hi.numerator, hi.denominator),
                          _HASH_SPACE)),
        )
        for n, lo, hi in bounds
    ]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash(df[key], salt)
        split = np.empty(len(df), dtype=object)
        for n, lo_t, hi_t in cuts:
            split[(h >= lo_t) & (h < hi_t)] = n
        out = df.copy()
        out["split"] = split
        return out

    return ds.map_batches(assign, batch_format="pandas")


def sample_exact_k(ds, k: int, key: str = "doc_id", salt: str = "xk"):
    """EXACTLY-k deterministic uniform sample: the k rows with the
    smallest 64-bit md5 hash of ``salt:key`` (ties broken by key) —
    the fixed-size eval-subset op that :func:`hash_sample`'s fractional
    cut can't provide. Distributed as a top-k: each block keeps its own
    k smallest (the sort's input shrinks to blocks × k rows), then one
    tiny global sort + limit — the driver never sees more than k rows.
    64-bit hash, so rank collisions stay negligible past 10^9 rows;
    SQL-replayable as ``ORDER BY md5-hash, key LIMIT k``."""
    from .dedup import _stable_hash64

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (_stable_hash64(f"{salt}:{v}") for v in df[key].astype(str)),
            dtype=np.uint64, count=len(df))
        out = df.copy()
        out["_h"] = h
        return out.sort_values(["_h", key]).head(k)

    return (ds.map_batches(block_topk, batch_format="pandas")
              .sort(["_h", key]).limit(k).drop_columns(["_h"]))


def weighted_sample_k(ds, k: int, weight_col: str, key: str = "doc_id",
                      salt: str = "wk"):
    """WEIGHTED sampling without replacement (Efraimidis–Spirakis
    A-Res): keep the k rows with the LARGEST selection key ln(u)/w,
    where u ∈ (0, 1] derives from the md5-64 of ``salt:key`` and
    w > 0 is the integer weight — inclusion probability rises with
    weight, the corpus-mixing primitive uniform hash sampling can't
    provide. Distributed exactly like :func:`sample_exact_k`: per-block
    top-k (the sort input shrinks to blocks × k rows) → one tiny global
    sort + limit; the driver never sees more than k rows.

    Exactness contract: u = (double(h) + 1) / 2⁶⁴ (the cast of the
    >2⁵³ hash rounds identically in numpy and DuckDB), ln via
    ``math.log`` (libm — the same ``ln`` DuckDB calls; numpy's SIMD
    log can differ in the last ulp, which could flip a rank
    comparison), and the two divisions are single IEEE ops — so the
    SQL replay selects the identical rows. Rows with w ≤ 0 are
    excluded (matches the SQL WHERE)."""
    import math

    from .dedup import _stable_hash64

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy()
        df = df[w > 0]
        w = w[w > 0].astype(np.float64)
        h = np.fromiter(
            (_stable_hash64(f"{salt}:{v}") for v in df[key].astype(str)),
            dtype=np.uint64, count=len(df))
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        lnu = np.fromiter((math.log(x) for x in u), dtype=np.float64,
                          count=len(u))
        out = df.copy()
        out["_nk"] = -(lnu / w)  # ascending sort == descending key
        return out.sort_values(["_nk", key]).head(k)

    return (ds.map_batches(block_topk, batch_format="pandas")
              .sort(["_nk", key]).limit(k).drop_columns(["_nk"]))


def sample_exact_k_per_group(ds, k: int, group: str, key: str = "doc_id",
                             salt: str = "xk"):
    """EXACTLY-k-per-group deterministic sample (the balanced-subset
    op: k docs per language/source): per group, the k rows with the
    smallest md5-64 of ``salt:key`` (ties by key). Distributed as a
    grouped top-k: each block first keeps its own k smallest PER GROUP
    (the shuffle input shrinks to <= blocks * k rows per group), then
    one co-locating groupby finishes each group with a tiny sort+head —
    the full corpus never shuffles. SQL mirror: ``row_number() OVER
    (PARTITION BY group ORDER BY hash, key) <= k``. Groups smaller
    than k keep all their rows (same as the SQL)."""
    from .dedup import _stable_hash64

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (_stable_hash64(f"{salt}:{v}") for v in df[key].astype(str)),
            dtype=np.uint64, count=len(df))
        out = df.copy()
        out["_h"] = h
        return (out.sort_values(["_h", key], kind="mergesort")
                   .groupby(group, sort=False).head(k))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["_h", key], kind="mergesort").head(k)
                 .drop(columns=["_h"]))

    return (ds.map_batches(block_topk, batch_format="pandas")
              .groupby(group).map_groups(finish, batch_format="pandas"))


def pack_sequences(docs, budget: int, buckets: int = 16,
                   key: str = "doc_id", text_col: str = "text"):
    """Greedy sequence packing: within each hash bucket (``key %
    buckets``), documents in ``key`` order accumulate into bins of at
    most ``budget`` whitespace tokens; a doc that would overflow starts
    the next bin (an oversized doc occupies its own bin). Output:
    (key, bucket, bin_id, n_tokens).

    The greedy recurrence is sequential per bucket (like the reference's
    token bucket) — one tight loop per bucket, buckets in parallel."""
    from .agg import map_buckets

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = _assign_bins(g, budget, key)
        return g[[key, "bucket", "bin_id", "n_tokens"]]

    tagged = docs.map_batches(
        lambda df: _tag_pack_input(df, key, text_col, buckets),
        batch_format="pandas",
    )
    return map_buckets(tagged, "bucket", pack, buckets=buckets)


def _tag_pack_input(df: pd.DataFrame, key: str, text_col: str,
                    buckets: int, keep_text: bool = False) -> pd.DataFrame:
    """Shared pack-stage input tagging (pack_sequences AND
    pack_and_concat — one place to keep the tokenizer oracle-synced):
    (key, bucket = key % buckets, n_tokens via the ASCII ws_tokens
    splitter the recursive-CTE oracle replays; text kept only for the
    concat variant)."""
    from .dedup import ws_tokens

    out = pd.DataFrame(
        {
            key: df[key].astype("int64"),
            "bucket": (df[key].astype("int64") % buckets),
            "n_tokens": (
                df[text_col].fillna("").map(lambda t: len(ws_tokens(t)))
                .astype("int64")
            ),
        }
    )
    if keep_text:
        out[text_col] = df[text_col].fillna("").to_numpy()
    return out


def _assign_bins(g: pd.DataFrame, budget: int, key: str) -> pd.DataFrame:
    """The greedy binning recurrence shared by pack_sequences and
    pack_and_concat: sort by (bucket, key) — a map_buckets hash bucket
    can hold several `bucket` values, so the reset detection needs each
    bucket as one contiguous run — then accumulate to the budget,
    overflow starts the next bin. Returns g sorted with a bin_id
    column."""
    g = g.sort_values(["bucket", key])
    toks = g["n_tokens"].to_numpy()
    bkt = g["bucket"].to_numpy()
    bins = np.zeros(len(g), dtype=np.int64)
    run = 0
    cur = 0
    prev_bucket = None
    for i in range(len(g)):
        if prev_bucket is None or bkt[i] != prev_bucket:
            prev_bucket = bkt[i]
            run, cur = int(toks[i]), 0
        elif run + toks[i] > budget:
            cur += 1
            run = int(toks[i])
        else:
            run += int(toks[i])
        bins[i] = cur
    out = g.copy()
    out["bin_id"] = bins
    return out


def pack_and_concat(docs, budget: int, buckets: int = 16,
                    key: str = "doc_id", text_col: str = "text",
                    sep: str = "\n"):
    """Materialize the packed TRAINING SEQUENCES: same greedy binning as
    ``pack_sequences``, but each bin becomes one output row with the
    member documents' text concatenated in ``key`` order (the actual
    sequence a dataloader would consume). Output: (bucket, bin_id,
    n_docs, n_tokens, text)."""
    from .agg import map_buckets

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = _assign_bins(g, budget, key)
        out = (
            g.groupby(["bucket", "bin_id"], as_index=False)
            .agg(
                n_docs=(key, "size"),
                n_tokens=("n_tokens", "sum"),
                text=(text_col, lambda s: sep.join(s)),
            )
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out

    tagged = docs.map_batches(
        lambda df: _tag_pack_input(df, key, text_col, buckets,
                                   keep_text=True),
        batch_format="pandas",
    )
    return map_buckets(tagged, "bucket", pack, buckets=buckets)


def chunk_documents(docs, size: int, stride: int | None = None,
                    key: str = "doc_id", text_col: str = "text"):
    """Sliding-window document chunking — the RAG/context-window prep
    op: split each document's ws-token stream into windows of at most
    ``size`` tokens starting every ``stride`` tokens (stride < size
    overlaps, stride == size tiles). Chunk starts are 0, stride,
    2·stride, … while start < n_tokens, so the final window may be
    short; zero-token documents emit no chunks. Output:
    (key, chunk_idx, chunk_text, n_tokens) with chunk_text the original
    (case-preserved) tokens joined by one space.

    Embarrassingly parallel — a pure per-batch expansion, no shuffle;
    output volume is input volume × (size/stride), which is the
    intended duplication of an overlapped chunking. Exactly replayable
    in SQL as range(0, len(ws), stride) × list_slice."""
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import ws_tokens

        toks = df[text_col].fillna("").map(ws_tokens)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        n_chunks = -(-lens // stride)  # ceil; 0 tokens -> 0 chunks
        keys = np.repeat(df[key].to_numpy(), n_chunks)
        idx = np.concatenate(
            [np.arange(c, dtype=np.int64) for c in n_chunks]
        ) if len(df) else np.empty(0, dtype=np.int64)
        starts = idx * stride
        ends = np.minimum(starts + size, np.repeat(lens, n_chunks))
        tok_lists = toks.to_numpy()
        docix = np.repeat(np.arange(len(df)), n_chunks)
        texts = [" ".join(tok_lists[d][s:e])
                 for d, s, e in zip(docix, starts, ends)]
        return pd.DataFrame({
            key: keys,
            "chunk_idx": idx,
            "chunk_text": pd.array(texts, dtype="object"),
            "n_tokens": (ends - starts).astype("int64"),
        })

    return docs.select_columns([key, text_col]).map_batches(
        expand, batch_format="pandas")


# ---------------------------------------------------------------------------
# Deterministic equal-size shuffle-sharding — the pre-training "global
# shuffle, then split into N shards" step — WITHOUT a global sort.
# A distributed ntile: shard(row) = (rank · N) // n where rank is the
# row's position in (hash, key) order. Ranks are never materialized;
# the N−1 boundary (hash, key) pairs are found by histogram
# rank-select (quantiles.rank_select) plus one bounded tie resolve,
# then assignment is a single broadcast searchsorted-style pass.
# Cost: O(log range) shrinking scans for the boundaries + one
# assignment pass — vs the all-to-all shuffle a sort would pay.
# ---------------------------------------------------------------------------


class _ShardAssign:
    """shard = #{boundary pairs ≤ (hv, key)} via N−1 vector compares."""

    def __init__(self, ref, key):
        from .joins import _resolve_ref

        self.pairs = _resolve_ref(ref)
        self.key = key

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        hv = df["hv"].to_numpy(np.int64)
        ids = df[self.key].to_numpy()
        shard = np.zeros(len(df), dtype=np.int64)
        for v, bid in self.pairs:
            shard += (hv > v) | ((hv == v) & (ids >= bid))
        return pd.DataFrame({self.key: ids, "shard": shard})


def shuffle_shards(ds, n_shards: int, key: str = "doc_id",
                   salt: str = "shuf", resolve_limit: int = 1_000_000,
                   hash_fn=None):
    """Dataset[(key, shard)] with shard sizes equal to within one row,
    rows ordered into shards by the 63-bit md5 hash of ``salt:key``
    (ties by key — exact even under hash collisions; ``hash_fn``
    overrides the hash for tests). SQL mirror:
    ``(row_number() OVER (ORDER BY hv, key) - 1) * N // n``."""
    import ray

    from .dedup import _stable_hash64
    from .joins import _resolve_ref
    from .quantiles import rank_select
    from .stagecache import task_stage

    hfn = hash_fn or _stable_hash64

    def with_h(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (hfn(f"{salt}:{v}") for v in df[key].astype(str)),
            dtype=np.uint64, count=len(df))
        out = df[[key]].copy()
        out["hv"] = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return out

    hd = (ds.select_columns([key])
            .map_batches(with_h, batch_format="pandas").materialize())
    n = hd.count()
    empty = pd.DataFrame({key: pd.Series(dtype="int64"),
                          "shard": pd.Series(dtype="int64")})
    if n == 0:
        import ray.data as rd

        return rd.from_pandas(empty)

    # 0-based rank of the first row of each shard s ≥ 1
    bound_ranks = [(s * n + n_shards - 1) // n_shards
                   for s in range(1, n_shards)]
    bound_ranks = [r for r in bound_ranks if r < n]
    vals = rank_select(hd, "hv", bound_ranks) if bound_ranks else {}

    # exact (hv, key) boundary pairs: rows below + tied rows per value
    bvals = np.array(sorted(set(vals.values())), dtype=np.int64)
    bref = ray.put(bvals)

    def below_partial(df: pd.DataFrame) -> pd.DataFrame:
        bv = _resolve_ref(bref)
        hv = np.sort(df["hv"].to_numpy(np.int64))
        return pd.DataFrame({
            "bi": np.arange(len(bv), dtype=np.int64),
            "c": np.searchsorted(hv, bv, side="left").astype(np.int64),
        })

    below = np.zeros(len(bvals), dtype=np.int64)
    for part in hd.map_batches(
            below_partial,
            batch_format="pandas").iter_batches(batch_format="pandas"):
        np.add.at(below, part["bi"].to_numpy(), part["c"].to_numpy())

    def tied_rows(df: pd.DataFrame) -> pd.DataFrame:
        bv = _resolve_ref(bref)
        return df[np.isin(df["hv"].to_numpy(np.int64), bv)]

    tied = hd.map_batches(
        tied_rows, batch_format="pandas").to_pandas()
    if len(tied) > resolve_limit:
        raise ValueError(
            f"boundary tie groups exceed resolve_limit ({len(tied)} rows); "
            "the hash column is too duplicated for value-boundary sharding")

    pairs = []
    for r in bound_ranks:
        v = vals[r]
        bi = int(np.searchsorted(bvals, v))
        grp = tied[tied["hv"] == v].sort_values(key)
        pairs.append((int(v), grp[key].iloc[r - int(below[bi])]))

    pref = ray.put(pairs)
    return hd.map_batches(task_stage(_ShardAssign, ref=pref, key=key),
                          batch_format="pandas")
