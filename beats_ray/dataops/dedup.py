"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (per the Ray guide's near-dup pattern):
- exact: content-hash column in ``map_batches`` → ``groupby(hash)`` →
  deterministic survivor (min doc_id) per group. One shuffle keyed on
  the hash (uniform — no skew).
- MinHash-LSH: shingle → minhash signature per batch (per-worker
  cached coefficient state, plain tasks) → explode to (band, band_hash,
  doc_id) rows → groupby band key → candidate pairs → exact-Jaccard
  verify. The only all-to-all moves ``bands × docs`` tiny rows, never
  documents.
- verify is FULLY DISTRIBUTED: the candidate id set (small by LSH
  construction) semi-joins the docs, the surviving docs tokenize in
  place, and the token lists join back onto the pair list — via a
  candidate-bounded broadcast below ``broadcast_limit``, or doc_id-
  keyed bucket joins above it — no whole-corpus structure ever
  materializes on the driver.

All hashes are content-derived (md5-based) — stable across processes
and runs (never Python's salted ``hash()``), and REPRODUCIBLE IN SQL:
DuckDB computes the identical 32-bit token hash via
``('0x'||substr(md5(t),1,8))::UBIGINT``, which is what lets the
correctness oracle replay the full MinHash-LSH pipeline.

Thresholds are applied with exact integer cross-multiplication
(``inter * q >= union * p`` for threshold p/q) on BOTH the engine and
the oracle side, so float rounding can never flip a boundary pair.
"""

from __future__ import annotations

import hashlib
import re
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

# Whitespace = RE2's ASCII \s class ([ \t\n\f\r]) EVERYWHERE a DuckDB
# oracle tokenizes with '\s+': Python's unicode-aware str.split()/re \s
# additionally matches \x0b, \xa0, … and would silently diverge from
# the SQL replay on non-ASCII-whitespace corpora.
_WS_RE = re.compile(r"[ \t\n\f\r]+")
# maximal runs of non-whitespace == split + drop-empties in one C pass
_NON_WS_RE = re.compile(r"[^ \t\n\f\r]+")


def ws_tokens(text: str) -> list[str]:
    """Split on ASCII whitespace (RE2 \\s), dropping empty pieces —
    the ONE tokenizer shared by every oracle-paired text op."""
    return _NON_WS_RE.findall(text)

# 31-bit Mersenne prime: with 32-bit shingle hashes, a*x fits uint64
# (2^31 x 2^32 = 2^63) so the modular hash is EXACT — a 61-bit prime
# would overflow int64 and break the universal-hash collision bound
_MERSENNE = (1 << 31) - 1


def _stable_hash(token: str) -> int:
    """32-bit content hash: big-endian first 4 bytes of md5. md5 (not
    crc32) so the DuckDB oracle reproduces it bit-exactly:
    ``('0x'||substr(md5(t),1,8))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:4], "big")


def _stable_hash64(token: str) -> int:
    """64-bit content hash: big-endian first 8 bytes of md5 — for ops
    whose hash universe must outlive ~10^6 sampled items (32-bit
    birthday collisions start at ~10^5). Oracle-reproducible as
    ``('0x'||substr(md5(t),1,16))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def threshold_fraction(threshold: float) -> tuple[int, int]:
    """Exact (p, q) for a decimal threshold: ``jaccard >= threshold``
    becomes ``inter * q >= union * p`` — pure integer math, identical
    on the engine and the SQL oracle."""
    fr = Fraction(str(threshold))
    return fr.numerator, fr.denominator


def word_shingles(text: str, k: int = 3) -> set[int]:
    words = ws_tokens(text.lower())
    if len(words) < k:
        return {_stable_hash(" ".join(words))} if words else set()
    return {_stable_hash(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}


def char_ngrams(text: str, n: int = 3) -> set[int]:
    t = text.lower()
    if len(t) < n:
        return {_stable_hash(t)} if t else set()
    return {_stable_hash(t[i : i + n]) for i in range(len(t) - n + 1)}


# ---------------------------------------------------------------- exact


def exact_dedup(docs, content_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: md5(content) → hash-partitioned groupby → keep the
    min-id row per group (deterministic survivor; models fingerprint →
    ES ``_id`` create-dedup, elasticsearch/client.go:509-516)."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in df[content_col].fillna("")
        ]
        return df

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized min-id survivor per hash over the whole bucket
        return (
            g.sort_values([id_col])
            .drop_duplicates("_h", keep="first")
            .drop(columns=["_h"])
        )

    from .agg import map_buckets

    return map_buckets(
        docs.map_batches(add_hash, batch_format="pandas"), "_h", keep_min
    )


# ----------------------------------------------------------- MinHash-LSH


class MinHasher:
    """Signature stage (cached per worker process): permutation
    coefficients generated once from a fixed seed; per batch emits
    (doc_id, band, band_hash).

    The batch path hashes each DISTINCT shingle once per batch (md5 is
    the kernel's dominant cost and near-dup corpora repeat shingles by
    construction) and evaluates all 64 permutations over the batch's
    unique-shingle matrix in one numpy pass — per-doc minima fall out
    of a single ``minimum.reduceat`` over doc offsets. Output is
    bit-identical to the per-doc path (same md5-32 token hashes, same
    exact (a*x+b) mod p in uint64), which is what keeps the DuckDB
    oracle replay valid."""

    # chunk for the (shingles × num_perm) gather buffer: 8k shingles
    # × 64 perms × 4 B ≈ 2 MB — L2-resident, ~4× faster than a
    # memory-streaming 100 MB transient at the same total work
    _CHUNK_SHINGLES = 8_192

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        rng = np.random.RandomState(42)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        sh = np.fromiter(shingles, dtype=np.uint64)
        # (a*x + b) mod p in uint64 — exact (no overflow), so collision
        # probability tracks Jaccard as the LSH banding math assumes
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def batch_signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix, empty-shingle
        docs = the _MERSENNE sentinel row (same as ``signature(set())``)."""
        k = self.shingle_k
        # batch-wide dedup: each DISTINCT shingle gets one md5 and one
        # insertion-order id, so the hot path is a dict hit, not a hash
        cache: dict[str, int] = {}  # shingle str → id
        uvals: list[int] = []  # id → md5-32 token hash
        flat: list[int] = []  # shingle-id stream, doc-contiguous
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            words = ws_tokens(text.lower())
            if not words:
                continue
            if len(words) < k:
                shs = {" ".join(words)}
            else:
                # zip-of-offsets window: C-level map/join, no per-window
                # list slicing
                shs = set(
                    map(" ".join, zip(*(words[j:] for j in range(k))))
                )
            # no int-level set: ``shs`` is already distinct, and min over
            # a multiset equals min over its set, so rare 32-bit hash
            # collisions cannot change any signature value
            cget = cache.get
            row = []
            for s in shs:
                ix = cget(s)
                if ix is None:
                    ix = len(uvals)
                    cache[s] = ix
                    uvals.append(_stable_hash(s))
                row.append(ix)
            counts[i] = len(row)
            flat.extend(row)

        sig = np.full((len(texts), self.num_perm), _MERSENNE, dtype=np.uint64)
        if not flat:
            return sig
        inv = np.array(flat, dtype=np.intp)
        # (unique × perm) hash matrix once per batch: exact uint64
        # modular math, then uint32 (values < 2^31) to halve the
        # gather/reduce memory traffic
        uniq = np.array(uvals, dtype=np.uint64)
        H = (
            (uniq[:, None] * self.a[None, :] + self.b[None, :])
            % np.uint64(_MERSENNE)
        ).astype(np.uint32)
        nz = np.flatnonzero(counts)
        ends = np.cumsum(counts[nz])
        starts = ends - counts[nz]
        buf = np.empty((self._CHUNK_SHINGLES + 1, self.num_perm), np.uint32)
        lo = 0
        while lo < len(nz):
            hi = lo + 1
            while hi < len(nz) and ends[hi - 1] - starts[lo] < self._CHUNK_SHINGLES:
                hi += 1
            seg = inv[starts[lo] : ends[hi - 1]]
            if len(seg) > buf.shape[0]:  # one giant doc outgrew the buffer
                buf = np.empty((len(seg), self.num_perm), np.uint32)
            g = np.take(H, seg, axis=0, out=buf[: len(seg)])
            sig[nz[lo:hi]] = np.minimum.reduceat(
                g, starts[lo:hi] - starts[lo], axis=0
            )
            lo = hi
        return sig

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.ascontiguousarray(
            self.batch_signatures(df["text"].fillna("").tolist())
        )
        n = len(df)
        bands = self.bands
        blake2b = hashlib.blake2b
        # one flat bytes buffer; 8-byte-per-perm band windows sliced as
        # bytes (≈25% cheaper than per-band ndarray views). Band offsets
        # are computed per doc ROW (row stride = num_perm), so leftover
        # permutations when bands ∤ num_perm are ignored exactly like
        # the per-doc path — never folded into a cross-row window.
        allbytes = sigs.tobytes()
        step = self.rows_per_band * 8
        row_stride = self.num_perm * 8
        out_hash = [
            blake2b(
                allbytes[r + b * step : r + (b + 1) * step], digest_size=8
            ).hexdigest()
            for r in range(0, n * row_stride, row_stride)
            for b in range(bands)
        ]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
                "band": np.tile(np.arange(bands), n),
                "band_hash": out_hash,
            }
        )


_MINHASHER_CACHE: dict = {}


def _minhash_batch(df: pd.DataFrame, num_perm: int, bands: int,
                   shingle_k: int) -> pd.DataFrame:
    # task-based with per-worker-process cache: the coefficient state is
    # tiny, so plain tasks (fusable, no pool spin-up) beat an actor pool
    key = (num_perm, bands, shingle_k)
    if key not in _MINHASHER_CACHE:
        _MINHASHER_CACHE[key] = MinHasher(num_perm, bands, shingle_k)
    return _MINHASHER_CACHE[key](df)


def minhash_coefficients(num_perm: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) permutation coefficients — exposed so the SQL oracle
    can inline the exact same values as a VALUES list."""
    mh = MinHasher(num_perm=num_perm, bands=1)
    return mh.a.copy(), mh.b.copy()


def lsh_candidate_pairs(docs, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
    """(band, band_hash) buckets → unordered candidate pairs (a < b)."""
    bands_ds = docs.map_batches(
        _minhash_batch,
        fn_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        batch_format="pandas",
    )

    # co-locate each (band, band_hash) bucket via ONE hash-bucket shuffle,
    # then emit pairs with a vectorized self-merge per bucket — B python
    # calls, not one per LSH bucket (80k+ buckets even at sf0.1)
    from .agg import map_buckets

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        return out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"}).astype(
            "int64"
        )

    pairs = map_buckets(bands_ds, "band_hash", emit_pairs, buckets=32)
    # same pair can surface from several bands (different buckets) —
    # dedup via a second bucket pass keyed on the pair
    return _dedup_pair_list(pairs)


def _dedup_pair_list(pairs_ds, buckets: int = 32):
    """Dedup (a, b) pair rows via a pair-keyed hash-bucket pass — one
    vectorized drop_duplicates per bucket (B python calls, never one
    per pair). Shared by the MinHash and SimHash candidate paths."""

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pk"] = (df["a"] * 1_000_003 + df["b"]) % buckets
        return df

    from .joins import coalesce_if_fragmented

    return (
        coalesce_if_fragmented(pairs_ds, 4 * buckets)
        .map_batches(pair_key, batch_format="pandas")
        .groupby("_pk")
        .map_groups(
            lambda g: g.drop_duplicates(["a", "b"]).drop(columns=["_pk"]),
            batch_format="pandas",
        )
    )


def _tokenize_stage(shingle_fn, k: int):
    """doc → sorted token hashes serialized as a comma-joined STRING
    column (plain utf8 survives every block format and the null padding
    a bucket join introduces; ndarray/list cells trip Ray's tensor
    extension on cross-block concat)."""

    def tok(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "toks": [
                    ",".join(map(str, sorted(shingle_fn(t, k))))
                    for t in df["text"].fillna("")
                ],
            }
        )

    return tok


def _tok_set(cell) -> set:
    if cell is None or (isinstance(cell, float) and np.isnan(cell)) or cell == "":
        return set()
    return set(int(x) for x in cell.split(","))


def verify_jaccard(pairs, docs, shingle_fn=word_shingles, k: int = 3,
                   buckets: int = 32, broadcast_limit: int = 100_000):
    """Exact Jaccard over the candidate pairs — fully distributed.

    The pair list is small by LSH construction, so its ID SET broadcasts
    cheaply; the docs NEVER materialize on the driver: candidates
    semi-join the corpus and tokenize in place. The token lists then
    join back onto the pairs adaptively:

    - ≤ ``broadcast_limit`` candidate docs → the CANDIDATE-BOUNDED token
      table broadcasts once and both pair sides probe it map-side (no
      shuffle). This is NOT the round-1 anti-pattern: the broadcast is
      O(candidates), never O(corpus).
    - beyond the limit → the candidate-ID set itself never lands on the
      driver either: the corpus is filtered with a DISTRIBUTED
      ``bucket_semi_join`` against the id Dataset, and the token lists
      attach via two bucket-hash-joins keyed on doc_id (one narrow
      shuffle per side) — the robust path when banding degenerates and
      candidates approach the corpus (dup-heavy web crawl).

    Output: (a, b, inter_n, union_n, jaccard) — integer counts first so
    thresholds can be applied in exact integer math.
    """
    from .joins import (
        broadcast_join, bucket_hash_join, bucket_semi_join, semi_join,
    )

    # the pair list and the candidate token table are both SMALL by LSH
    # construction and each feeds TWO consumers — materialize once so
    # the upstream LSH / tokenize pipelines don't re-execute per use
    # (lazy Datasets recompute from the source on every consumption)
    pairs = pairs.materialize()
    ids_ds = pairs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": pd.unique(pd.concat([df["a"], df["b"]]))}
        ),
        batch_format="pandas",
    ).materialize()
    # per-batch-unique UPPER BOUND on the distinct candidate count: if
    # even the overcount fits the broadcast budget, collecting is safe
    # (true count ≤ bound); otherwise NOTHING id-sized reaches the
    # driver and every step below is shuffle-based
    n_ids_upper = ids_ds.count()
    use_broadcast = n_ids_upper <= broadcast_limit

    if use_broadcast:
        ids = ids_ds.to_pandas().drop_duplicates("doc_id")
        docs_c = semi_join(
            docs.select_columns(["doc_id", "text"]), ids, on="doc_id"
        )
    else:
        docs_c = bucket_semi_join(
            docs.select_columns(["doc_id", "text"]), ids_ds, on="doc_id",
            buckets=buckets,
        )
    toks = docs_c.map_batches(
        _tokenize_stage(shingle_fn, k), batch_format="pandas"
    ).materialize()

    # join token lists onto both pair sides (rename → join key matches)
    if use_broadcast:
        toks_df = toks.to_pandas()  # candidate-bounded, NOT corpus-bounded
        j = broadcast_join(
            pairs,
            toks_df.rename(columns={"doc_id": "a", "toks": "toks_a"}),
            on="a",
        )
        j = broadcast_join(
            j,
            toks_df.rename(columns={"doc_id": "b", "toks": "toks_b"}),
            on="b",
        )
    else:
        toks_a = toks.map_batches(
            lambda df: df.rename(columns={"doc_id": "a", "toks": "toks_a"}),
            batch_format="pandas",
        )
        toks_b = toks.map_batches(
            lambda df: df.rename(columns={"doc_id": "b", "toks": "toks_b"}),
            batch_format="pandas",
        )
        j = bucket_hash_join(pairs, toks_a, "a", "a", buckets=buckets)
        j = bucket_hash_join(j, toks_b, "b", "b", buckets=buckets)

    def _explode(ser: pd.Series):
        """Parse a comma-joined sorted-unique token column into ONE flat
        int64 array + per-row lengths + per-token row index — Arrow
        split_pattern + list<string>→list<int64> cast, all C++ (the
        parse was the old per-pair set kernel's dominant cost)."""
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(ser.astype("string"))
        arr = pc.if_else(
            pc.equal(pc.fill_null(arr, ""), ""),
            pa.scalar(None, pa.string()),
            arr,
        )
        lst = pc.cast(pc.split_pattern(arr, ","), pa.list_(pa.int64()))
        lens = (
            pc.fill_null(pc.list_value_length(lst), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        toks = pc.list_flatten(lst).to_numpy()
        return toks, lens, np.repeat(np.arange(len(ser)), lens)

    def jaccard(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ta, la, ra = _explode(df["toks_a"])
        tb, lb, rb = _explode(df["toks_b"])
        # grouped merge: key = row<<32 | token. Tokens are unique AND
        # sorted within each row (set→sorted serialization) and rows
        # ascend, so both key arrays are globally sorted — intersection
        # is one searchsorted probe, no sort. _stable_hash tokens are
        # 32-bit; a custom shingle_fn exceeding uint32 falls back to
        # per-pair set intersection.
        if (
            (len(ta) == 0 or (ta.min() >= 0 and ta.max() < 2**32))
            and (len(tb) == 0 or (tb.min() >= 0 and tb.max() < 2**32))
        ):
            ka = (ra.astype(np.uint64) << np.uint64(32)) | ta.astype(np.uint64)
            kb = (rb.astype(np.uint64) << np.uint64(32)) | tb.astype(np.uint64)
            if len(kb) > 1 and not (kb[1:] >= kb[:-1]).all():
                kb = np.sort(kb)  # defensive: unsorted serialization
            idx = np.searchsorted(kb, ka)
            m = idx < len(kb)
            m[m] = kb[idx[m]] == ka[m]
            inter = np.bincount(ra[m], minlength=n).astype(np.int64)
        else:  # oversized token universe: per-pair set intersect
            inter = np.array(
                [
                    len(_tok_set(x) & _tok_set(y))
                    for x, y in zip(df["toks_a"], df["toks_b"])
                ],
                dtype=np.int64,
            )
        union = la + lb - inter
        out = pd.DataFrame(
            {
                "a": df["a"].astype("int64"),
                "b": df["b"].astype("int64"),
                "inter_n": pd.array(inter, dtype="int64"),
                "union_n": pd.array(union, dtype="int64"),
            }
        )
        out["jaccard"] = np.where(
            out["union_n"] > 0, out["inter_n"] / out["union_n"].clip(lower=1), 0.0
        )
        return out

    return j.map_batches(jaccard, batch_format="pandas")


def minhash_dedup(docs, threshold: float = 0.7,
                  broadcast_limit: int = 100_000, **lsh_kwargs):
    """Near-dup dedup: LSH candidates → distributed Jaccard verify →
    drop the larger id of every duplicate pair (exact integer threshold
    comparison). Returns surviving doc_ids.

    The DROP-ID set is O(#duplicates) — corpus-proportional on a
    dup-heavy crawl (50%+ dup rates are common), so it is applied
    adaptively: a driver-side set broadcast only when a per-batch-unique
    UPPER BOUND on its size fits ``broadcast_limit``; otherwise a fully
    distributed anti ``bucket_semi_join`` where the ids never leave the
    object store."""
    from .joins import bucket_semi_join, semi_join

    p, q = threshold_fraction(threshold)
    pairs = lsh_candidate_pairs(docs, **lsh_kwargs)
    verified = verify_jaccard(pairs, docs,
                              broadcast_limit=broadcast_limit)

    def dup_b(df: pd.DataFrame) -> pd.DataFrame:
        m = df["inter_n"] * q >= df["union_n"] * p
        return pd.DataFrame({"doc_id": df.loc[m, "b"].unique().astype("int64")})

    drop_ds = verified.map_batches(dup_b, batch_format="pandas").materialize()
    ids = docs.select_columns(["doc_id"])
    if drop_ds.count() <= broadcast_limit:
        drop_ids = drop_ds.to_pandas().drop_duplicates("doc_id")
        return semi_join(ids, drop_ids, on="doc_id", anti=True)
    survivors = bucket_semi_join(ids, drop_ds, on="doc_id", anti=True)
    # the union inside the bucket join null-pads ints → float64 in
    # pandas groups; restore the exact id dtype
    return survivors.map_batches(
        lambda df: df.astype({"doc_id": "int64"}), batch_format="pandas"
    )


def ngram_jaccard_pairs(docs, n: int = 3, threshold: float = 0.5, **lsh_kwargs):
    """Character n-gram Jaccard near-dup pairs, LSH-accelerated:
    candidates from word-shingle MinHash, verification on char n-grams.
    Output keeps the exact integer (inter_n, union_n) evidence."""
    p, q = threshold_fraction(threshold)
    pairs = lsh_candidate_pairs(docs, **lsh_kwargs)
    verified = verify_jaccard(pairs, docs, shingle_fn=char_ngrams, k=n)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = df["inter_n"] * q >= df["union_n"] * p
        return df.loc[m, ["a", "b", "inter_n", "union_n", "jaccard"]]

    return verified.map_batches(keep, batch_format="pandas")


# --------------------------------------------------------------- SimHash

# byte-popcount lookup (numpy<2 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array of any shape."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1).astype(np.int64)


class SimHasher:
    """64-bit SimHash per document. Per doc the bit voting is ONE numpy
    pass (unpackbits over the word-hash vector), not a per-word ×64
    Python loop; word→hash results are memoized per actor (zipf vocab →
    high hit rate). Word hash = first 8 md5 bytes (big-endian), which
    the SQL oracle reproduces as ``('0x'||substr(md5(w),1,16))::UBIGINT``."""

    def __init__(self, bits: int = 64):
        self.bits = bits
        self._cache: dict[str, int] = {}

    def _word_hash(self, w: str) -> int:
        h = self._cache.get(w)
        if h is None:
            # bound the per-worker memo: vocab is zipf so hits dominate,
            # but an adversarial corpus must not grow worker RSS
            # forever. Evict only the OLDER half — dict preserves
            # insertion order, and the hot zipf head re-enters quickly,
            # so the high hit rate the memo exists for survives eviction
            if len(self._cache) >= 1_000_000:
                for k in list(self._cache)[: len(self._cache) // 2]:
                    del self._cache[k]
            h = int.from_bytes(
                hashlib.md5(w.encode("utf-8")).digest()[:8], "big"
            )
            self._cache[w] = h
        return h

    def simhash(self, text: str) -> int:
        words = ws_tokens(text.lower())
        if not words:
            return 0
        hs = np.fromiter(
            (self._word_hash(w) for w in words), dtype=np.uint64, count=len(words)
        )
        # bit i of each uint64, LSB-first: little-endian byte view +
        # unpackbits(bitorder="little") → (n_words, 64)
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(words)
        out_bits = (votes > 0).astype(np.uint8)
        return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        hashes = [self.simhash(t) for t in df["text"].fillna("")]
        # store as signed int64 (two's complement view) for Arrow
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": np.array(hashes, dtype=np.uint64).view(np.int64),
            }
        )


def _chunks_for(max_hamming: int) -> int:
    """Smallest power-of-two divisor of 64 STRICTLY greater than
    ``max_hamming`` — the pigeonhole guarantee: any pair with hamming ≤
    chunks-1 shares at least one chunk, so candidate recall is EXACT."""
    for c in (2, 4, 8, 16, 32, 64):
        if c > max_hamming:
            return c
    return 64


def simhash_dedup(docs, max_hamming: int = 3, chunks: int | None = None):
    """SimHash near-dup pairs: band the 64-bit hash into ``chunks``
    equal-width keys (chunks > max_hamming ⇒ pigeonhole-exact recall)
    → groupby chunk key → vectorized hamming verify per bucket."""
    if chunks is None:
        chunks = _chunks_for(max_hamming)
    if chunks <= max_hamming:
        raise ValueError(
            f"chunks={chunks} <= max_hamming={max_hamming}: pigeonhole "
            "guarantee broken (pairs would be silently missed)"
        )
    from .stagecache import task_stage

    sims = docs.map_batches(task_stage(SimHasher), batch_format="pandas")

    width = 64 // chunks
    mask = (1 << width) - 1

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        uh = df["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(df)
        doc = np.repeat(df["doc_id"].to_numpy(), chunks)
        chunk = np.tile(np.arange(chunks, dtype=np.int64), n)
        keys = (
            (uh[:, None] >> (np.arange(chunks, dtype=np.uint64) * width))
            & np.uint64(mask)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc,
                "chunk": chunk,
                "key": keys.reshape(-1),
                "simhash": np.repeat(df["simhash"].to_numpy(), chunks),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per HASH BUCKET of (chunk, key) groups (map_buckets,
        not map_groups-per-distinct-key — that costs an interpreter
        round per LSH bucket). Within the bucket each group is one
        dense popcount matrix + triu argwhere; a wide ``max_hamming``
        forces narrow chunks whose groups are large, and the matrix
        path avoids materializing the n² self-merge rows."""
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}
        )
        recs = g.drop_duplicates(["chunk", "key", "doc_id"])
        out_a, out_b, out_h = [], [], []
        TILE = 2048  # caps per-task transients (xor matrix + popcount
        # byte view + int64 result ≈ 3×TILE²×8 B ≈ 100 MB) so a
        # degenerate hot group can't OOM a full worker pool
        for _, sub in recs.groupby(["chunk", "key"], sort=False):
            n = len(sub)
            if n < 2:
                continue
            ids = sub["doc_id"].to_numpy(dtype=np.int64)
            hs = sub["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            for r0 in range(0, n, TILE):
                hr = hs[r0 : r0 + TILE]
                for c0 in range(r0, n, TILE):
                    hc = hs[c0 : c0 + TILE]
                    dist = _popcount64(hr[:, None] ^ hc[None, :])
                    m = dist <= max_hamming
                    if c0 == r0:
                        m = np.triu(m, k=1)
                    cand = np.argwhere(m)
                    if len(cand) == 0:
                        continue
                    ia = ids[cand[:, 0] + r0]
                    ib = ids[cand[:, 1] + c0]
                    swap = ia > ib
                    out_a.append(np.where(swap, ib, ia))
                    out_b.append(np.where(swap, ia, ib))
                    out_h.append(dist[cand[:, 0], cand[:, 1]])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        ).drop_duplicates(["a", "b"]).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )

    from .agg import map_buckets

    def chunk_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ck"] = df["chunk"] * (mask + 1) + df["key"]
        return df

    cand = sims.map_batches(explode, batch_format="pandas").map_batches(
        chunk_key, batch_format="pandas"
    )
    p = map_buckets(cand, "_ck", lambda g: pairs(g.drop(columns=["_ck"])),
                    buckets=32)

    # a pair can surface from several shared chunks — shared pair-keyed
    # bucket dedup (same helper as the MinHash candidate path)
    return _dedup_pair_list(p)


# ------------------------------------------- exact substring-span dedup


def window_dup_spans(docs, k: int = 10, sample_mod: int = 4,
                     content_col: str = "text", id_col: str = "doc_id",
                     buckets: int = 32):
    """Exact duplicate-substring detection — the suffix-array
    training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better") re-expressed for Ray Data as
    content-defined sampled token-window hashing.

    Every ``k``-token window (stride 1) of the lowercased ws-token
    stream is hashed (md5-64, ``_stable_hash64`` — 64-bit so birthday
    collisions between unrelated windows stay negligible past 10^9
    sampled windows, where a 32-bit hash would fabricate shared spans
    from ~10^5 on); a window is SELECTED when
    ``hash % sample_mod == 0``. Selection is
    content-defined, so two documents sharing a literal span select the
    SAME windows inside it regardless of where the span starts in
    either document — the property a fixed stride lacks (stride-aligned
    windows of a shifted span hash differently). A shared span of
    ``s >= k`` tokens contains ``s - k + 1`` windows of which
    ~``1/sample_mod`` are selected; spans of ``>= k + sample_mod``
    tokens are detected with high probability, and ``sample_mod=1``
    makes detection exact at ``k`` tokens.

    Distribution shape: emit (doc_id, window_hash) for selected windows
    (deduped within doc) → ONE hash-bucket shuffle on the window hash →
    per bucket, keep hashes spanning >1 distinct doc → per-doc shared
    counts via the partial-count combiner. Nothing doc-sized shuffles;
    the emitted stream is ~``n_tokens / sample_mod`` tiny rows.

    Returns (doc_id, n_shared): selected windows that also appear in at
    least one OTHER document, for docs where that count is positive.
    """
    mod = int(sample_mod)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        out_doc: list = []
        out_hash: list = []
        for doc_id, text in zip(df[id_col], df[content_col].fillna("")):
            words = ws_tokens(text.lower())
            if len(words) < k:
                continue
            seen = set()
            for i in range(len(words) - k + 1):
                h = _stable_hash64(" ".join(words[i : i + k]))
                if h % mod == 0:
                    seen.add(h)
            out_doc.extend([doc_id] * len(seen))
            out_hash.extend(seen)
        # id dtype follows the input column (string/int ids both valid);
        # uint64 holds the full 64-bit hash (top-bit values overflow
        # int64)
        return pd.DataFrame(
            {id_col: pd.Series(out_doc, dtype=df[id_col].dtype),
             "h": pd.array(out_hash, dtype="uint64")}
        )

    wins = docs.map_batches(emit, batch_format="pandas")

    def shared_only(g: pd.DataFrame) -> pd.DataFrame:
        # windows present in >1 distinct doc mark duplicated spans
        n_docs = g.groupby("h")[id_col].transform("nunique")
        out = g[n_docs > 1]
        # boolean masking preserves the input dtypes, so empty buckets
        # stay schema-stable for any id type
        return out

    from .agg import grouped_count, map_buckets

    shared = map_buckets(wins, "h", shared_only, buckets=buckets)
    return grouped_count(shared, [id_col], name="n_shared")
