"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (per the Ray guide's near-dup pattern):
- exact: content-hash column in ``map_batches`` → ``groupby(hash)`` →
  deterministic survivor (min doc_id) per group. One shuffle keyed on
  the hash (uniform — no skew).
- MinHash-LSH: shingle → minhash signature per batch (stateful actor
  holds the permutation coefficients) → explode to (band, band_hash,
  doc_id) rows → groupby band key → candidate pairs → exact-Jaccard
  verify. The only all-to-all moves ``bands × docs`` tiny rows, never
  documents.
- verify joins the pair list back to documents via broadcast token-set
  lookup: valid while candidates ≪ corpus (banding guarantees this for
  sane thresholds); at 100 TB swap the broadcast for a two-sided hash
  join on doc_id — the pair list itself stays small.

All hashes are content-derived (crc32/md5/blake2) — stable across
processes and runs; never Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

# 31-bit Mersenne prime: with 32-bit shingle hashes, a*x fits uint64
# (2^31 x 2^32 = 2^63) so the modular hash is EXACT — a 61-bit prime
# would overflow int64 and break the universal-hash collision bound
_MERSENNE = (1 << 31) - 1


def _stable_hash(token: str) -> int:
    return zlib.crc32(token.encode("utf-8")) & 0xFFFFFFFF


def word_shingles(text: str, k: int = 3) -> set[int]:
    words = text.lower().split()
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
    """Actor stage: permutation coefficients generated once per actor
    from a fixed seed; per batch emits (doc_id, band, band_hash)."""

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

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            sig = self.signature(word_shingles(text, self.shingle_k))
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(h)
        return pd.DataFrame(
            {"doc_id": out_doc, "band": out_band, "band_hash": out_hash}
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
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pk"] = (df["a"] * 1_000_003 + df["b"]) % 32
        return df

    return (
        pairs.map_batches(pair_key, batch_format="pandas")
        .groupby("_pk")
        .map_groups(
            lambda g: g.drop_duplicates(["a", "b"]).drop(columns=["_pk"]),
            batch_format="pandas",
        )
    )


def verify_jaccard(pairs, docs, shingle_fn=word_shingles, k: int = 3):
    """Exact Jaccard over the candidate pairs. The doc→token-set table is
    broadcast once (ray.put) and probed inside the verify stage."""
    toks = {}
    for batch in docs.select_columns(["doc_id", "text"]).iter_batches(
        batch_format="pandas", batch_size=8192
    ):
        for d, t in zip(batch["doc_id"], batch["text"].fillna("")):
            toks[int(d)] = shingle_fn(t, k)
    ref = ray.put(toks)

    class Verify:
        def __init__(self, ref):
            self.toks = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            js = []
            for a, b in zip(df["a"], df["b"]):
                sa, sb = self.toks.get(int(a), set()), self.toks.get(int(b), set())
                inter = len(sa & sb)
                union = len(sa | sb)
                js.append(inter / union if union else 0.0)
            out = df.copy()
            out["jaccard"] = js
            return out

    return pairs.map_batches(
        Verify, fn_constructor_kwargs={"ref": ref}, batch_format="pandas",
        concurrency=(1, 4),
    )


def minhash_dedup(docs, threshold: float = 0.7, **lsh_kwargs):
    """Near-dup dedup: LSH candidates → Jaccard verify → drop the larger
    id of every duplicate pair. Returns surviving doc_ids."""
    pairs = lsh_candidate_pairs(docs, **lsh_kwargs)
    verified = verify_jaccard(pairs, docs)
    dup = verified.filter(lambda r: r["jaccard"] >= threshold)
    drop = {int(r["b"]) for r in dup.iter_rows()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["doc_id"].isin(drop)][["doc_id"]]

    return docs.map_batches(keep, batch_format="pandas")


# --------------------------------------------------------------- SimHash


class SimHasher:
    """64-bit SimHash per document (token-hash bit voting)."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        v = np.zeros(self.bits, dtype=np.int64)
        for w in text.lower().split():
            h = int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big"
            )
            for i in range(self.bits):
                v[i] += 1 if (h >> i) & 1 else -1
        out = 0
        for i in range(self.bits):
            if v[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        hashes = [self.simhash(t) for t in df["text"].fillna("")]
        # store as signed int64 (two's complement view) for Arrow
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": np.array(hashes, dtype=np.uint64).view(np.int64),
            }
        )


def simhash_dedup(docs, max_hamming: int = 3, chunks: int = 4):
    """SimHash near-dup pairs: band the 64-bit hash into ``chunks``
    16-bit keys (pigeonhole: any pair within hamming ≤ chunks-1 shares a
    chunk) → groupby chunk key → verify hamming distance."""
    sims = docs.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "chunk": [], "key": [], "simhash": []}
        width = 64 // chunks
        mask = (1 << width) - 1
        for d, h in zip(df["doc_id"], df["simhash"]):
            uh = np.int64(h).astype(np.uint64)
            for c in range(chunks):
                rows["doc_id"].append(d)
                rows["chunk"].append(c)
                rows["key"].append(int((int(uh) >> (c * width)) & mask))
                rows["simhash"].append(h)
        return pd.DataFrame(rows)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out: dict = {"a": [], "b": [], "hamming": []}
        recs = sorted(
            set(zip(g["doc_id"].tolist(), g["simhash"].tolist()))
        )
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                ha = int(np.int64(recs[i][1]).astype(np.uint64))
                hb = int(np.int64(recs[j][1]).astype(np.uint64))
                dist = bin(ha ^ hb).count("1")
                if dist <= max_hamming:
                    out["a"].append(recs[i][0])
                    out["b"].append(recs[j][0])
                    out["hamming"].append(dist)
        return pd.DataFrame(out).astype(
            {"a": "int64", "b": "int64", "hamming": "int64"}
        )

    cand = sims.map_batches(explode, batch_format="pandas")
    p = cand.groupby(["chunk", "key"]).map_groups(pairs, batch_format="pandas")
    return p.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def ngram_jaccard_pairs(docs, n: int = 3, threshold: float = 0.5, **lsh_kwargs):
    """Character n-gram Jaccard near-dup pairs, LSH-accelerated:
    candidates from word-shingle MinHash, verification on char n-grams."""
    pairs = lsh_candidate_pairs(docs, **lsh_kwargs)
    verified = verify_jaccard(pairs, docs, shingle_fn=char_ngrams, k=n)
    return verified.filter(lambda r: r["jaccard"] >= threshold)
