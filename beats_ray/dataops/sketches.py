"""Distributed cardinality sketches — HyperLogLog approx-distinct.

At 100 TB a grouped COUNT(DISTINCT key) shuffles every unique key; the
HLL sketch replaces that with a FIXED 256-register summary per group:
each batch folds its keys into (group, register, max-rho) partials, a
tiny ``groupby().max()`` merges them (the shuffle moves at most
groups × 256 rows regardless of corpus size — the sketch union is just
elementwise max), and the estimate is evaluated per group in a final
grouped pass. Nothing key-sized moves anywhere.

Everything is INTEGER-exact so the sketch replays bit-for-bit in SQL:

- hash = md5(salt:key) (the oracle convention used across the dedup
  tier); register = first 2 hex digits (m = 256), rho = leading-zero
  bits of the next 56 bits + 1 (57 for an all-zero tail);
- the harmonic sum is kept SCALED: S = Σ 2^(57 - M_r) with M_r = 0 for
  an empty register — a pure integer (≤ 256·2^57, held as int128 on
  the SQL side);
- alpha_256 ≈ 0.7213/(1 + 1.079/256) is carried as the rational
  71827/100000, so the estimate floor(alpha·m²/Σ2^-M_r) becomes ONE
  integer floor-division: (71827·m²·2^57) // (100000·S).

The estimator is Flajolet et al. 2007 with the SMALL-RANGE correction
(linear counting ``m·ln(m/V)`` when the raw estimate is <= 2.5·m and
empty registers remain — without it the raw formula overshoots badly
below ~2.5·m). The correction is the one float in the module; it is
safe because DuckDB's ``ln``/``FLOOR`` on this stack is bit-identical
to CPython's libm (verified exhaustively over all 256 V values in
tests), and both sides floor to an integer. Typical error is
~1.04/√256 ≈ 6.5 %.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

M_BITS = 8
M = 1 << M_BITS        # 256 registers
V_BITS = 56            # rho field: 14 md5 hex chars
RHO_ZERO = V_BITS + 1  # rho of an all-zero tail
ALPHA_NUM, ALPHA_DEN = 71827, 100_000  # rational alpha_256
# alpha * m^2 * 2^57 — the scaled numerator, precomputed exactly
EST_NUM = ALPHA_NUM * M * M * (1 << RHO_ZERO)


def _rho_of(hexstr: str) -> tuple[int, int]:
    """(register, rho) from an md5 hex digest."""
    reg = int(hexstr[:2], 16)
    v = int(hexstr[2:2 + V_BITS // 4], 16)
    return reg, RHO_ZERO - v.bit_length()


def estimate_from_registers(regs: np.ndarray) -> int:
    """HLL estimate from an int array of per-register max-rho
    (0 = never touched): integer floor-division raw estimate, with the
    linear-counting small-range branch (the module's one float)."""
    s = 0
    for r in regs:
        s += 1 << (RHO_ZERO - int(r))
    n_empty = M - len(regs)
    s += n_empty << RHO_ZERO
    raw = EST_NUM // (ALPHA_DEN * s)
    if 2 * raw <= 5 * M and n_empty > 0:
        return math.floor(M * math.log(M / n_empty))
    return raw


def hll_distinct(ds, key: str, by: list[str], salt: str = "hll",
                 buckets: int = 16):
    """Per-group approximate distinct count of ``key``.  Returns a
    Dataset with columns ``by + [approx_distinct]``.  Per-batch fold →
    ONE co-locating shuffle on the group key (``map_buckets``; all of a
    group's registers land in one bucket, so the max-merge AND the
    estimate run in the same task) — vs two chained sort-based
    groupbys, whose fixed shuffle cost dominated the tiny partials
    (5.7 s for 46k partial rows at sf0.1). The md5 is computed once
    per unique (group, key) pair per batch."""
    from .agg import map_buckets

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[[*by, key]].dropna(subset=[key]).drop_duplicates()
        regs = np.empty(len(sub), np.int64)
        rhos = np.empty(len(sub), np.int64)
        for i, v in enumerate(sub[key].astype(str)):
            h = hashlib.md5(f"{salt}:{v}".encode("utf-8")).hexdigest()
            regs[i], rhos[i] = _rho_of(h)
        out = sub[by].copy()
        out["reg"] = regs
        out["rho"] = rhos
        return out.groupby([*by, "reg"], as_index=False)["rho"].max()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        regs = g.groupby([*by, "reg"], as_index=False)["rho"].max()
        rows = []
        for kv, sub in regs.groupby(by, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            rows.append((*kv,
                         estimate_from_registers(sub["rho"].to_numpy(np.int64))))
        return pd.DataFrame(rows, columns=[*by, "approx_distinct"]).astype(
            {"approx_distinct": "int64"}
        )

    folded = ds.map_batches(fold, batch_format="pandas")
    return map_buckets(folded, by[0], combine, buckets=buckets)


def hll_sql(source_sql: str, key_expr: str, by: list[str],
            salt: str = "hll") -> str:
    """The bit-exact DuckDB replay of :func:`hll_distinct` over
    ``source_sql`` (a relation expression), as a SELECT returning
    ``by + [approx_distinct]``. Kept beside the implementation so the
    two sides can never drift apart silently."""
    bys = ", ".join(by)
    nib = ("CASE substr(tail, length(regexp_extract(tail, '^(0*)', 1)) + 1, 1) "
           "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
           "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
           "ELSE 0 END")
    return f"""
        WITH hx AS (
          SELECT DISTINCT {bys},
                 md5('{salt}:' || CAST({key_expr} AS VARCHAR)) AS h
          FROM {source_sql} WHERE {key_expr} IS NOT NULL
        ), fields AS (
          SELECT {bys}, ('0x' || substr(h, 1, 2))::BIGINT AS reg,
                 substr(h, 3, {V_BITS // 4}) AS tail
          FROM hx
        ), rhos AS (
          SELECT {bys}, reg,
            CASE WHEN tail = '{'0' * (V_BITS // 4)}' THEN {RHO_ZERO}
                 ELSE 4 * length(regexp_extract(tail, '^(0*)', 1))
                      + {nib} + 1 END AS rho
          FROM fields
        ), regs AS (
          SELECT {bys}, reg, MAX(rho) AS mr FROM rhos GROUP BY {bys}, reg
        ), s AS (
          SELECT {bys},
            SUM(CAST(1::BIGINT << ({RHO_ZERO} - mr) AS HUGEINT))
              + CAST({M} - COUNT(*) AS HUGEINT)
                * CAST(1::BIGINT << {RHO_ZERO} AS HUGEINT) AS S,
            {M} - COUNT(*) AS n_empty
          FROM regs GROUP BY {bys}
        ), est AS (
          SELECT {bys}, n_empty,
            CAST({EST_NUM}::HUGEINT // ({ALPHA_DEN}::HUGEINT * S)
                 AS BIGINT) AS raw
          FROM s
        )
        SELECT {bys},
               CASE WHEN 2 * raw <= 5 * {M} AND n_empty > 0
                    THEN CAST(FLOOR({M} * ln({M} / CAST(n_empty AS DOUBLE)))
                              AS BIGINT)
                    ELSE raw END AS approx_distinct
        FROM est"""


# ------------------------------------------------------- Bloom contamination
#
# The contamination screen's exact probe set ships every distinct probe
# shingle hash; at benchmark-suite scale (hundreds of eval sets, 10^8
# probe n-grams) the broadcast payload itself becomes the bottleneck. A
# Bloom filter caps it at m bits regardless of probe size, at the cost
# of a bounded false-positive rate — the standard trade for
# decontamination sweeps. Everything is md5-derived so the SQL oracle
# replays the EXACT bit pattern (same positions, same false positives):
# position_j(shingle) = md5-64("j:shingle") % m, replayed as
# ('0x'||substr(md5(CAST(j AS VARCHAR)||':'||s),1,16))::UBIGINT % m.


def _shingle_strings(text: str, k: int = 3) -> list[str]:
    """Distinct word-k-gram STRINGS (lowercased, ws-token split) — the
    string-identity twin of dedup.word_shingles (which returns hashes);
    same <k-words fallback so the two screens agree on n_ngrams."""
    from .dedup import ws_tokens

    words = ws_tokens(text.lower())
    if not words:
        return []
    if len(words) < k:
        return [" ".join(words)]
    return list({" ".join(words[i:i + k]) for i in range(len(words) - k + 1)})


def bloom_positions(shingle: str, k_hashes: int, m_bits: int) -> list[int]:
    """The k bit positions of a shingle (j is 1-based, matching the SQL
    ``generate_series(1, k)``)."""
    from .dedup import _stable_hash64

    return [_stable_hash64(f"{j}:{shingle}") % m_bits
            for j in range(1, k_hashes + 1)]


def bloom_build(probe_texts: list[str], k_hashes: int = 4,
                m_bits: int = 4096, shingle_k: int = 3) -> np.ndarray:
    """Sorted array of SET bit positions of the probe Bloom filter —
    at most m_bits int64s however large the probe corpus is."""
    bits: set[int] = set()
    for t in probe_texts:
        for s in _shingle_strings(t, shingle_k):
            bits.update(bloom_positions(s, k_hashes, m_bits))
    return np.sort(np.fromiter(bits, dtype=np.int64, count=len(bits)))


class BloomScreen:
    """Per-batch screen (cached task): the sorted bit array resolves
    once per worker; each DISTINCT shingle in the batch is hashed once
    and membership is one vectorized searchsorted."""

    def __init__(self, bits_ref, k_hashes: int, m_bits: int,
                 shingle_k: int, p: int, q: int):
        import ray as _ray

        b = (_ray.get(bits_ref) if isinstance(bits_ref, _ray.ObjectRef)
             else bits_ref)
        self.bits = np.asarray(b, dtype=np.int64)
        self.k_hashes = k_hashes
        self.m_bits = m_bits
        self.shingle_k = shingle_k
        self.p, self.q = p, q

    def _member_all(self, shingles: list[str]) -> np.ndarray:
        """hit[i] = every position of shingles[i] is set."""
        if not shingles:
            return np.zeros(0, dtype=bool)
        pos = np.array(
            [bloom_positions(s, self.k_hashes, self.m_bits)
             for s in shingles], dtype=np.int64,
        )  # (n, k)
        if len(self.bits) == 0:
            return np.zeros(len(shingles), dtype=bool)
        idx = np.clip(np.searchsorted(self.bits, pos), 0,
                      len(self.bits) - 1)
        return (self.bits[idx] == pos).all(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # batch-level shingle dedup: hash each distinct shingle once
        per_doc = [
            _shingle_strings(t, self.shingle_k)
            for t in df["text"].fillna("")
        ]
        uniq = sorted({s for ss in per_doc for s in ss})
        hit = dict(zip(uniq, self._member_all(uniq)))
        n_ngrams = np.array([len(ss) for ss in per_doc], dtype=np.int64)
        n_hits = np.array(
            [sum(hit[s] for s in ss) for ss in per_doc], dtype=np.int64
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_ngrams": n_ngrams,
            "n_bloom_hits": n_hits,
            "contaminated": n_hits * self.q >= np.maximum(n_ngrams, 1) * self.p,
        })


def bloom_contamination_screen(docs, probe_texts: list[str],
                               k_hashes: int = 4, m_bits: int = 4096,
                               shingle_k: int = 3,
                               threshold: float = 0.5):
    """Flag documents whose word-k-gram Bloom-hit ratio against the
    probe corpus exceeds ``threshold`` (integer-exact comparison). The
    m-bit filter ships once via ``ray.put``; false positives are a
    DETERMINISTIC function of the md5 positions, so the SQL oracle
    reproduces them bit-for-bit."""
    import ray as _ray

    from .dedup import threshold_fraction
    from .stagecache import task_stage

    p, q = threshold_fraction(threshold)
    ref = _ray.put(bloom_build(probe_texts, k_hashes, m_bits, shingle_k))
    return docs.map_batches(
        task_stage(BloomScreen, bits_ref=ref, k_hashes=k_hashes,
                   m_bits=m_bits, shingle_k=shingle_k, p=p, q=q),
        batch_format="pandas",
    )


# ------------------------------------------------------------- Count-Min
#
# Heavy-hitter frequency estimation with FIXED memory: a d×w counter
# grid. Each occurrence of a word increments d counters (one per hash
# row); est(word) = min_j grid[j][pos_j(word)] >= true count, with the
# overshoot bounded by (e/w)·total. Distribution shape mirrors HLL:
# per-batch fold to (row, pos, n) partials (md5 once per DISTINCT word
# per batch, counts vectorized), ONE co-locating shuffle sums them, and
# the merged grid is a BOUNDED d×w table (4096 rows at the defaults) —
# legitimately driver-sized however large the corpus. Positions are
# md5-derived: pos_j(word) = md5-64("j:word") % w, the same expression
# the SQL oracle computes.


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_fold_words(docs, text_col: str = "text", depth: int = CMS_DEPTH,
                   width: int = CMS_WIDTH):
    """Dataset[(row, pos, n)] partial counters over the corpus's words
    (ws-token split of lower(text), WITH multiplicity)."""
    from .dedup import _stable_hash64, ws_tokens

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].fillna("").str.lower().map(ws_tokens)
        flat = words.explode().dropna()
        if flat.empty:
            return pd.DataFrame({"row": pd.array([], dtype="int64"),
                                 "pos": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        counts = flat.value_counts()  # distinct word -> multiplicity
        uniq = counts.index.to_numpy()
        n = counts.to_numpy()
        rows, poss, ns = [], [], []
        for j in range(1, depth + 1):
            pos = np.fromiter(
                (_stable_hash64(f"{j}:{w}") % width for w in uniq),
                dtype=np.int64, count=len(uniq))
            rows.append(np.full(len(uniq), j, dtype=np.int64))
            poss.append(pos)
            ns.append(n)
        out = pd.DataFrame({"row": np.concatenate(rows),
                            "pos": np.concatenate(poss),
                            "n": np.concatenate(ns)})
        # collapse per-batch collisions so the shuffle moves <= d*w rows
        return out.groupby(["row", "pos"], as_index=False)["n"].sum()

    return docs.map_batches(fold, batch_format="pandas")


def cms_build(docs, text_col: str = "text", depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH, buckets: int = 8) -> np.ndarray:
    """The merged d×w grid as a dense numpy array — bounded, so the
    driver collect is O(d·w) regardless of corpus size."""
    from .agg import map_buckets

    partials = cms_fold_words(docs, text_col, depth, width)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["row", "pos"], as_index=False)["n"].sum()

    merged = map_buckets(partials, "pos", combine, buckets=buckets).to_pandas()
    grid = np.zeros((depth + 1, width), dtype=np.int64)  # row is 1-based
    if len(merged):
        grid[merged["row"].to_numpy(), merged["pos"].to_numpy()] = (
            merged["n"].to_numpy()
        )
    return grid


def cms_estimate(grid: np.ndarray, words: list[str],
                 width: int = CMS_WIDTH) -> pd.DataFrame:
    """est(word) = min over rows of the word's counter."""
    from .dedup import _stable_hash64

    depth = grid.shape[0] - 1
    ests = []
    for w in words:
        ests.append(min(
            int(grid[j, _stable_hash64(f"{j}:{w}") % width])
            for j in range(1, depth + 1)
        ))
    return pd.DataFrame({"word": words,
                         "est_n": pd.array(ests, dtype="int64")})
