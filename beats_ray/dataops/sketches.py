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
