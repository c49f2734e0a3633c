"""Exact distributed quantiles — randomized cross-check against the
DuckDB quantile_disc rule (1-based index ceil(q*n)), with tiny nbins /
resolve_limit so the histogram refinement recurses deep, plus the
all-tied and huge-range paths and the grouped variant."""

import math

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.quantiles import (
    exact_quantiles,
    grouped_quantiles,
    quantile_rank,
    rank_select,
)

QS = [0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _oracle(vals: np.ndarray, q: float) -> int:
    return int(np.sort(vals)[quantile_rank(q, len(vals))])


def test_rank_rule_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(3)
    for n in [1, 2, 3, 7, 100, 999]:
        vals = rng.integers(-1000, 1000, n).tolist()
        con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS v",
                    [vals])
        for q in QS:
            got = con.execute(
                f"SELECT quantile_disc(v, {q!r}) FROM t").fetchone()[0]
            assert got == _oracle(np.asarray(vals), q), (n, q)


@pytest.mark.parametrize("seed,lo,hi", [
    (1, -50, 50),                      # narrow range, heavy ties
    (2, -2**40, 2**40),                # huge range -> deep refinement
    (3, 7, 8),                         # two values
])
def test_randomized_vs_sorted_oracle(ray_session, seed, lo, hi):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = int(rng.integers(100, 2000))
    vals = rng.integers(lo, hi, n).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
    got = exact_quantiles(ds, "v", QS, nbins=8, resolve_limit=16)
    gd = dict(zip(got["q"].to_pylist(), got["value"].to_pylist()))
    for q in QS:
        assert gd[f"{q:g}"] == _oracle(vals, q), (seed, q)


def test_all_tied_and_single_row(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"v": np.full(500, 42, np.int64)}))
    got = exact_quantiles(ds, "v", [0.5, 1.0], nbins=8, resolve_limit=16)
    assert got["value"].to_pylist() == [42, 42]

    one = rd.from_pandas(pd.DataFrame({"v": np.array([-7], np.int64)}))
    got = exact_quantiles(one, "v", QS)
    assert set(got["value"].to_pylist()) == {-7}


def test_empty_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"v": np.array([], np.int64)}))
    got = exact_quantiles(ds, "v", [0.5])
    assert len(got) == 0
    for sl in (500_000, 0):
        with pytest.raises(ValueError):
            rank_select(ds, "v", [0], small_limit=sl)


def test_rank_select_every_rank_tiny(ray_session):
    """Exhaustive: every rank of a small multiset, forced recursion."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vals = rng.integers(-3, 4, 60).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    s = np.sort(vals)
    for sl in (500_000, 0):  # bounded-collect path AND refinement loop
        got = rank_select(ds, "v", list(range(60)), nbins=4,
                          resolve_limit=5, small_limit=sl)
        assert [got[k] for k in range(60)] == s.tolist(), sl


def test_grouped_quantiles_vs_duckdb(ray_session):
    import duckdb

    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 800
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "dd"], n),
        "v": rng.integers(0, 10_000, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(5)
    got = (grouped_quantiles(ds, "v", "g", [0.5, 0.9, 0.99], buckets=8)
           .to_pandas().sort_values("g").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    ora = con.execute(
        "SELECT g, quantile_disc(v,0.5) AS q0_5, quantile_disc(v,0.9) AS q0_9,"
        " quantile_disc(v,0.99) AS q0_99 FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    assert got[["g", "q0_5", "q0_9", "q0_99"]].astype("int64", errors="ignore") \
        .equals(ora.astype({"q0_5": "int64", "q0_9": "int64", "q0_99": "int64"})) or \
        (got["g"].tolist() == ora["g"].tolist()
         and got["q0_5"].tolist() == ora["q0_5"].tolist()
         and got["q0_9"].tolist() == ora["q0_9"].tolist()
         and got["q0_99"].tolist() == ora["q0_99"].tolist())


def test_quantile_rank_edges():
    assert quantile_rank(0.0, 10) == 0
    assert quantile_rank(1.0, 10) == 9
    assert quantile_rank(0.5, 1) == 0
    # the float-boundary case that distinguishes ceil from round rules
    assert quantile_rank(0.05, 11) == 0
    assert math.ceil(0.1 * 60000) - 1 == quantile_rank(0.1, 60000) == 5999
