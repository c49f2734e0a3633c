"""Budgeted selection (take_token_budget) — randomized cross-check
against the exact pandas prefix-sum oracle, with tiny nbins /
resolve_limit so the histogram refinement recurses deep and the
tied-score key path is exercised."""

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.selection import take_token_budget


def _oracle(df: pd.DataFrame, budget: int) -> set:
    o = df.sort_values(["score", "key"], ascending=[False, True])
    return set(o["key"][o["tok"].cumsum() <= budget])


def _got(ds, budget, **kw) -> set:
    g = take_token_budget(ds, budget, score="score", tokens="tok",
                          key="key", **kw).to_pandas()
    return set(g["key"]) if len(g) else set()


@pytest.mark.parametrize("seed,heavy_ties", [(7, False), (8, True),
                                             (9, True)])
def test_randomized_vs_prefix_sum_oracle(ray_session, seed, heavy_ties):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 1500))
    df = pd.DataFrame({
        "key": rng.permutation(n).astype(np.int64),
        "score": rng.integers(-50, 3 if heavy_ties else 50,
                              n).astype(np.int64),
        "tok": rng.integers(1, 200, n).astype(np.int64),
    })
    total = int(df["tok"].sum())
    for budget in [0, 1, total // 10, total // 2, total - 1, total,
                   total + 10]:
        ds = rd.from_pandas(df).repartition(6)
        for sl in (500_000, 0):  # bounded-collect path AND histogram loop
            got = _got(ds, budget, nbins=16, resolve_limit=40,
                       small_limit=sl)
            assert got == _oracle(df, budget), (budget, sl)


def test_boundary_semantics(ray_session):
    """Cumulative sum INCLUDES the row; ties break by key ASC."""
    import ray.data as rd

    df = pd.DataFrame({"key": [1, 2, 3, 4],
                       "score": [9, 5, 5, 5],
                       "tok": [10, 10, 10, 10]})
    ds = rd.from_pandas(df)
    for sl in (500_000, 0):
        assert _got(ds, 9, small_limit=sl) == set()   # best row exceeds
        assert _got(ds, 10, small_limit=sl) == {1}    # exactly fits
        assert _got(ds, 25, small_limit=sl) == {1, 2}  # ties key ASC
        assert _got(ds, 35, small_limit=sl) == {1, 2, 3}
        assert _got(ds, 10**9, small_limit=sl) == {1, 2, 3, 4}
