"""HyperLogLog approx-distinct — bit-exact SQL replay identity,
partition-invariance (sketch union = elementwise max), and accuracy
within the published error envelope."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.sketches import (
    M,
    RHO_ZERO,
    _rho_of,
    estimate_from_registers,
    hll_distinct,
    hll_sql,
)


def test_rho_fields():
    # all-zero tail -> rho 57; high bit set -> rho 1
    assert _rho_of("00" + "0" * 30) == (0, RHO_ZERO)
    assert _rho_of("ff" + "f" * 30) == (255, 1)
    assert _rho_of("0a" + "1" + "0" * 29)[1] == 4  # 0001 -> 3 lz + 1


def test_estimate_pure_math():
    # empty sketch -> linear counting with V = m -> ln(1) -> exactly 0
    assert estimate_from_registers(np.array([], np.int64)) == 0
    # saturated sketch (every register rho=1) -> raw path
    full = np.ones(M, np.int64)
    raw = (71827 * M * M * (1 << RHO_ZERO)) // (100_000 * (M << (RHO_ZERO - 1)))
    assert estimate_from_registers(full) == raw


def test_duckdb_ln_bitwise_identical():
    """The linear-counting branch's one float: DuckDB ln/FLOOR must
    match CPython libm exactly for every possible V."""
    import duckdb
    import math

    con = duckdb.connect()
    rows = con.execute(
        "SELECT v, CAST(FLOOR(256 * ln(256 / CAST(v AS DOUBLE))) AS BIGINT)"
        " FROM range(1, 257) r(v)").fetchall()
    for v, got in rows:
        assert got == math.floor(256 * math.log(256 / v)), v


def _reference(values, salt="hll"):
    regs = np.zeros(M, np.int64)
    for v in set(values):
        h = hashlib.md5(f"{salt}:{v}".encode()).hexdigest()
        r, rho = _rho_of(h)
        regs[r] = max(regs[r], rho)
    return estimate_from_registers(regs[regs > 0])


@pytest.mark.parametrize("n,parts", [(100, 1), (5000, 7), (20000, 4)])
def test_partition_invariance_and_accuracy(ray_session, n, parts):
    import ray.data as rd

    rng = np.random.default_rng(n)
    # duplicated keys across partitions: true distinct is n
    keys = [f"conv-{i}" for i in range(n)]
    rows = pd.DataFrame({
        "g": ["x"] * (2 * n),
        "k": keys + list(rng.choice(keys, n)),
    })
    got = (hll_distinct(rd.from_pandas(rows).repartition(parts), "k", ["g"])
           .to_pandas())
    est = int(got["approx_distinct"].iloc[0])
    assert est == _reference(rows["k"]), "partitioning changed the sketch"
    assert abs(est - n) / n < 0.25  # 256 registers: ~6.5% typical error


def test_sql_replay_identity(ray_session):
    import duckdb

    import ray.data as rd

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 3000),
        "k": [f"u{int(v)}" for v in rng.integers(0, 800, 3000)],
    })
    got = (hll_distinct(rd.from_pandas(df).repartition(5), "k", ["g"])
           .to_pandas().sort_values("g").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    ora = con.execute(
        hll_sql("t", "k", ["g"]) + " ORDER BY g").fetchdf()
    assert got["g"].tolist() == ora["g"].tolist()
    assert got["approx_distinct"].tolist() == ora["approx_distinct"].tolist()


def test_nulls_dropped_both_sides(ray_session):
    import duckdb

    import ray.data as rd

    df = pd.DataFrame({"g": ["a"] * 4, "k": ["x", None, "y", None]})
    got = hll_distinct(rd.from_pandas(df), "k", ["g"]).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    ora = con.execute(hll_sql("t", "k", ["g"])).fetchdf()
    assert got["approx_distinct"].tolist() == ora["approx_distinct"].tolist()
    assert int(got["approx_distinct"].iloc[0]) >= 1


def test_bloom_screen_superset_of_exact_membership(ray_session):
    """Every shingle literally present in the probe must hit the Bloom
    filter (no false negatives); hits are >= the exact string-set hits
    on every doc; and a tiny filter (m=64) on a big probe produces
    false positives — demonstrating the trade the op exists to make."""
    import ray.data as rd

    from beats_ray.dataops.sketches import (
        BloomScreen, _shingle_strings, bloom_build,
        bloom_contamination_screen,
    )

    probe = ["alpha beta gamma delta", "one two three four five"]
    docs = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},       # fully in
        {"doc_id": 1, "text": "unrelated words entirely here"},
        {"doc_id": 2, "text": "one two three nine ten eleven"},  # partial
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_items(docs)
    out = bloom_contamination_screen(
        ds, probe, k_hashes=4, m_bits=4096
    ).to_pandas().set_index("doc_id").sort_index()
    # exact string-membership reference
    pset = {s for t in probe for s in _shingle_strings(t)}
    for d in docs:
        exact = sum(s in pset for s in _shingle_strings(d["text"]))
        assert out.loc[d["doc_id"], "n_bloom_hits"] >= exact
    assert bool(out.loc[0, "contaminated"])          # no false negatives
    assert out.loc[3, "n_ngrams"] == 0 and not bool(out.loc[3, "contaminated"])

    # false positives exist at m=64 with a probe that sets most bits
    big_probe = [" ".join(f"p{i} p{i+1} p{i+2}" for i in range(40))]
    bits = bloom_build(big_probe, k_hashes=4, m_bits=64)
    scr = BloomScreen(bits, k_hashes=4, m_bits=64, shingle_k=3, p=1, q=2)
    import pandas as pd

    foreign = pd.DataFrame(
        {"doc_id": [9], "text": ["zz yy xx ww vv uu tt ss rr qq"]}
    )
    res = scr(foreign)
    assert res.loc[0, "n_bloom_hits"] > 0  # FP pressure at 64 bits


def test_cms_overestimates_never_under(ray_session):
    """CMS guarantee: est >= exact for every word; on a narrow grid the
    overshoot is visible; est == exact when the grid is wide enough
    that no probe word collides."""
    import ray.data as rd

    from beats_ray.dataops.sketches import cms_build, cms_estimate

    rows = [{"doc_id": i, "text": "alpha beta " * (i + 1)} for i in range(5)]
    rows.append({"doc_id": 9, "text": "gamma"})
    ds = rd.from_items(rows)
    # exact: alpha=beta=1+2+3+4+5=15, gamma=1
    grid = cms_build(ds, width=1024)
    est = cms_estimate(grid, ["alpha", "beta", "gamma", "absent"],
                       width=1024).set_index("word")["est_n"]
    assert est["alpha"] >= 15 and est["beta"] >= 15 and est["gamma"] >= 1
    assert est["alpha"] == 15  # 3 words in 4x1024: no collision
    assert est["absent"] >= 0
    # narrow grid: collisions inflate, never deflate
    g2 = cms_build(ds, width=2)
    e2 = cms_estimate(g2, ["alpha", "beta", "gamma"], width=2)
    assert (e2["est_n"] >= pd.Series([15, 15, 1])).all()
