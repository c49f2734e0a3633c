"""Driver-contract smoke: entry() runs under an existing Ray session,
every queries() entry is callable, oracle_sql() covers the advertised
subset, and a sample of queries executes at sf0.001."""

import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SAMPLE = [
    "route_counts",
    "dissect_parse",
    "flow_agg",
    "dedup_exact",
    "token_stats",
    "conv_stats",
    "unique_tools",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_returns_stable_frame(entrymod):
    out = entrymod.entry()
    assert isinstance(out, pd.DataFrame)
    assert list(out.columns) == ["sink", "n"]
    assert len(out) == 4 and out["n"].sum() > 0


def test_query_oracle_key_consistency(entrymod):
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 40
    assert len(sqls) >= 30
    for name, fn in qs.items():
        assert callable(fn), name


def test_all_oracle_sql_plans(entrymod):
    """Every oracle_sql() entry must at least PLAN in DuckDB against
    the registered views — a fast whole-surface guard against SQL
    typos (the full value-level sweep is tools/selfcheck.py's job)."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 - collect all failures
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad


@pytest.mark.parametrize("name", SAMPLE)
def test_sample_queries_run_small(entrymod, name):
    import ray.data

    res = entrymod.queries()[name]("/root/testdata/sf0.001")
    if isinstance(res, ray.data.Dataset):
        n = res.count()
    elif isinstance(res, pa.Table):
        n = res.num_rows
    else:
        n = len(res)
    assert n > 0


@pytest.mark.parametrize("name,limits", [
    ("tpch_q5", [("_Q5_BROADCAST_LIMIT", 0)]),
    ("tpch_q18", [("_Q18_BROADCAST_LIMIT", 0)]),
])
def test_adaptive_join_paths_equal(entrymod, monkeypatch, name, limits):
    """The broadcast fast path and the bucket-join fallback must
    return identical frames (forced via the module-level cutoffs)."""
    fast = entrymod.queries()[name]("/root/testdata/sf0.001")
    for attr, v in limits:
        monkeypatch.setattr(entrymod, attr, v)
    slow = entrymod.queries()[name]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True))


@pytest.mark.parametrize("name", ["tpch_q7", "tpch_q8", "tpch_q10"])
def test_tpch_join_shape_paths_equal(entrymod, name):
    """The new join-shape queries (bilateral Q7, market-share Q8,
    returned-item top-k Q10) take broadcast_limit directly: the fused
    broadcast-probe path and the bucket hash-join fallback must return
    identical frames."""
    fn = entrymod.queries()[name]
    fast = fn("/root/testdata/sf0.001")
    slow = fn("/root/testdata/sf0.001", broadcast_limit=0)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True))


def test_tpch_q17_small_quantity_mask(entrymod):
    """Q17's integer cross-product test 5·qty·cnt < sum_qty must agree
    with a pandas replay of qty < 0.2·avg(qty) per part (exact because
    both sides are integers)."""
    import numpy as np
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = entrymod.q_tpch_q17(sf)
    part = pq.read_table(sf + "/part.parquet").to_pandas()
    li = pq.read_table(sf + "/lineitem.parquet").to_pandas()
    fam = part.loc[(part["p_brand"] == "Brand#23")
                   & (part["p_type"] == "MEDIUM"), "p_partkey"]
    sub = li[li["l_partkey"].isin(fam)].copy()
    sub["qty"] = np.round(sub["l_quantity"]).astype("int64")
    st = sub.groupby("l_partkey")["qty"].agg(["sum", "count"])
    s = st["sum"].reindex(sub["l_partkey"]).to_numpy()
    c = st["count"].reindex(sub["l_partkey"]).to_numpy()
    mask = 5 * sub["qty"].to_numpy() * c < s
    want = int(np.round(
        sub.loc[mask, "l_extendedprice"].to_numpy() * 100).astype("int64").sum())
    assert int(out["total_um"].iloc[0]) == want


def test_role_latency_matches_pandas(entrymod):
    """The bucketed role-pair latency aggregate must equal a pandas
    lead() replay over the whole corpus."""
    import numpy as np

    import pyarrow.parquet as pq
    from beats_ray.fixtures import ensure_transcripts

    out = entrymod.q_role_latency("/root/testdata/sf0.001")
    import glob

    files = sorted(glob.glob(ensure_transcripts(0.001) + "/part-*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = df.groupby("conv_id")
    df["role_b"] = g["role"].shift(-1)
    df["dt_us"] = (g["ts"].shift(-1) - df["ts"]).dt.total_seconds() * 1e6
    sub = df[df["role_b"].notna()]
    want = (sub.assign(dt_us=sub["dt_us"].round().astype("int64"))
            .groupby(["role", "role_b"], as_index=False)
            .agg(n_pairs=("dt_us", "size"), sum_dt_us=("dt_us", "sum"))
            .rename(columns={"role": "role_a"})
            .astype({"n_pairs": "int64", "sum_dt_us": "int64"})
            .sort_values(["role_a", "role_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"role_a": object, "role_b": object}),
        want.astype({"role_a": object, "role_b": object}))
    assert (out["sum_dt_us"] >= 0).all()
    assert int(out["n_pairs"].sum()) == len(sub)


def test_role_latency_quantiles_match_pandas(entrymod):
    """Per-pair gap quantiles must equal the quantile_disc rule
    (1-based rank ceil(q·n)) replayed in pandas."""
    import glob
    import math

    import numpy as np
    import pyarrow.parquet as pq
    from beats_ray.fixtures import ensure_transcripts

    out = (entrymod.q_role_latency_quantiles("/root/testdata/sf0.001")
           .to_pandas().sort_values("pair").reset_index(drop=True))
    files = sorted(glob.glob(ensure_transcripts(0.001) + "/part-*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = df.groupby("conv_id")
    df["role_b"] = g["role"].shift(-1)
    df["dt_us"] = ((g["ts"].shift(-1) - df["ts"])
                   .dt.total_seconds() * 1e6).round()
    sub = df[df["role_b"].notna()].copy()
    sub["pair"] = sub["role"] + "->" + sub["role_b"]
    for pair, grp in sub.groupby("pair"):
        v = np.sort(grp["dt_us"].to_numpy("int64"))
        row = out[out["pair"] == pair].iloc[0]
        for q, col in [(0.5, "q0_5"), (0.9, "q0_9"), (0.99, "q0_99")]:
            want = v[max(math.ceil(q * len(v)), 1) - 1]
            assert int(row[col]) == want, (pair, col)


def test_tpch_q19_q16_match_pandas(entrymod):
    """Disjunctive-predicate revenue (Q19) and grouped distinct
    suppliers (Q16) vs whole-corpus pandas replays."""
    import numpy as np
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    part = pq.read_table(sf + "/part.parquet").to_pandas()
    li = pq.read_table(sf + "/lineitem.parquet").to_pandas()
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    qty = np.round(m["l_quantity"]).astype("int64")
    keep = (
        ((m["p_brand"] == "Brand#12") & m["p_size"].between(1, 5)
         & qty.between(1, 11))
        | ((m["p_brand"] == "Brand#23") & m["p_size"].between(1, 10)
           & qty.between(10, 20))
        | ((m["p_brand"] == "Brand#24") & m["p_size"].between(1, 15)
           & qty.between(20, 30)))
    want19 = int((np.round(m.loc[keep, "l_extendedprice"] * 100)
                  .astype("int64")
                  * (100 - np.round(m.loc[keep, "l_discount"] * 100)
                     .astype("int64"))).sum())
    got19 = entrymod.q_tpch_q19(sf)
    assert int(got19["revenue_um"].iloc[0]) == want19

    f = m[(m["p_brand"] != "Brand#5") & (m["p_type"] != "PROMO")
          & m["p_size"].isin([1, 4, 9, 14, 19, 23, 36, 45])]
    want16 = (f.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
              .nunique().reset_index(name="supplier_cnt")
              .astype({"p_size": "int64", "supplier_cnt": "int64"}))
    want16 = want16.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)
    got16 = entrymod.q_tpch_q16(sf)
    pd.testing.assert_frame_equal(
        got16.astype({"p_brand": object, "p_type": object}),
        want16.astype({"p_brand": object, "p_type": object}))


def test_tool_funnel_matches_pandas(entrymod):
    """Funnel counts (first(a) < last(b) within a conversation) vs a
    whole-corpus pandas replay."""
    import glob

    import pyarrow.parquet as pq
    from beats_ray.fixtures import ensure_transcripts

    out = entrymod.q_tool_funnel("/root/testdata/sf0.001")
    files = sorted(glob.glob(ensure_transcripts(0.001) + "/part-*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df = df[df["tool"] != "none"]
    ext = (df.groupby(["conv_id", "tool"])["turn_idx"]
           .agg(["min", "max"]).reset_index())
    pairs = ext.merge(ext, on="conv_id", suffixes=("_a", "_b"))
    hit = pairs[(pairs["tool_a"] != pairs["tool_b"])
                & (pairs["min_a"] < pairs["max_b"])]
    want = (hit.groupby(["tool_a", "tool_b"], as_index=False).size()
            .rename(columns={"size": "n_convs"})
            .astype({"n_convs": "int64"})
            .sort_values(["tool_a", "tool_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"tool_a": object, "tool_b": object}),
        want.astype({"tool_a": object, "tool_b": object}))


def test_hopping_and_first_seen_match_pandas(entrymod):
    import numpy as np
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    es = ev["ts"].to_numpy("datetime64[us]").astype("int64") // 1_000_000

    hop = entrymod.q_hopping_event_counts(sf)
    # every event lands in exactly window/hop = 2 windows
    assert int(hop["n"].sum()) == 2 * len(ev)
    ws1 = (es // 300) * 300
    rep = pd.DataFrame({
        "window_start": np.concatenate([ws1, ws1 - 300]),
        "event_type": np.concatenate([ev["event_type"]] * 2)})
    want = (rep.groupby(["window_start", "event_type"], as_index=False)
            .size().rename(columns={"size": "n"}).astype({"n": "int64"})
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        hop.astype({"event_type": object}),
        want.astype({"event_type": object}))

    curve = entrymod.q_user_first_seen_curve(sf)
    assert int(curve["cum_users"].iloc[-1]) == ev["user_id"].nunique()
    assert (curve["cum_users"].diff().dropna() > 0).all()
    first = pd.DataFrame({"u": ev["user_id"], "day": es // 86_400}
                         ).groupby("u")["day"].min()
    want_days = first.value_counts().sort_index()
    assert list(curve["day"]) == list(want_days.index)
    assert list(curve["new_users"]) == list(want_days.to_numpy())


def test_weighted_sample_replay_and_bias(entrymod, ray_session):
    """A-Res selection must equal a scalar replay, and heavy rows must
    be over-represented relative to their population share."""
    import hashlib
    import math

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from beats_ray.dataops.sampling import weighted_sample_k

    sf = "/root/testdata/sf0.001"
    out = entrymod.q_weighted_sample_docs(sf)
    got = set(out.to_pandas()["doc_id"])
    docs = pq.read_table(sf + "/documents.parquet").to_pandas()
    docs = docs[docs["n_chars"] > 0]

    def sel_key(doc_id, w):
        h = int.from_bytes(hashlib.md5(f"wk:{doc_id}".encode())
                           .digest()[:8], "big")
        u = (np.float64(h) + 1.0) / 18446744073709551616.0
        return -(math.log(u) / np.float64(w))

    keys = [(sel_key(d, w), d) for d, w in
            zip(docs["doc_id"], docs["n_chars"])]
    want = {d for _, d in sorted(keys)[:100]}
    assert got == want

    # bias: two weight classes 1 vs 50 — the heavy class must win far
    # more than its population share
    df = pd.DataFrame({"doc_id": range(2000),
                       "w": [50 if i < 200 else 1 for i in range(2000)]})
    sel = (weighted_sample_k(rd.from_pandas(df), 200, weight_col="w")
           .to_pandas())
    heavy = int((sel["doc_id"] < 200).sum())
    assert heavy > 120  # population share would give 20 of 200


def test_tool_cooccurrence_matches_pandas(entrymod):
    """Intersection/union counts per tool pair vs a pandas set replay;
    inclusion-exclusion invariant holds."""
    import glob

    import pyarrow.parquet as pq
    from beats_ray.fixtures import ensure_transcripts

    out = entrymod.q_tool_cooccurrence("/root/testdata/sf0.001")
    files = sorted(glob.glob(ensure_transcripts(0.001) + "/part-*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df = df[df["tool"] != "none"]
    sets = df.groupby("tool")["conv_id"].agg(set)
    for _, r in out.iterrows():
        a, b = sets[r["tool_a"]], sets[r["tool_b"]]
        assert int(r["n_both"]) == len(a & b)
        assert int(r["n_either"]) == len(a | b)
    # every co-occurring pair is present
    tools = sorted(sets.index)
    pairs = {(x, y) for i, x in enumerate(tools) for y in tools[i + 1:]
             if sets[x] & sets[y]}
    assert pairs == set(zip(out["tool_a"], out["tool_b"]))


def test_conv_dedup_matches_pandas(entrymod):
    """Identity groups must match a pandas concat+md5 replay, and
    survivors must cover every conversation exactly once."""
    import glob
    import hashlib

    import pyarrow.parquet as pq
    from beats_ray.fixtures import ensure_transcripts

    out = entrymod.q_conv_dedup("/root/testdata/sf0.001")
    files = sorted(glob.glob(ensure_transcripts(0.001) + "/part-*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    full = (df.assign(text=df["text"].fillna(""))
            .groupby("conv_id", sort=False)["text"].agg("\n".join))
    hh = full.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    want = (pd.DataFrame({"conv_id": hh.index, "hh": hh.to_numpy()})
            .groupby("hh")
            .agg(conv_id=("conv_id", "min"), n_convs=("conv_id", "size"))
            .reset_index(drop=True)
            .astype({"n_convs": "int64"})
            .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"conv_id": object}),
        want.astype({"conv_id": object}))
    assert int(out["n_convs"].sum()) == df["conv_id"].nunique()


def test_conv_prefix_groups_match_pandas(entrymod):
    """First-turn prefix groups vs a pandas replay; every reported
    group has ≥2 members."""
    import glob
    import hashlib

    import pyarrow.parquet as pq
    from beats_ray.fixtures import ensure_transcripts

    out = entrymod.q_conv_prefix_groups("/root/testdata/sf0.001")
    files = sorted(glob.glob(ensure_transcripts(0.001) + "/part-*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    first = (df.assign(text=df["text"].fillna(""))
             .groupby("conv_id", sort=False).head(1)
             .set_index("conv_id")["text"])
    hh = first.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    g = (pd.DataFrame({"conv_id": hh.index, "hh": hh.to_numpy()})
         .groupby("hh")
         .agg(conv_id=("conv_id", "min"), n_convs=("conv_id", "size")))
    want = (g[g["n_convs"] >= 2].reset_index(drop=True)
            .astype({"n_convs": "int64"})
            .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"conv_id": object}),
        want.astype({"conv_id": object}))
    assert (out["n_convs"] >= 2).all()


def test_events_rollup_levels_consistent(entrymod):
    """Every rollup level must be an exact sum over the finest level,
    and the finest level must match a pandas replay."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = entrymod.q_events_rollup(sf)
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    day = (ev["ts"].to_numpy("datetime64[us]").astype("int64")
           // 1_000_000 // 86_400)
    fine = out[(out["day"] >= 0) & (out["event_type"] != "<all>")]
    want = (pd.DataFrame({"event_type": ev["event_type"], "day": day})
            .groupby(["event_type", "day"], as_index=False).size()
            .rename(columns={"size": "n"}))
    assert len(fine) == len(want)
    m = fine.merge(want, on=["event_type", "day"])
    assert (m["n_x"] == m["n_y"]).all()
    sub = out[(out["day"] == -1) & (out["event_type"] != "<all>")]
    per_type = fine.groupby("event_type")["n"].sum()
    assert dict(zip(sub["event_type"], sub["n"])) == per_type.to_dict()
    grand = out[out["event_type"] == "<all>"]
    assert len(grand) == 1 and int(grand["n"].iloc[0]) == len(ev)


def test_event_burst_pairs_match_bruteforce(entrymod):
    """The searchsorted window count must equal the quadratic brute
    force per user (strict lower bound excludes equal timestamps)."""
    import numpy as np
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = entrymod.q_event_burst_pairs(sf)
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    ts = ev["ts"].to_numpy("datetime64[us]").astype("int64")
    want = {}
    for u, grp in pd.DataFrame({"u": ev["user_id"], "t": ts}).groupby("u"):
        t = np.sort(grp["t"].to_numpy())
        n = sum(int(((t > x) & (t <= x + 60_000_000)).sum()) for x in t)
        if n:
            want[int(u)] = n
    got = dict(zip(out["user_id"].astype(int), out["n_pairs"].astype(int)))
    assert got == want


def test_retention_cohorts_match_pandas(entrymod):
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = entrymod.q_retention_cohorts(sf)
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    day = (ev["ts"].to_numpy("datetime64[us]").astype("int64")
           // 1_000_000 // 86_400)
    ud = pd.DataFrame({"u": ev["user_id"], "day": day}).drop_duplicates()
    first = ud.groupby("u")["day"].transform("min")
    want = (pd.DataFrame({"first_day": first, "age": ud["day"] - first})
            .groupby(["first_day", "age"], as_index=False).size()
            .rename(columns={"size": "n_users"})
            .astype({"first_day": "int64", "age": "int64",
                     "n_users": "int64"})
            .sort_values(["first_day", "age"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, want)
    # age-0 rows cover every user exactly once
    assert (int(out.loc[out["age"] == 0, "n_users"].sum())
            == ud["u"].nunique())


def test_lang_confusion_totals_and_replay(entrymod):
    """Confusion counts must cover every document exactly once and
    match a scalar replay of the LangId kernel."""
    import glob

    import pyarrow.parquet as pq

    out = entrymod.q_lang_confusion("/root/testdata/sf0.001")
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet"
                         ).to_pandas()
    assert int(out["n"].sum()) == len(docs)
    # scalar replay via the engine's own single-batch kernel
    import pyarrow as pa

    from beats_ray.dataops.textstats import LangId

    preds = LangId()(pa.Table.from_pandas(docs[["doc_id", "text"]])
                     ).to_pandas()
    merged = docs.merge(preds, on="doc_id")
    want = (merged.groupby(["lang", "lang_pred"], as_index=False).size()
            .rename(columns={"size": "n"}).astype({"n": "int64"})
            .sort_values(["lang", "lang_pred"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"lang": object, "lang_pred": object}),
        want.astype({"lang": object, "lang_pred": object}))


def test_tpch_q13_outer_join_paths_equal(entrymod):
    """Q13's broadcast-probe path and the bucket left-outer-join
    fallback must return the identical distribution, including the
    c_count=0 bin an inner join would drop."""
    a = entrymod.q_tpch_q13("/root/testdata/sf0.001")
    b = entrymod.q_tpch_q13("/root/testdata/sf0.001", broadcast_limit=0)
    pd.testing.assert_frame_equal(a, b)
    # the distribution covers every customer exactly once
    import pyarrow.parquet as pq

    n_cust = pq.read_metadata(
        "/root/testdata/sf0.001/customer.parquet").num_rows
    assert int(a["custdist"].sum()) == n_cust
