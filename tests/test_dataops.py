"""Dataops correctness: dedup family vs brute force, ANN recall,
windowed aggregation vs pandas, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def docs(ray_session):
    # deterministic doc set with planted near-duplicates
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the trip home",
        "how vexingly quick daft zebras jump over the sleepy fence",
        "sphinx of black quartz judge my vow in the ancient temple",
    ]
    rows = []
    for i in range(40):
        b = base[i % 4]
        if i >= 36:  # planted near-dups of doc i-36 (one word changed)
            words = base[i % 4].split()
            words[-1] = "CHANGED"
            b = " ".join(words)
        rows.append({"doc_id": i, "text": f"{b} variant {i % 4}" if i < 36 else b})
    return rd.from_items(rows)


def brute_jaccard_pairs(df, k=3, threshold=0.5):
    from beats_ray.dataops.dedup import word_shingles

    toks = {r.doc_id: word_shingles(r.text, k) for r in df.itertuples()}
    out = set()
    ids = sorted(toks)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = toks[ids[i]], toks[ids[j]]
            u = len(a | b)
            if u and len(a & b) / u >= threshold:
                out.add((ids[i], ids[j]))
    return out


def test_minhash_lsh_finds_planted_dups(docs):
    from beats_ray.dataops.dedup import lsh_candidate_pairs, verify_jaccard

    df = docs.to_pandas()
    want = brute_jaccard_pairs(df, threshold=0.7)
    assert want, "fixture must contain near-dup pairs"
    pairs = lsh_candidate_pairs(docs, num_perm=64, bands=32)
    verified = verify_jaccard(pairs, docs).to_pandas()
    got = set(
        map(tuple, verified[verified["jaccard"] >= 0.7][["a", "b"]].values)
    )
    # LSH with 32 bands @ 0.7 threshold: recall must be total on this set
    assert want <= got


def test_exact_dedup_survivor(ray_session):
    from beats_ray.dataops.dedup import exact_dedup

    rows = [
        {"doc_id": 5, "text": "same"},
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "other"},
    ]
    out = exact_dedup(rd.from_items(rows)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]  # min-id survivor


def test_simhash_close_texts_low_hamming(docs):
    from beats_ray.dataops.dedup import SimHasher

    sh = SimHasher()
    a = sh.simhash("the quick brown fox jumps over the lazy dog")
    b = sh.simhash("the quick brown fox jumps over the lazy cat")
    c = sh.simhash("completely unrelated text about databases and queries")
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def test_ann_brute_equals_numpy(ray_session):
    from beats_ray.dataops.ann import brute_topk

    rng = np.random.RandomState(0)
    vecs = rng.randn(200, 16).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    )
    q = vecs[:2].astype(np.float64)
    got = brute_topk(ds, q, k=5)
    # numpy reference
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = m @ qn.T
    for qi in range(2):
        want = set(np.argsort(-sims[:, qi])[:5].tolist())
        have = set(got[got["query_id"] == qi]["vec_id"].tolist())
        assert have == want


def test_ivf_recall_reasonable(ray_session):
    from beats_ray.dataops.ann import brute_topk, ivf_topk

    rng = np.random.RandomState(1)
    vecs = rng.randn(300, 16).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[:4].astype(np.float64)
    exact = brute_topk(ds, q, k=10)
    approx = ivf_topk(ds, q, k=10, n_clusters=8, n_probe=4)
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # probing half the buckets


def test_topk_tiebreak_exact_under_mass_ties():
    """ADVICE regression: with more tied rows at the boundary sim than
    the argpartition slack (4k+32), the tie-break must still pick the
    globally smallest vec_ids — the candidate set expands to every row
    at or above the boundary."""
    from beats_ray.dataops.ann import _topk_tiebreak

    rng = np.random.RandomState(3)
    s = np.ones(500)                      # 500-way tie >> 4*5+32
    ids = rng.permutation(500).astype(np.int64)
    idx = _topk_tiebreak(s, ids, k=5)
    assert sorted(ids[idx].tolist()) == [0, 1, 2, 3, 4]

    # mixed: 300 tied at the boundary behind 2 strictly-better rows
    s2 = np.full(302, 0.5)
    s2[:2] = 0.9
    ids2 = np.concatenate([[900, 901], rng.permutation(300) + 10]).astype(
        np.int64
    )
    idx2 = _topk_tiebreak(s2, ids2, k=5)
    assert ids2[idx2].tolist() == [900, 901, 10, 11, 12]


def test_ivf_fit_sample_is_layout_unbiased(ray_session):
    """A cluster-ordered corpus (layout correlates with embedding
    space) must yield a fit sample drawn from across the whole layout,
    not the first blocks — and the dup-pair result stays exact."""
    from beats_ray.dataops.ann import _fit_sample_df

    rng = np.random.RandomState(7)
    n = 6000
    vecs = rng.randn(n, 8)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)],
        override_num_blocks=16,
    )
    sample, _ = _fit_sample_df(ds, 512)
    assert 128 <= len(sample) <= 1024  # ~512 expected, hash-binomial
    ids = sample["vec_id"].to_numpy()
    # spread across layout: first and last thirds both represented
    assert (ids < n // 3).sum() > 0 and (ids > 2 * n // 3).sum() > 0
    # roughly uniform: mean vec_id near the corpus midpoint
    assert abs(ids.mean() - n / 2) < n / 8


def test_flow_agg_matches_pandas(ray_session):
    from beats_ray.dataops.flows import flow_agg

    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(np.arange(100) * 3, unit="s")
    df = pd.DataFrame(
        {
            "user_id": np.arange(100) % 5,
            "event_type": np.where(np.arange(100) % 2 == 0, "click", "view"),
            "ts": ts,
            "value": np.arange(100) * 0.5,
        }
    )
    got = flow_agg(rd.from_pandas(df), window_s=10).to_pandas()
    sec = df["ts"].astype("datetime64[s]").astype("int64")
    want = (
        df.assign(window_s=(sec // 10) * 10,
                  value_cents=np.round(df["value"] * 100).astype("int64"))
        .groupby(["user_id", "event_type", "window_s"], as_index=False)
        .agg(n=("value", "size"), value_cents=("value_cents", "sum"))
    )
    g = got.sort_values(["user_id", "event_type", "window_s"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "event_type", "window_s"]).reset_index(drop=True)
    assert (g["n"].to_numpy() == w["n"].to_numpy()).all()
    assert (g["value_cents"].to_numpy() == w["value_cents"].to_numpy()).all()


def test_multimodal_plumbing(ray_session):
    from beats_ray.dataops.multimodal import (
        ImageFeatures,
        image_features,
        sample_frames,
        synthesize_media_table,
    )

    media = rd.from_arrow(synthesize_media_table(30))
    feats = image_features(media, fake=True).to_pandas()
    assert len(feats) == 10  # 30 rows, 1/3 images
    assert feats["feat_mean"].between(0, 255).all()
    frames = sample_frames(media).to_pandas()
    assert (frames.groupby("media_id").size() >= 2).all()
    # the stub seam: real decode raises cleanly without PIL
    with pytest.raises(NotImplementedError):
        ImageFeatures(fake=False).decode(b"xx", 4, 4)


def test_skew_aware_bucketing_isolates_hot_keys(ray_session):
    """North-rule skew handling: a hot key gets a dedicated bucket, so
    the heaviest shared bucket stays near the uniform share."""
    import ray.data as rd

    from beats_ray.dataops.agg import hash_bucket, map_buckets

    rows = [{"k": f"k{i % 50}", "v": i} for i in range(5000)]
    rows += [{"k": "HOT", "v": i} for i in range(5000)]  # 50% in one key
    ds = rd.from_items(rows)

    seen: list[tuple] = []

    def record(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"keys": [g["k"].nunique()], "rows": [len(g)],
             "has_hot": [(g["k"] == "HOT").any()]}
        )

    out = map_buckets(ds, "k", record, buckets=8, skew_aware=True, hot_factor=2.0).to_pandas()
    hot_buckets = out[out["has_hot"]]
    assert len(hot_buckets) == 1
    assert hot_buckets.iloc[0]["keys"] == 1  # dedicated bucket: HOT alone
    assert hot_buckets.iloc[0]["rows"] == 5000
    # per-key co-location invariant: 50 normal keys + 1 hot across buckets
    assert out["keys"].sum() == 51


def test_mask_pii(ray_session):
    from beats_ray.dataops.pii import mask_pii

    ds = rd.from_items(
        [{"text": "mail a@b.co from 10.1.2.3 call +1 (555) 123-4567 ssn 123-45-6789"}]
    )
    out = mask_pii(ds).to_pandas()["text"][0]
    assert "<EMAIL>" in out and "<IP>" in out and "<PHONE>" in out
    assert "a@b.co" not in out and "10.1.2.3" not in out


def test_top_words(ray_session):
    from beats_ray.dataops.pii import top_words

    ds = rd.from_items(
        [{"doc_id": 0, "text": "a b b c c c"}, {"doc_id": 1, "text": "c a"}]
    )
    out = top_words(ds, k=2)
    assert out["word"].tolist() == ["c", "a"]
    assert out["n"].tolist() == [4, 2]


def test_asof_join_matches_pandas(ray_session):
    from beats_ray.dataops.joins import asof_join

    l = pd.DataFrame({"uid": [1, 1, 2, 3], "ts": pd.to_datetime([10, 20, 15, 7], unit="s"), "x": list("abcd")})
    r = pd.DataFrame({"uid": [1, 1, 2], "ts": pd.to_datetime([5, 18, 99], unit="s"), "y": list("XYZ")})
    got = (
        asof_join(rd.from_pandas(l), rd.from_pandas(r), key="uid")
        .to_pandas()
        .sort_values(["uid", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(l.sort_values("ts"), r.sort_values("ts"), on="ts", by="uid").sort_values(["uid", "ts"]).reset_index(drop=True)
    assert got["y"].fillna("-").tolist() == want["y"].fillna("-").tolist()


def test_normalize_and_repetition(ray_session):
    from beats_ray.dataops.textnorm import normalize_text, repetition_score

    ds = rd.from_items([{"doc_id": 0, "text": "  The  THE the\tcat  "},
                        {"doc_id": 1, "text": ""}])
    n = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert n["norm_text"].tolist() == ["the the the cat", ""]
    r = repetition_score(ds).to_pandas().sort_values("doc_id")
    assert r["n_words"].tolist() == [4, 0]
    assert r["top_word_n"].tolist() == [3, 0]


def test_contamination_screen(ray_session):
    from beats_ray.dataops.textnorm import contamination_screen

    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 1, "text": "totally different words here now ok"},
        ]
    )
    out = (
        contamination_screen(docs, ["alpha beta gamma delta epsilon zeta"])
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [True, False]
    assert out["n_probe_hits"].tolist()[0] == out["n_ngrams"].tolist()[0]


def test_function_registry_processor():
    import pyarrow as pa
    import pyarrow.compute as pc

    from beats_ray.functions import batch_function
    from beats_ray.processors import build_processor

    @batch_function("upper_text")
    def upper_text(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("text"), "text", pc.utf8_upper(t["text"])
        )

    out = build_processor({"function": {"name": "upper_text"}})(
        pa.table({"text": ["ab"]})
    )
    assert out["text"].to_pylist() == ["AB"]


def test_security_pipeline_preset(ray_session, sf0001_dir):
    import glob

    from beats_ray.pipeline import build_dataset
    from beats_ray.pipelines.flagship import SECURITY_CONFIG

    files = sorted(glob.glob(sf0001_dir + "/part-*.parquet"))[:1]
    out = build_dataset(rd.read_parquet(files), config=SECURITY_CONFIG,
                        num_parts=8, enrich=False).to_pandas()
    assert set(out["sink"].unique()) <= {"high_sev", "failures", "audit"}
    assert (out["pipeline"] == "security").all()


def test_verify_jaccard_paths_agree(docs):
    """The candidate-bounded broadcast path and the bucket-hash-join
    path of verify_jaccard must produce identical (a, b, inter, union)
    evidence — the bucket path is the 100TB fallback when candidates
    approach the corpus."""
    from beats_ray.dataops.dedup import lsh_candidate_pairs, verify_jaccard

    pairs = lsh_candidate_pairs(docs, num_perm=64, bands=32).materialize()
    cols = ["a", "b", "inter_n", "union_n"]
    bc = (
        verify_jaccard(pairs, docs)
        .to_pandas()[cols]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    bj = (
        verify_jaccard(pairs, docs, broadcast_limit=0)
        .to_pandas()[cols]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, bj)


def test_simhash_pigeonhole_exact(docs):
    """simhash_dedup with auto chunking must find EVERY pair within
    max_hamming (verified against all-pairs brute force)."""
    from beats_ray.dataops.dedup import SimHasher, simhash_dedup

    df = docs.to_pandas()
    sh = SimHasher()
    hs = {int(r.doc_id): sh.simhash(r.text) for r in df.itertuples()}
    ids = sorted(hs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(hs[ids[i]] ^ hs[ids[j]]).count("1") <= 6:
                want.add((ids[i], ids[j]))
    got_df = simhash_dedup(docs, max_hamming=6).to_pandas()
    got = set(map(tuple, got_df[["a", "b"]].values))
    assert got == want
    assert want, "fixture must contain close pairs"


def test_simhash_chunks_guard():
    from beats_ray.dataops.dedup import _chunks_for

    assert _chunks_for(3) == 4
    assert _chunks_for(10) == 16
    assert _chunks_for(40) == 64


def test_embed_dup_pairs_exact_vs_allpairs(ray_session):
    """The centroid-bound bucket-pair pruning must be EXACT: every pair
    with cosine >= threshold is found, across buckets too (brute-force
    all-pairs numpy as ground truth)."""
    from beats_ray.dataops.ann import embedding_cosine_dup_pairs

    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 16)
    vecs[290:] = vecs[:10] + 0.05 * rng.randn(10, 16)  # planted near-dups
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    got_df = embedding_cosine_dup_pairs(
        ds, threshold=0.8, n_clusters=8
    ).to_pandas()
    got = set(map(tuple, got_df[["a", "b"]].values))

    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    want = set(map(tuple, np.argwhere(np.triu(sims >= 0.8, k=1))))
    assert want, "fixture must contain qualifying pairs"
    assert got == want


def test_token_bucket_refill_semantics(ray_session):
    """Reference token-bucket math (ratelimit/rate_limit.go): burst
    capacity, 1-token cost, fractional refill accumulates — verified
    against a hand-computed replay (limit 1/s, burst 2)."""
    from beats_ray.dataops.flows import token_bucket_limit

    base = pd.Timestamp("2024-01-01 00:00:00")
    ts_off_ms = [0, 500, 1000, 1200, 10_000]
    #  t=0.0s: bucket full (2) -> allow (1 left)
    #  t=0.5s: 1+0.5=1.5      -> allow (0.5)
    #  t=1.0s: 0.5+0.5=1.0    -> allow (0.0)
    #  t=1.2s: 0.0+0.2=0.2    -> DENY
    #  t=10s:  0.2+8.8 -> cap -> allow
    want_allowed = [True, True, True, False, True]
    rows = [
        {"event_id": i, "user_id": 7,
         "ts": base + pd.Timedelta(milliseconds=ms)}
        for i, ms in enumerate(ts_off_ms)
    ]
    kept = token_bucket_limit(
        rd.from_items(rows), key="user_id", limit_n=1, per_s=1, burst=2
    ).to_pandas()
    got = sorted(kept["event_id"].tolist())
    assert got == [i for i, a in enumerate(want_allowed) if a]


def test_token_bucket_dataset_state_matches_broadcast(ray_session):
    """The distributed (Dataset) initial_state path must admit exactly
    the same rows as the driver-broadcast (DataFrame) path — the seeds
    bucket-join onto the replay, one co-locating shuffle, no dict on
    the driver."""
    from beats_ray.dataops.flows import token_bucket_limit

    base = pd.Timestamp("2024-01-01 01:00:00")
    rows = [
        {"event_id": i, "user_id": f"u{i % 5}",
         "ts": base + pd.Timedelta(seconds=i * 3)}
        for i in range(40)
    ]
    # carried state: u0 mid-refill (empty bucket as of 00:59:58),
    # u1 half-full, u9 quiet (no events this segment)
    t0 = int((base - pd.Timedelta(seconds=2)).timestamp() * 1e6)
    state = pd.DataFrame(
        {"user_id": ["u0", "u1", "u9"],
         "tok": [0, 100_000_000, 0],
         "last_us": [t0, t0, t0]}
    )
    kw = dict(key="user_id", limit_n=1, per_s=200, burst=1,
              order_col="event_id")
    got_bcast = token_bucket_limit(
        rd.from_items(rows), initial_state=state, **kw
    ).to_pandas()
    got_ds = token_bucket_limit(
        rd.from_items(rows), initial_state=rd.from_pandas(state), **kw
    ).to_pandas()
    assert sorted(got_bcast["event_id"]) == sorted(got_ds["event_id"])
    assert len(got_ds) < len(rows)  # the limiter actually denied rows

    # emit_state with a horizon: quiet key u9 (still mid-refill at the
    # horizon) carries forward; refilled keys are GC'd
    horizon = int((base + pd.Timedelta(seconds=130)).timestamp() * 1e6)
    st = token_bucket_limit(
        rd.from_items(rows), initial_state=rd.from_pandas(state),
        emit_state=True, gc_horizon_us=horizon, **kw,
    ).to_pandas()
    assert "u9" in set(st["user_id"])  # quiet key carried
    # every emitted key is genuinely in-flight at the horizon
    cap = 1 * 200 * 1_000_000
    assert ((st["tok"] + 1 * (horizon - st["last_us"])) < cap).all()


def test_cache_put_get_delete_ttl(ray_session):
    """cache processor semantics (cache/cache_test.go shape): put->get
    hit, delete->get miss, re-put->get hit, expiry->miss."""
    from beats_ray.dataops.kvcache import cache_put_get

    base = pd.Timestamp("2024-01-01 00:00:00")
    sec = lambda s: base + pd.Timedelta(seconds=s)
    ops = [
        {"k": 1, "ts": sec(0), "op": "put", "v": 10},
        {"k": 1, "ts": sec(10), "op": "get", "v": -1},     # hit 10
        {"k": 1, "ts": sec(20), "op": "delete", "v": -1},
        {"k": 1, "ts": sec(30), "op": "get", "v": -1},     # miss (deleted)
        {"k": 1, "ts": sec(40), "op": "put", "v": 20},
        {"k": 1, "ts": sec(45), "op": "get", "v": -1},     # hit 20
        {"k": 1, "ts": sec(40 + 101), "op": "get", "v": -1},  # expired
        {"k": 2, "ts": sec(5), "op": "get", "v": -1},      # never put
    ]
    out = (
        cache_put_get(rd.from_items(ops), ttl_s=100)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert out["cached"].tolist() == [10, -1, 20, -1, -1]
    assert out["hit"].tolist() == [True, False, True, False, False]


def test_hash_sample_deterministic_fraction(docs):
    from beats_ray.dataops.sampling import hash_sample

    a = sorted(hash_sample(docs, 0.5, key="doc_id").to_pandas()["doc_id"])
    b = sorted(hash_sample(docs, 0.5, key="doc_id").to_pandas()["doc_id"])
    assert a == b                      # reproducible
    assert 0 < len(a) < 40             # an actual fraction
    sub = sorted(hash_sample(docs, 0.25, key="doc_id").to_pandas()["doc_id"])
    assert set(sub) <= set(a)          # nested thresholds ⇒ nested samples


def test_sample_exact_k(docs):
    import hashlib

    from beats_ray.dataops.sampling import sample_exact_k

    got = sorted(sample_exact_k(docs, 10, key="doc_id")
                 .to_pandas()["doc_id"])
    # pandas oracle: smallest-10 by the same 64-bit md5 hash
    full = docs.to_pandas()
    h = full["doc_id"].astype(str).map(
        lambda v: int.from_bytes(
            hashlib.md5(f"xk:{v}".encode()).digest()[:8], "big"))
    want = sorted(full.assign(_h=h).sort_values(["_h", "doc_id"])
                  .head(10)["doc_id"])
    assert got == want
    # k > n returns everything, once
    assert len(sample_exact_k(docs, 10_000, key="doc_id").to_pandas()) \
        == len(full)
    # partition-invariant
    again = sorted(sample_exact_k(docs.repartition(7), 10, key="doc_id")
                   .to_pandas()["doc_id"])
    assert again == got


def test_hash_split_partition(docs):
    from beats_ray.dataops.sampling import hash_split

    out = hash_split(docs, {"train": 0.5, "val": 0.25, "test": 0.25}).to_pandas()
    assert len(out) == 40
    assert set(out["split"]) <= {"train", "val", "test"}
    assert out["split"].notna().all()  # exhaustive + disjoint by construction
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.3})


def test_pack_sequences_budget_invariants(docs):
    from beats_ray.dataops.sampling import pack_sequences

    out = pack_sequences(docs, budget=30, buckets=4).to_pandas()
    assert len(out) == 40
    per_bin = out.groupby(["bucket", "bin_id"]).agg(
        total=("n_tokens", "sum"), n=("n_tokens", "size"),
        mx=("n_tokens", "max"),
    )
    # a bin is within budget unless it holds a single oversized doc
    over = per_bin[per_bin["total"] > 30]
    assert (over["n"] == 1).all()
    # bin ids are contiguous from 0 within each bucket
    for _, g in out.groupby("bucket"):
        ids = sorted(g["bin_id"].unique())
        assert ids == list(range(len(ids)))


def test_hash_sample_large_denominator_fraction(docs):
    """Fractions whose decimal repr has a huge denominator (e.g. 1/3's
    float) must not silently wrap the vectorized comparison — the
    cutoff is precomputed in big-int math (review regression)."""
    from beats_ray.dataops.sampling import hash_sample

    out = hash_sample(docs, 1 / 3, key="doc_id").to_pandas()
    # sane fraction of 40 docs, not garbage membership
    assert 4 <= len(out) <= 28
    # and monotone vs a strictly larger fraction
    bigger = hash_sample(docs, 0.75, key="doc_id").to_pandas()
    assert set(out["doc_id"]) <= set(bigger["doc_id"])


def test_map_buckets_skew_aware_empty(ray_session):
    """skew_aware pre-count on an EMPTY dataset must not crash
    (Dataset.aggregate returns None there — review regression)."""
    import pyarrow as pa

    from beats_ray.dataops.agg import map_buckets

    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    out = map_buckets(
        empty, "k", lambda g: g, buckets=4, skew_aware=True
    ).to_pandas()
    assert len(out) == 0


def test_dead_letter_reason_precedence(ray_session):
    """A row that is BOTH missing a required field and oversized gets
    the missing-field reason (documented precedence — review fix)."""
    from beats_ray.sinks import dead_letter_route

    rows = [{"sink": "m", "text": "y" * 500, "tool": None}]
    out = dead_letter_route(
        rd.from_items(rows), max_text_bytes=100, required=("tool",)
    ).to_pandas()
    assert out.loc[0, "dead_letter.reason"] == "missing_field:tool"


def test_cache_string_values(ray_session):
    """value_kind='str' caches arbitrary string values (the reference's
    general case); misses resolve to the stringified sentinel."""
    from beats_ray.dataops.kvcache import cache_put_get

    base = pd.Timestamp("2024-01-01")
    sec = lambda s: base + pd.Timedelta(seconds=s)
    ops = [
        {"k": 1, "ts": sec(0), "op": "put", "v": "alpha"},
        {"k": 1, "ts": sec(5), "op": "get", "v": ""},
        {"k": 2, "ts": sec(5), "op": "get", "v": ""},
    ]
    out = (
        cache_put_get(rd.from_items(ops), value_kind="str", miss_value=-1)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["cached"].tolist() == ["alpha", "-1"]
    assert out["hit"].tolist() == [True, False]


def test_c4_line_filter_rules(ray_session):
    """C4 rules: terminal punctuation + min words per line; blocklist
    empties the doc but keeps its row (tag-and-keep)."""
    from beats_ray.dataops.quality import c4_line_filter

    rows = [
        {"doc_id": 0,
         "text": "This line has enough words and punctuation.\nshort.\n"
                 "no terminal punctuation here at all\n"
                 'a quoted ending with five words here "'},
        {"doc_id": 1, "text": "Uses Lorem Ipsum filler text everywhere."},
        {"doc_id": 2, "text": "json blob { inside } this doc."},
    ]
    out = (
        c4_line_filter(rd.from_items(rows), min_words=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "n_lines"] == 4
    assert out.loc[0, "n_kept"] == 2   # first + quoted line
    assert not out.loc[0, "blocked"]
    assert "enough words" in out.loc[0, "clean_text"]
    assert out.loc[1, "blocked"] and out.loc[1, "clean_text"] == ""
    assert out.loc[2, "blocked"]


def test_bigram_coverage_fit_then_score(ray_session):
    """Model = top-k corpus bigrams; scores count model hits per doc."""
    from beats_ray.dataops.quality import bigram_coverage, fit_bigram_model

    rows = [
        {"doc_id": 0, "text": "a b a b a b"},     # 'a b' x3, 'b a' x2
        {"doc_id": 1, "text": "a b c d"},
        {"doc_id": 2, "text": "x"},               # no bigrams
    ]
    ds = rd.from_items(rows)
    model = fit_bigram_model(ds, model_k=2)
    assert model["bigram"].tolist() == ["a b", "b a"]  # count desc, tie asc
    out = (
        bigram_coverage(ds, model_k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_bigrams"].tolist() == [5, 3, 0]
    # doc 1's bigrams are 'a b', 'b c', 'c d' — only 'a b' is in-model
    assert out["n_in_model"].tolist() == [5, 1, 0]


def test_flow_agg_string_keys_and_nulls(ray_session):
    """flow_agg accepts non-numeric keys and keeps null-keyed groups
    (review regressions from the bucketed rewrite)."""
    from beats_ray.dataops.flows import flow_agg

    base = pd.Timestamp("2024-01-01")
    rows = [
        {"user_id": "alice", "event_type": "click",
         "ts": base, "value": 1.0},
        {"user_id": "alice", "event_type": "click",
         "ts": base + pd.Timedelta(seconds=1), "value": 2.0},
        {"user_id": None, "event_type": "view",
         "ts": base, "value": 3.0},
    ]
    out = flow_agg(rd.from_items(rows)).to_pandas()
    assert len(out) == 2
    a = out[out["user_id"] == "alice"].iloc[0]
    assert a["n"] == 2 and a["value_cents"] == 300
    nul = out[out["user_id"].isna()].iloc[0]
    assert nul["n"] == 1 and nul["value_cents"] == 300


def test_ascii_whitespace_tokenizer_matches_re2():
    """ws_tokens must match RE2's \\s (ASCII) — NOT Python's unicode
    \\s — because every oracle tokenizes with DuckDB regexps."""
    from beats_ray.dataops.dedup import ws_tokens

    assert ws_tokens("a b\tc\nd") == ["a", "b", "c", "d"]
    # \x0b and \xa0 are unicode whitespace but NOT RE2 \s: they stay
    # inside the token, exactly as the SQL side sees them
    assert ws_tokens("a\x0bb") == ["a\x0bb"]
    assert ws_tokens("a\xa0b") == ["a\xa0b"]
    assert ws_tokens("") == []


def test_minhash_dedup_dup_heavy_distributed_path(ray_session):
    """Dup-heavy corpus (90% near-duplicates): the fully distributed
    drop-set path (broadcast_limit=0 → anti bucket_semi_join, nothing
    id-sized on the driver) must keep exactly the survivors the
    broadcast path keeps."""
    from beats_ray.dataops.dedup import minhash_dedup

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the trip home",
    ]
    rows = []
    for i in range(100):
        b = base[i % 2]
        if i >= 10:  # 90% duplicates: exact copies of the two bases
            rows.append({"doc_id": i, "text": b})
        else:  # 10% distinct
            rows.append({"doc_id": i, "text": f"{b} unique tail {i}"})
    docs = rd.from_items(rows)

    kw = dict(threshold=0.7, num_perm=32, bands=16)
    bc = sorted(minhash_dedup(docs, **kw).to_pandas()["doc_id"])
    dist = minhash_dedup(docs, broadcast_limit=0, **kw).to_pandas()
    assert dist["doc_id"].dtype == "int64"
    assert sorted(dist["doc_id"]) == bc
    # 90 exact dups of two bases → only the min-id of each dup cluster
    # plus the 10 distinct docs survive
    assert len(bc) < 20


def test_bucket_semi_join_matches_broadcast(ray_session):
    """bucket_semi_join ≡ semi_join (broadcast) for semi and anti, with
    duplicate keys in the key Dataset."""
    from beats_ray.dataops.joins import bucket_semi_join, semi_join

    left = rd.from_items(
        [{"k": i, "v": f"r{i}"} for i in range(50)]
    )
    keys_df = pd.DataFrame({"k": [1, 3, 3, 7, 7, 7, 40, 99]})
    keys_ds = rd.from_pandas(keys_df)
    for anti in (False, True):
        want = (
            semi_join(left, keys_df, on="k", anti=anti)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        got = (
            bucket_semi_join(left, keys_ds, on="k", anti=anti)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        got = got.astype({"k": "int64"})
        pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])


def test_asof_join_tie_cols_deterministic(ray_session):
    """Several right rows at the same (key, ts): with tie_cols the
    winner is the largest tie tuple, stable across block orders."""
    import pandas as pd
    from beats_ray.dataops.joins import asof_join

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    right_rows = [
        {"k": 1, "ts": t0, "val": 10},
        {"k": 1, "ts": t0, "val": 30},
        {"k": 1, "ts": t0, "val": 20},
    ]
    left = rd.from_items([{"k": 1, "ts": t0 + pd.Timedelta(seconds=5)}])
    for perm in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
        right = rd.from_items([right_rows[i] for i in perm])
        out = asof_join(left, right, key="k", ts_col="ts",
                        tie_cols=["val"]).to_pandas()
        assert len(out) == 1
        assert int(out["val"].iloc[0]) == 30


def test_window_dup_spans_alignment_independent(ray_session):
    """Content-defined window sampling detects a shared literal span
    even when it sits at DIFFERENT token offsets in the two documents
    (a fixed stride would misalign and hash different windows), and
    unrelated docs report nothing."""
    import ray.data as rd

    from beats_ray.dataops.dedup import window_dup_spans

    span = " ".join(f"s{i}" for i in range(30))  # 30 shared tokens
    docs = rd.from_items([
        {"doc_id": 1, "text": "a0 a1 a2 " + span + " a3"},
        {"doc_id": 2, "text": "b0 " + span},  # span shifted by 2 tokens
        {"doc_id": 3, "text": " ".join(f"c{i}" for i in range(40))},
        {"doc_id": 4, "text": "short text"},  # < k tokens: no windows
    ])
    out = (
        window_dup_spans(docs, k=10, sample_mod=2, buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # both span-carrying docs flagged with the SAME shared-window count
    # (the selected windows inside the span are identical); others absent
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_shared"].iloc[0] == out["n_shared"].iloc[1] > 0
    # every shared window lies inside the 30-token span: ≤ 21 windows,
    # ~half selected at sample_mod=2
    assert out["n_shared"].iloc[0] <= 21


def test_fnv1a32_arrow_matches_scalar():
    """The vectorized byte-position FNV kernel must be bit-identical to
    the scalar fnv1a32 — lineage part keys and every keyed shuffle
    depend on it. Covers empties, unicode, nulls (== str(None)), the
    >512-byte fallback path, and sliced arrays (non-zero offset)."""
    import pyarrow as pa

    from beats_ray.fixtures import fnv1a32, fnv1a32_arrow

    vals = ["", "a", "conv-000123", "héllo wörld", "x" * 511,
            "\t\n spaces ", "日本語テキスト", None, "None"]
    got = fnv1a32_arrow(pa.array(vals, pa.string()))
    want = [fnv1a32(str(v)) for v in vals]
    assert got.tolist() == want

    # long-string fallback (>512 bytes) — same values
    longs = ["y" * 600, "z" * 1000, "short"]
    got_l = fnv1a32_arrow(pa.array(longs))
    assert got_l.tolist() == [fnv1a32(v) for v in longs]

    # sliced array: offsets != 0
    arr = pa.array(vals, pa.string()).slice(2, 4)
    assert fnv1a32_arrow(arr).tolist() == [
        fnv1a32(str(v)) for v in vals[2:6]
    ]

    # large_string input
    got_ls = fnv1a32_arrow(pa.array(["a", "bb"], pa.large_string()))
    assert got_ls.tolist() == [fnv1a32("a"), fnv1a32("bb")]


def test_lsh_full_probe_equals_brute(ray_session):
    """n_probe = 2^n_planes probes every bucket — provably exact; the
    oracle-paired regime of ann_lsh_topk."""
    from beats_ray.dataops.ann import brute_topk, lsh_topk

    rng = np.random.RandomState(4)
    vecs = rng.randn(300, 16).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[:4].astype(np.float64)
    exact = brute_topk(ds, q, k=10)
    full = lsh_topk(ds, q, k=10, n_planes=5, n_probe=32)
    e = exact.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert e["vec_id"].tolist() == f["vec_id"].tolist()


def test_lsh_multiprobe_recall_reasonable(ray_session):
    """Partial multi-probe (margin-ordered bit flips) keeps useful
    recall at a fraction of the candidate scans."""
    from beats_ray.dataops.ann import brute_topk, lsh_topk

    rng = np.random.RandomState(5)
    vecs = rng.randn(400, 16).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
    )
    q = vecs[:4].astype(np.float64)
    exact = brute_topk(ds, q, k=10)
    approx = lsh_topk(ds, q, k=10, n_planes=6, n_probe=16)  # 1/4 of buckets
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5


def test_connected_components_chain_and_isolates(ray_session):
    """Label chasing converges in O(log diameter): a 64-chain (the
    plain-propagation worst case) resolves to one cluster; isolated
    nodes keep their own id; per-round block count stays bounded."""
    from beats_ray.dataops.graph import (
        connected_components,
        dup_cluster_survivors,
    )

    edges = rd.from_pandas(
        pd.DataFrame({"a": list(range(63)), "b": list(range(1, 64))})
    )
    nodes = rd.from_pandas(pd.DataFrame({"id": list(range(64)) + [99]}))
    for sl in (200_000, 0):  # driver union-find path AND the BSP path
        out = (
            connected_components(edges, nodes, buckets=4, small_limit=sl)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert out[out["id"] < 64]["cluster_id"].eq(0).all(), sl
        assert out[out["id"] == 99]["cluster_id"].eq(99).all(), sl

    surv = sorted(
        dup_cluster_survivors(edges, nodes, buckets=4)
        .to_pandas()["id"]
        .tolist()
    )
    assert surv == [0, 99]


def test_connected_components_triangle_plus_pair(ray_session):
    from beats_ray.dataops.graph import connected_components

    edges = rd.from_pandas(pd.DataFrame({"a": [1, 2, 5], "b": [0, 1, 6]}))
    nodes = rd.from_pandas(pd.DataFrame({"id": [0, 1, 2, 5, 6, 9]}))
    for sl in (200_000, 0):
        out = (
            connected_components(edges, nodes, buckets=4, small_limit=sl)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert out["cluster_id"].tolist() == [0, 0, 0, 5, 5, 9], sl


def test_token_stats_regexes_match_re2_on_unicode_edges():
    """Review regression: Python-unicode \\s and \\b diverge from the
    RE2 oracle on \\x0b / \\xa0 / accented text — the shared pattern
    constants must produce IDENTICAL counts in both engines."""
    import re

    import duckdb

    from beats_ray.dataops.textstats import BPE_TOKEN, STOPWORD_RE

    texts = ["a\x0bb", "a\xa0b", "theé cat", "the cat", "", "x  y"]
    con = duckdb.connect()
    bpe = re.compile(BPE_TOKEN)
    stop = re.compile(STOPWORD_RE, re.ASCII)
    for t in texts:
        n_py = len(bpe.findall(t))
        n_sql = con.execute(
            "SELECT length(regexp_extract_all(?, ?))", [t, BPE_TOKEN]
        ).fetchone()[0]
        assert n_py == n_sql, (t, n_py, n_sql)
        s_py = len(stop.findall(t.lower()))
        s_sql = con.execute(
            "SELECT length(regexp_extract_all(lower(?), ?))",
            [t, STOPWORD_RE],
        ).fetchone()[0]
        assert s_py == s_sql, (t, s_py, s_sql)


def test_dns_cache_numeric_and_null_keys(ray_session):
    """Review regressions: (a) an int64 query column must match its
    str()-coerced zone entry; (b) null keys on a FLOAT column must
    normalize (NaN != NaN would reset the replay chain every row, so
    repeated null-key events within the failure TTL must be hits)."""
    from beats_ray.dataops.dnscache import dns_cache_replay

    base = pd.Timestamp("2024-05-01")
    ev = rd.from_pandas(pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "query": pd.array([123, 123, None, None], dtype="float64"),
        "ts": [base + pd.Timedelta(seconds=s) for s in (0, 10, 20, 30)],
    }))
    out = dns_cache_replay(
        ev, resolutions={123.0: "10.0.0.1"},
        success_ttl_s=300, failure_ttl_s=300, buckets=2,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert out["status"].tolist() == ["OK", "OK", "NXDOMAIN", "NXDOMAIN"]
    assert out["answer"].tolist()[:2] == ["10.0.0.1", "10.0.0.1"]
    # 2nd occurrence of each key within TTL = cache hit
    assert out["cache"].tolist() == ["miss", "hit", "miss", "hit"]


def test_bigram_model_empty_corpus_is_empty_not_keyerror(ray_session):
    from beats_ray.dataops.quality import bigram_coverage

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["single", ""],  # no doc has 2 tokens
    }))
    out = bigram_coverage(docs).to_pandas().sort_values("doc_id")
    assert out["n_bigrams"].tolist() == [0, 0]
    assert out["n_in_model"].tolist() == [0, 0]


def test_mask_pii_explicit_empty_patterns_is_noop(ray_session):
    from beats_ray.dataops.pii import mask_pii

    docs = rd.from_pandas(pd.DataFrame(
        {"text": ["mail me: a@b.com"]}
    ))
    out = mask_pii(docs, patterns=[]).to_pandas()
    assert out["text"].tolist() == ["mail me: a@b.com"]


def test_top_words_min_len_zero_drops_empty_tokens(ray_session):
    from beats_ray.dataops.pii import top_words

    docs = rd.from_pandas(pd.DataFrame(
        {"text": ["  leading space", "", "  x"]}
    ))
    words = top_words(docs, k=10, min_len=0)["word"].tolist()
    assert "" not in words and "x" in words


def test_fixture_cache_token_invalidates_stale_corpus(tmp_path):
    """Review regression: a bare _DONE marker served a stale corpus
    after generator edits; the marker now carries a generation token
    and regeneration publishes via an atomic directory swap."""
    from beats_ray.fixtures import _fixture_token, ensure_transcripts

    root = str(tmp_path / "fx")
    d = ensure_transcripts(0.001, root=root)
    from pathlib import Path

    done = Path(d) / "_DONE"
    assert done.read_text() == _fixture_token(0.001)
    # corrupt the token -> next call regenerates (and still completes)
    done.write_text("stale-token")
    mtime_before = (Path(d) / "part-00000.parquet").stat().st_mtime_ns
    d2 = ensure_transcripts(0.001, root=root)
    assert d2 == d
    assert done.read_text() == _fixture_token(0.001)
    assert (Path(d) / "part-00000.parquet").stat().st_mtime_ns != mtime_before


def test_connected_components_random_vs_union_find(ray_session):
    """BSP CC vs a driver-side union-find oracle on random graphs with
    non-contiguous (and negative) int64 ids, isolated nodes, self-loops
    and duplicate edges — the rewrite (actor shards) must match the
    abstract semantics exactly."""
    from beats_ray.dataops.graph import connected_components

    rng = np.random.RandomState(7)
    for trial in range(3):
        ids = rng.choice(np.arange(-500, 4000, 7), size=120,
                         replace=False).astype(np.int64)
        a = rng.choice(ids, size=80)
        b = rng.choice(ids, size=80)
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a, b):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        want = {int(i): find(int(i)) for i in ids}

        for sl in (200_000, 0):  # union-find path AND BSP path
            out = (
                connected_components(
                    rd.from_pandas(pd.DataFrame({"a": a, "b": b})),
                    rd.from_pandas(pd.DataFrame({"id": ids})),
                    buckets=3 + trial, small_limit=sl,
                )
                .to_pandas()
            )
            got = dict(zip(out["id"].astype(int),
                           out["cluster_id"].astype(int)))
            assert got == want, (trial, sl)


@pytest.mark.parametrize("trial", [1, 2, 3])  # the adversarial kinds;
# kind-0 uniform is already covered by the fixed-seed exactness test
def test_embed_dup_pairs_exact_across_geometries(ray_session, trial):
    """The centroid-bound pruning must hold on adversarial geometry,
    not just the fixture corpus: uniform clouds, tight clusters,
    antipodal + near-zero-norm vectors, near-duplicate-heavy — across
    thresholds, cluster counts, and dimensionalities. Ground truth is
    brute-force all-pairs numpy."""
    from beats_ray.dataops.ann import embedding_cosine_dup_pairs

    rng = np.random.RandomState(trial)
    n, d = 200, int(rng.choice([4, 8, 32]))
    kind = trial % 4
    if kind == 0:
        vecs = rng.randn(n, d)
    elif kind == 1:
        cents = rng.randn(8, d) * 3
        vecs = cents[rng.randint(0, 8, n)] + 0.1 * rng.randn(n, d)
    elif kind == 2:
        vecs = rng.randn(n, d)
        vecs[50:100] = -vecs[:50] * rng.uniform(0.001, 2, (50, 1))
        vecs[100:110] *= 1e-6  # near-zero norms keep their direction
    else:
        base = rng.randn(30, d)
        vecs = base[rng.randint(0, 30, n)] + 0.02 * rng.randn(n, d)
    thr = [0.35, 0.8, 0.95, 0.5][trial % 4]
    nc = int(rng.choice([2, 4, 8, 16]))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    )
    got_ds = embedding_cosine_dup_pairs(ds, threshold=thr, n_clusters=nc)
    got_df = got_ds.to_pandas()
    # Ray's to_pandas drops columns on a zero-block result; schema()
    # still carries them (the q_embed_dup_pairs empty guard exists for
    # exactly this)
    got = (set() if got_df.empty
           else set(map(tuple, got_df[["a", "b"]].values)))
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    want = set(map(tuple, np.argwhere(np.triu(sims >= thr, k=1))))
    assert got == want


def test_stratified_sample_per_stratum_rates(docs):
    """Per-stratum cutoffs: a stratum at rate 1.0 keeps everything, at
    0.0 keeps nothing, unlisted strata use default_fraction; the
    selection is the same hash family as hash_sample, so the 'all'
    stratum's members at rate f are exactly hash_sample(f)'s picks."""
    import pandas as pd

    from beats_ray.dataops.sampling import hash_sample, stratified_sample

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = df["doc_id"].map(
            lambda i: ["keep", "drop", "half", "other"][i % 4])
        return df

    labelled = docs.map_batches(lab, batch_format="pandas")
    out = stratified_sample(
        labelled, {"keep": 1.0, "drop": 0.0, "half": 0.5},
        stratum="grp", default_fraction=0.25,
    ).to_pandas()
    assert set(out[out["grp"] == "keep"]["doc_id"]) == set(range(0, 40, 4))
    assert (out["grp"] != "drop").all()
    # same hash family: the 'half' stratum's picks == hash_sample(0.5)
    # restricted to that stratum, with the matching salt
    ref = set(hash_sample(labelled, 0.5, key="doc_id",
                          salt="stratified").to_pandas()["doc_id"])
    assert set(out[out["grp"] == "half"]["doc_id"]) == \
        ref & set(range(2, 40, 4))
    # deterministic across runs
    again = stratified_sample(
        labelled, {"keep": 1.0, "drop": 0.0, "half": 0.5},
        stratum="grp", default_fraction=0.25,
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_mix_corpora_epochs_and_fraction(docs):
    """Whole epochs replicate every row; the fractional epoch is the
    hash_sample of the corpus with the per-source salt; tags (source,
    epoch) identify each copy."""
    from beats_ray.dataops.sampling import hash_sample, mix_corpora

    out = mix_corpora({"a": (docs, 100), "b": (docs, 10)}).to_pandas()
    a = out[out["source"] == "a"]
    # 100 = 2 full epochs of 40 + a 0.5-epoch sample
    assert set(a[a["epoch"] == 0]["doc_id"]) == set(range(40))
    assert set(a[a["epoch"] == 1]["doc_id"]) == set(range(40))
    frac = set(a[a["epoch"] == 2]["doc_id"])
    ref = set(hash_sample(docs, 20 / 40, key="doc_id",
                          salt="mix:a").to_pandas()["doc_id"])
    assert frac == ref
    b = out[out["source"] == "b"]
    assert set(b["epoch"]) == {0}          # fraction-only corpus
    assert 1 <= len(b) <= 20
    # deterministic
    again = mix_corpora({"a": (docs, 100), "b": (docs, 10)}).to_pandas()
    assert sorted(map(tuple, out[["doc_id", "source", "epoch"]].values.tolist())) == \
        sorted(map(tuple, again[["doc_id", "source", "epoch"]].values.tolist()))


# ------------------------------------------------------- boilerplate lines


def _bp_corpus():
    import ray.data as rd

    rows = []
    # "BANNER" appears in 4 distinct docs (8 occurrences incl. repeats
    # within a doc); "rare" in 1; blanks everywhere
    for d in range(4):
        rows.append({"conv_id": f"c{d}", "turn_idx": 0,
                     "text": "BANNER\nbody %d\nBANNER" % d})
        rows.append({"conv_id": f"c{d}", "turn_idx": 1,
                     "text": "\nBANNER\n"})
    rows.append({"conv_id": "c9", "turn_idx": 0, "text": "rare\nonly"})
    rows.append({"conv_id": "c9", "turn_idx": 1, "text": ""})
    rows.append({"conv_id": "c9", "turn_idx": 2, "text": "BANNER"})
    return rd.from_items(rows)


def _bp_expect():
    # min_docs=3: BANNER (5 distinct convs) is boilerplate, rare/only not
    return {
        ("c0", 0): ("body 0", 2), ("c1", 0): ("body 1", 2),
        ("c2", 0): ("body 2", 2), ("c3", 0): ("body 3", 2),
        ("c0", 1): ("\n", 1), ("c1", 1): ("\n", 1),
        ("c2", 1): ("\n", 1), ("c3", 1): ("\n", 1),
        ("c9", 0): ("rare\nonly", 0), ("c9", 1): ("", 0),
        ("c9", 2): ("", 1),
    }


def test_boilerplate_lines_broadcast_path(ray_session):
    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    out = remove_boilerplate_lines(
        _bp_corpus(), min_docs=3, broadcast_limit=100
    ).to_pandas()
    got = {(r.conv_id, r.turn_idx): (r.clean_text, r.n_removed)
           for r in out.itertuples()}
    assert got == _bp_expect()


def test_boilerplate_lines_distributed_path_matches(ray_session):
    """broadcast_limit=0 forces the explode→join→regroup scale path;
    it must agree row-for-row with the broadcast path."""
    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    out = remove_boilerplate_lines(
        _bp_corpus(), min_docs=3, broadcast_limit=0, buckets=5
    ).to_pandas()
    got = {(r.conv_id, r.turn_idx): (r.clean_text, int(r.n_removed))
           for r in out.itertuples()}
    assert got == _bp_expect()


def test_boilerplate_lines_no_boilerplate_is_identity(ray_session):
    import ray.data as rd

    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    rows = [{"conv_id": "a", "turn_idx": i, "text": f"unique line {i}"}
            for i in range(5)]
    out = remove_boilerplate_lines(
        rd.from_items(rows), min_docs=2
    ).to_pandas().sort_values("turn_idx")
    assert list(out["clean_text"]) == [f"unique line {i}" for i in range(5)]
    assert out["n_removed"].sum() == 0


def test_sample_exact_k_per_group_block_independence(ray_session):
    """The grouped top-k must be invariant to block layout, and groups
    smaller than k keep every row."""
    import ray.data as rd

    from beats_ray.dataops.sampling import sample_exact_k_per_group

    rows = [{"doc_id": i, "g": "big" if i < 90 else "tiny"}
            for i in range(100)]
    outs = []
    for blocks in (1, 7):
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(blocks)
        out = sample_exact_k_per_group(ds, 10, group="g").to_pandas()
        outs.append(out.sort_values(["g", "doc_id"]).reset_index(drop=True))
    assert outs[0].equals(outs[1])
    got = outs[0]
    assert (got["g"] == "big").sum() == 10
    assert (got["g"] == "tiny").sum() == 10  # only 10 tiny rows exist
    assert set(got.loc[got["g"] == "tiny", "doc_id"]) == set(range(90, 100))


def test_pq_full_rerank_equals_brute(ray_session):
    """PQ with a full-coverage re-rank must be bit-identical to brute
    force (the oracle identity), across block layouts."""
    import ray.data as rd

    from beats_ray.dataops.ann import brute_topk, pq_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 16).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    ).repartition(5)
    q = vecs[:4].astype(np.float64)
    exact = brute_topk(ds, q, k=10).reset_index(drop=True)
    pq = pq_topk(ds, q, k=10, n_sub=4, n_codes=16).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        exact[["query_id", "vec_id"]], pq[["query_id", "vec_id"]]
    )


def test_pq_small_rerank_recall_reasonable(ray_session):
    """The approximate regime: a 40-candidate re-rank pool out of 300
    rows still recovers most of the true top-10 (ADC ordering is a
    useful signal, not noise)."""
    import ray.data as rd

    from beats_ray.dataops.ann import brute_topk, pq_topk

    rng = np.random.RandomState(11)
    vecs = rng.randn(300, 16).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[:4].astype(np.float64)
    exact = brute_topk(ds, q, k=10)
    approx = pq_topk(ds, q, k=10, n_sub=4, n_codes=16, rerank=40)
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6


def test_boilerplate_lines_randomized_vs_pandas(ray_session):
    """Randomized cross-check of BOTH apply paths against a
    straightforward pandas reference over corpora with repeated lines,
    blanks, empty docs, and multi-row documents."""
    import ray.data as rd

    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    rng = np.random.RandomState(1234)
    pool = [f"line {i}" for i in range(12)] + ["", "  ", "dup dup"]
    for trial in range(3):
        rows = []
        for r in range(120):
            n = rng.randint(0, 5)
            text = "\n".join(rng.choice(pool) for _ in range(n))
            rows.append({"conv_id": f"c{rng.randint(0, 25)}",
                         "turn_idx": r, "text": text})
        df = pd.DataFrame(rows)
        min_docs = int(rng.randint(2, 6))

        # pandas reference: distinct-conv counts per nonblank line
        ex = df.assign(line=df["text"].str.split("\n")).explode("line")
        ex = ex[ex["line"].notna()]
        nb = ex[ex["line"] != ""]
        bad = set(
            nb.groupby("line")["conv_id"].nunique()
            .loc[lambda s: s >= min_docs].index
        )

        def clean(t):
            ls = t.split("\n")
            kept = [l for l in ls if l == "" or l not in bad]
            return "\n".join(kept), len(ls) - len(kept)

        expect = {
            (r.conv_id, r.turn_idx): clean(r.text) for r in df.itertuples()
        }
        ds = rd.from_pandas(df).repartition(6)
        for limit in (10_000, 0):
            out = remove_boilerplate_lines(
                ds, min_docs=min_docs, broadcast_limit=limit
            ).to_pandas()
            got = {(r.conv_id, r.turn_idx): (r.clean_text, int(r.n_removed))
                   for r in out.itertuples()}
            assert got == expect, f"trial {trial} limit {limit}"


def test_sample_exact_k_per_group_randomized_vs_pandas(ray_session):
    """Randomized cross-check vs the PARTITION-BY row_number reference
    (same md5-64 hash), across group skew and block layouts."""
    import hashlib

    import ray.data as rd

    from beats_ray.dataops.sampling import sample_exact_k_per_group

    rng = np.random.RandomState(99)
    for trial in range(3):
        n = 200
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype="int64"),
            "g": rng.choice(["a", "b", "c", "rare"],
                            p=[0.6, 0.25, 0.13, 0.02], size=n),
        })
        k = int(rng.randint(1, 15))
        h = df["doc_id"].map(
            lambda v: int.from_bytes(
                hashlib.md5(f"xk:{v}".encode()).digest()[:8], "big")
        )
        ref = (df.assign(_h=h)
                 .sort_values(["_h", "doc_id"])
                 .groupby("g").head(k)[["doc_id", "g"]])
        expect = set(map(tuple, ref.itertuples(index=False)))
        ds = rd.from_pandas(df).repartition(int(rng.randint(1, 9)))
        out = sample_exact_k_per_group(ds, k, group="g").to_pandas()
        got = set(map(tuple, out[["doc_id", "g"]].itertuples(index=False)))
        assert got == expect, f"trial {trial} k={k}"


def _range_join_brute(ldf, rdf, key, ts, how="inner"):
    out = ldf.merge(rdf, on=key, how="left")
    c = out["start_s"].notna() & (out["start_s"] <= out[ts]) & (out[ts] <= out["end_s"])
    hit = out[c]
    if how == "inner":
        return hit
    miss = ldf.merge(hit[ldf.columns].drop_duplicates(), how="left",
                     indicator=True)
    miss = miss[miss["_merge"] == "left_only"].drop(columns="_merge")
    for col in ("start_s", "end_s", "win"):
        if col in rdf.columns:
            miss[col] = None
    return pd.concat([hit, miss], ignore_index=True)


def test_range_join_disjoint_and_overlapping_vs_brute(ray_session):
    import ray.data as rd

    from beats_ray.dataops.joins import range_join

    rng = np.random.RandomState(5)
    ldf = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 60),
        "ts": rng.randint(0, 100, 60).astype("int64"),
        "eid": np.arange(60, dtype="int64"),
    })
    # disjoint windows per key
    win_rows = []
    for k in "abc":
        for i, (s0, e0) in enumerate([(0, 20), (30, 55), (70, 90)]):
            win_rows.append({"k": k, "start_s": s0, "end_s": e0,
                             "win": f"{k}{i}"})
    rdf = pd.DataFrame(win_rows).astype({"start_s": "int64", "end_s": "int64"})
    lds, rds = rd.from_pandas(ldf).repartition(4), rd.from_pandas(rdf)
    for how in ("inner", "left"):
        got = range_join(lds, rds, key="k", ts_col="ts", how=how,
                         buckets=4).to_pandas()
        exp = _range_join_brute(ldf, rdf, "k", "ts", how)
        g = got.sort_values(["eid"]).reset_index(drop=True)
        e = exp.sort_values(["eid"]).reset_index(drop=True)
        assert len(g) == len(e), how
        pd.testing.assert_series_equal(
            g["eid"].astype("int64"), e["eid"].astype("int64"),
            check_names=False)
        m = g["win"].notna()
        assert (g.loc[m, "win"].to_numpy() == e.loc[m.to_numpy(), "win"].to_numpy()).all()

    # overlapping windows: every containing interval matches
    rdf2 = pd.DataFrame([
        {"k": k, "start_s": s0, "end_s": e0, "win": f"{k}{i}"}
        for k in "abc"
        for i, (s0, e0) in enumerate([(0, 50), (25, 75), (60, 99)])
    ]).astype({"start_s": "int64", "end_s": "int64"})
    got = range_join(lds, rd.from_pandas(rdf2), key="k", ts_col="ts",
                     how="inner", assume_disjoint=False,
                     buckets=4).to_pandas()
    exp = _range_join_brute(ldf, rdf2, "k", "ts", "inner")
    assert sorted(map(tuple, got[["eid", "win"]].itertuples(index=False))) == \
           sorted(map(tuple, exp[["eid", "win"]].itertuples(index=False)))


def test_windowed_top_terms_vs_pandas(ray_session):
    """Randomized cross-check of the trending-terms op against a
    straight pandas replay (hourly floor, count desc / term asc)."""
    import numpy as np
    import ray.data as rd

    from beats_ray.dataops.textstats import windowed_top_terms

    rng = np.random.default_rng(41)
    base = pd.Timestamp("2026-01-01")
    words = ["scan", "sort", "merge", "", "JOIN", "join"]
    df = pd.DataFrame({
        "ts": base + pd.to_timedelta(rng.integers(0, 6 * 3600, 400), "s"),
        "text": [" ".join(rng.choice(words, rng.integers(0, 8)))
                 for _ in range(400)],
    })
    got = (windowed_top_terms(rd.from_pandas(df).repartition(4), k=3)
           .to_pandas().sort_values(["w_start", "term"])
           .reset_index(drop=True))

    tok = df.assign(w_start=df["ts"].dt.floor("h"),
                    term=df["text"].str.lower().str.split())
    tok = tok.explode("term").dropna(subset=["term"])
    tok = tok[tok["term"] != ""]
    c = tok.groupby(["w_start", "term"], as_index=False).size() \
           .rename(columns={"size": "n"})
    c = c.sort_values(["w_start", "n", "term"],
                      ascending=[True, False, True], kind="mergesort")
    want = (c.groupby("w_start", sort=False).head(3)
            .sort_values(["w_start", "term"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}),
                                  want.astype({"n": "int64"}))


def test_curate_corpus_composed(ray_session):
    """Composed curation: lang filter -> quality filter -> exact dedup
    (min-id survivor) -> PII mask, one streaming pipeline."""
    import ray.data as rd

    from beats_ray.pipelines.curate import curate_corpus

    en = ("the quick brown fox and the lazy dog went to the market "
          "for a very long walk in the sun it is a fine day")
    de = ("der hund und die katze sind nicht mit dem mann ein haus "
          "ist das und der baum und die blume sind mit der sonne")
    short = "the and of"
    pii = (en + " contact alice@example.com or 10.0.0.1 for details "
           "and more of the same words to pad the doc out")
    docs = rd.from_items([
        {"doc_id": 1, "text": en},
        {"doc_id": 2, "text": en},       # exact dup of 1 -> dropped
        {"doc_id": 3, "text": de},       # german -> dropped
        {"doc_id": 4, "text": short},    # low quality -> dropped
        {"doc_id": 5, "text": pii},      # survives, PII masked
    ])
    out = curate_corpus(docs).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 5]
    assert set(out["lang_pred"]) == {"en"}
    assert "low" not in set(out["quality"])
    m5 = out.loc[out["doc_id"] == 5, "masked_text"].iloc[0]
    assert "<EMAIL>" in m5 and "<IP>" in m5
    assert "alice@example.com" not in m5


def test_grouped_sum_driver_and_bucket_paths_equal(ray_session):
    """grouped_sum's bounded driver merge and its co-locating bucket
    fallback must agree exactly (multi-column sums, negative values,
    single-key corner)."""
    from beats_ray.dataops.agg import grouped_sum

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "term": rng.choice(["a", "b", "c", "dd", "e" * 30], size=500),
        "c": rng.randint(-50, 50, size=500).astype("int64"),
        "d": rng.randint(0, 9, size=500).astype("int64"),
    })
    ds = rd.from_pandas(df).repartition(7)
    want = (df.groupby("term", as_index=False)[["c", "d"]].sum()
              .sort_values("term").reset_index(drop=True))
    for sl in (200_000, 0):  # driver path AND bucket path
        got = (grouped_sum(ds, "term", ["c", "d"], small_limit=sl)
               .to_pandas().sort_values("term").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want), sl


def test_rolling_sum_per_key_vs_pandas(ray_session):
    """rolling_sum_per_key == pandas groupby.rolling on shuffled
    multi-block input (frame = last N rows per key, current row
    inclusive, min_periods=1)."""
    from beats_ray.dataops.agg import rolling_sum_per_key

    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "long-key"], size=n),
        "o": rng.permutation(n).astype("int64"),
        "v": rng.randint(-100, 100, size=n).astype("int64"),
    })
    got = (rolling_sum_per_key(
        rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(7),
        key="k", order="o", value="v", window=3, out="r", buckets=4)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    want["r"] = (want.groupby("k", sort=False)["v"]
                 .rolling(3, min_periods=1).sum()
                 .reset_index(drop=True).to_numpy(np.int64))
    pd.testing.assert_frame_equal(got[["k", "o", "v", "r"]], want)
    # expanding frame (window=None) == per-key cumsum
    got_c = (rolling_sum_per_key(
        rd.from_pandas(df).repartition(5),
        key="k", order="o", value="v", window=None, out="c", buckets=4)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want_c = want.drop(columns=["r"])
    want_c["c"] = want_c.groupby("k", sort=False)["v"].cumsum().to_numpy(np.int64)
    pd.testing.assert_frame_equal(got_c[["k", "o", "v", "c"]], want_c)
