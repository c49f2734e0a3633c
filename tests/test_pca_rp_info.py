"""PCA top-component, random projection, word-info entropy, tool-pair
PMI: exact-integer contracts + scalar cross-checks."""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _emb_ds(mat, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else np.arange(len(mat))
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.asarray(ids, dtype=np.int64),
        "embedding": [np.asarray(r, dtype=np.float32) for r in mat],
    }))


def test_pca_finds_planted_direction(ray_session):
    """A corpus stretched 20× along one axis must project with far
    more variance on that axis than any other."""
    from beats_ray.dataops.ann import pca_top_component

    rng = np.random.RandomState(7)
    mat = rng.randn(200, 8) * 0.05
    mat[:, 3] += rng.randn(200) * 1.0  # dominant direction = dim 3
    out = pca_top_component(_emb_ds(mat), iters=5).to_pandas()
    assert len(out) == 200
    # numpy reference: top eigenvector of the float Gram
    g = mat.astype(np.float64).T @ mat.astype(np.float64)
    w, v = np.linalg.eigh(g)
    top = v[:, -1]
    # the integer component must be nearly collinear with the float one
    from beats_ray.dataops.ann import gram_matrix, power_iter_int, _gram_dense

    vi = np.array(power_iter_int(_gram_dense(gram_matrix(_emb_ds(mat))), 5),
                  dtype=np.float64)
    cos = abs(vi @ top) / (np.linalg.norm(vi) * np.linalg.norm(top))
    assert cos > 0.999


def test_pca_replica_matches_engine(ray_session, tmp_path):
    """The no-Ray scalar replica and the distributed fit must produce
    the IDENTICAL integer component (associative integer sums)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beats_ray.dataops.ann import (
        _gram_dense, gram_matrix, pca_component_replica, power_iter_int)

    rng = np.random.RandomState(3)
    mat = rng.randn(60, 5).astype(np.float32)
    path = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float32())),
    }), path)
    want = pca_component_replica(path, iters=3)
    got = power_iter_int(_gram_dense(gram_matrix(_emb_ds(mat))), 3)
    assert want == got
    assert max(abs(x) for x in got) == 1_000_000
    first_nz = next(x for x in got if x != 0)
    assert first_nz > 0  # deterministic sign fix


def test_pca_projection_layout_independent(ray_session):
    """Same rows in a different block layout → identical projections."""
    from beats_ray.dataops.ann import pca_top_component

    rng = np.random.RandomState(11)
    mat = rng.randn(120, 6)
    a = (pca_top_component(_emb_ds(mat), iters=3).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (pca_top_component(_emb_ds(mat).repartition(7), iters=3).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_random_projection_matches_scalar_replay(ray_session):
    """y must equal the scalar x_um @ S replay, and S must be the
    md5-derived sign matrix."""
    import hashlib

    from beats_ray.dataops.ann import EMB_SCALE, random_projection, rp_sign_matrix

    rng = np.random.RandomState(5)
    mat = rng.randn(40, 6)
    out = (random_projection(_emb_ds(mat), k=4).to_pandas()
           .sort_values(["vec_id", "j"]).reset_index(drop=True))
    assert len(out) == 160
    s = rp_sign_matrix(6, 4)
    for d in range(1, 7):
        for j in range(1, 5):
            h = int(hashlib.md5(f"rp:{d}:{j}".encode()).hexdigest()[:16], 16)
            assert s[d - 1, j - 1] == (1 if h % 2 == 0 else -1)
    # embeddings are stored float32 — replay through the same rounding
    xum = np.floor(EMB_SCALE * mat.astype(np.float32).astype(np.float64)
                   ).astype(np.int64)
    want = (xum @ s).reshape(-1)
    assert (out["y_um"].to_numpy() == want).all()


def test_word_info_hand_computed(ray_session):
    import ray.data as rd

    from beats_ray.dataops.textnorm import word_info

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a b", "", "x X x"],  # lowercased: x appears 3×
    }))
    out = (word_info(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want1 = (math.floor(2_000_000 * math.log(3 / 2))
             + math.floor(1_000_000 * math.log(3)))
    assert out.loc[0, "n_words"] == 3 and out.loc[0, "info_um"] == want1
    assert out.loc[1, "n_words"] == 0 and out.loc[1, "info_um"] == 0
    # single-word doc: entropy 0 exactly (ln(3/3) = 0)
    assert out.loc[2, "n_words"] == 3 and out.loc[2, "info_um"] == 0


def test_word_info_layout_independent(ray_session):
    import ray.data as rd

    from beats_ray.dataops.textnorm import word_info

    rng = np.random.RandomState(9)
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(words, rng.randint(0, 12)))
             for _ in range(50)]
    df = pd.DataFrame({"doc_id": range(50), "text": texts})
    a = (word_info(rd.from_pandas(df)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (word_info(rd.from_pandas(df).repartition(6)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # scalar cross-check on one row
    i = int(np.argmax(a["n_words"].to_numpy()))
    toks = texts[i].lower().split()
    T = len(toks)
    cnt = pd.Series(toks).value_counts()
    want = sum(math.floor((1_000_000 * int(c)) * math.log(T / int(c)))
               for c in cnt)
    assert a.loc[i, "info_um"] == want


def test_pair_counts_within_random_vs_bruteforce(ray_session):
    """The offset-remap searchsorted kernel must match the O(n²) brute
    force on randomized corpora, including duplicate timestamps, dense
    bursts, and single-row keys."""
    import ray.data as rd

    from beats_ray.dataops.agg import pair_counts_within

    rng = np.random.RandomState(17)
    for trial in range(5):
        n = int(rng.randint(50, 400))
        keys = rng.randint(0, 20, n)
        # cluster times so windows genuinely overlap; include ties
        ts = (rng.randint(0, 500, n) * 1_000_000
              + rng.choice([0, 0, 250_000], n))
        df = pd.DataFrame({
            "user_id": keys.astype("int64"),
            "ts": pd.to_datetime(ts, unit="us"),
        })
        got = (pair_counts_within(
            rd.from_pandas(df).repartition(4), "user_id", "ts",
            window_us=30_000_000).to_pandas())
        got_d = dict(zip(got["user_id"].astype(int),
                         got["n_pairs"].astype(int)))
        want = {}
        for u, grp in df.groupby("user_id"):
            t = np.sort(grp["ts"].to_numpy("datetime64[us]")
                        .astype("int64"))
            c = sum(int(((t > x) & (t <= x + 30_000_000)).sum())
                    for x in t)
            if c:
                want[int(u)] = c
        assert got_d == want, trial


def test_tool_pair_pmi_matches_pandas(ray_session):
    import __ray_entry__ as e

    out = e.q_tool_pair_pmi("/root/testdata/sf0.001")
    pairs = e.q_tool_sequences("/root/testdata/sf0.001")
    assert len(out) == len(pairs)
    n = int(pairs["n_pairs"].sum())
    ca = pairs.groupby("tool_a")["n_pairs"].sum()
    cb = pairs.groupby("tool_b")["n_pairs"].sum()
    for _, r in out.iterrows():
        want = math.floor(1_000_000 * math.log(
            int(r["n_pairs"]) * n
            / (int(ca[r["tool_a"]]) * int(cb[r["tool_b"]]))))
        assert int(r["pmi_um"]) == want
    # PMI is positive for over-represented pairs, negative for under
    assert (out["pmi_um"] != 0).any()
