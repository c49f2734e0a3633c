"""Distributed exact-integer k-means (`ann.kmeans_clusters`).

Cross-checks the distributed Lloyd loop against an independent scalar
replica of the identical integer contract (floor(1e6·x) quantize,
id-rank seeding, first-min tie-break, truncating centroid division,
empty clusters keep the old centroid), plus block-layout independence
— the partials merge must not depend on how rows land in blocks.
"""

import numpy as np
import pandas as pd
import ray.data as rd

from beats_ray.dataops.ann import EMB_SCALE, kmeans_clusters


def scalar_kmeans(df: pd.DataFrame, k: int, iters: int) -> pd.DataFrame:
    """Independent per-row replica of the documented contract."""
    ids = df["vec_id"].to_numpy()
    m = np.floor(
        EMB_SCALE * np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cents = m[order[:k]].copy()
    k = len(cents)

    def assign(row):
        best_j, best_d = 0, None
        for j in range(k):
            d = int(((row - cents[j]) ** 2).sum())
            if best_d is None or d < best_d:
                best_j, best_d = j, d
        return best_j, best_d

    for _ in range(iters):
        a = np.array([assign(m[i])[0] for i in range(len(m))])
        new = cents.copy()
        for j in range(k):
            members = m[a == j]
            if len(members):
                s = members.sum(axis=0, dtype=np.int64)
                new[j] = np.sign(s) * (np.abs(s) // len(members))
        cents = new
    out = [assign(m[i]) for i in range(len(m))]
    return pd.DataFrame({
        "vec_id": ids,
        "cluster": [o[0] for o in out],
        "dist2_um2": [o[1] for o in out],
    })


def _random_df(n, dims, seed):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(rng.randn(n, dims).astype(np.float32) * 0.5),
    })


def test_kmeans_matches_scalar_replica(ray_session):
    for seed, n, dims, k, iters in [(1, 60, 8, 4, 2), (2, 45, 5, 3, 3)]:
        df = _random_df(n, dims, seed)
        want = (scalar_kmeans(df, k, iters)
                .sort_values("vec_id").reset_index(drop=True))
        for sl in (200_000, 0):  # bounded-collect path AND per-iter passes
            got = (kmeans_clusters(rd.from_pandas(df), k=k, iters=iters,
                                   small_limit=sl)
                   .to_pandas().sort_values("vec_id").reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got.astype({"cluster": np.int64, "dist2_um2": np.int64}),
                want.astype({"cluster": np.int64, "dist2_um2": np.int64}))


def test_kmeans_layout_independent(ray_session):
    df = _random_df(80, 6, seed=7)
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    a = (kmeans_clusters(rd.from_pandas(df).repartition(1), k=4, iters=2)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    b = (kmeans_clusters(
            rd.from_pandas(shuffled).repartition(9), k=4, iters=2)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_kmeans_empty_cluster_keeps_seed(ray_session):
    # two tight groups, k=3: the third seed (id 2, inside group A)
    # loses every point after iter 1 yet must stay a valid centroid
    base = np.zeros(4, dtype=np.float32)
    far = base + 1.0
    df = pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": [base, base, base, far, far, far],
    })
    got = (kmeans_clusters(rd.from_pandas(df), k=3, iters=2)
           .to_pandas().sort_values("vec_id"))
    want = scalar_kmeans(df, 3, 2).sort_values("vec_id")
    assert got["cluster"].tolist() == want["cluster"].tolist()
    assert got["dist2_um2"].tolist() == want["dist2_um2"].tolist()
    # separated groups resolve to distance 0 from their own centroid
    assert set(got["dist2_um2"]) == {0}


def test_kmeans_separates_planted_clusters(ray_session):
    # ids interleave across blobs (row i → blob i%3) so the id-rank
    # seeding starts with one seed per blob — Lloyd then converges to
    # the planted structure
    rng = np.random.RandomState(11)
    n = 120
    blob = np.arange(n) % 3
    m = (rng.randn(n, 8) * 0.01 + 3.0 * blob[:, None]).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(m),
    })
    got = kmeans_clusters(rd.from_pandas(df), k=3, iters=5).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    # every planted blob ends in exactly one cluster, blobs in distinct ones
    assert (pd.Series(blob).groupby(got["cluster"].to_numpy())
            .nunique() == 1).all()
    assert got["cluster"].nunique() == 3


def test_dup_cluster_best_survivors_policy(ray_session):
    # chain 1-2-3 (best score at 2), isolate 4, pair 5-6 (tie scores →
    # smaller id wins); min-id policy would keep {1, 4, 5} instead
    from beats_ray.dataops.graph import dup_cluster_best_survivors

    edges = rd.from_pandas(pd.DataFrame(
        {"a": [1, 2, 5], "b": [2, 3, 6]}))
    nodes = rd.from_pandas(pd.DataFrame({"id": [1, 2, 3, 4, 5, 6]}))
    scores = rd.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3, 4, 5, 6], "score": [10, 99, 10, 1, 7, 7]}))
    keep = dup_cluster_best_survivors(
        edges, nodes, scores, node_col="id", score_col="score"
    ).to_pandas()
    assert sorted(keep["id"]) == [2, 4, 5]
    # the corpus-sized fallback (bucket join instead of broadcast)
    # must agree exactly
    keep2 = dup_cluster_best_survivors(
        edges, nodes, scores, node_col="id", score_col="score",
        broadcast_limit=0,
    ).to_pandas()
    assert sorted(keep2["id"]) == [2, 4, 5]


def test_gram_matrix_vs_numpy(ray_session):
    """gram_matrix == the quantized numpy second-moment, independent of
    block layout."""
    from beats_ray.dataops.ann import EMB_SCALE, gram_matrix

    df = _random_df(120, 5, seed=13)
    m = np.floor(EMB_SCALE * np.stack(df["embedding"].to_numpy())
                 .astype(np.float64)).astype(np.int64)
    want_full = m.T @ m
    for parts in (1, 9):
        got = gram_matrix(rd.from_pandas(df).repartition(parts))
        for _, r in got.iterrows():
            assert want_full[int(r["i"]) - 1, int(r["j"]) - 1] == r["s_um2"]
        assert len(got) == 5 * 6 // 2
