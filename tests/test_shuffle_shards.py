"""Distributed ntile shuffle-sharding (`sampling.shuffle_shards`).

Cross-checks against the window-function definition
``shard = (row_number over (hash, key) order − 1) · N // n`` on a
pandas replica, including forced hash-tie groups straddling shard
boundaries (a collision-heavy hash_fn), equal-size bounds, and block
layout independence.
"""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from beats_ray.dataops.dedup import _stable_hash64
from beats_ray.dataops.sampling import shuffle_shards

MASK = 0x7FFFFFFFFFFFFFFF


def replica(ids, n_shards, hfn, salt="shuf"):
    hv = np.array([hfn(f"{salt}:{i}") & MASK for i in ids], dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "hv": hv})
    df = df.sort_values(["hv", "doc_id"], kind="mergesort")
    rn = np.arange(len(df))
    df["shard"] = (rn * n_shards) // len(df)
    return df[["doc_id", "shard"]].sort_values("doc_id").reset_index(drop=True)


def _run(ids, n_shards, hfn=None, parts=5):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64)})
    ).repartition(parts)
    out = shuffle_shards(ds, n_shards, hash_fn=hfn).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_matches_window_replica(ray_session):
    ids = np.arange(403)
    got = _run(ids, 8)
    want = replica(ids, 8, _stable_hash64)
    pd.testing.assert_frame_equal(got.astype({"shard": np.int64}), want)


def test_equal_shard_sizes(ray_session):
    got = _run(np.arange(1000), 7)
    sizes = got["shard"].value_counts()
    assert sorted(sizes.index) == list(range(7))
    assert sizes.max() - sizes.min() <= 1


def test_boundary_ties_resolved_by_key(ray_session):
    # every row hashes into one of THREE values → tie groups straddle
    # every boundary; the (hash, key) pair contract must still hold
    def collide(s: str) -> int:
        d = hashlib.md5(s.encode()).digest()[0] % 3
        return (d + 1) * 1000

    ids = np.arange(217)
    got = _run(ids, 5, hfn=collide)
    want = replica(ids, 5, collide)
    pd.testing.assert_frame_equal(got.astype({"shard": np.int64}), want)
    sizes = got["shard"].value_counts()
    assert sizes.max() - sizes.min() <= 1


def test_layout_independent(ray_session):
    ids = np.arange(300)
    a = _run(ids, 4, parts=1)
    b = _run(np.random.RandomState(0).permutation(ids), 4, parts=11)
    pd.testing.assert_frame_equal(a, b)


def test_single_shard_and_empty(ray_session):
    got = _run(np.arange(9), 1)
    assert set(got["shard"]) == {0}
    empty = shuffle_shards(
        rd.from_pandas(pd.DataFrame({"doc_id": pd.Series(dtype="int64")})),
        4).to_pandas()
    assert len(empty) == 0
