"""Similarity search over an embedding column (``list<float>``).

- ``brute_topk``: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix, per-batch top-k pre-reduction, tiny global
  merge. The baseline and the oracle for recall.
- ``ivf_topk``: IVF (inverted-file) variant — deterministic k-means
  coarse quantizer built on a sample, batches probe only the
  ``n_probe`` nearest centroid buckets: the scale path (search cost
  drops by ~n_clusters/n_probe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _batch_matrix(df: pd.DataFrame, col: str = "embedding") -> np.ndarray:
    if len(df) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    return np.stack(df[col].to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteCosine:
    """Actor stage: query matrix resolved & normalized once per actor."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "vec_id": [], "sim": []}
        if len(df) == 0:  # Ray may deliver empty blocks
            return pd.DataFrame(out)
        m = _normalize(_batch_matrix(df))
        sims = m @ self.q.T  # (batch, n_queries)
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            idx = np.argpartition(-s, k - 1)[:k]
            out["query_id"].extend([qi] * k)
            out["vec_id"].extend(df["vec_id"].to_numpy()[idx])
            out["sim"].extend(s[idx])
        return pd.DataFrame(out)


def brute_topk(embeddings, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of each query row against the dataset.
    Per-batch top-k (the combiner) keeps the driver-side merge at
    ``n_batches × k`` rows regardless of corpus size."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = embeddings.map_batches(
        BruteCosine,
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        batch_format="pandas",
        concurrency=(1, 4),
    ).to_pandas()
    # deterministic global top-k: sim desc, vec_id asc tie-break
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means (seeded init) — the coarse
    quantizer. No sklearn dependency; runs on a driver-side sample."""
    rng = np.random.RandomState(42)
    sample = _normalize(sample.astype(np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IVFSearcher:
    """Probe only the n_probe nearest centroid buckets per query."""

    def __init__(self, query_ref, cents_ref, k: int, n_probe: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.cents = np.asarray(c, dtype=np.float64)
        self.k = k
        # per query: the allowed bucket set
        qsims = self.q @ self.cents.T
        order = np.argsort(-qsims, axis=1)
        self.probe = order[:, :n_probe]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "vec_id": [], "sim": []}
        if len(df) == 0:
            return pd.DataFrame(out)
        m = _normalize(_batch_matrix(df))
        buckets = np.argmax(m @ self.cents.T, axis=1)
        sims = m @ self.q.T
        vec_ids = df["vec_id"].to_numpy()
        for qi in range(self.q.shape[0]):
            allowed = np.isin(buckets, self.probe[qi])
            if not allowed.any():
                continue
            s = sims[allowed, qi]
            ids = vec_ids[allowed]
            k = min(self.k, len(s))
            idx = np.argpartition(-s, k - 1)[:k]
            out["query_id"].extend([qi] * k)
            out["vec_id"].extend(ids[idx])
            out["sim"].extend(s[idx])
        return pd.DataFrame(out)


def ivf_topk(
    embeddings,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_n: int = 2048,
) -> pd.DataFrame:
    """Approximate top-k via IVF bucketing. At scale the bucket id would
    be a partition key (write-time clustering); here assignment happens
    in-stage so the same code path serves any layout."""
    sample = embeddings.limit(sample_n).to_pandas()
    cents = kmeans_fit(_batch_matrix(sample), n_clusters)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cref = ray.put(cents)
    partials = embeddings.map_batches(
        IVFSearcher,
        fn_constructor_kwargs={
            "query_ref": qref,
            "cents_ref": cref,
            "k": k,
            "n_probe": n_probe,
        },
        batch_format="pandas",
        concurrency=(1, 4),
    ).to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    )


def embedding_cosine_dup_pairs(embeddings, threshold: float = 0.95,
                               n_clusters: int = 16) -> pd.DataFrame:
    """Embedding-cosine near-dup detection: bucket by nearest centroid
    (groupby) and compare only within buckets — the all-pairs matmul
    never materializes."""
    sample = embeddings.limit(2048).to_pandas()
    cents = kmeans_fit(_batch_matrix(sample), n_clusters)
    cref = ray.put(cents)

    class Assign:
        def __init__(self, cents_ref):
            c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
            self.cents = np.asarray(c)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            if len(df) == 0:
                df["bucket"] = pd.Series(dtype="int64")
                return df
            m = _normalize(_batch_matrix(df))
            df["bucket"] = np.argmax(m @ self.cents.T, axis=1)
            return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_batch_matrix(g))
        sims = m @ m.T
        ids = g["vec_id"].to_numpy()
        out = {"a": [], "b": [], "sim": []}
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out["a"].append(a)
                    out["b"].append(b)
                    out["sim"].append(float(sims[i, j]))
        return pd.DataFrame(out).astype({"a": "int64", "b": "int64", "sim": "float64"})

    assigned = embeddings.map_batches(
        Assign, fn_constructor_kwargs={"cents_ref": cref}, batch_format="pandas",
        concurrency=(1, 4),
    )
    return assigned.groupby("bucket").map_groups(pairs, batch_format="pandas").to_pandas()
