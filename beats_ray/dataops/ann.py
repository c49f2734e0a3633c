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


def _topk_tiebreak(s: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (sim DESC, vec_id ASC) — the per-batch
    combiner must apply the SAME deterministic tie-break as the global
    merge and the SQL oracle, or tied sims at the batch k-boundary
    survive by arbitrary row position. argpartition with slack keeps the
    exact lexsort to a small candidate set."""
    k = min(k, len(s))
    cand = np.arange(len(s))
    if len(s) > 4 * k + 32:
        cand = np.argpartition(-s, 4 * k + 31)[: 4 * k + 32]
        # under MASS ties (e.g. many bitwise-identical vectors) more
        # than 4k+32 rows can share the boundary sim — tied smaller
        # vec_ids outside the slice would be dropped and the claimed
        # (sim DESC, vec_id ASC) order would diverge from the global
        # merge. Expand to every row at or above the boundary sim.
        boundary = s[cand].min()
        if (s >= boundary).sum() > len(cand):
            cand = np.flatnonzero(s >= boundary)
    order = np.lexsort((ids[cand], -s[cand]))[:k]
    return cand[order]


class BruteCosine:
    """Search stage (cached task): query matrix resolved & normalized
    once per worker."""

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
        vec_ids = df["vec_id"].to_numpy()
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            idx = _topk_tiebreak(s, vec_ids, self.k)
            out["query_id"].extend([qi] * len(idx))
            out["vec_id"].extend(vec_ids[idx])
            out["sim"].extend(s[idx])
        return pd.DataFrame(out)


def brute_topk(embeddings, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of each query row against the dataset.
    Per-batch top-k (the combiner) keeps the driver-side merge at
    ``n_batches × k`` rows regardless of corpus size."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    from .stagecache import task_stage

    partials = embeddings.map_batches(
        task_stage(BruteCosine, query_ref=qref, k=k),
        batch_format="pandas",
    ).to_pandas()
    if partials.empty:  # empty to_pandas() loses column names — guard
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    # deterministic global top-k: sim desc, vec_id asc tie-break
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


def _fit_sample_df(embeddings, sample_n: int):
    """Layout-UNBIASED k-means fit sample: a deterministic hash-sample
    over ``vec_id`` drawn uniformly from every block, not
    ``limit(sample_n)``'s first-blocks-in-layout-order slice. On a
    corpus whose layout correlates with embedding space (time- or
    topic-partitioned — the normal case) the limit() sample covers one
    region, centroids collapse there, bucket radii inflate, and the
    triangle-bound pruning degrades toward all-pairs.

    Returns ``(sample_df, embeddings)`` — the second element may be a
    MATERIALIZED handle of the input: for a file-backed Dataset,
    ``count()`` is parquet-metadata-only and nothing is pinned; for a
    lazy in-memory chain (from_items / map_batches), count + sample +
    the caller's search would otherwise re-execute the upstream chain
    three times, so it materializes once and every consumer reuses the
    blocks. Callers must run their search over the RETURNED handle."""
    from .sampling import hash_sample

    try:
        file_backed = bool(embeddings.input_files())
    except Exception:
        file_backed = False
    if not file_backed:
        embeddings = embeddings.materialize()
    try:
        n = embeddings.count()
    except Exception:
        n = None
    if n is not None and n > sample_n:
        df = hash_sample(
            embeddings, sample_n / n, key="vec_id", salt="ivf-fit"
        ).to_pandas()
        if len(df) >= max(8, sample_n // 4):
            return df, embeddings
    return embeddings.limit(sample_n).to_pandas(), embeddings


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
            idx = _topk_tiebreak(s, ids, self.k)
            out["query_id"].extend([qi] * len(idx))
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
    sample, embeddings = _fit_sample_df(embeddings, sample_n)
    cents = kmeans_fit(_batch_matrix(sample), n_clusters)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cref = ray.put(cents)
    from .stagecache import task_stage

    partials = embeddings.map_batches(
        task_stage(IVFSearcher, query_ref=qref, cents_ref=cref, k=k,
                   n_probe=n_probe),
        batch_format="pandas",
    ).to_pandas()
    if partials.empty:  # empty to_pandas() loses column names — guard
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    )


def _lsh_planes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    """Deterministic random hyperplanes (dim × n_planes) — the
    signature projection matrix, identical on every worker."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def _lsh_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack sign(m @ planes) into integer bucket codes."""
    bits = (m @ planes) >= 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


class LSHSearcher:
    """Random-hyperplane LSH top-k (the multi-probe scale path beside
    IVF): each vector hashes to a 2^n_planes bucket code; a query
    probes its own bucket plus the buckets reached by flipping the
    lowest-|margin| bits (multi-probe LSH — flips ordered by how close
    the query sat to each hyperplane). ``n_probe`` = probed buckets per
    query; ``n_probe >= 2**n_planes`` probes everything and is provably
    exact (the oracle regime). At scale the bucket code is a write-time
    partition key; here assignment happens in-stage."""

    def __init__(self, query_ref, planes_ref, k: int, n_probe: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.planes = np.asarray(p, dtype=np.float64)
        self.k = k
        n_planes = self.planes.shape[1]
        n_buckets = 1 << n_planes
        n_probe = min(n_probe, n_buckets)
        margins = self.q @ self.planes  # signed distance per plane
        base = _lsh_codes(self.q, self.planes)
        # multi-probe order: enumerate flip masks by total |margin| of
        # the flipped planes (small n_planes ⇒ the full 2^n mask grid
        # ranks in one vectorized pass per query)
        masks = np.arange(n_buckets, dtype=np.int64)
        flip_bits = ((masks[:, None] >> np.arange(n_planes)) & 1).astype(
            np.float64
        )
        self.probe = np.empty((self.q.shape[0], n_probe), dtype=np.int64)
        for qi in range(self.q.shape[0]):
            costs = flip_bits @ np.abs(margins[qi])
            order = np.argsort(costs, kind="stable")[:n_probe]
            self.probe[qi] = base[qi] ^ masks[order]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "vec_id": [], "sim": []}
        if len(df):
            m = _normalize(_batch_matrix(df))
            codes = _lsh_codes(m, self.planes)
            sims = m @ self.q.T
            vec_ids = df["vec_id"].to_numpy()
            for qi in range(self.q.shape[0]):
                allowed = np.isin(codes, self.probe[qi])
                if not allowed.any():
                    continue
                s = sims[allowed, qi]
                ids = vec_ids[allowed]
                idx = _topk_tiebreak(s, ids, self.k)
                out["query_id"].extend([qi] * len(idx))
                out["vec_id"].extend(ids[idx])
                out["sim"].extend(s[idx])
        # explicit dtypes even when NO batch row fell in any probed
        # bucket: empty python lists would build float64 columns and
        # the result Dataset would mix block schemas with the int64
        # blocks from matching batches
        return pd.DataFrame(
            {"query_id": pd.array(out["query_id"], dtype="int64"),
             "vec_id": pd.array(out["vec_id"], dtype="int64"),
             "sim": pd.array(out["sim"], dtype="float64")}
        )


def lsh_topk(
    embeddings,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    n_probe: int = 8,
    seed: int = 1234,
) -> pd.DataFrame:
    """Approximate top-k via multi-probe hyperplane LSH. Same partial
    top-k combiner shape as brute/IVF: per-batch candidates → per-batch
    top-k → driver merge of batches × k rows (never the corpus)."""
    queries = np.asarray(queries, dtype=np.float64)
    planes = _lsh_planes(queries.shape[1], n_planes, seed)
    qref = ray.put(queries)
    pref = ray.put(planes)
    from .stagecache import task_stage

    partials = embeddings.map_batches(
        task_stage(LSHSearcher, query_ref=qref, planes_ref=pref, k=k,
                   n_probe=n_probe),
        batch_format="pandas",
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    )


def kmeans_fit_l2(sample: np.ndarray, n_clusters: int, iters: int = 10,
                  seed: int = 4242) -> np.ndarray:
    """Plain-L2 Lloyd's on raw (sub)vectors — the PQ codebook fit
    (cosine k-means is wrong for subspaces: subvectors are not unit)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cents = sample[idx].astype(np.float64).copy()
    for _ in range(iters):
        # argmin ||x-c||^2 == argmax x.c - 0.5||c||^2 (one matmul)
        score = sample @ cents.T - 0.5 * (cents * cents).sum(axis=1)
        assign = np.argmax(score, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_fit(sample: np.ndarray, n_sub: int = 8, n_codes: int = 32,
           iters: int = 10) -> np.ndarray:
    """Product-quantizer codebooks over the NORMALIZED sample: the dim
    splits into ``n_sub`` subspaces, each L2-k-means'd to ``n_codes``
    entries. Returns (n_sub, n_codes, dim/n_sub)."""
    m = _normalize(sample.astype(np.float64))
    d = m.shape[1]
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    dsub = d // n_sub
    return np.stack([
        kmeans_fit_l2(m[:, s * dsub:(s + 1) * dsub], n_codes, iters=iters,
                      seed=4242 + s)
        for s in range(n_sub)
    ])


class PQSearcher:
    """ADC candidate scoring + exact re-rank, per batch. The approx
    cosine of a vector is the sum of per-subspace lookup-table entries
    for its codes (one fancy-index per subspace — no per-row Python);
    the top-``rerank`` candidates per query are then re-scored with the
    TRUE dot product, and the batch emits its exact top-k among them.
    ``rerank >= len(batch)`` degenerates to exact brute force — the
    identity the SQL oracle checks (same pattern as IVF full-probe).

    At 100 TB the point of PQ is MEMORY: an 8-subspace code is 8 bytes
    per vector vs 256+ for the float payload, so the candidate sweep
    streams codes while only the re-rank touches real vectors. Here
    both live in the same batch; the compute shape (table lookups, then
    a small exact matmul) is the scale shape."""

    def __init__(self, query_ref, books_ref, k: int, rerank: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        b = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.books = np.asarray(b, dtype=np.float64)
        self.k = k
        self.rerank = rerank
        n_sub, n_codes, dsub = self.books.shape
        # lut[qi, s, c] = q_sub(qi, s) . book[s, c]
        qsub = self.q.reshape(self.q.shape[0], n_sub, dsub)
        self.lut = np.einsum("qsd,scd->qsc", qsub, self.books)
        # encode scorer: x_sub . book^T - 0.5||book||^2, argmax
        self.book_norm2 = (self.books * self.books).sum(axis=2)  # (s, c)

    def _encode(self, m: np.ndarray) -> np.ndarray:
        n_sub, _, dsub = self.books.shape
        codes = np.empty((len(m), n_sub), dtype=np.int64)
        for s in range(n_sub):
            sub = m[:, s * dsub:(s + 1) * dsub]
            codes[:, s] = np.argmax(
                sub @ self.books[s].T - 0.5 * self.book_norm2[s], axis=1
            )
        return codes

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "vec_id": [], "sim": []}
        if len(df) == 0:
            return pd.DataFrame(out)
        m = _normalize(_batch_matrix(df))
        codes = self._encode(m)
        n_sub = self.books.shape[0]
        # ADC: approx[qi, i] = sum_s lut[qi, s, codes[i, s]]
        approx = np.zeros((self.q.shape[0], len(m)))
        for s in range(n_sub):
            approx += self.lut[:, s, codes[:, s]]
        vec_ids = df["vec_id"].to_numpy()
        r = min(self.rerank, len(m))
        for qi in range(self.q.shape[0]):
            # candidate pool by ADC score (vec_id tie-break for
            # determinism), then exact re-rank inside the pool
            cand = _topk_tiebreak(approx[qi], vec_ids, r)
            true = m[cand] @ self.q[qi]
            idx = _topk_tiebreak(true, vec_ids[cand], self.k)
            sel = cand[idx]
            out["query_id"].extend([qi] * len(sel))
            out["vec_id"].extend(vec_ids[sel])
            out["sim"].extend(m[sel] @ self.q[qi])
        return pd.DataFrame(out)


def pq_topk(
    embeddings,
    queries: np.ndarray,
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 32,
    rerank: int = 1 << 30,
    sample_n: int = 2048,
) -> pd.DataFrame:
    """Approximate top-k via product quantization (ADC) with exact
    re-rank. Default ``rerank`` covers every batch row = exact (the
    oracle identity); pass a small ``rerank`` for the approximate
    regime (recall tests + probe)."""
    sample, embeddings = _fit_sample_df(embeddings, sample_n)
    books = pq_fit(_batch_matrix(sample), n_sub=n_sub, n_codes=n_codes)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    bref = ray.put(books)
    from .stagecache import task_stage

    partials = embeddings.map_batches(
        task_stage(PQSearcher, query_ref=qref, books_ref=bref, k=k,
                   rerank=rerank),
        batch_format="pandas",
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    )


class _AssignWithAngle:
    """Tag each vector with its nearest centroid bucket and its angle
    to that centroid (radians) — the radius input for bucket-pair
    pruning."""

    def __init__(self, cents_ref):
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.cents = np.asarray(c, dtype=np.float64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["bucket"] = pd.Series(dtype="int64")
            df["angle"] = pd.Series(dtype="float64")
            return df
        m = _normalize(_batch_matrix(df))
        sims = m @ self.cents.T
        b = np.argmax(sims, axis=1)
        df["bucket"] = b.astype(np.int64)
        df["angle"] = np.arccos(np.clip(sims[np.arange(len(b)), b], -1.0, 1.0))
        return df


def embedding_cosine_dup_pairs(embeddings, threshold: float = 0.95,
                               n_clusters: int = 16):
    """EXACT embedding-cosine similarity join, scale-safe.

    Vectors bucket by nearest centroid; a bucket PAIR (i, j) is compared
    only if the triangle-inequality bound admits a qualifying pair:
    ``angle(c_i, c_j) <= arccos(threshold) + r_i + r_j`` where ``r`` is
    the bucket's max member-to-centroid angle. Within admitted pairs the
    comparison is one vectorized matmul + ``argwhere`` (no Python pair
    loop). No false negatives (the bound is sound, padded by epsilon for
    float safety); high thresholds prune most of the n_clusters² grid.
    Replication factor per vector = number of admitted partner buckets.
    """
    sample, embeddings = _fit_sample_df(embeddings, 2048)
    cents = _normalize(kmeans_fit(_batch_matrix(sample), n_clusters))
    cref = ray.put(cents)

    from .stagecache import task_stage

    assigned = embeddings.map_batches(
        task_stage(_AssignWithAngle, cents_ref=cref), batch_format="pandas"
    ).materialize()  # consumed twice: radius pre-agg + pair comparison

    # per-bucket radius: per-block partial max (≤ n_clusters rows per
    # block, bounded by construction) merged with np.maximum.at on the
    # driver — the identical volume a groupby would shuffle, minus the
    # sort exchange (the rank-select histogram-partials convention)
    radii_parts = (
        assigned.select_columns(["bucket", "angle"])
        .map_batches(
            lambda df: df.groupby("bucket", as_index=False)["angle"].max(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    radii = np.zeros(len(cents), dtype=np.float64)
    if len(radii_parts):
        np.maximum.at(
            radii,
            radii_parts["bucket"].to_numpy(dtype=np.int64),
            radii_parts["angle"].to_numpy(dtype=np.float64),
        )

    # admitted bucket pairs from the centroid-angle bound (driver-side:
    # n_clusters² tiny). eps pads float rounding — extra comparisons
    # only, never lost pairs.
    theta_t = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    cang = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))
    eps = 1e-9
    admitted: list[tuple[int, int]] = [
        (i, j)
        for i in range(len(cents))
        for j in range(i, len(cents))
        if cang[i, j] <= theta_t + radii[i] + radii[j] + eps
    ]
    # group id per admitted pair; each vector replicates to every group
    # its bucket participates in
    group_of: dict[tuple[int, int], int] = {p: g for g, p in enumerate(admitted)}
    by_bucket: dict[int, list[tuple[int, int, int]]] = {}
    for (i, j), g in group_of.items():
        by_bucket.setdefault(i, []).append((g, i, j))
        if i != j:
            by_bucket.setdefault(j, []).append((g, i, j))
    bref = ray.put(by_bucket)
    aref = ray.put(admitted)

    def replicate(df: pd.DataFrame, ref) -> pd.DataFrame:
        from .joins import _resolve_ref

        bb = _resolve_ref(ref)
        out = []
        for b, sub in df.groupby("bucket"):
            for g, _i, _j in bb.get(int(b), ()):  # noqa: B023
                s = sub.copy()
                s["_grp"] = g
                out.append(s)
        if not out:
            return df.head(0).assign(_grp=pd.Series(dtype="int64"))
        return pd.concat(out, ignore_index=True)

    def pairs(g: pd.DataFrame, ref) -> pd.DataFrame:
        from .joins import _resolve_ref

        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )
        # the group's identity IS its admitted bucket pair — sides come
        # from the bucket column, so an empty side can never be
        # misread as a same-bucket comparison (no cross-group dups)
        i, j = _resolve_ref(ref)[int(g["_grp"].iloc[0])]
        same_bucket = i == j
        left = g[g["bucket"] == i]
        right = left if same_bucket else g[g["bucket"] == j]
        if left.empty or right.empty:
            return empty
        ml = _normalize(_batch_matrix(left))
        mr = ml if same_bucket else _normalize(_batch_matrix(right))
        sims = ml @ mr.T
        mask = sims >= threshold
        if same_bucket:
            mask = np.triu(mask, k=1)
        idx = np.argwhere(mask)
        if len(idx) == 0:
            return empty
        la = left["vec_id"].to_numpy(dtype=np.int64)[idx[:, 0]]
        rb = right["vec_id"].to_numpy(dtype=np.int64)[idx[:, 1]]
        a = np.minimum(la, rb)
        b = np.maximum(la, rb)
        keep = a != b
        return pd.DataFrame(
            {"a": a[keep], "b": b[keep], "sim": sims[idx[:, 0], idx[:, 1]][keep]}
        ).astype({"a": "int64", "b": "int64", "sim": "float64"})

    # each unordered pair appears in exactly ONE group (a vector has one
    # bucket; group = that bucket pair) — no global dedup needed. The
    # pair list is returned as a DATASET: at scale it is result-sized
    # (can exceed the corpus on dup-heavy inputs) and must stream to
    # its sink, never collect on the driver; small callers just
    # .to_pandas() it themselves.
    return (
        assigned.map_batches(
            replicate, fn_kwargs={"ref": bref}, batch_format="pandas"
        )
        .groupby("_grp")
        .map_groups(
            lambda g: pairs(g, aref), batch_format="pandas"
        )
    )


# ---------------------------------------------------------------------------
# Grouped-centroid outlier scoring — the embedding-quality screen of a
# curation pipeline (distance-to-class-centroid; SemDeDup/SSL-prototype
# class). Exact-integer contract: components quantize to micro-units
# (floor(1e6·x)), per-label sums are exact int64, the centroid is the
# TRUNCATING integer division sum/count (DuckDB's `//`), and the score
# is the exact integer Σ_dims (x_um − c_um)² — both sides replay the
# identical arithmetic, no float summation order anywhere.
# ---------------------------------------------------------------------------

EMB_SCALE = 1_000_000


def _trunc_div(a: np.ndarray, b: int) -> np.ndarray:
    """Truncate-toward-zero integer division (DuckDB `//` semantics;
    numpy // floors, so route through magnitudes)."""
    return np.sign(a) * (np.abs(a) // b)


def gram_matrix(embeddings, col: str = "embedding") -> pd.DataFrame:
    """Exact-integer Gram matrix Σ x·xᵀ over the quantized embedding
    corpus (floor(1e6·x) components) — the second-moment table PCA /
    whitening / ZCA preprocessing starts from. Per-batch partials are
    one dims×dims int64 matmul (bounded by dims², never by rows); the
    driver accumulates them in arbitrary-precision Python ints so no
    corpus size overflows, and asserts the final entries fit int64
    (they do for unit-scale embeddings well past 10^6 vectors).
    Returns the upper triangle as DataFrame[(i, j, s_um2)] with
    1-based indices (SQL ``generate_subscripts`` convention)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.floor(EMB_SCALE * _batch_matrix(df, col)).astype(np.int64)
        g = m.T @ m  # exact int64 matmul; per-batch magnitude bounded
        dims = g.shape[0]
        i, j = np.triu_indices(dims)
        return pd.DataFrame({"i": (i + 1).astype(np.int64),
                             "j": (j + 1).astype(np.int64),
                             "s_um2": g[i, j]})

    parts = embeddings.select_columns([col]).map_batches(
        partial, batch_format="pandas").to_pandas()  # blocks × dims²
    if not len(parts):
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "s_um2": pd.Series(dtype="int64")})
    parts["s_um2"] = parts["s_um2"].astype(object)  # python-int sums
    out = (parts.groupby(["i", "j"], as_index=False)["s_um2"].sum()
           .sort_values(["i", "j"]).reset_index(drop=True))
    assert all(abs(int(x)) < 2 ** 63 for x in out["s_um2"]), "overflow"
    out["s_um2"] = out["s_um2"].astype(np.int64)
    return out


def centroid_outliers(embeddings, label_col: str = "label",
                      id_col: str = "vec_id", col: str = "embedding"):
    """Per-vector squared distance to its label's centroid:
    Dataset[(vec_id, label, dist2_um2)]. Fit folds per-batch per-label
    (Σ components_um, count) — the driver holds labels × dims int64s,
    bounded however large the corpus — and the centroid table
    broadcasts back for one shuffle-free scoring pass."""
    import ray

    from .joins import _resolve_ref
    from .stagecache import task_stage

    def fit_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.floor(EMB_SCALE * _batch_matrix(df, col)).astype(np.int64)
        out = pd.DataFrame(m)
        out.columns = [f"s{j}" for j in range(m.shape[1])]
        out["label"] = df[label_col].to_numpy()
        g = out.groupby("label", as_index=False).sum()
        g["n"] = df.groupby(df[label_col].to_numpy()).size().to_numpy()
        return g

    parts = embeddings.select_columns([label_col, col]).map_batches(
        fit_partial, batch_format="pandas").to_pandas()
    dims = [c for c in parts.columns if c.startswith("s")]
    tot = parts.groupby("label", as_index=False)[dims + ["n"]].sum()
    cents = {
        row["label"]: _trunc_div(
            row[dims].to_numpy().astype(np.int64), int(row["n"]))
        for _, row in tot.iterrows()
    }

    class _Score:
        def __init__(self, ref):
            self.cents = _resolve_ref(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.floor(EMB_SCALE * _batch_matrix(df, col)).astype(np.int64)
            labels = df[label_col].to_numpy()
            c = np.stack([self.cents[v] for v in labels]) if len(df) else \
                np.zeros((0, m.shape[1]), dtype=np.int64)
            d = m - c
            return pd.DataFrame({
                "vec_id": df[id_col].to_numpy(),
                "label": labels,
                "dist2_um2": (d * d).sum(axis=1).astype(np.int64),
            })

    ref = ray.put(cents)
    return embeddings.select_columns([id_col, label_col, col]).map_batches(
        task_stage(_Score, ref=ref), batch_format="pandas")


# ---------------------------------------------------------------------------
# Distributed k-means clustering over the FULL corpus (SemDeDup /
# cluster-curation archetype: partition the embedding space, then
# sample / dedup / score per cluster). Unlike ``kmeans_fit`` (a
# driver-side SAMPLE fit for the IVF quantizer) every Lloyd iteration
# here is a distributed pass: batches compute per-cluster (Σ um, n)
# partials against the broadcast centroids and the driver merges a
# bounded k×dims table — nothing row-sized ever leaves the object
# store, however large the corpus. Exact-integer contract like
# ``centroid_outliers`` (floor(1e6·x) quantize, int64 sums, truncating
# centroid division, integer squared distances, ties → smallest
# cluster id) so the SQL oracle replays every iteration bit-for-bit.
# ---------------------------------------------------------------------------


def _assign_int(m: np.ndarray, cents: np.ndarray):
    """Exact integer nearest-centroid assignment. Uses the expansion
    ||m-c||² = ||m||² + ||c||² − 2m·c — exact in int64 (|um| ≤ 1e6 so
    the largest term is dims·4e12 ≪ 2⁶³). argmin takes the FIRST
    minimum → smallest cluster id on ties, matching the SQL
    ``ORDER BY dist2, cluster``."""
    if not len(m):
        z = np.zeros(0, dtype=np.int64)
        return z, z
    d2 = ((m * m).sum(axis=1)[:, None]
          + (cents * cents).sum(axis=1)[None, :]
          - 2 * (m @ cents.T))
    a = d2.argmin(axis=1)
    return a.astype(np.int64), d2[np.arange(len(a)), a].astype(np.int64)


def _trunc_div_rows(a: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Row-wise truncate-toward-zero division (DuckDB ``//``)."""
    return np.sign(a) * (np.abs(a) // n[:, None])


class _KMeansPartials:
    """Per-batch Lloyd partials: assign to the broadcast centroids,
    emit per-cluster (Σ um per dim, count) — ≤ k rows per batch."""

    def __init__(self, ref, col):
        from .joins import _resolve_ref

        self.cents = _resolve_ref(ref)
        self.col = col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        k, dims = self.cents.shape
        m = np.floor(EMB_SCALE * _batch_matrix(df, self.col)).astype(np.int64)
        a, _ = _assign_int(m, self.cents)
        sums = np.zeros((k, dims), dtype=np.int64)
        np.add.at(sums, a, m)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        out = pd.DataFrame(sums, columns=[f"s{j}" for j in range(dims)])
        out.insert(0, "cluster", np.arange(k, dtype=np.int64))
        out["n"] = cnt
        return out[out["n"] > 0]


class _KMeansAssign:
    """Final broadcast assignment pass → (id, cluster, dist2_um2)."""

    def __init__(self, ref, id_col, col):
        from .joins import _resolve_ref

        self.cents = _resolve_ref(ref)
        self.id_col = id_col
        self.col = col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        m = np.floor(EMB_SCALE * _batch_matrix(df, self.col)).astype(np.int64)
        a, d2 = _assign_int(m, self.cents)
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "cluster": a,
            "dist2_um2": d2,
        })


def kmeans_clusters(embeddings, k: int = 4, iters: int = 2,
                    id_col: str = "vec_id", col: str = "embedding",
                    small_limit: int = 200_000):
    """Full-corpus Lloyd k-means: Dataset[(id, cluster, dist2_um2)].

    Deterministic init: the quantized embeddings of the k smallest ids
    (cluster j = rank j in id order — SQL-replayable, no RNG). Each of
    the ``iters`` iterations is one distributed pass (per-batch
    partials → bounded k×dims driver merge); empty clusters keep their
    previous centroid. The returned assignment is one more broadcast
    pass against the final centroids."""
    from .stagecache import task_stage

    sel = embeddings.select_columns([id_col, col])
    try:
        file_backed = bool(embeddings.input_files())
    except Exception:
        file_backed = False
    if not file_backed:
        # lazy chains would re-execute upstream once per iteration
        sel = sel.materialize()
    else:
        # file-backed inputs re-read per iteration, which is the right
        # streaming shape at corpus scale — but below the broadcast
        # class the re-reads are pure fixed cost, so pin the pruned
        # columns once (count() is parquet-metadata-only here)
        try:
            if sel.count() <= 5_000_000:
                sel = sel.materialize()
        except Exception:
            pass

    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.argsort(df[id_col].to_numpy(), kind="stable")[:k]
        return df.iloc[idx]

    # bounded-collect fast path: a corpus under the broadcast class
    # runs the IDENTICAL per-batch kernels on one frame — same integer
    # arithmetic, zero per-iteration scheduling; above it, each Lloyd
    # iteration is one distributed partials pass as documented
    head = (sel.limit(small_limit + 1).to_pandas()
            if small_limit else pd.DataFrame())
    small = small_limit and len(head) <= small_limit

    def _iterate(cents, partials_of):
        scols = [f"s{j}" for j in range(cents.shape[1])]
        for _ in range(iters):
            parts = partials_of(cents)
            g = parts.groupby("cluster", as_index=False).sum()
            new = cents.copy()
            idx = g["cluster"].to_numpy().astype(np.int64)
            new[idx] = _trunc_div_rows(
                g[scols].to_numpy().astype(np.int64),
                g["n"].to_numpy().astype(np.int64))
            cents = new
        return cents

    if small:
        seeds = (seed_partial(head).sort_values(id_col).head(k)
                 .reset_index(drop=True))
        cents = np.floor(
            EMB_SCALE * _batch_matrix(seeds, col)).astype(np.int64)
        k = len(cents)
        cents = _iterate(
            cents, lambda c: _KMeansPartials(ray.put(c), col)(head))
        out = _KMeansAssign(ray.put(cents), id_col, col)(head)
        import ray.data as rd

        return rd.from_pandas(out)

    seeds = (sel.map_batches(seed_partial, batch_format="pandas")
             .to_pandas().sort_values(id_col).head(k)
             .reset_index(drop=True))
    cents = np.floor(EMB_SCALE * _batch_matrix(seeds, col)).astype(np.int64)
    k = len(cents)
    cents = _iterate(cents, lambda c: sel.map_batches(
        task_stage(_KMeansPartials, ref=ray.put(c), col=col),
        batch_format="pandas").to_pandas())

    ref = ray.put(cents)
    return sel.map_batches(
        task_stage(_KMeansAssign, ref=ref, id_col=id_col, col=col),
        batch_format="pandas")


# ------------------------------------------------------------------ PCA
# Top principal component of the (uncentered) second-moment matrix via
# power iteration — the PCA/whitening first step over an embedding
# corpus. Exact-integer contract throughout so the result is replayable
# bit-for-bit: the Gram matrix is the exact int sum of quantized outer
# products (gram_matrix above), every iteration runs in
# arbitrary-precision Python ints (Gram entries × 1e6-scale vectors
# overflow int64, so numpy is NOT used here — the matrix is dims², the
# cost is nil), and renormalization is symmetric truncating division
# sign·((1e6·|gv|)//max|gv|) — the same op sequence an independent
# scalar replica (and a SQL replay with HUGEINT) produces.


def power_iter_int(gram: list[list[int]], iters: int = 3) -> list[int]:
    """Exact-integer power iteration on a dims×dims Python-int matrix.
    Start vector is all-1e6; after each multiply the vector rescales to
    max|v| = 1e6 by symmetric truncating division; the returned
    component is sign-fixed so its first nonzero entry is positive
    (eigenvectors are sign-ambiguous; ties must not flip between the
    engine and the replica)."""
    dims = len(gram)
    v = [EMB_SCALE] * dims
    for _ in range(iters):
        gv = [sum(gram[i][j] * v[j] for j in range(dims))
              for i in range(dims)]
        mx = max(abs(x) for x in gv) if gv else 0
        if mx == 0:
            break
        v = [(EMB_SCALE * x) // mx if x >= 0 else -((EMB_SCALE * -x) // mx)
             for x in gv]
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    return v


def _gram_dense(gram_df: pd.DataFrame) -> list[list[int]]:
    """Upper-triangle (i, j, s_um2) rows → symmetric dense Python-int
    matrix."""
    if not len(gram_df):
        return []
    dims = int(gram_df["j"].max())
    g = [[0] * dims for _ in range(dims)]
    for i, j, s in zip(gram_df["i"], gram_df["j"], gram_df["s_um2"]):
        g[int(i) - 1][int(j) - 1] = int(s)
        g[int(j) - 1][int(i) - 1] = int(s)
    return g


def pca_top_component(embeddings, iters: int = 3, id_col: str = "vec_id",
                      col: str = "embedding"):
    """Project every embedding onto the corpus' top principal
    component: Dataset[(vec_id, proj_um)] with
    proj_um = Σ_d floor(1e6·x_d)·v_d (exact int64; |v| ≤ 1e6 and dims
    ≤ ~10³ keep the sum far under 2⁶³). The fit is the distributed
    exact-integer Gram (bounded by dims², never rows) + driver power
    iteration; scoring is one shuffle-free broadcast pass."""
    from .joins import _resolve_ref
    from .stagecache import task_stage

    v = power_iter_int(_gram_dense(gram_matrix(embeddings, col)), iters)
    ref = ray.put(np.array(v, dtype=np.int64))

    class _Project:
        def __init__(self, ref, id_col, col):
            self.v = _resolve_ref(ref)
            self.id_col, self.col = id_col, col

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.floor(EMB_SCALE * _batch_matrix(df, self.col)
                         ).astype(np.int64)
            proj = (m @ self.v if m.shape[1] == len(self.v)
                    else np.zeros(len(df), dtype=np.int64))
            return pd.DataFrame({
                self.id_col: df[self.id_col].to_numpy(),
                "proj_um": proj.astype(np.int64),
            })

    return embeddings.select_columns([id_col, col]).map_batches(
        task_stage(_Project, ref=ref, id_col=id_col, col=col),
        batch_format="pandas")


def pca_component_replica(parquet_path: str, iters: int = 3,
                          col: str = "embedding") -> list[int]:
    """INDEPENDENT scalar replica of the PCA fit (no Ray): reads the
    parquet directly, builds the exact-integer Gram in Python ints,
    runs the same power iteration. Used to inline the component into
    the SQL oracle (the BPE-oracle convention) — integer addition is
    associative, so the replica's Gram equals the distributed one."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[col])
    rows = tbl.column(col).to_pylist()
    if not rows:
        return []
    m = np.floor(EMB_SCALE * np.array(rows, dtype=np.float64)
                 ).astype(np.int64)
    dims = m.shape[1]
    g = [[0] * dims for _ in range(dims)]
    for i in range(dims):
        for j in range(i, dims):
            s = int(np.multiply(m[:, i], m[:, j], dtype=np.int64).sum())
            g[i][j] = s
            g[j][i] = s
    return power_iter_int(g, iters)


# ------------------------------------------------ random projection
# Johnson–Lindenstrauss sign projection: y_j = Σ_d x_um_d · s(d, j)
# with s(d, j) ∈ {±1} derived from md5 — deterministic, shared
# bit-for-bit with the SQL replay (the Count-Min convention), and
# shipped as a dims×k broadcast so however large the corpus the
# "model" is one tiny matrix.


def rp_sign_matrix(dims: int, k: int) -> np.ndarray:
    """±1 sign matrix (dims×k), s[d-1, j-1] = +1 iff the first 16 hex
    chars of md5('rp:{d}:{j}') are even (1-based d/j to match SQL
    generate_subscripts)."""
    import hashlib

    s = np.empty((dims, k), dtype=np.int64)
    for d in range(1, dims + 1):
        for j in range(1, k + 1):
            h = int(hashlib.md5(f"rp:{d}:{j}".encode()
                                ).hexdigest()[:16], 16)
            s[d - 1, j - 1] = 1 if h % 2 == 0 else -1
    return s


def random_projection(embeddings, k: int = 8, id_col: str = "vec_id",
                      col: str = "embedding"):
    """JL dimensionality reduction to ``k`` sign-projected components:
    Dataset[(vec_id, j, y_um)] (long form, j 1-based), exact int64.
    One shuffle-free pass; the sign matrix derives from md5 so no
    state ships beyond dims×k int64s."""
    from .joins import _resolve_ref
    from .stagecache import task_stage

    class _RP:
        def __init__(self, ref, id_col, col, k):
            self.ref, self.id_col, self.col, self.k = ref, id_col, col, k
            self.s = _resolve_ref(ref) if ref is not None else None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.floor(EMB_SCALE * _batch_matrix(df, self.col)
                         ).astype(np.int64)
            dims = m.shape[1]
            s = self.s
            if s is None or s.shape[0] != dims:
                s = rp_sign_matrix(dims, self.k)
            y = m @ s  # (n × k) exact int64
            n = len(df)
            return pd.DataFrame({
                self.id_col: np.repeat(df[self.id_col].to_numpy(), self.k),
                "j": np.tile(np.arange(1, self.k + 1, dtype=np.int64), n),
                "y_um": y.reshape(-1).astype(np.int64),
            })

    # probe one row for dims so the matrix broadcasts prebuilt (falls
    # back to a per-worker build if a batch disagrees)
    head = embeddings.select_columns([col]).limit(1).to_pandas()
    ref = None
    if len(head):
        dims = len(head[col].iloc[0])
        ref = ray.put(rp_sign_matrix(dims, k))
    return embeddings.select_columns([id_col, col]).map_batches(
        task_stage(_RP, ref=ref, id_col=id_col, col=col, k=k),
        batch_format="pandas")
