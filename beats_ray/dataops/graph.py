"""Iterative graph ops over pair Datasets — duplicate CLUSTERING.

Near-dup detection emits PAIRS (minhash/simhash/embedding joins); a
training-data pipeline then needs the transitive closure — "keep one
doc per duplicate CLUSTER", not "drop the larger of each pair" — which
is connected components over the pair graph.

Algorithm: min-label propagation WITH label chasing (pointer jumping).
Every node starts labelled with its own id; each round every node
adopts ``min(own label, neighbour labels)`` and then labels chase one
hop through the label table (``lab <- lab[lab]``), which collapses
chains exponentially — O(log diameter) rounds instead of O(diameter)
(the Hash-to-Min / large-star family, Rastogi et al. 2013).

Execution shape: a BSP actor pool (Pregel-style), the one place in the
engine where raw Ray actors beat a Dataset composition. An iterative
keyed algorithm re-executed as Dataset pipelines pays the full
streaming-executor setup + an all-to-all shuffle of the STATIC edge
set every round (measured: ~7 s/round of pure fixed cost at 500 nodes
— scheduling tax, not data). Instead, ``buckets`` actors each hold one
hash-shard of the edges (loaded once, streamed in via map_batches —
never through the driver) and of the label table; a round is three
bucket-to-bucket object-store exchanges of label-sized arrays
(candidates → grouped min → pointer-jump probes/answers), with the
driver touching only object refs and one scalar changed-count per
round. Partitioning assumption (document per the engine's custom-op
rule): node ids hash-shard uniformly; per-actor state is
O((|V|+|E|)/buckets) — size ``buckets`` to the cluster so a shard fits
a worker's heap. A hub node's incident edges land in one shard (same
skew exposure as any vertex-partitioned graph system).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing multiplier


def _bkt(ids: np.ndarray, buckets: int) -> np.ndarray:
    """Decorrelate sequential ids from the shard index (int64 → uint64
    multiplicative mix, top bits carry the entropy)."""
    x = ids.astype(np.uint64) * _MIX
    return ((x >> np.uint64(40)) % np.uint64(buckets)).astype(np.int64)


@ray.remote(num_cpus=0)
class _CCShard:
    """One hash-shard of the dup graph: the edges whose src hashes
    here, and the current label of every node that hashes here.
    ``num_cpus=0`` so the pool never deadlocks against the map tasks
    that stream edges in (the per-round bursts are short and the pool
    is idle between rounds)."""

    def __init__(self, bucket: int, n_buckets: int):
        self.b = bucket
        self.B = n_buckets
        self._edge_parts: list[tuple[np.ndarray, np.ndarray]] = []
        self._node_parts: list[np.ndarray] = []
        self.nodes = np.empty(0, np.int64)  # sorted
        self.labs = np.empty(0, np.int64)

    def add_edges(self, src, dst) -> None:
        self._edge_parts.append(
            (np.asarray(src, np.int64), np.asarray(dst, np.int64))
        )

    def add_nodes(self, ids) -> None:
        self._node_parts.append(np.asarray(ids, np.int64))

    def seal(self) -> int:
        """Freeze the shard: dedupe nodes, index edge sources into the
        node table once (labels are then O(1) array lookups all run)."""
        self.nodes = (
            np.unique(np.concatenate(self._node_parts))
            if self._node_parts else np.empty(0, np.int64)
        )
        self.labs = self.nodes.copy()
        if self._edge_parts:
            src = np.concatenate([p[0] for p in self._edge_parts])
            self.dst = np.concatenate([p[1] for p in self._edge_parts])
        else:
            src = np.empty(0, np.int64)
            self.dst = np.empty(0, np.int64)
        self._edge_parts = []
        self._node_parts = []
        # pair endpoints may reference nodes absent from ``nodes``
        # (caller passed a node subset); drop those edges — same
        # behaviour as the join-based formulation, which inner-joined
        # edges against the label table
        self.src_idx, ok = self._lookup(src)
        if not ok.all():
            self.src_idx = self.src_idx[ok]
            self.dst = self.dst[ok]
        self.dst_bkt = _bkt(self.dst, self.B)
        return len(self.nodes)

    def _lookup(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(index into nodes, present-mask) for an id array."""
        if len(self.nodes) == 0:
            z = np.zeros(len(ids), np.int64)
            return z, np.zeros(len(ids), bool)
        idx = np.searchsorted(self.nodes, ids)
        idx = np.minimum(idx, len(self.nodes) - 1)
        return idx, self.nodes[idx] == ids

    def cand_out(self):
        """Superstep 1: for every local edge, the neighbour candidate
        (dst, lab[src]), split by dst's shard."""
        lab = self.labs[self.src_idx]
        return tuple(
            (self.dst[m], lab[m])
            for m in (self.dst_bkt == j for j in range(self.B))
        )

    def min_and_probe(self, *cands):
        """Superstep 2: grouped min over own labels + received
        candidates → new labels; emit (node, newlab) pointer-jump
        probes to each label's owner shard. Returns
        (changed_count, probes_for_shard_0, ..., probes_for_shard_B-1).
        """
        new = self.labs.copy()
        for dst, lab in cands:
            idx, ok = self._lookup(np.asarray(dst, np.int64))
            np.minimum.at(new, idx[ok], np.asarray(lab, np.int64)[ok])
        changed = int(np.sum(new < self.labs))
        self.labs = new
        # only non-root nodes need the chase (lab[root]==root, no-op)
        nz = new < self.nodes
        pn, pl = self.nodes[nz], new[nz]
        pb = _bkt(pl, self.B)
        return (changed, *(
            (pn[m], pl[m]) for m in (pb == j for j in range(self.B))
        ))

    def answer_probes(self, *probes):
        """Superstep 3a: answer lab[lab[n]] lookups for labels this
        shard owns (labels are node ids, so the lookup is total), split
        by the asking node's shard. Runs before ``apply_chase`` on this
        actor (per-actor FIFO), so it reads post-min, pre-chase labels
        — exactly the lab <- lab[lab] semantics."""
        outs: list[list[tuple[np.ndarray, np.ndarray]]] = [
            [] for _ in range(self.B)
        ]
        for node, lab in probes:
            node = np.asarray(node, np.int64)
            # labels are ids of surviving (edge-validated) nodes, so
            # the lookup is total; the mask is belt-and-braces
            idx, ok = self._lookup(np.asarray(lab, np.int64))
            node, plab = node[ok], self.labs[idx[ok]]
            nb = _bkt(node, self.B)
            for j in range(self.B):
                m = nb == j
                if m.any():
                    outs[j].append((node[m], plab[m]))
        return tuple(
            (np.concatenate([a for a, _ in o]) if o else np.empty(0, np.int64),
             np.concatenate([b for _, b in o]) if o else np.empty(0, np.int64))
            for o in outs
        )

    def apply_chase(self, *answers) -> None:
        for node, plab in answers:
            if len(node):
                idx = np.searchsorted(self.nodes, node)
                self.labs[idx] = plab

    def labels_table(self, node_col: str, label_col: str) -> pa.Table:
        return pa.table({node_col: self.nodes, label_col: self.labs})


def connected_components(edges, nodes, node_col: str = "id",
                         label_col: str = "cluster_id", buckets: int = 8,
                         max_iters: int = 40, verbose: bool = False,
                         small_limit: int = 200_000):
    """Label every node with the MINIMUM node id reachable from it.

    ``edges``: Dataset with int columns (a, b) — undirected pairs.
    ``nodes``: Dataset with ``node_col`` — every node (isolated nodes
    keep their own id as the label). Returns a Dataset
    [node_col, label_col]. See module docstring for the BSP shape.

    Adaptive: a pair graph with at most ``small_limit`` edges resolves
    with a driver-side union-find over the EDGE-TOUCHED nodes only
    (bounded by 2x|edges| — never the node set), broadcast back and
    applied to ``nodes`` in one streaming pass; larger graphs take the
    BSP actor path. ``small_limit=0`` forces the distributed path.
    The same adaptive convention as the dedup drop-set broadcast.
    """
    import time as _time

    if small_limit:
        head = edges.limit(small_limit + 1).to_pandas()
        if len(head) <= small_limit:
            return _cc_small(head, nodes, node_col, label_col)

    shards = [_CCShard.remote(i, buckets) for i in range(buckets)]

    # stream edges/nodes into the shards from map tasks — symmetrize in
    # flight; nothing graph-sized ever passes through the driver
    def push_edges(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].astype("int64").to_numpy()
        b = df["b"].astype("int64").to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        sb = _bkt(src, buckets)
        ray.get([
            shards[j].add_edges.remote(src[m], dst[m])
            for j in range(buckets)
            for m in (sb == j,) if m.any()
        ])
        return pd.DataFrame({"n": [len(df)]})

    def push_nodes(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[node_col].astype("int64").to_numpy()
        ib = _bkt(ids, buckets)
        ray.get([
            shards[j].add_nodes.remote(ids[m])
            for j in range(buckets)
            for m in (ib == j,) if m.any()
        ])
        return pd.DataFrame({"n": [len(df)]})

    edges.map_batches(push_edges, batch_format="pandas").count()
    nodes.map_batches(push_nodes, batch_format="pandas").count()
    ray.get([s.seal.remote() for s in shards])

    for _it in range(max_iters):
        _t0 = _time.perf_counter()
        cand = [
            s.cand_out.options(num_returns=buckets).remote() for s in shards
        ]
        if buckets == 1:
            cand = [[c] for c in cand]
        minp = [
            shards[j].min_and_probe.options(num_returns=buckets + 1).remote(
                *(cand[i][j] for i in range(buckets))
            )
            for j in range(buckets)
        ]
        ans = [
            shards[j].answer_probes.options(num_returns=buckets).remote(
                *(minp[i][1 + j] for i in range(buckets))
            )
            for j in range(buckets)
        ]
        if buckets == 1:
            ans = [[a] for a in ans]
        done = [
            shards[j].apply_chase.remote(*(ans[i][j] for i in range(buckets)))
            for j in range(buckets)
        ]
        changed = sum(ray.get([minp[j][0] for j in range(buckets)]))
        ray.get(done)
        if verbose:
            print(f"[cc] round {_it}: changed={changed} "
                  f"{_time.perf_counter() - _t0:.3f}s", flush=True)
        if changed == 0:
            break

    refs = [
        s.labels_table.remote(node_col, label_col) for s in shards
    ]
    out = ray.data.from_arrow_refs(refs)
    out = out.materialize()  # let the actor pool die with its refs
    for s in shards:
        ray.kill(s)
    return out


def _cc_small(edge_df: pd.DataFrame, nodes, node_col: str,
              label_col: str):
    """Small-graph closure: union-find with path compression over the
    edge-touched ids (bounded by 2x|edges|), component min as the
    label, broadcast once; every node NOT in the table keeps its own
    id. The label application is a streaming map_batches over
    ``nodes`` — nothing node-sized ever lands on the driver."""
    if len(edge_df):
        a = edge_df["a"].astype("int64").to_numpy()
        b = edge_df["b"].astype("int64").to_numpy()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[rx] = ry
        label: dict[int, int] = {}
        for x in parent:
            r = find(x)
            label[r] = min(label.get(r, r), x)
        ids = np.fromiter(parent.keys(), np.int64, len(parent))
        labs = np.fromiter((label[find(int(x))] for x in ids), np.int64,
                           len(ids))
        order = np.argsort(ids)
        table_ref = ray.put((ids[order], labs[order]))
    else:
        table_ref = None

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[node_col].astype("int64").to_numpy()
        labs = ids.copy()
        if table_ref is not None:
            tids, tlabs = ray.get(table_ref)
            pos = np.searchsorted(tids, ids)
            pos_c = np.minimum(pos, max(len(tids) - 1, 0))
            hit = (pos < len(tids)) & (tids[pos_c] == ids)
            labs[hit] = tlabs[pos_c[hit]]
        return pd.DataFrame({node_col: ids, label_col: labs})

    return nodes.map_batches(apply, batch_format="pandas")


def dup_cluster_survivors(edges, nodes, node_col: str = "id",
                          buckets: int = 8):
    """Cluster-level dedup: one survivor per connected component (the
    minimum id — which IS the component label), as a Dataset of
    [node_col]. The "keep one per duplicate cluster" policy pair-based
    dedup cannot express (A~B, B~C but not A~C still collapses to one
    survivor here)."""
    labels = connected_components(
        edges, nodes, node_col=node_col, buckets=buckets
    )

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df[node_col] == df["cluster_id"]][[node_col]]
        return keep.astype("int64")

    return labels.map_batches(survivors, batch_format="pandas")


# ---------------------------------------------------------------------------
# TextRank keyword scoring (Mihalcea & Tarau 2004): PageRank over the
# adjacent-word co-occurrence graph — the corpus-level keyword
# extraction archetype. The node set is the bounded top-``vocab_k``
# vocabulary (same contract as the LM fits: the driver holds the
# k-row model, never the key space), the weighted edge set is a
# Dataset (never collected), and each power iteration is ONE
# distributed pass over the edges against the broadcast rank vector —
# per-batch partial per-destination sums, V-bounded driver merge.
# Exact-integer contract: ranks in micro-units (start = scale // V),
# per-edge contribution (r_src · w) // out_w(src) with DuckDB-``//``
# truncating division, damping as (15·start) // 100 + (85·Σ) // 100,
# dangling mass dropped — the SQL oracle unrolls the same iterations
# bit-for-bit. int64-exact while max edge weight < 2⁶³/scale ≈ 9.2e9
# occurrences at the default scale.
# ---------------------------------------------------------------------------


class _TextRankEdges:
    """Per-batch vocab-restricted adjacent-bigram partial counts."""

    def __init__(self, ref, text_col):
        from .joins import _resolve_ref

        self.terms = _resolve_ref(ref)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.utf8_lower(
            pc.fill_null(t[self.text_col].combine_chunks(), ""))
        words = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        arr = np.asarray(pc.list_flatten(words).to_pandas(), dtype=object)
        docidx = np.repeat(np.arange(len(lens)), lens)
        nonblank = arr != ""
        arr = arr[nonblank]
        docidx = docidx[nonblank]
        if len(arr) > 1:
            in_v = np.isin(arr, self.terms)
            adj = (docidx[1:] == docidx[:-1]) & in_v[:-1] & in_v[1:]
            bi = np.char.add(np.char.add(arr[:-1].astype(str), " "),
                             arr[1:].astype(str))[adj]
        else:
            bi = np.empty(0, dtype=object)
        if not len(bi):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        u, c = np.unique(bi, return_counts=True)
        return pa.table({"bigram": pa.array(u.astype(object), pa.string()),
                         "w": pa.array(c.astype(np.int64))})


class _TextRankIndex:
    """bigram → (src_idx, dst_idx, w) against the broadcast sorted
    vocabulary (tokens cannot contain whitespace, so the joined string
    splits back unambiguously)."""

    def __init__(self, ref):
        from .joins import _resolve_ref

        self.terms = _resolve_ref(ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        src = np.searchsorted(self.terms, parts[0].to_numpy(dtype=object))
        dst = np.searchsorted(self.terms, parts[1].to_numpy(dtype=object))
        return pd.DataFrame({
            "src_idx": src.astype(np.int32),
            "dst_idx": dst.astype(np.int32),
            "w": df["w"].to_numpy().astype(np.int64),
        })


class _TextRankPass:
    """One power-iteration pass: per-edge integer contributions against
    the broadcast (rank, out-weight) vectors, per-batch per-destination
    partial sums (≤ V rows out per batch)."""

    def __init__(self, ref):
        from .joins import _resolve_ref

        self.r, self.ow = _resolve_ref(ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        src = df["src_idx"].to_numpy()
        dst = df["dst_idx"].to_numpy()
        w = df["w"].to_numpy()
        contrib = (self.r[src] * w) // self.ow[src]
        u, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, contrib)
        return pd.DataFrame({"dst_idx": u.astype(np.int32), "s": s})


def textrank_scores(docs, vocab_k: int = 300, iters: int = 3,
                    text_col: str = "text",
                    scale: int = 1_000_000_000) -> pd.DataFrame:
    """TextRank keyword scores: DataFrame[(term, rank_ur)] over the
    top-``vocab_k`` vocabulary, rank in integer micro-units after
    ``iters`` damped power iterations (d = 0.85 as exact 85/100
    integer arithmetic). See the module-level contract note."""
    from .lm import fit_unigram_lm
    from .stagecache import task_stage

    vocab_df, _ = fit_unigram_lm(docs, text_col=text_col, model_k=vocab_k)
    terms = np.sort(vocab_df["term"].to_numpy().astype(object))
    n = len(terms)
    if n == 0:
        return pd.DataFrame({"term": pd.Series(dtype="string"),
                             "rank_ur": pd.Series(dtype="int64")})
    vref = ray.put(terms)

    from .agg import map_buckets

    idx_stage = task_stage(_TextRankIndex, ref=vref)

    def merge_index(g: pd.DataFrame) -> pd.DataFrame:
        # merge + index fused in the same co-locating task — ONE cheap
        # bucket shuffle instead of a sort-based global groupby (the
        # HLL lesson: the sort shuffle costs seconds of pure
        # scheduling on partial-count row sets)
        return idx_stage(g.groupby("bigram", as_index=False)["w"].sum())

    # the corpus-sized work is the partials pass; the merged edge set
    # is bounded by vocab_k^2 BY CONSTRUCTION, so it collects and the
    # power iterations run driver-side on the identical kernel — no
    # per-iteration dataset execution at any corpus size
    parts = (docs.select_columns([text_col])
             .map_batches(task_stage(_TextRankEdges, ref=vref,
                                     text_col=text_col),
                          batch_format="pyarrow")
             .materialize())
    edges_df = map_buckets(parts, "bigram", merge_index, buckets=32,
                           small_limit=2_000_000).to_pandas()
    if "src_idx" not in edges_df.columns:  # zero co-occurrences
        edges_df = pd.DataFrame({"src_idx": pd.Series(dtype="int32"),
                                 "dst_idx": pd.Series(dtype="int32"),
                                 "w": pd.Series(dtype="int64")})

    ow = np.zeros(n, dtype=np.int64)
    np.add.at(ow, edges_df["src_idx"].to_numpy(),
              edges_df["w"].to_numpy().astype(np.int64))
    ow_safe = np.maximum(ow, 1)  # srcs with ow=0 have no edges to divide

    start = scale // n
    base = (15 * start) // 100
    r = np.full(n, start, dtype=np.int64)
    for _ in range(iters):
        part = _TextRankPass((r, ow_safe))(edges_df)
        incoming = np.zeros(n, dtype=np.int64)
        np.add.at(incoming, part["dst_idx"].to_numpy(),
                  part["s"].to_numpy().astype(np.int64))
        r = base + (85 * incoming) // 100

    return pd.DataFrame({"term": terms.astype(str), "rank_ur": r})


def dup_cluster_best_survivors(edges, nodes, scores, node_col: str = "id",
                               score_col: str = "score",
                               buckets: int = 8,
                               broadcast_limit: int = 1_000_000):
    """Keep-BEST cluster dedup: one survivor per connected component —
    the member with the HIGHEST ``score_col`` (ties → smallest id) —
    as a Dataset of [node_col]. ``scores`` maps node_col → score_col.
    Adaptive score attach (the repo's dedup-apply convention): a score
    table under ``broadcast_limit`` ships once via ``ray.put`` and the
    argmax runs in the SAME co-locating pass as the cluster grouping;
    a corpus-sized table falls back to one bucket hash join first."""
    from .agg import map_buckets
    from .joins import _resolve_ref, bucket_hash_join

    labels = connected_components(edges, nodes, node_col=node_col,
                                  buckets=buckets)

    def best(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values([score_col, node_col],
                              ascending=[False, True], kind="mergesort")
                 .groupby("cluster_id", sort=False).head(1)[[node_col]])

    scores = scores.materialize()  # consumed by count + attach below
    n_scores = scores.count()
    if n_scores <= broadcast_limit:
        sdf = scores.to_pandas()
        ref = ray.put(dict(zip(sdf[node_col], sdf[score_col])))

        def best_bcast(g: pd.DataFrame) -> pd.DataFrame:
            lut = _resolve_ref(ref)
            g = g.copy()
            g[score_col] = g[node_col].map(lut)
            return best(g)

        return map_buckets(labels, "cluster_id", best_bcast,
                           buckets=buckets, small_limit=500_000)

    scored = bucket_hash_join(
        labels, scores, node_col, node_col, buckets=buckets)
    return map_buckets(scored, "cluster_id", best, buckets=buckets,
                       small_limit=500_000)
