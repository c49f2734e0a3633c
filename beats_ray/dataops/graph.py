"""Iterative graph ops over pair Datasets — duplicate CLUSTERING.

Near-dup detection emits PAIRS (minhash/simhash/embedding joins); a
training-data pipeline then needs the transitive closure — "keep one
doc per duplicate CLUSTER", not "drop the larger of each pair" — which
is connected components over the pair graph.

Ray-Data-first shape: min-label propagation WITH label chasing
(pointer jumping). Every node starts labelled with its own id; each
round every node adopts ``min(own label, neighbour labels)`` and then
labels chase one hop through the label table (``lab <- lab[lab]``),
which collapses chains exponentially — O(log diameter) rounds instead
of O(diameter) (the Hash-to-Min / large-star family, Rastogi et al.
2013). All state lives in Datasets; each round is one candidate join,
one grouped min, one chase join and a scalar changed-count — no
adjacency ever materializes on the driver, so the dup graph can be
corpus-sized.
"""

from __future__ import annotations

import pandas as pd


def _int_join(left, right, lon: str, ron: str, buckets: int):
    """Lightweight inner join for ALL-INT64 frames (the CC loop's only
    shape): tag each side with ``key % buckets`` + a side marker, pad
    to the combined column set with int64 sentinels (schemas align
    without typed-null machinery), one co-locating groupby, pandas
    merge per bucket. ~5× less per-round fixed cost than the general
    ``bucket_hash_join`` — iterative algorithms pay the per-execution
    overhead every round, so the constant matters more than anywhere
    else in the engine."""

    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side, keycol, cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=df.index)
            for c in all_cols:
                out[c] = (df[c].astype("int64") if c in cols
                          else pd.array([0] * len(df), dtype="int64"))
            out["_side"] = pd.array([side] * len(df), dtype="int64")
            out["_b"] = (df[keycol].astype("int64") % buckets).astype("int64")
            return out

        return fn

    both = left.map_batches(
        tag(0, lon, lcols), batch_format="pandas"
    ).union(right.map_batches(tag(1, ron, rcols), batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_b"])
        l = g[g["_side"] == 0][lcols]
        r = g[g["_side"] == 1][rcols]
        out = l.merge(r, left_on=lon, right_on=ron)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return both.groupby("_b").map_groups(merge, batch_format="pandas")


def connected_components(edges, nodes, node_col: str = "id",
                         label_col: str = "cluster_id", buckets: int = 8,
                         max_iters: int = 40, verbose: bool = False):
    """Label every node with the MINIMUM node id reachable from it.

    ``edges``: Dataset with int columns (a, b) — undirected pairs.
    ``nodes``: Dataset with ``node_col`` — every node (isolated nodes
    keep their own id as the label). Returns a Dataset
    [node_col, label_col].
    """
    from .agg import map_buckets
    from .joins import coalesce_if_fragmented

    # labels(node, lab) — start: every node labels itself
    labels = nodes.map_batches(
        lambda df: pd.DataFrame(
            {"node": df[node_col].astype("int64"),
             "lab": df[node_col].astype("int64")}
        ),
        batch_format="pandas",
    ).materialize()
    # symmetrize once: candidates then need ONE join per round
    sym = coalesce_if_fragmented(edges.materialize(), 2 * buckets)
    sym = sym.map_batches(
        lambda df: pd.DataFrame(
            {"src": pd.concat([df["a"], df["b"]]).astype("int64").to_numpy(),
             "dst": pd.concat([df["b"], df["a"]]).astype("int64").to_numpy()}
        ),
        batch_format="pandas",
    ).materialize()

    import time as _time

    for _it in range(max_iters):
        _t0 = _time.perf_counter()
        # neighbour candidates: (dst, lab[src]) over the symmetric edges
        cand = _int_join(
            sym,
            labels.map_batches(
                lambda df: df.rename(columns={"node": "_n"}),
                batch_format="pandas",
            ),
            "src", "_n", buckets=buckets,
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"].astype("int64"),
                 "lab": df["lab"].astype("int64"),
                 "own": pd.array([0] * len(df), dtype="int64")}
            ),
            batch_format="pandas",
        ).materialize()
        # ^ materialized: ``labels`` must not feed two branches of ONE
        # plan (the cand join's probe side AND ``tagged`` below) — a
        # multi-branch read of the same materialized dataset inside a
        # single union plan can deadlock Ray's streaming executor
        tagged = labels.map_batches(
            lambda df: df.assign(own=pd.array([1] * len(df), dtype="int64")),
            batch_format="pandas",
        )

        # grouped min per node + per-row changed flag (own row carries
        # the previous label, so "changed" computes inside the bucket —
        # no extra join for the convergence check)
        def group_min(g: pd.DataFrame) -> pd.DataFrame:
            newlab = g.groupby("node")["lab"].min()
            old = g[g["own"] == 1].set_index("node")["lab"]
            old = old.reindex(newlab.index)
            return pd.DataFrame(
                {"node": newlab.index.astype("int64"),
                 "lab": newlab.astype("int64").to_numpy(),
                 "changed": (newlab.to_numpy()
                             < old.to_numpy()).astype("int64")}
            ).reset_index(drop=True)

        new_labels = map_buckets(
            tagged.union(cand), "node", group_min, buckets=buckets
        ).materialize()
        changed = new_labels.sum("changed") or 0

        # label chase (pointer jump): lab <- lab[lab]. Labels are node
        # ids and every node has a row, so the inner join is total.
        # SELF-join emitted in ONE pass (probe rows bucket by the
        # label they chase, build rows by their own node id) — a union
        # of two lazy branches over the same materialized dataset
        # deadlocks Ray's streaming executor on repeated execution.
        def chase_sides(df: pd.DataFrame) -> pd.DataFrame:
            node = df["node"].astype("int64").to_numpy()
            lab = df["lab"].astype("int64").to_numpy()
            import numpy as np

            return pd.DataFrame(
                {"node": np.concatenate([node, node]),
                 "lab": np.concatenate([lab, lab]),
                 "_side": np.repeat(
                     np.array([0, 1], dtype=np.int64), len(df)
                 ),
                 "_b": np.concatenate(
                     [lab % buckets, node % buckets]
                 ).astype("int64")}
            )

        def chase_merge(g: pd.DataFrame) -> pd.DataFrame:
            probe = g[g["_side"] == 0][["node", "lab"]]
            build = g[g["_side"] == 1][["node", "lab"]].rename(
                columns={"node": "_p", "lab": "_plab"}
            )
            out = probe.merge(build, left_on="lab", right_on="_p")
            return pd.DataFrame(
                {"node": out["node"].astype("int64"),
                 "lab": out["_plab"].astype("int64")}
            )

        labels = (
            new_labels.map_batches(chase_sides, batch_format="pandas")
            .groupby("_b")
            .map_groups(
                lambda g: chase_merge(g.drop(columns=["_b"])),
                batch_format="pandas",
            )
            .materialize()
        )
        # bound the block count: each round's sort outputs inherit and
        # COMPOUND upstream fragmentation (measured 80 → 176 → 368
        # blocks in 3 rounds at constant 500 rows, tripling round wall
        # each time) — an iterative op must re-coalesce per round
        if labels.num_blocks() > 2 * buckets:
            labels = labels.repartition(
                buckets, shuffle=False
            ).materialize()
        if verbose:
            print(f"[cc] round {_it}: changed={changed} "
                  f"rows={labels.count()} blocks={labels.num_blocks()} "
                  f"{_time.perf_counter() - _t0:.1f}s", flush=True)
        if changed == 0:
            break

    return labels.map_batches(
        lambda df: pd.DataFrame(
            {node_col: df["node"].astype("int64"),
             label_col: df["lab"].astype("int64")}
        ),
        batch_format="pandas",
    )


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
