"""Scale probes beyond the oracle corpus: dup-heavy dedup, hot-key
stateful replay, and 10x stateful-family runs.

Each probe prints one JSON line; results are recorded in BASELINE.md.
All fixtures are synthesized deterministically inside Ray tasks (no
driver-side corpus construction), so the probes measure the engine's
distribution shape, not fixture-generation overhead.

Usage:
    python tools/scale_probe.py dup_heavy hot_key families_10x
    python tools/scale_probe.py            # all probes
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import ray


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _base_ts() -> pd.Timestamp:
    return pd.Timestamp("2024-05-01 00:00:00")


# --------------------------------------------------------------- fixtures


def dup_heavy_docs(n_docs: int = 200_000, n_unique: int = 20_000):
    """90%-duplicate corpus: ``n_unique`` distinct 60-token texts, each
    appearing ``n_docs/n_unique`` times under distinct doc_ids spread
    across blocks (so the dedup shuffle actually moves rows)."""

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        group = ids % n_unique
        # group-prefixed tokens: zero vocabulary overlap across groups,
        # so cross-group Jaccard is exactly 0 and the true survivor
        # count is exactly n_unique
        texts = [
            " ".join(f"g{int(g)}w{j}" for j in range(60)) for g in group
        ]
        return pd.DataFrame({"doc_id": ids.astype("int64"), "text": texts})

    return ray.data.range(n_docs, override_num_blocks=64).map_batches(
        make, batch_format="pandas"
    )


def hot_key_events(n_events: int = 2_000_000, n_keys: int = 50_000,
                   hot_share: float = 0.10):
    """Event stream where ONE key owns ``hot_share`` of all events (a
    50x-hot conversation at web scale); the rest spread uniformly."""
    hot_every = int(1 / hot_share)

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        user = np.where(ids % hot_every == 0, 0, 1 + ids % (n_keys - 1))
        ts = _base_ts() + pd.to_timedelta(ids * 137, unit="ms")
        return pd.DataFrame(
            {"event_id": ids.astype("int64"), "user_id": user.astype("int64"),
             "ts": ts}
        )

    return ray.data.range(n_events, override_num_blocks=64).map_batches(
        make, batch_format="pandas"
    )


# ----------------------------------------------------------------- probes


def probe_dup_heavy() -> dict:
    """minhash_dedup on 200k docs / 90% dups with the driver broadcast
    DISABLED (broadcast_limit=0 forces the bucket_semi_join tail), so
    the drop-id/candidate-id sets stay in the object store. The driver
    max-RSS delta is the evidence that no O(dups) structure landed on
    the driver."""
    from beats_ray.dataops.dedup import exact_dedup, minhash_dedup

    docs = dup_heavy_docs().materialize()
    # CONTROL at the same scale: exact_dedup holds no id set on the
    # driver by construction, so its max-RSS delta is the Ray-framework
    # floor (task metadata, stats, block refs) that the minhash delta
    # must be read against
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    n_exact = exact_dedup(docs).count()
    exact_wall = time.perf_counter() - t0
    rss_control = _rss_mb() - rss0
    rss1 = _rss_mb()
    t0 = time.perf_counter()
    survivors = minhash_dedup(docs, threshold=0.7, broadcast_limit=0)
    n = survivors.count()
    wall = time.perf_counter() - t0
    return {
        "probe": "dup_heavy_minhash", "docs": 200_000, "dup_rate": 0.9,
        "survivors": int(n), "expected_survivors": 20_000,
        "wall_s": round(wall, 1),
        "driver_rss_delta_mb": round(_rss_mb() - rss1, 1),
        "control_exact_survivors": int(n_exact),
        "control_exact_wall_s": round(exact_wall, 1),
        "control_rss_delta_mb": round(rss_control, 1),
    }


def probe_hot_key() -> dict:
    """token_bucket_limit over 2M events with one 10%-hot key, with and
    without skew_aware bucket isolation; plus cache_put_get (asof-join
    shape) under the same skew."""
    from beats_ray.dataops.flows import token_bucket_limit
    from beats_ray.dataops.kvcache import cache_put_get

    ev = hot_key_events().materialize()
    out = {"probe": "hot_key", "events": 2_000_000, "hot_share": 0.10}
    for label, skew in (("plain", False), ("skew_aware", True)):
        t0 = time.perf_counter()
        kept = token_bucket_limit(
            ev, key="user_id", limit_n=1, per_s=2, burst=5,
            buckets=32, skew_aware=skew,
        ).count()
        out[f"token_bucket_{label}_s"] = round(time.perf_counter() - t0, 1)
        out[f"token_bucket_{label}_kept"] = int(kept)

    def to_ops(df: pd.DataFrame) -> pd.DataFrame:
        op = np.where(df["event_id"] % 3 == 0, "put",
                      np.where(df["event_id"] % 3 == 1, "get", "delete"))
        return pd.DataFrame(
            {"k": df["user_id"].astype(str), "ts": df["ts"], "op": op,
             "v": df["event_id"]}
        )

    ops = ev.map_batches(to_ops, batch_format="pandas")
    t0 = time.perf_counter()
    hits = cache_put_get(ops, ttl_s=3600).count()
    out["cache_replay_s"] = round(time.perf_counter() - t0, 1)
    out["cache_gets"] = int(hits)
    return out


def probe_families_10x() -> dict:
    """Round-2 stateful families at 10x the bench corpus (2M events vs
    sf0.1's ~200k): token bucket, cache replay, dns cache, sequence
    packing — the ops whose per-key replay is inherently sequential and
    whose scale story is the bucket fan-out."""
    from beats_ray.dataops.dnscache import dns_cache_replay
    from beats_ray.dataops.sampling import pack_sequences

    ev = hot_key_events(n_events=2_000_000, hot_share=1e-7).materialize()
    out = {"probe": "families_10x", "events": 2_000_000}

    def to_dns(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_id": df["event_id"], "ts": df["ts"],
             "query": "host-" + (df["user_id"] % 1000).astype(str) + ".example"}
        )

    zone = {f"host-{i}.example": f"10.0.{i // 256}.{i % 256}"
            for i in range(800)}
    t0 = time.perf_counter()
    n = dns_cache_replay(
        ev.map_batches(to_dns, batch_format="pandas"),
        resolutions=zone, success_ttl_s=600, failure_ttl_s=120,
    ).count()
    out["dns_cache_s"] = round(time.perf_counter() - t0, 1)
    out["dns_rows"] = int(n)

    # pack 500k docs (10x the documents table) into 2048-token budgets
    def to_docs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy()
        n = 37 + (ids * 7919) % 400
        return pd.DataFrame(
            {"doc_id": ids.astype("int64"),
             "text": ["t " * int(k) for k in n]}
        )

    docs = ray.data.range(500_000, override_num_blocks=32).map_batches(
        to_docs, batch_format="pandas"
    )
    t0 = time.perf_counter()
    packed = pack_sequences(docs, budget=2048).count()
    out["pack_500k_s"] = round(time.perf_counter() - t0, 1)
    out["pack_sequences"] = int(packed)
    return out


def probe_tb_state() -> dict:
    """Cross-window token-bucket state carry at millions of IN-FLIGHT
    keys, fully distributed: window 1 emits a ~4M-key state Dataset
    (every key mid-refill), persists it as a sharded parquet directory
    (the streaming runner's path), window 2 seeds from it via the
    bucket-join. The driver max-RSS delta vs the no-state control run
    is the evidence that no keys-proportional dict/DataFrame ever
    lands on the driver (the round-3 carry did exactly that)."""
    import shutil
    import tempfile

    from beats_ray.dataops.flows import token_bucket_limit

    n = 4_000_000
    # ~4M distinct keys, one event each per window; refill horizon 1e6 s
    # >> the corpus span, so every key stays mid-refill (in flight)
    ev = hot_key_events(n_events=n, n_keys=n, hot_share=1e-9).materialize()
    kw = dict(key="user_id", limit_n=1, per_s=1_000_000, burst=1,
              order_col="event_id")
    # horizon 7 days: past the corpus span (137 ms spacing x 4M events
    # ~= 6.3 days of event time) but inside the ~11.6-day full-refill
    # time, so every key is still in flight at the horizon
    hi_us = int((_base_ts() + pd.Timedelta(days=7)).timestamp() * 1e6)

    # CONTROL: same replay, no state carry — the framework RSS floor
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    n_ctl = token_bucket_limit(ev, **kw).count()
    ctl_wall = time.perf_counter() - t0
    rss_control = _rss_mb() - rss0

    state_dir = tempfile.mkdtemp(prefix="tb_state_probe_")
    rss1 = _rss_mb()
    t0 = time.perf_counter()
    st = token_bucket_limit(ev, emit_state=True, gc_horizon_us=hi_us, **kw)
    st.write_parquet(state_dir)
    st2 = ray.data.read_parquet(state_dir)
    n_keys_carried = st2.count()
    # window 2: seed the replay from the persisted state (bucket-join)
    n_w2 = token_bucket_limit(ev, initial_state=st2, **kw).count()
    wall = time.perf_counter() - t0
    rss_delta = _rss_mb() - rss1
    shutil.rmtree(state_dir, ignore_errors=True)
    return {
        "probe": "tb_state_carry", "events": n,
        "keys_in_flight": int(n_keys_carried),
        "window1_allowed": int(n_ctl), "window2_allowed": int(n_w2),
        "wall_s": round(wall, 1), "control_wall_s": round(ctl_wall, 1),
        "driver_rss_delta_mb": round(rss_delta, 1),
        "control_rss_delta_mb": round(rss_control, 1),
    }


def _chain_corpus(in_dir: str, n_win: int, rows_per: int) -> list[str]:
    """One parquet file per hourly window: transcript-schema rows whose
    conv_ids repeat across windows (so dedup + token_bucket state stays
    hot) plus per-window fresh ids (so each window writes something)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _base_ts()
    files = []
    for w in range(n_win):
        idx = np.arange(rows_per)
        # half the keys recur every window (in-flight state), half are new
        conv = np.where(
            idx % 2 == 0,
            np.char.add("hot-", (idx % 400).astype(str)),
            np.char.add(f"w{w}-", idx.astype(str)),
        )
        ts = (
            base
            + pd.Timedelta(hours=w)
            + pd.to_timedelta(idx * (3_600_000_000 // rows_per), unit="us")
        )
        t = pa.table({
            "conv_id": pa.array(conv.tolist(), pa.string()),
            "turn_idx": pa.array(idx.astype("int32")),
            "role": pa.array(["user"] * rows_per),
            "text": pa.array(
                [f"level=info ts=x tool=bash status=ok msg=\"m{i}\""
                 for i in idx]
            ),
            "tool": pa.array(["bash"] * rows_per),
            "ts": pa.array(ts, pa.timestamp("us")),
        })
        f = os.path.join(in_dir, f"hour-{w:03d}.parquet")
        pq.write_table(t, f)
        files.append(f)
    return files


def probe_stream_long_chain() -> dict:
    """~100-window streaming chain with token_bucket + dedup stages:
    per-window overhead must stay FLAT (no state-chain slowdown — the
    per-window cost of window 80-100 matches window 0-20) and the state
    directory must stay GC-BOUNDED (only the last two windows' state
    dirs exist at the end, never one per processed window)."""
    import glob as _glob
    import tempfile

    from beats_ray.stream import MicroBatchRunner

    n_win = int(os.environ.get("PROBE_WINDOWS", "100"))
    rows_per = 2000
    in_dir = tempfile.mkdtemp(prefix="stream_chain_in_")
    files = _chain_corpus(in_dir, n_win, rows_per)
    cfg = {
        "processors": [],
        "stages": [
            {"token_bucket": {"key": "conv_id", "limit_n": 5,
                              "per_s": 3600, "burst": 5, "buckets": 8}},
            {"dedup": {"field": "conv_id", "ttl_s": 3 * 3600,
                       "buckets": 8}},
        ],
        "routes": [{"name": "default"}],
    }
    out = tempfile.mkdtemp(prefix="stream_chain_")
    t0 = time.perf_counter()
    totals = MicroBatchRunner(out, window_s=3600).run(files, config=cfg)
    wall = time.perf_counter() - t0

    lineage = Path(out) / "_stream_lineage"
    # per-window walls from the lineage records the runner now writes
    walls = [
        json.loads(f.read_text()).get("wall_s", 0.0)
        for f in sorted(lineage.glob("window-*.json"))
    ]
    k = max(5, len(walls) // 10)
    head = sum(walls[1 : 1 + k]) / k  # skip window 0 (session warmup)
    tail = sum(walls[-k:]) / k
    state_dirs = sorted(
        p.name for p in lineage.iterdir() if p.name.startswith("state-w")
    )
    state_mb = sum(
        os.path.getsize(f)
        for d in state_dirs
        for f in _glob.glob(str(lineage / d / "*.parquet"))
    ) / 1e6
    import shutil as _sh

    for d in (in_dir, out):
        _sh.rmtree(d, ignore_errors=True)
    return {
        "probe": "stream_long_chain", "windows": n_win,
        "rows_per_window": rows_per,
        "rows_routed": int(sum(totals["rows_routed"].values())),
        "wall_s": round(wall, 1),
        "per_window_s_head": round(head, 2),
        "per_window_s_tail": round(tail, 2),
        # flat = the last windows cost what the first ones did: no
        # state-chain or fragmentation growth across the run
        "overhead_flat": bool(tail <= head * 1.3 + 0.5),
        "state_dirs_at_end": state_dirs,
        "state_dirs_gc_bounded": bool(
            len(state_dirs) <= 2 * len(cfg["stages"]) + 2
        ),
        "state_mb_at_end": round(state_mb, 2),
    }


def _hash_uniform(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-uniform in [-1, 1) from integer (i, j) —
    counter-based, so the corpus is identical regardless of how Ray
    blocks the id range."""
    x = (i.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
         + j.astype(np.uint64)[None, :] * np.uint64(0xC2B2AE3D27D4EB4F))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / 2**52 - 1.0


def ann_corpus(n: int = 50_000, dim: int = 64, n_true_clusters: int = 32):
    """Clustered embedding corpus (centroid + noise), synthesized
    inside Ray tasks — IVF/LSH recall on uniform data is meaningless;
    real embedding spaces are clustered."""
    import ray.data as rd

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        j = np.arange(dim)
        cents = _hash_uniform(ids % n_true_clusters + 1_000_000, j)
        noise = _hash_uniform(ids, j) * 0.35
        emb = cents + noise
        return pd.DataFrame(
            {"vec_id": ids.astype("int64"),
             "embedding": list(emb.astype(np.float32))}
        )

    return rd.range(n).map_batches(make, batch_format="pandas")


def probe_ann_recall() -> dict:
    """Recall@10 vs wall-clock for IVF and multi-probe LSH as n_probe
    varies, at 10× the oracle corpus (50k × 64d, 32 queries), against
    brute-force ground truth. Full probe must hit recall 1.0 (the
    provable identity); the curve between is the user's
    accuracy/latency lever. Recorded in BASELINE.md."""
    from beats_ray.dataops.ann import brute_topk, ivf_topk, lsh_topk

    n, dim, k = 50_000, 64, 10
    ds = ann_corpus(n, dim).materialize()
    # queries: perturbed members of the corpus (realistic near-dup ask)
    qids = np.arange(32) * (n // 32)
    j = np.arange(dim)
    queries = (_hash_uniform(qids % 32 + 1_000_000, j)
               + _hash_uniform(qids, j) * 0.35
               + _hash_uniform(qids + 7_777_777, j) * 0.05)

    t0 = time.time()
    exact = brute_topk(ds, queries, k=k)
    brute_wall = round(time.time() - t0, 2)
    truth = {
        qi: set(exact[exact["query_id"] == qi]["vec_id"])
        for qi in range(len(qids))
    }

    def recall(approx: pd.DataFrame) -> float:
        rs = [
            len(truth[qi] & set(approx[approx["query_id"] == qi]["vec_id"]))
            / max(len(truth[qi]), 1)
            for qi in range(len(qids))
        ]
        return round(float(np.mean(rs)), 3)

    ivf_rows = []
    for n_probe in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        res = ivf_topk(ds, queries, k=k, n_clusters=32, n_probe=n_probe,
                       sample_n=4096)
        ivf_rows.append({"n_probe": n_probe, "recall": recall(res),
                         "wall_s": round(time.time() - t0, 2)})
    lsh_rows = []
    for n_probe in (1, 4, 16, 64, 256):
        t0 = time.time()
        res = lsh_topk(ds, queries, k=k, n_planes=8, n_probe=n_probe)
        lsh_rows.append({"n_probe": n_probe, "recall": recall(res),
                         "wall_s": round(time.time() - t0, 2)})
    from beats_ray.dataops.ann import pq_topk

    pq_rows = []
    for rerank in (50, 200, 1000, 1 << 30):
        t0 = time.time()
        res = pq_topk(ds, queries, k=k, n_sub=8, n_codes=32, rerank=rerank,
                      sample_n=4096)
        pq_rows.append({"rerank": min(rerank, n), "recall": recall(res),
                        "wall_s": round(time.time() - t0, 2)})
    return {
        "probe": "ann_recall", "n_vectors": n, "dim": dim, "k": k,
        "n_queries": len(qids), "brute_wall_s": brute_wall,
        "ivf_n_clusters_32": ivf_rows, "lsh_n_planes_8": lsh_rows,
        "pq_8sub_32codes": pq_rows,
        "full_probe_exact": bool(
            ivf_rows[-1]["recall"] == 1.0 and lsh_rows[-1]["recall"] == 1.0
            and pq_rows[-1]["recall"] == 1.0
        ),
    }


def probe_cc_scale() -> dict:
    """Connected components at 200× the oracle graph (100k nodes, 80k
    random edges + a 1k-node chain for pointer-jumping depth):
    wall-clock and correctness invariants for the BSP actor-pool
    rewrite. The round-4 Dataset-loop implementation paid ~7 s/round of
    fixed executor cost regardless of graph size; the BSP rounds are
    object-store exchanges, so wall should track data, not rounds ×
    executor setup."""
    import ray.data as rd

    from beats_ray.dataops.graph import connected_components

    n = 100_000
    rng = np.random.RandomState(3)

    def mk_edges(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        r = np.random.RandomState(int(ids.min()) % 2**31)
        return pd.DataFrame({
            "a": r.randint(0, n, size=len(ids)).astype("int64"),
            "b": r.randint(0, n, size=len(ids)).astype("int64"),
        })

    edges = rd.range(80_000).map_batches(mk_edges, batch_format="pandas")
    chain = rd.from_pandas(pd.DataFrame({
        "a": np.arange(1000, dtype=np.int64) * 91 % n,
        "b": np.arange(1, 1001, dtype=np.int64) * 91 % n,
    }))
    nodes = rd.range(n).map_batches(
        lambda df: pd.DataFrame({"id": df["id"].astype("int64")}),
        batch_format="pandas",
    )
    t0 = time.time()
    labels = connected_components(
        edges.union(chain), nodes, buckets=16, small_limit=0,  # BSP path
    ).to_pandas()
    wall = time.time() - t0
    assert len(labels) == n
    # invariants: every label ≤ its node id, labels are component mins
    ok_min = bool((labels["cluster_id"] <= labels["id"]).all())
    n_clusters = int(labels["cluster_id"].nunique())
    return {
        "probe": "cc_scale", "n_nodes": n, "n_edges": 81_000,
        "wall_s": round(wall, 1), "n_clusters": n_clusters,
        "labels_are_minima": ok_min,
        "rss_mb": round(_rss_mb(), 1),
    }


def probe_socket_wal() -> dict:
    """Durable-ingestion cost: TCP listener throughput with and
    without the write-ahead log (100k messages, one sender, loopback).
    The WAL's append is buffered through the OS file cache, so the
    expected tax is one write syscall per message — this probe pins
    the actual number."""
    import shutil
    import socket as _socket
    import tempfile
    import time as _time

    from beats_ray.sources.sockets import SocketListener

    n_msgs = 100_000
    payload = b"".join(
        b"msg-%06d some log line payload here\n" % i for i in range(n_msgs)
    )
    out = {"probe": "socket_wal", "n_msgs": n_msgs}
    for label, wal_dir in [("plain", None),
                           ("wal", tempfile.mkdtemp(prefix="walprobe"))]:
        lis = SocketListener.remote(proto="tcp", wal_dir=wal_dir)
        addr = ray.get(lis.address.remote())
        t0 = _time.perf_counter()
        s = _socket.create_connection(addr)
        s.sendall(payload)
        s.close()
        while ray.get(lis.pending.remote()) < n_msgs:
            _time.sleep(0.02)
        wall = _time.perf_counter() - t0
        out[f"{label}_msgs_per_s"] = round(n_msgs / wall)
        ray.get(lis.close.remote())
        ray.kill(lis)
        if wal_dir:
            shutil.rmtree(wal_dir, ignore_errors=True)
    out["wal_tax"] = round(
        1 - out["wal_msgs_per_s"] / out["plain_msgs_per_s"], 3
    )
    return out


def probe_tailer() -> dict:
    """File-tail throughput: 8 files × 250k appended lines (~2 GB/h
    equivalent per poll), one poll cycle → lines/s end-to-end (stat →
    range reads → decode → line chain → offsets extracted)."""
    import shutil
    import tempfile
    import time as _time

    from beats_ray.sources.tailer import FileTailer

    root = tempfile.mkdtemp(prefix="tailprobe")
    n_files, n_lines = 8, 250_000
    line = b"2024-05-01T00:00:00Z host app[1]: request handled in 12ms\n"
    for i in range(n_files):
        with open(f"{root}/f{i}.log", "wb") as f:
            f.write(line * n_lines)
    t = FileTailer(f"{root}/f*.log", f"{root}/state")
    t0 = _time.perf_counter()
    n = t.poll().count()
    wall = _time.perf_counter() - t0
    t.commit()
    # second poll must be metadata-only (nothing appended)
    t0 = _time.perf_counter()
    n2 = t.poll().count()
    idle = _time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    return {
        "probe": "tailer", "files": n_files, "lines": n,
        "lines_per_s": round(n / wall), "idle_poll_s": round(idle, 3),
        "idle_rows": n2,
    }


def probe_boilerplate() -> dict:
    """remove_boilerplate_lines on 500k docs x 4 lines where 200 banner
    lines each appear in ~2.5k docs (every banner is boilerplate at
    min_docs=20) and body lines are doc-unique. Construction makes the
    exact removal total 2 * n_docs, so both apply paths are verified
    against a closed-form answer at 10x the bench corpus; driver RSS
    deltas evidence that neither path lands anything doc-sized on the
    driver (the broadcast set is 200 hashes)."""
    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    n_docs = 500_000

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        texts = [
            f"BANNER {int(i) % 200}\nbody {int(i)} a\nbody {int(i)} b"
            f"\nBANNER {(int(i) * 7) % 200}"
            for i in ids
        ]
        return pd.DataFrame({"doc_id": ids.astype("int64"), "text": texts})

    docs = ray.data.range(n_docs, override_num_blocks=64).map_batches(
        make, batch_format="pandas"
    ).materialize()
    out = {"probe": "boilerplate", "docs": n_docs,
           "expected_removed": 2 * n_docs}
    for label, limit in (("broadcast", 100_000), ("distributed", 0)):
        rss0 = _rss_mb()
        t0 = time.perf_counter()
        cleaned = remove_boilerplate_lines(
            docs, keys=("doc_id",), id_col="doc_id", min_docs=20,
            broadcast_limit=limit,
        )
        removed = cleaned.sum("n_removed")
        out[f"{label}_removed"] = int(removed)
        out[f"{label}_wall_s"] = round(time.perf_counter() - t0, 1)
        out[f"{label}_rss_delta_mb"] = round(_rss_mb() - rss0, 1)
    return out


def probe_lm_ops_500k() -> dict:
    """The round-5 LM/text tier at 500k docs (~30M tokens): unigram-LM
    scoring, DSIR weights, BPE fit+apply, and global line dedup. Each
    fit's driver state is bounded by construction (top-k vocab / 1024
    hash buckets / merge list / nothing); the driver max-RSS delta per
    op is the evidence, read against the probe's own corpus-build
    floor. Synthesis happens inside Ray tasks."""
    n_docs, n_vocab = 500_000, 30_000

    def make(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        out = []
        for i in ids:
            r = np.random.RandomState(int(i) % 2**31)
            words = [f"w{v}" for v in r.zipf(1.5, 60) % n_vocab]
            # a shared banner line + a unique body line per doc
            out.append("shared banner line\n" + " ".join(words))
        return pd.DataFrame({
            "doc_id": ids.astype("int64"),
            "conv_id": (ids % 9973).astype("int64"),
            "turn_idx": ids.astype("int64"),
            "lang": np.where(ids % 3 == 0, "en", "de"),
            "text": out,
        })

    import ray.data as rd

    from beats_ray.dataops.bpe import bpe_token_counts, fit_bpe
    from beats_ray.dataops.lm import dsir_weights, unigram_nll
    from beats_ray.dataops.textnorm import dedup_lines_global

    docs = rd.range(n_docs, override_num_blocks=64).map_batches(
        make, batch_format="pandas").materialize()
    out: dict = {"probe": "lm_ops_500k", "docs": n_docs}

    for label, run in [
        ("unigram_nll", lambda: unigram_nll(docs, model_k=10_000)
            .sum("nll_sum")),
        ("dsir", lambda: dsir_weights(docs).sum("dsir_um")),
        ("bpe", lambda: bpe_token_counts(
            docs, fit_bpe(docs, n_merges=20, vocab_k=10_000))
            .sum("n_bpe_tokens")),
        ("line_dedup", lambda: dedup_lines_global(
            docs, keys=("conv_id", "turn_idx")).sum("n_dropped")),
    ]:
        rss0 = _rss_mb()
        t0 = time.perf_counter()
        agg = run()
        out[f"{label}_agg"] = int(agg or 0)
        out[f"{label}_wall_s"] = round(time.perf_counter() - t0, 1)
        out[f"{label}_rss_delta_mb"] = round(_rss_mb() - rss0, 1)
    # invariant: the shared banner appears in every doc; global line
    # dedup must drop it everywhere but its first occurrence
    assert out["line_dedup_agg"] == n_docs - 1, out["line_dedup_agg"]
    return out


def probe_kmeans_500k() -> dict:
    """Distributed k-means at 500k x 32d: wall + driver RSS delta per
    Lloyd iteration count. Driver state is k x dims int64s by
    construction; the probe asserts the planted 8-cluster structure is
    recovered and RSS stays at the framework floor."""
    from beats_ray.dataops.ann import kmeans_clusters

    n, dim, k = 500_000, 32, 8
    corpus = ann_corpus(n=n, dim=dim, n_true_clusters=k).materialize()
    out = {"probe": "kmeans_500k", "n": n, "dim": dim, "k": k}
    rss0 = _rss_mb()
    t0 = time.time()
    got = kmeans_clusters(corpus, k=k, iters=3)
    n_out = got.count()
    out["wall_s"] = round(time.time() - t0, 1)
    out["driver_rss_delta_mb"] = round(_rss_mb() - rss0, 1)
    out["rows"] = n_out
    assert n_out == n
    # planted structure: vectors sharing id % k should co-cluster --
    # sample one block and check purity is high (seeding is id-rank,
    # which lands one seed per planted cluster because ids interleave)
    samp = got.limit(20_000).to_pandas()
    true = samp["vec_id"].to_numpy() % k
    purity = (pd.crosstab(true, samp["cluster"]).max(axis=1).sum()
              / len(samp))
    out["sample_purity"] = round(float(purity), 4)
    assert purity > 0.95, purity
    return out


def probe_pca_rp_500k() -> dict:
    """PCA top-component + JL projection at 500k × 32d: wall + driver
    RSS delta. PCA fit state is dims² Python ints (the Gram) however
    large the corpus; scoring and the RP pass are shuffle-free. The
    probe asserts the projection recovers the planted dominant
    direction (|proj| correlates with the planted cluster axis norm —
    here simply that output is full-size and driver RSS stays flat)."""
    from beats_ray.dataops.ann import pca_top_component, random_projection

    n, dim = 500_000, 32
    corpus = ann_corpus(n=n, dim=dim, n_true_clusters=8).materialize()
    out = {"probe": "pca_rp_500k", "n": n, "dim": dim}
    rss0 = _rss_mb()
    t0 = time.time()
    proj = pca_top_component(corpus, iters=3)
    n_pca = proj.count()
    out["pca_wall_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    rp = random_projection(corpus, k=8)
    n_rp = rp.count()
    out["rp_wall_s"] = round(time.time() - t0, 1)
    out["driver_rss_delta_mb"] = round(_rss_mb() - rss0, 1)
    out["pca_rows"], out["rp_rows"] = n_pca, n_rp
    assert n_pca == n and n_rp == n * 8
    return out


def probe_shards_5m() -> dict:
    """Equal-size shuffle-sharding at 5M rows / 16 shards: wall +
    driver RSS delta. Exercises the batched rank-select boundary
    resolve (15 boundary bins fetched in grouped passes) and asserts
    the exact size bound (max-min <= 1) the distributed ntile
    guarantees."""
    import ray.data as rd

    from beats_ray.dataops.sampling import shuffle_shards

    n = 5_000_000
    ids = rd.range(n).map_batches(
        lambda df: pd.DataFrame({"doc_id": df["id"].astype("int64")}),
        batch_format="pandas").materialize()
    out = {"probe": "shards_5m", "n": n, "shards": 16}
    rss0 = _rss_mb()
    t0 = time.time()
    shards = shuffle_shards(ids, 16).materialize()
    out["wall_s"] = round(time.time() - t0, 1)
    out["driver_rss_delta_mb"] = round(_rss_mb() - rss0, 1)
    # size check via driver-merged per-block bincounts (16 cells/block)
    # so the probe's verification doesn't pay a sort shuffle the op
    # itself avoids
    sizes = np.zeros(16, dtype=np.int64)
    parts = shards.map_batches(
        lambda df: pd.DataFrame({
            "s": np.arange(16, dtype=np.int64),
            "c": np.bincount(df["shard"], minlength=16).astype(np.int64),
        }), batch_format="pandas")
    for p in parts.iter_batches(batch_format="pandas"):
        np.add.at(sizes, p["s"].to_numpy(), p["c"].to_numpy())
    out["size_spread"] = int(sizes.max() - sizes.min())
    out["n_shards_seen"] = int((sizes > 0).sum())
    assert out["n_shards_seen"] == 16
    assert out["size_spread"] <= 1, sizes.tolist()
    assert int(sizes.sum()) == n
    return out


PROBES = {
    "dup_heavy": probe_dup_heavy,
    "hot_key": probe_hot_key,
    "families_10x": probe_families_10x,
    "tb_state": probe_tb_state,
    "stream_long_chain": probe_stream_long_chain,
    "ann_recall": probe_ann_recall,
    "cc_scale": probe_cc_scale,
    "socket_wal": probe_socket_wal,
    "tailer": probe_tailer,
    "boilerplate": probe_boilerplate,
    "lm_ops_500k": probe_lm_ops_500k,
    "kmeans_500k": probe_kmeans_500k,
    "shards_5m": probe_shards_5m,
    "pca_rp_500k": probe_pca_rp_500k,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    for name in names:
        print(json.dumps(PROBES[name]()), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
