"""Benchmark harness for the beats_ray engine.

Headline: the flagship parse→enrich→route pipeline (read transcript
parquet → fused parse chain → actor-pool enrich → route → per-sink
partitioned parquet write) over the corpus matching $GRAFT_SF_DIR.
Prints ONE JSON line on stdout:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": .., "num_cpus": N,
     "turns_per_sec": ...}

``--scaling``: runs the headline twice in fresh processes
(RAY_GRAFT_CPUS=8 then 32) and reports both throughputs + scaling
efficiency (north rule: ≥0.8 from N to 4N).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "route_counts",
    "flow_agg",
    "tpch_q1",
    "rate_limited_counts",
    "dedup_exact",
    "token_stats",
    "minhash_dedup",
    "ann_brute_topk",
]


def _consume(res) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data as rd

    import __ray_entry__ as entrymod
    from beats_ray.fixtures import ensure_transcripts, sf_from_dir
    from beats_ray.pipeline import build_dataset

    sf = sf_from_dir(SF_DIR)
    tr_dir = ensure_transcripts(sf)  # untimed (cached fixture synthesis)

    # warm the page cache so we measure compute+shuffle, not cold disk
    n_turns = rd.read_parquet(tr_dir).count()

    out_dir = f"/tmp/beats_ray_bench/out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.time()
    ds = rd.read_parquet(tr_dir)
    routed = build_dataset(ds, num_parts=16, enrich_concurrency=(1, max(2, NUM_CPUS // 4)))
    routed.write_parquet(out_dir, partition_cols=["sink"])
    headline = time.time() - t0

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        _consume(qs[name](SF_DIR))
        qtimes[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "end-to-end parse->enrich->route throughput (turns/sec)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    tps_lo, tps_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    eff = (tps_hi / tps_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency (8 -> 32 cpus)",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": tps_lo,
        "turns_per_sec_32": tps_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
