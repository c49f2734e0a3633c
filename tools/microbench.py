"""Per-operator micro-benchmarks — the engine's counterpart to the
reference's go-bench surface (BenchmarkDissect dissect_test.go:186-303,
BenchmarkEncoderReader readfile/bench_test.go:34-71, conditions
benchmarks). Single-core, no Ray: isolates kernel throughput from
executor overhead. Prints one JSON line (rows/sec per op).

Usage: python tools/microbench.py [n_rows]
"""

import json
import sys
import time

import pyarrow as pa


def bench(fn, arg, iters=3):
    fn(arg)  # warm
    t0 = time.time()
    for _ in range(iters):
        fn(arg)
    return (time.time() - t0) / iters


def main(n_rows: int = 200_000):
    sys.path.insert(0, "/root/repo")
    from beats_ray.fixtures import build_transcripts
    from beats_ray.processors import build_processor
    from beats_ray.conditions import compile_condition
    from beats_ray.pipeline import FLAGSHIP_TOKENIZER, ParseStage, RouteStage
    from beats_ray.enrich import enrich_batch
    from beats_ray.sources.readers import line_reader_chain  # noqa: F401

    tbl = build_transcripts(0.05).slice(0, n_rows)
    n = tbl.num_rows

    ops = {
        "dissect": build_processor(
            {"dissect": {"tokenizer": FLAGSHIP_TOKENIZER, "ignore_failure": True}}
        ),
        "decode_json_fields": build_processor(
            {"decode_json_fields": {"fields": ["text"], "add_error_key": True}}
        ),
        "syslog_auto": build_processor({"syslog": {"format": "auto"}}),
        "multiline_stats": build_processor({"multiline_stats": {}}),
        "fingerprint_sha256": build_processor(
            {"fingerprint": {"fields": ["conv_id", "turn_idx", "text"]}}
        ),
        "replace_regex": build_processor(
            {"replace": {"fields": [{"field": "text", "pattern": r"\d+",
                                     "replacement": "N"}]}}
        ),
        "truncate_fields": build_processor(
            {"truncate_fields": {"fields": ["text"], "max_characters": 40}}
        ),
        "enrich_lookup": lambda t: enrich_batch(t),
        "parse_stage_fused": ParseStage(),
        "route_stage": None,  # needs parsed input; set below
    }
    cond = compile_condition(
        {"and": [{"regexp": {"text": "level=error|<\\d+>"}},
                 {"not": {"equals": {"role": "system"}}}]}
    )
    ops["condition_eval"] = lambda t: cond(t)

    parsed = ParseStage()(tbl)
    ops["route_stage"] = RouteStage(num_parts=16)

    out = {"n_rows": n, "rows_per_sec": {}}
    for name, fn in ops.items():
        arg = parsed if name == "route_stage" else tbl
        dt = bench(fn, arg)
        out["rows_per_sec"][name] = round(n / dt)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
