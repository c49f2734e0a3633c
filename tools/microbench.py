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

    # ---- round-2 kernels (their own row counts; rows/sec comparable) ----
    import numpy as np
    import pandas as pd

    from beats_ray.dataops.codecs import decode_png, decode_wav, encode_png, encode_wav
    from beats_ray.dataops.dedup import SimHasher, _minhash_batch
    from beats_ray.dataops.flows import token_bucket_limit  # noqa: F401 (shape below)

    docs = pd.DataFrame(
        {
            "doc_id": range(5000),
            "text": [
                " ".join(f"w{(i * 7 + j) % 97}" for j in range(40))
                for i in range(5000)
            ],
        }
    )
    sh = SimHasher()
    dt = bench(lambda d: [sh.simhash(t) for t in d["text"]], docs)
    out["rows_per_sec"]["simhash_64bit"] = round(len(docs) / dt)
    dt = bench(
        lambda d: _minhash_batch(d, num_perm=64, bands=16, shingle_k=3), docs
    )
    out["rows_per_sec"]["minhash_signature"] = round(len(docs) / dt)

    png = encode_png(np.arange(64 * 48, dtype=np.uint8).reshape(48, 64) % 256)
    dt = bench(lambda p: [decode_png(p) for _ in range(100)], png)
    out["rows_per_sec"]["png_decode_64x48"] = round(100 / dt)
    wav = encode_wav((np.arange(16000) % 2048 - 1024).astype(np.int16))
    dt = bench(lambda p: [decode_wav(p) for _ in range(200)], wav)
    out["rows_per_sec"]["wav_decode_1s"] = round(200 / dt)

    # token-bucket replay throughput (pure recurrence, single key)
    tus = np.cumsum(np.full(100_000, 250_000, dtype=np.int64))

    def replay(tus_arr):
        unit = 1_000_000
        cap = 2 * unit
        tok, last = cap, tus_arr[0]
        kept = 0
        for t in tus_arr:
            tok = min(cap, tok + (t - last))
            last = t
            if tok >= unit:
                kept += 1
                tok -= unit
        return kept

    dt = bench(replay, tus)
    out["rows_per_sec"]["token_bucket_replay"] = round(len(tus) / dt)

    # keyed-shuffle bucket hash (round-4 vectorized FNV): repeat-heavy
    # conv_id batch, the hash every keyed shuffle pays per block
    import pyarrow as pa

    from beats_ray.fixtures import fnv1a32_bucket

    uniq = [f"conv-{i:07d}" for i in range(6000)]
    rng = np.random.RandomState(0)
    keys = pa.array([uniq[i] for i in rng.randint(0, 6000, 100_000)])
    dt = bench(lambda k: fnv1a32_bucket(k, 32), keys)
    out["rows_per_sec"]["hash_bucket_fnv"] = round(len(keys) / dt)

    # jaccard verify kernel (round-4: Arrow parse + searchsorted merge)
    from beats_ray.dataops.dedup import word_shingles

    toks = [
        ",".join(map(str, sorted(word_shingles(
            " ".join(f"g{i % 50}w{j}" for j in range(60)), 3))))
        for i in range(2000)
    ]
    import pandas as pd

    pairs = pd.DataFrame({
        "a": np.arange(2000), "b": np.arange(2000) + 10_000,
        "toks_a": toks, "toks_b": toks[1:] + toks[:1],
    })

    def jac(df):
        import pyarrow.compute as pc

        def explode(ser):
            arr = pa.Array.from_pandas(ser.astype("string"))
            lst = pc.cast(pc.split_pattern(arr, ","), pa.list_(pa.int64()))
            lens = pc.list_value_length(lst).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            return (pc.list_flatten(lst).to_numpy(), lens,
                    np.repeat(np.arange(len(ser)), lens))

        ta, la, ra = explode(df["toks_a"])
        tb, lb, rb = explode(df["toks_b"])
        ka = (ra.astype(np.uint64) << np.uint64(32)) | ta.astype(np.uint64)
        kb = (rb.astype(np.uint64) << np.uint64(32)) | tb.astype(np.uint64)
        idx = np.searchsorted(kb, ka)
        m = idx < len(kb)
        m[m] = kb[idx[m]] == ka[m]
        return np.bincount(ra[m], minlength=len(df))

    dt = bench(jac, pairs)
    out["rows_per_sec"]["jaccard_verify_pairs"] = round(len(pairs) / dt)

    # round-5 byte-level text kernels (bytekernels.py — raw Arrow
    # buffer numpy; BASELINE.md "text-kernel vectorization" table)
    from beats_ray.dataops.textstats import LangId, TokenStats

    docs = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": tbl["text"]}
    )
    dt = bench(TokenStats(), docs)
    out["rows_per_sec"]["token_stats_stage"] = round(n / dt)
    dt = bench(LangId(), docs)
    out["rows_per_sec"]["lang_id_stage"] = round(n / dt)

    # round-5 compressed codecs (codecs.py)
    from beats_ray.dataops.codecs import (
        decode_avi,
        decode_wav,
        encode_avi,
        encode_wav_adpcm,
        g711_wav_from_codes,
    )

    sec = 8000  # one second of 8 kHz telephony audio per file
    codes = ((np.arange(sec) * 13) % 256).astype(np.uint8)
    g711_files = [g711_wav_from_codes(codes, 8000, "mulaw")
                  for _ in range(200)]
    dt = bench(lambda fs: [decode_wav(f) for f in fs], g711_files)
    out["rows_per_sec"]["g711_decode_1s_files"] = round(len(g711_files) / dt)

    samples = (3000 * np.sin(np.arange(sec) / 3.0)).astype(np.int16)
    adpcm_files = [encode_wav_adpcm(samples, 8000) for _ in range(200)]
    dt = bench(lambda fs: [decode_wav(f) for f in fs], adpcm_files)
    out["rows_per_sec"]["adpcm_decode_1s_files"] = round(len(adpcm_files) / dt)

    fr = (np.arange(8 * 48 * 64) % 256).astype(np.uint8).reshape(8, 48, 64)
    mjpeg_files = [encode_avi(fr, fps=8, codec="mjpeg") for _ in range(20)]
    dt = bench(lambda fs: [decode_avi(f) for f in fs], mjpeg_files)
    out["rows_per_sec"]["mjpeg_decode_8f_48x64"] = round(
        len(mjpeg_files) * 8 / dt
    )

    # round-5 input decoders: winlog ET vs vectorized, and the live
    # wire protocols end-to-end over localhost (server included, so
    # these are conservative session throughputs, not codec ceilings)
    from beats_ray.sources.winlog import winlog_events, split_winlog_xml
    from beats_ray.sources.winlog import write_winlog_xml_fixture
    import glob as _glob

    class _Fake:
        def __init__(self, t):
            self.t = t

        def map_batches(self, fn, **kw):
            return fn(self.t)

    wd = write_winlog_xml_fixture(0.01)
    wt = split_winlog_xml(
        open(sorted(_glob.glob(wd + "/*.xml"))[0], "rb").read())
    dt = bench(lambda t: winlog_events(
        _Fake(t), event_data_columns=["ConvId", "TurnIdx"]), wt)
    out["rows_per_sec"]["winlog_decode_et"] = round(wt.num_rows / dt)
    dt = bench(lambda t: winlog_events(
        _Fake(t), event_data_columns=["ConvId", "TurnIdx"],
        winlog_json=False), wt)
    out["rows_per_sec"]["winlog_decode_vectorized"] = round(wt.num_rows / dt)

    from beats_ray.sources.redisslow import (
        ScriptedRedisServer, harvest_slowlog)

    entries = [[i, 1700000000 + i, 10 + i,
                ["GET", f"conv-{i:06d}", str(i)],
                f"10.0.0.{i % 200}:40000", "user"]
               for i in range(20_000)]

    def resp_cycle(_):
        srv = ScriptedRedisServer(list(entries))
        try:
            return harvest_slowlog("127.0.0.1", srv.port)
        finally:
            srv.close()

    dt = bench(resp_cycle, None)
    out["rows_per_sec"]["resp_slowlog_harvest"] = round(len(entries) / dt)

    from beats_ray.sources.mqtt import ScriptedMqttBroker, collect_mqtt

    script = [(f"conv/c{i % 97}/user", b"x" * 120, i % 3, False)
              for i in range(20_000)]

    def mqtt_cycle(_):
        b = ScriptedMqttBroker(list(script))
        try:
            return collect_mqtt("127.0.0.1", b.port, {"#": 1})
        finally:
            b.close()

    dt = bench(mqtt_cycle, None)
    out["rows_per_sec"]["mqtt_session_msgs"] = round(len(script) / dt)

    from beats_ray.sources.kafka import (
        scan_kafka_segment, write_kafka_segments_fixture)

    kd = write_kafka_segments_fixture(0.01)
    seg = open(sorted(_glob.glob(kd + "/transcripts-0/*.log"))[0],
               "rb").read()
    kt = scan_kafka_segment(seg, topic="transcripts", partition=0)
    dt = bench(lambda d: scan_kafka_segment(
        d, topic="transcripts", partition=0), seg)
    out["rows_per_sec"]["kafka_segment_scan"] = round(kt.num_rows / dt)

    # ---- final-session kernels ----
    # word-info entropy (libm ln once per distinct (T, c) pair)
    from beats_ray.dataops.textnorm import word_info  # noqa: F401 (kernel below)

    info_docs = pd.DataFrame({
        "doc_id": range(5000),
        "text": [" ".join(f"w{(i * 7 + j) % 97}" for j in range(40))
                 for i in range(5000)],
    })

    def info_kernel(d):
        # the batch fn word_info wraps, run directly (no Ray)
        import math

        words = d["text"].str.lower().str.split()
        ridx = np.arange(len(d))
        lens = words.str.len().to_numpy()
        exploded = pd.DataFrame({"_r": np.repeat(ridx, lens),
                                 "w": words.explode().to_numpy()})
        per = exploded.groupby(["_r", "w"]).size()
        rows = per.index.get_level_values("_r").to_numpy()
        c = per.to_numpy(np.int64)
        t = per.groupby("_r").sum().reindex(rows).to_numpy(np.int64)
        uniq, inv = np.unique(np.stack([t, c], 1), axis=0,
                              return_inverse=True)
        terms = np.array([math.floor((1_000_000 * int(cc))
                                     * math.log(int(tt) / int(cc)))
                          for tt, cc in uniq], dtype=np.int64)
        return pd.Series(terms[inv]).groupby(rows).sum()

    dt = bench(info_kernel, info_docs)
    out["rows_per_sec"]["word_info_entropy"] = round(len(info_docs) / dt)

    # burst theta-join kernel (offset-remap searchsorted)
    rng2 = np.random.RandomState(1)
    burst_df = pd.DataFrame({
        "user_id": rng2.randint(0, 5000, 200_000).astype("int64"),
        "ts": pd.to_datetime(
            rng2.randint(0, 3600, 200_000) * 1_000_000, unit="us"),
    })

    def burst_kernel(d):
        d = d.sort_values(["user_id", "ts"], kind="mergesort")
        ks = d["user_id"].to_numpy()
        ts = d["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new = np.concatenate([[True], ks[1:] != ks[:-1]])
        rank = np.cumsum(new) - 1
        rel = ts - ts.min()
        adj = rel + rank * (int(rel.max()) + 120_000_000)
        hi = np.searchsorted(adj, adj + 60_000_000, side="right")
        lo = np.searchsorted(adj, adj, side="right")
        return int((hi - lo).sum())

    dt = bench(burst_kernel, burst_df)
    out["rows_per_sec"]["burst_pair_count"] = round(len(burst_df) / dt)

    # PCA projection (int64 matvec against the broadcast component)
    vec_mat = np.floor(1e6 * np.random.RandomState(2).randn(200_000, 32)
                       ).astype(np.int64)
    comp = np.floor(1e6 * np.random.RandomState(3).rand(32)).astype(np.int64)
    dt = bench(lambda m: m @ comp, vec_mat)
    out["rows_per_sec"]["pca_project_32d"] = round(len(vec_mat) / dt)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
