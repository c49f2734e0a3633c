"""Driver contract for the beats_ray engine.

``entry()`` — flagship parse→enrich→route on sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data ops), each ``sf_dir → result``.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for
genuinely non-SQL ops → rows-only check).

Ray is initialised by the caller; nothing here calls ray.init().
The transcript corpus (BASELINE.json input_hint shape) is synthesized
deterministically per scale factor under /tmp (beats_ray.fixtures) —
the oracle reads the exact same parquet files via read_parquet().
"""

from __future__ import annotations

import glob
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from beats_ray.fixtures import (
    TOOL_LOOKUP,
    ROLE_LOOKUP,
    ensure_transcripts,
    sf_from_dir,
    transcripts_dir,
)

# ------------------------------------------------------------------ inputs


def _tr_files(sf: float) -> list[str]:
    return sorted(glob.glob(ensure_transcripts(sf) + "/part-*.parquet"))


def _transcripts(sf_dir: str, columns: list[str] | None = None):
    """Transcript corpus read. ALWAYS pass ``columns=`` when the query
    consumes a subset — pruning at the read is the difference between
    scanning 2 columns and scanning 6 at 100 TB (a post-read
    select_columns still ships every column out of storage)."""
    import ray.data as rd

    return rd.read_parquet(_tr_files(sf_from_dir(sf_dir)), columns=columns)


def _table(sf_dir: str, name: str, columns: list[str] | None = None,
           blocks: int | None = None):
    import ray.data as rd

    kwargs = {"override_num_blocks": blocks} if blocks else {}
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def _routed(sf_dir: str):
    from beats_ray.pipeline import build_dataset

    return build_dataset(_transcripts(sf_dir), num_parts=8)


# ------------------------------------------------------------------ entry


def entry() -> Any:
    """Flagship pipeline at sf0.001 → per-sink aggregate counts."""
    from beats_ray.dataops.agg import grouped_count

    routed = _routed("/root/testdata/sf0.001")
    return (
        grouped_count(routed, ["sink"])
        .to_pandas()
        .sort_values("sink")
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------- queries


def q_route_counts(sf_dir: str):
    from beats_ray.dataops.agg import grouped_count

    return grouped_count(_routed(sf_dir), ["sink"])


def q_routed_rows(sf_dir: str):
    return _routed(sf_dir).select_columns(["conv_id", "turn_idx", "sink", "text"])


def q_parse_kinds(sf_dir: str):
    from beats_ray.dataops.agg import grouped_count

    ds = grouped_count(_routed(sf_dir), ["parsed.kind"])
    return ds.map_batches(
        lambda t: t.rename_columns(["kind", "n"]), batch_format="pyarrow"
    )


def q_error_rows(sf_dir: str):
    import pyarrow.compute as pc

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["error.message"]))
        out = t.select(["conv_id", "turn_idx", "error.message"])
        return out.rename_columns(["conv_id", "turn_idx", "error_message"])

    return _routed(sf_dir).map_batches(pick, batch_format="pyarrow")


def q_enrich_counts(sf_dir: str):
    from beats_ray.dataops.agg import grouped_count

    return grouped_count(
        _routed(sf_dir), ["tool_category", "risk_level", "role_tag"]
    )


DISSECT_RX = '(?s)^level=(.*?) ts=(.*?) tool=(.*?) status=(.*?) msg="(.*?)"'


def q_dissect_parse(sf_dir: str):
    import pyarrow.compute as pc

    from beats_ray.processors import build_processor

    proc = build_processor(
        {
            "dissect": {
                "tokenizer": 'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg="%{msg}"',
                "ignore_failure": True,
            }
        }
    )

    def parse(t: pa.Table) -> pa.Table:
        t = proc(t)
        t = t.filter(pc.is_valid(t["dissect.level"]))
        out = t.select(
            ["conv_id", "turn_idx", "dissect.level", "dissect.ts",
             "dissect.tool", "dissect.status", "dissect.msg"]
        )
        return out.rename_columns(
            ["conv_id", "turn_idx", "level", "ts_str", "tool_name", "status", "msg"]
        )

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(parse, batch_format="pyarrow")


GROK_PATTERN = (
    'level=%{LOGLEVEL:level} ts=%{TIMESTAMP_ISO8601:ts_str} '
    'tool=%{WORD:tool_name} status=%{WORD:status} '
    'msg="ran %{NONNEGINT:n_cmds:int} commands"'
)


def q_grok_parse(sf_dir: str):
    """Grok parse stage (the north star's "grok/regex parse" named
    surface; Elasticsearch ingest grok config on the repo's processor
    conventions, beats_ray/processors/grok.py): Logstash-pattern-syntax
    extraction with library composites (LOGLEVEL, TIMESTAMP_ISO8601)
    and a TYPED capture (n_cmds:int — the capability dissect lacks),
    compiled once and applied as ONE pc.extract_regex per batch.
    Oracle: the equivalent anchored regexp_extract + CAST in SQL."""
    import pyarrow.compute as pc

    from beats_ray.processors import build_processor

    proc = build_processor(
        {"grok": {"patterns": ["^" + GROK_PATTERN + "$"],
                  "ignore_failure": True}}
    )

    def parse(t: pa.Table) -> pa.Table:
        t = proc(t)
        t = t.filter(pc.is_valid(t["grok.level"]))
        out = t.select(
            ["conv_id", "turn_idx", "grok.level", "grok.ts_str",
             "grok.tool_name", "grok.status", "grok.n_cmds"]
        )
        return out.rename_columns(
            ["conv_id", "turn_idx", "level", "ts_str", "tool_name",
             "status", "n_cmds"]
        )

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(
        parse, batch_format="pyarrow")


def q_ndjson_parse(sf_dir: str):
    import pyarrow.compute as pc

    from beats_ray.processors import build_processor

    proc = build_processor(
        {"decode_json_fields": {"fields": ["text"], "target": "parsed"}}
    )

    def parse(t: pa.Table) -> pa.Table:
        t = proc(t)
        t = t.filter(pc.is_valid(t["parsed.event"]))
        out = t.select(
            ["conv_id", "turn_idx", "parsed.event", "parsed.tool",
             "parsed.duration_ms"]
        )
        return out.rename_columns(
            ["conv_id", "turn_idx", "event", "json_tool", "duration_ms"]
        )

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(parse, batch_format="pyarrow")


def q_syslog_parse(sf_dir: str):
    import pyarrow.compute as pc

    from beats_ray.processors import build_processor

    proc = build_processor({"syslog": {}})

    def parse(t: pa.Table) -> pa.Table:
        t = proc(t)
        t = t.filter(pc.fill_null(t["syslog.ok"], False))
        out = t.select(
            ["conv_id", "turn_idx", "syslog.pri", "syslog.facility",
             "syslog.severity", "syslog.host", "syslog.app", "syslog.pid",
             "syslog.msg"]
        )
        return out.rename_columns(
            ["conv_id", "turn_idx", "pri", "facility", "severity", "host",
             "app", "pid", "msg"]
        )

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(parse, batch_format="pyarrow")


def q_syslog_sd_parse(sf_dir: str):
    """RFC5424 structured-data round-trip: build an SD-bearing 5424
    line from each turn's identity, parse it through the syslog
    processor (SD elements + escape handling), and recover the identity
    from the parsed ``syslog.sd`` JSON. The oracle re-derives the same
    values directly — equality proves the parser inverted the encoding
    (including the escaped-quote param)."""
    import json as _json

    import pyarrow.compute as pc

    from beats_ray.processors import build_processor

    proc = build_processor({"syslog": {"format": "rfc5424", "field": "line"}})

    def build(df: pd.DataFrame) -> pd.DataFrame:
        line = (
            '<165>1 2024-01-01T00:00:00Z host app - MID [meta@1 conv="'
            + df["conv_id"].astype(str)
            + '" idx="'
            + df["turn_idx"].astype(str)
            + '"][note@2 esc="a \\" b"] payload'
        )
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": df["turn_idx"], "line": line}
        )

    def extract(t: pa.Table) -> pa.Table:
        t = proc(t)
        sd_conv, sd_idx, sd_esc = [], [], []
        for s in t["syslog.sd"].to_pylist():
            d = _json.loads(s) if s else {}
            sd_conv.append(d.get("meta@1", {}).get("conv"))
            v = d.get("meta@1", {}).get("idx")
            sd_idx.append(int(v) if v is not None else None)
            sd_esc.append(d.get("note@2", {}).get("esc"))
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "sd_conv": pa.array(sd_conv, pa.string()),
                "sd_idx": pa.array(sd_idx, pa.int64()),
                "sd_esc": pa.array(sd_esc, pa.string()),
            }
        )

    return (
        _transcripts(sf_dir, ["conv_id", "turn_idx"])
        .map_batches(build, batch_format="pandas")
        .map_batches(extract, batch_format="pyarrow")
    )


def q_dead_letter_counts(sf_dir: str):
    """ES dead-letter routing: rows whose payload exceeds the sink's
    byte cap re-route to the dead_letter sink (reason + original target
    preserved); per-sink counts after re-routing."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.sinks import dead_letter_route

    routed = dead_letter_route(_routed(sf_dir), max_text_bytes=100)
    return grouped_count(routed, ["sink"])


def q_multiline_stats(sf_dir: str):
    import pyarrow.compute as pc

    from beats_ray.processors import build_processor

    proc = build_processor({"multiline_stats": {}})

    def stats(t: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(
            pc.fill_null(t["text"].combine_chunks(), ""), "^Exception in thread "
        )
        t = proc(t.filter(mask))
        out = t.select(
            ["conv_id", "turn_idx", "multiline.n_lines", "multiline.first_line"]
        )
        return out.rename_columns(["conv_id", "turn_idx", "n_lines", "first_line"])

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(stats, batch_format="pyarrow")


def q_truncate_preview(sf_dir: str):
    import pyarrow.compute as pc

    def trunc(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "text_trunc": pc.utf8_slice_codeunits(text, 0, 40),
                "truncated": pc.greater(pc.utf8_length(text), 40),
            }
        )

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(trunc, batch_format="pyarrow")


def q_replace_mask_numbers(sf_dir: str):
    from beats_ray.processors import build_processor

    proc = build_processor(
        {"replace": {"fields": [{"field": "text", "pattern": r"\d+", "replacement": "N"}]}}
    )

    def go(t: pa.Table) -> pa.Table:
        return proc(t).select(["conv_id", "turn_idx", "text"]).rename_columns(
            ["conv_id", "turn_idx", "masked"]
        )

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(go, batch_format="pyarrow")


def q_timestamp_parse(sf_dir: str):
    import pyarrow.compute as pc

    from beats_ray.processors import build_chain, run_chain

    chain = build_chain(
        [
            {
                "dissect": {
                    "tokenizer": 'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg="%{msg}"',
                    "ignore_failure": True,
                }
            },
            {"timestamp": {"field": "dissect.ts", "target": "ts_parsed"}},
        ]
    )

    def go(t: pa.Table) -> pa.Table:
        t = run_chain(t, chain)
        t = t.filter(pc.is_valid(t["dissect.level"]))
        return t.select(["conv_id", "turn_idx", "ts_parsed"])

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(go, batch_format="pyarrow")


def q_format_index(sf_dir: str):
    from beats_ray.processors import build_processor

    proc = build_processor(
        {"add_formatted_index": {"index": "logs-%{[role]}-%{+yyyy.MM.dd}", "target": "idx_name"}}
    )

    def go(t: pa.Table) -> pa.Table:
        return proc(t).select(["conv_id", "turn_idx", "idx_name"])

    return _transcripts(sf_dir, ["conv_id", "turn_idx", "role", "ts"]).map_batches(go, batch_format="pyarrow")


def q_fingerprint_docs(sf_dir: str):
    from beats_ray.processors import build_processor

    proc = build_processor(
        {"fingerprint": {"fields": ["text"], "method": "md5", "target_field": "fp"}}
    )

    def go(t: pa.Table) -> pa.Table:
        return proc(t).select(["doc_id", "fp"])

    return _table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        go, batch_format="pyarrow"
    )


def q_rate_limited_counts(sf_dir: str):
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.dataops.flows import rate_limit

    # narrow projection BEFORE the keyed shuffle: the rate limiter only
    # needs (conv_id, turn_idx, ts) to decide survivors for the count
    narrow = _transcripts(sf_dir, ["conv_id", "turn_idx", "ts"])
    kept = rate_limit(narrow, k=3, window_s=60)
    return grouped_count(kept, ["conv_id"], name="n_kept")


def q_stage_rate_limited_counts(sf_dir: str):
    """Config-driven `stages:` surface end to end: the flagship parse
    chain with a keyed rate-limit stage (first 2 turns per conversation
    per minute) applied before routing — per-sink counts of the
    surviving rows."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.pipeline import FLAGSHIP_CONFIG, build_dataset

    cfg = dict(FLAGSHIP_CONFIG)
    cfg["stages"] = [{"rate_limit": {"k": 2, "window_s": 60}}]
    routed = build_dataset(_transcripts(sf_dir), config=cfg, num_parts=8)
    return grouped_count(routed, ["sink"])


def q_rate_limit_tokens(sf_dir: str):
    """TRUE token-bucket rate limit (refill semantics, ratelimit/
    rate_limit.go): 1 token per hour, burst 2, replayed per user over
    the events stream — kept-event count per user. Oracle = a DuckDB
    recursive CTE replaying the identical integer recurrence."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.dataops.flows import token_bucket_limit

    ev = _table(sf_dir, "events", ["event_id", "user_id", "ts"], blocks=16)
    kept = token_bucket_limit(ev, key="user_id", limit_n=1, per_s=3600, burst=2)
    return grouped_count(kept, ["user_id"], name="n_kept")


def q_dns_cache_hits(sf_dir: str):
    """dns processor TTL lookup-cache replay (dns/cache.go): click
    events resolve a user-derived host against a config-fed zone
    (30/40 hosts resolve); successes cache for 600 s, failures for
    120 s, and each event is classified hit/miss by event-time expiry.
    Oracle = a recursive CTE replaying the identical anchored-expiry
    chain per host."""

    from beats_ray.dataops.dnscache import dns_cache_replay

    ev = _table(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts"],
        blocks=16,
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "click"].copy()
        df["query"] = (
            "host-" + (df["user_id"] % 40).astype(str) + ".example"
        )
        return df[["event_id", "ts", "query"]]

    zone = {
        f"host-{i}.example": {"answer": f"10.0.0.{i}", "ttl_s": 600}
        for i in range(30)
    }
    out = dns_cache_replay(
        ev.map_batches(prep, batch_format="pandas"),
        key="query", order_col="event_id", resolutions=zone,
        success_ttl_s=600, failure_ttl_s=120,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        res = df[["event_id", "query", "answer", "status", "cache"]].copy()
        res["answer"] = res["answer"].fillna("")  # oracle COALESCEs too
        return res.astype({"event_id": "int64"})

    return out.map_batches(final, batch_format="pandas")


def q_cache_hits(sf_dir: str):
    """cache processor put/get/delete with TTL (cache/cache.go): views
    PUT (value = event_id), purchases DELETE, clicks GET. A click
    resolves the user's latest view if it is newer than any delete and
    at most ttl_s old. Oracle = DuckDB ASOF join over the same state
    stream."""
    import pyarrow.compute as pc

    from beats_ray.dataops.kvcache import cache_put_get

    ev = _table(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts"],
        blocks=16,
    )

    def to_ops(t: pa.Table) -> pa.Table:
        op = pc.case_when(
            pc.make_struct(
                pc.equal(t["event_type"], "view"),
                pc.equal(t["event_type"], "purchase"),
                pc.equal(t["event_type"], "click"),
            ),
            "put", "delete", "get",
        )
        return pa.table(
            {
                "k": t["user_id"],
                "ts": t["ts"],
                "op": op,
                "v": t["event_id"],
            }
        ).filter(pc.is_valid(op))

    ops = ev.map_batches(to_ops, batch_format="pyarrow")
    out = cache_put_get(ops, key="k", value_col="v", op_col="op",
                        ts_col="ts", ttl_s=50_000)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["user_id" if c == "k" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


def q_flow_agg(sf_dir: str):
    from beats_ray.dataops.flows import flow_agg

    return flow_agg(
        _table(sf_dir, "events", ["user_id", "event_type", "ts", "value"],
               blocks=16)
    )


def q_sessionize(sf_dir: str):
    from beats_ray.dataops.flows import sessionize

    return sessionize(_table(sf_dir, "events", ["user_id", "ts"], blocks=16))


def q_event_session_windows(sf_dir: str):
    """Range join (interval containment): derive per-user session
    windows (flow_sessions, 1800 s gap), then join every event back to
    its containing window — the windows are a separate Dataset, so this
    is a genuine two-sided interval join (one co-locating shuffle, a
    vectorized merge_asof + end filter per bucket), not a window
    function."""
    from beats_ray.dataops.flows import flow_sessions
    from beats_ray.dataops.joins import range_join

    ev = _table(sf_dir, "events", ["event_id", "user_id", "ts"], blocks=16)

    def to_sec(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "user_id"]].copy()
        # same floored-seconds convention as flow_sessions
        out["sec"] = df["ts"].astype("datetime64[s]").astype("int64")
        return out

    evs = ev.map_batches(to_sec, batch_format="pandas")
    wins = flow_sessions(
        ev.drop_columns(["event_id"]), key_cols=("user_id",),
        timeout_s=1800,
    )
    joined = range_join(evs, wins, key="user_id", ts_col="sec")

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        # the bucket union pads each side's columns with nulls (ints
        # float in pandas); inner containment means no null survives,
        # so the cast back is lossless
        cols = ["event_id", "user_id", "sec", "start_s", "end_s", "n"]
        return df[cols].astype("int64")

    return joined.map_batches(cast, batch_format="pandas")


def q_top_users(sf_dir: str):
    from beats_ray.dataops.flows import top_k_users

    return top_k_users(_table(sf_dir, "events", ["user_id"]), k=10)


def q_events_type_counts(sf_dir: str):
    from beats_ray.dataops.agg import grouped_count

    return grouped_count(_table(sf_dir, "events", ["event_type"]), ["event_type"])


def q_tpch_q1(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    li = _table(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        px_cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_pct = np.round((1 - df["l_discount"].to_numpy()) * 100).astype(np.int64)
        g = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": df["l_quantity"].to_numpy().astype(np.int64),
                "revenue_um": px_cents * disc_pct,
                "n": 1,
            }
        ).groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        # Arrow out: Ray's global aggregate runs C++ kernels on Arrow
        # blocks but a slow per-row path on pandas blocks
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        li.map_batches(partial, batch_format="pandas")
        # partials are ≤4 rows per block; collapsing 64 map blocks to 4
        # cuts the final groupby's sort shuffle from 64×64 micro-tasks
        # to 4×4 (measured 1.8→1.2 s)
        .repartition(4)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue_um", alias_name="revenue_um"),
            Sum("n", alias_name="n"),
        )
    )


def q_dedup_exact(sf_dir: str):
    from beats_ray.dataops.dedup import exact_dedup

    return exact_dedup(_table(sf_dir, "documents", ["doc_id", "text"], blocks=16)).select_columns(
        ["doc_id"]
    )


def q_minhash_dedup(sf_dir: str):
    from beats_ray.dataops.dedup import minhash_dedup

    return minhash_dedup(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), threshold=0.5
    )


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs at hamming ≤ 6 (8 chunks × 8 bits —
    pigeonhole-exact). Wider radii force narrower chunks whose key
    space collapses (width 4 ⇒ 16 buckets ⇒ banding stops pruning and
    the cost approaches all-pairs); ≤6 is the standard 64-bit near-dup
    operating point."""
    from beats_ray.dataops.dedup import simhash_dedup

    return simhash_dedup(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), max_hamming=6
    )


def q_ngram_dup_pairs(sf_dir: str):
    from beats_ray.dataops.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), n=3, threshold=0.6
    )
    # integer evidence columns only (exact oracle compare; the float
    # jaccard is inter_n/union_n, trivially derived)
    return out.select_columns(["a", "b", "inter_n", "union_n"])


def q_ngram_dup_clusters(sf_dir: str):
    """Duplicate clustering COMPOSED with the sketch family: connected
    components over the MinHash-candidate → char-3-gram-Jaccard-verified
    pair graph (the production near-dup dedup shape: sketch → verify →
    transitive closure → keep one per cluster). Oracle: the full SQL
    pipeline replay wrapped in a recursive-CTE closure."""
    from beats_ray.dataops.dedup import ngram_jaccard_pairs
    from beats_ray.dataops.graph import connected_components

    pairs = ngram_jaccard_pairs(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16),
        n=3, threshold=0.6,
    ).select_columns(["a", "b"])
    nodes = _table(sf_dir, "documents", ["doc_id"])
    out = connected_components(pairs, nodes, node_col="doc_id")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_substring_dup_spans(sf_dir: str):
    """Exact duplicate-substring spans (suffix-array training-data
    dedup, Lee et al. 2022, as content-defined sampled window hashing):
    per doc, the number of selected 10-token windows also present in at
    least one other document. Oracle replays the identical window
    hashing + sampling in SQL."""
    from beats_ray.dataops.dedup import window_dup_spans

    return window_dup_spans(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16),
        k=10, sample_mod=4,
    )


def q_c4_clean_docs(sf_dir: str):
    """C4-style rule cleaning over the transcript turns (JSON turns hit
    the '{' blocklist; dissect log lines end in '"' so the terminal-
    punctuation rule fires both ways): line keep rules + blocklist,
    integer evidence + cleaned text. Row id is the SQL-reproducible
    md5-based conv hash + turn."""
    from beats_ray.dataops.dedup import _stable_hash
    from beats_ray.dataops.quality import c4_line_filter

    def with_id(df: pd.DataFrame) -> pd.DataFrame:
        # hash per UNIQUE conv (conversations repeat ~28x per batch);
        # the per-row md5 loop cost ~6M hashes at sf1 for ~212k convs
        uniq = pd.unique(df["conv_id"])
        lut = {c: _stable_hash(c) for c in uniq}
        ids = (
            df["conv_id"].map(lut).to_numpy(dtype="int64") * 100_000
            + df["turn_idx"].to_numpy(dtype="int64")
        )
        return pd.DataFrame(
            {"doc_id": pd.array(ids, dtype="int64"), "text": df["text"]}
        )

    docs = (
        _transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
        .map_batches(with_id, batch_format="pandas")
    )
    return c4_line_filter(docs)


def q_bigram_coverage(sf_dir: str):
    """Two-pass fit-then-score: top-500 corpus bigram model (distributed
    top-k) broadcast back over the corpus; per-doc bigram counts and
    model hits — the LM-coverage quality signal."""
    from beats_ray.dataops.quality import bigram_coverage

    return bigram_coverage(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), model_k=500
    )


def q_sample_docs(sf_dir: str):
    """Deterministic 25% corpus sample by content-stable hash threshold
    (exact integer comparison) — reproducible sampling at any scale."""
    from beats_ray.dataops.sampling import hash_sample

    return hash_sample(
        _table(sf_dir, "documents", ["doc_id"]), 0.25
    ).select_columns(["doc_id"])


def q_sample_k_per_lang(sf_dir: str):
    """Balanced subset: exactly 25 docs per language (smallest-hash)."""
    from beats_ray.dataops.sampling import sample_exact_k_per_group

    return sample_exact_k_per_group(
        _table(sf_dir, "documents", ["doc_id", "lang"]), 25, group="lang"
    )


def q_sample_exact_k(sf_dir: str):
    """Exactly-k deterministic sample (fixed-size eval subset): the
    k=100 smallest 64-bit content hashes, per-block top-k combiner →
    tiny global sort — the driver never sees more than k rows."""
    from beats_ray.dataops.sampling import sample_exact_k

    return sample_exact_k(_table(sf_dir, "documents", ["doc_id"]), 100)


def q_weighted_sample_docs(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res, weight = n_chars): long documents are proportionally more
    likely to be kept — the size-biased corpus-mixing primitive.
    Distributed block top-k; the driver sees only k rows."""
    from beats_ray.dataops.sampling import weighted_sample_k

    return weighted_sample_k(
        _table(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        100, weight_col="n_chars")


def q_stratified_sample(sf_dir: str):
    """Corpus mixing: per-language sampling rates (down-sample the
    dominant 'en' to 12.5%, keep half of zh/es, default 25% for the
    rest) via per-stratum exact hash cutoffs — the language-balancing
    step of a training-data mix, reproducible at any cluster size."""
    from beats_ray.dataops.sampling import stratified_sample

    return stratified_sample(
        _table(sf_dir, "documents", ["doc_id", "lang"]),
        {"en": 0.125, "zh": 0.5, "es": 0.5},
        stratum="lang",
        default_fraction=0.25,
    ).select_columns(["doc_id", "lang"])


def q_token_budget_docs(sf_dir: str):
    """Budgeted selection: keep the highest-scoring documents until a
    token budget (40% of total corpus chars), cut exactly at the
    cumulative boundary in (score DESC, doc_id ASC) order — resolved
    by the distributed histogram-refinement loop, never a global sort;
    oracle = the equivalent SUM() OVER window."""
    from beats_ray.dataops.selection import take_token_budget

    ds = _table(sf_dir, "documents", ["doc_id", "n_chars"])
    budget = (ds.sum("n_chars") * 2) // 5
    return take_token_budget(
        ds, budget, score="n_chars", tokens="n_chars", key="doc_id"
    ).select_columns(["doc_id", "n_chars"])


def _hll_convs_sql() -> str:
    """Bit-exact HLL replay (sketches.hll_sql) + exact join, at the
    driver's sf0.01."""
    from beats_ray.dataops.sketches import hll_sql

    path = transcripts_dir(0.01) + "/part-*.parquet"
    src = f"read_parquet('{path}')"
    return f"""
        WITH approx AS ({hll_sql(src, "conv_id", ["role"])}),
        exact AS (
          SELECT role, COUNT(DISTINCT conv_id) AS exact_distinct
          FROM {src} GROUP BY role)
        SELECT approx.role, approx_distinct, exact_distinct
        FROM approx JOIN exact USING (role)"""


def q_inverted_index(sf_dir: str):
    """Retrieval-index build: term → (df, bounded posting list) with
    document-frequency pruning — one distinct-fold pass over text, one
    hash-partition shuffle on term, per-bucket vectorized assembly.
    Postings comma-joined (doc-id asc, capped at 20) so the artifact
    string-compares with the string_agg oracle."""
    from beats_ray.dataops.invindex import inverted_index

    return inverted_index(
        _table(sf_dir, "documents", ["doc_id", "text"]),
        min_df=2, max_df=400, max_postings=20)


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top TF-IDF term over a bounded broadcast
    vocabulary (the 500 most document-frequent terms): fit pass =
    distinct-fold → grouped df → distributed top-k; score pass =
    broadcast model, each doc decided inside its own batch row — no
    shuffle. Integer-scaled idf so the SQL replay compares exactly."""
    from beats_ray.dataops.quality import tfidf_top_terms

    return tfidf_top_terms(
        _table(sf_dir, "documents", ["doc_id", "text"]), model_k=500)


def q_hll_distinct_convs(sf_dir: str):
    """Approximate distinct conversations per role via a HyperLogLog
    sketch: the shuffle moves at most roles × 256 (register, max-rho)
    rows regardless of corpus size — vs the exact path's every unique
    pair. Exact count rides beside the estimate as evidence; the
    oracle replays the sketch bit-for-bit (md5 registers, integer
    floor-division estimator)."""
    from beats_ray.dataops.agg import map_buckets
    from beats_ray.dataops.sketches import hll_distinct

    ds = _transcripts(sf_dir, ["conv_id", "role"])
    approx = hll_distinct(ds, "conv_id", ["role"]).to_pandas()

    def pairs(t: pa.Table) -> pa.Table:
        return t.select(["role", "conv_id"]).group_by(
            ["role", "conv_id"]).aggregate([])

    # exact side: batch-local pair dedup (Arrow C++), then ONE
    # role-co-locating shuffle whose task finishes the global dedup +
    # count — the sort-based groupby chain this replaces cost ~2 s of
    # pure shuffle scheduling on ~100k partial rows
    def nuniq(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("role", as_index=False)["conv_id"].nunique()
        out = out.rename(columns={"conv_id": "exact_distinct"})
        return out.astype({"exact_distinct": "int64"})

    exact = map_buckets(
        ds.map_batches(pairs, batch_format="pyarrow"), "role", nuniq,
        buckets=8,
    ).to_pandas()
    return (approx.merge(exact, on="role")
            .sort_values("role").reset_index(drop=True))


def q_bloom_contamination(sf_dir: str):
    """Bloom-filter contamination screen: the probe set (docs 0-4, same
    as contamination_screen) compresses to a 4096-bit filter that ships
    once; hits INCLUDE the filter's deterministic false positives, which
    the oracle reproduces bit-for-bit from the same md5 positions."""
    import pyarrow.compute as pc

    from beats_ray.dataops.sketches import bloom_contamination_screen

    probe = (
        _table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 5)), batch_format="pyarrow"
        )
        .to_pandas()["text"]
        .tolist()
    )
    return bloom_contamination_screen(
        _table(sf_dir, "documents", ["doc_id", "text"]), probe,
        k_hashes=4, m_bits=4096,
    )


def q_cms_word_counts(sf_dir: str):
    """Count-Min word-frequency estimates for a bounded probe set (the
    distinct words of doc 0), exact counts beside them as evidence. The
    merged grid is d*w = 4096 counters however large the corpus — the
    fixed-memory heavy-hitter summary; the oracle replays the exact
    grid (same md5 positions, same collisions) in SQL."""
    from beats_ray.dataops.agg import map_buckets
    from beats_ray.dataops.dedup import ws_tokens
    from beats_ray.dataops.sketches import cms_build, cms_estimate

    import pyarrow.compute as pc

    docs = _table(sf_dir, "documents", ["doc_id", "text"])
    probe_texts = (
        docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 1)),
            batch_format="pyarrow",
        ).to_pandas()["text"].tolist()
    )
    words = sorted({w for t in probe_texts for w in ws_tokens(t.lower())})
    est = cms_estimate(cms_build(docs), words)

    wset = set(words)

    def count_probe(df: pd.DataFrame) -> pd.DataFrame:
        flat = (df["text"].fillna("").str.lower().map(ws_tokens)
                .explode().dropna())
        flat = flat[flat.isin(wset)]
        vc = flat.value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "exact_n": vc.to_numpy()})

    exact = map_buckets(
        docs.map_batches(count_probe, batch_format="pandas"), "word",
        lambda g: g.groupby("word", as_index=False)["exact_n"].sum(),
        buckets=4,
    ).to_pandas()
    out = est.merge(exact, on="word", how="left")
    out["exact_n"] = out["exact_n"].fillna(0).astype("int64")
    return out.sort_values("word").reset_index(drop=True)


def q_gopher_quality_docs(sf_dir: str):
    """Gopher-rule quality screen (Rae et al. 2021 heuristics): every
    metric a pyarrow C++ counting kernel, every rule an integer
    comparison, evidence counters kept beside the verdict."""
    from beats_ray.dataops.quality import gopher_rules

    # thresholds tuned to the synthetic corpus (words 10-99, sparse
    # stopwords) so the verdict SPLITS it; defaults are the canonical
    # Gopher values
    return gopher_rules(_table(sf_dir, "documents", ["doc_id", "text"]),
                        min_words=20, min_stop_hits=1)


def q_doc_len_quantiles(sf_dir: str):
    """Exact corpus-length quantiles WITHOUT a global sort: the
    histogram-refinement rank-select (one shared <=4096-bin scan, then
    O(log range) shrinking passes per boundary bin — the distributed
    k-th-order-statistic pattern). Rank rule matches DuckDB
    quantile_disc (1-based index ceil(q*n)), so the oracle is the
    literal quantile_disc call."""
    from beats_ray.dataops.quantiles import exact_quantiles

    return exact_quantiles(
        _table(sf_dir, "documents", ["n_chars"]), "n_chars",
        [0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0],
    )


def q_lang_len_quantiles(sf_dir: str):
    """Per-group exact quantiles for MANY small groups (the opposite
    shape from the global rank-select): hash-bucket co-location, one
    vectorized sort per group, every rank indexed from it."""
    from beats_ray.dataops.quantiles import grouped_quantiles

    return grouped_quantiles(
        _table(sf_dir, "documents", ["lang", "n_chars"]),
        "n_chars", "lang", [0.5, 0.9, 0.99],
    )


def _mix_corpora_sql() -> str:
    """Replay of q_mix_corpora at the driver's sf0.01: whole epochs as
    a range() cross join; the fractional epoch's hash cutoff literals
    are computed here with the SAME exact-integer math the engine
    uses (threshold_fraction + _lt_threshold over the per-language
    counts of the sf0.01 documents table)."""
    import pyarrow.parquet as pq

    from beats_ray.dataops.dedup import threshold_fraction
    from beats_ray.dataops.sampling import _lt_threshold

    langs = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                          columns=["lang"])["lang"].to_pylist()

    def part(name: str, target: int) -> str:
        n = langs.count(name)
        epochs, rem = divmod(target, n)
        pieces = []
        if epochs:
            pieces.append(f"""
            SELECT doc_id, '{name}' AS source,
                   CAST(t.e AS BIGINT) AS epoch
            FROM documents, range(0, {epochs}) t(e)
            WHERE lang = '{name}'""")
        if rem:
            p, q = threshold_fraction(rem / n)
            pieces.append(f"""
            SELECT doc_id, '{name}' AS source,
                   CAST({epochs} AS BIGINT) AS epoch
            FROM documents WHERE lang = '{name}'
              AND ('0x'||substr(md5('mix:{name}:'
                    ||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT
                  < {_lt_threshold(p, q)}""")
        return " UNION ALL ".join(pieces)

    return " UNION ALL ".join([part("en", 150), part("fr", 200)])


def q_mix_corpora(sf_dir: str):
    """Training-mix assembly: 150 rows of 'en' (a fractional epoch)
    and 200 rows of 'fr' (3 whole epochs + a hash-sampled fractional
    one), each row tagged (source, epoch) — deterministic upsampling,
    replayed in SQL as range() cross-join + the same hash cutoffs."""
    from beats_ray.dataops.sampling import mix_corpora

    docs = _table(sf_dir, "documents", ["doc_id", "lang"])
    en = docs.filter(expr="lang == 'en'").select_columns(["doc_id"])
    fr = docs.filter(expr="lang == 'fr'").select_columns(["doc_id"])
    mixed = mix_corpora({"en": (en, 150), "fr": (fr, 200)})
    return mixed.select_columns(["doc_id", "source", "epoch"])


def q_split_docs(sf_dir: str):
    """Stable train/val/test split (80/10/10) from cumulative hash
    ranges — every doc in exactly one split, identical across runs and
    cluster sizes."""
    from beats_ray.dataops.sampling import hash_split

    return hash_split(
        _table(sf_dir, "documents", ["doc_id"]),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select_columns(["doc_id", "split"])


def q_pack_sequences(sf_dir: str):
    """Greedy fixed-budget sequence packing (512 whitespace tokens per
    bin, 16 hash buckets) — the training-sequence assembly op; oracle
    replays the greedy recurrence with a recursive CTE."""
    from beats_ray.dataops.sampling import pack_sequences

    return pack_sequences(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), budget=512, buckets=16
    )


def q_packed_sequences_text(sf_dir: str):
    """Materialized packed training sequences: one row per bin with
    concatenated member text (doc order), doc/token counts."""
    from beats_ray.dataops.sampling import pack_and_concat

    return pack_and_concat(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), budget=512, buckets=16
    )


def q_token_stats(sf_dir: str):
    from beats_ray.dataops.textstats import token_stats

    return token_stats(_table(sf_dir, "documents", ["doc_id", "text"]))


def q_quality_score(sf_dir: str):
    from beats_ray.dataops.textstats import quality_score

    return quality_score(_table(sf_dir, "documents", ["doc_id", "text"]))


def q_lang_id(sf_dir: str):
    from beats_ray.dataops.textstats import lang_id

    return lang_id(_table(sf_dir, "documents", ["doc_id", "text"]))


def q_curate_corpus(sf_dir: str):
    """Composed curation pipeline (the C4/FineWeb recipe shape): ONE
    streaming flow of lang-ID filter (keep 'en') → quality filter
    (drop 'low') → exact dedup (min-id survivor per md5) → PII mask —
    the fused-signals single-scan composition in pipelines/curate.py.
    Oracle: the same four stages as chained CTEs (lang/quality/mask
    SQL fragments shared verbatim with the standalone queries)."""
    from beats_ray.pipelines.curate import curate_corpus

    return curate_corpus(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16)
    )


def q_doc_fingerprint(sf_dir: str):
    from beats_ray.dataops.textstats import doc_fingerprint

    return doc_fingerprint(_table(sf_dir, "documents", ["doc_id", "text"]))


def _query_vectors(sf_dir: str) -> np.ndarray:
    """The 4 probe vectors — a driver-side footer-pruned parquet read
    (4 rows; a full Ray Dataset execution per ANN query paid ~0.5 s of
    fixed cost before the search even started)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t["vec_id"], 4)).sort_by("vec_id")
    return np.stack(t["embedding"].to_pandas().to_numpy())


def _query_vec_ids(sf_dir: str) -> np.ndarray:
    """The probe rows' ACTUAL vec_ids, sorted — the oracle labels
    results with q.vec_id, so the engine must map its positional query
    index back to these (they only coincide while ids 0..3 exist
    contiguously)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    t = t.filter(pc.less(t["vec_id"], 4)).sort_by("vec_id")
    return t["vec_id"].to_numpy()


def _rank_topk(res: "pd.DataFrame", sf_dir: str) -> "pd.DataFrame":
    """Shared ANN postlude: deterministic (sim desc, vec_id asc) rank
    per query + map the positional query index to the real probe
    vec_id (oracle labels)."""
    res = res.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    res["rank"] = res.groupby("query_id").cumcount() + 1
    qids = _query_vec_ids(sf_dir)
    res["query_id"] = res["query_id"].map(
        lambda qi: int(qids[qi])
    ).astype("int64")
    return res[["query_id", "rank", "vec_id"]].reset_index(drop=True)


def q_ann_brute_topk(sf_dir: str):
    from beats_ray.dataops.ann import brute_topk

    res = brute_topk(
        _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16),
        _query_vectors(sf_dir),
        k=10,
    )
    return _rank_topk(res, sf_dir)


def q_ann_ivf_topk(sf_dir: str):
    """IVF machinery driven at FULL probe (n_probe = n_clusters): the
    bucket assignment, probe filtering and top-k merge all execute, and
    the result is provably identical to exact brute force — which is
    what the SQL oracle checks. The approximate regime (n_probe <
    n_clusters) is covered by the recall test in tests/test_dataops.py
    (recall is data-dependent, so it has no exact oracle)."""
    from beats_ray.dataops.ann import ivf_topk

    res = ivf_topk(
        _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16),
        _query_vectors(sf_dir),
        k=10,
        n_clusters=16,
        n_probe=16,
    )
    return _rank_topk(res, sf_dir)


def q_ann_lsh_topk(sf_dir: str):
    """Multi-probe hyperplane-LSH machinery driven at FULL probe
    (n_probe = 2^n_planes): signature hashing, probe-bucket filtering
    and the partial top-k merge all execute, and the result is provably
    identical to exact brute force — what the SQL oracle checks. The
    approximate regime (few probes) is covered by the recall test in
    tests/test_dataops.py."""
    from beats_ray.dataops.ann import lsh_topk

    res = lsh_topk(
        _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16),
        _query_vectors(sf_dir),
        k=10,
        n_planes=6,
        n_probe=64,
    )
    return _rank_topk(res, sf_dir)


def q_ann_pq_topk(sf_dir: str):
    """Product-quantization (IVF-PQ class) machinery driven with a
    full-coverage re-rank: codebook fit, per-batch encode, ADC lookup
    scoring and candidate selection all execute, and the exact re-rank
    over the full pool makes the result provably identical to brute
    force — what the SQL oracle checks. The approximate regime (small
    ``rerank``) is covered by the recall test in tests/test_dataops.py
    and the ann_recall probe."""
    from beats_ray.dataops.ann import pq_topk

    res = pq_topk(
        _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16),
        _query_vectors(sf_dir),
        k=10,
        n_sub=8,
        n_codes=32,
    )
    return _rank_topk(res, sf_dir)


def q_embed_dup_pairs(sf_dir: str):
    """EXACT cosine similarity join (centroid-bound bucket-pair
    pruning, no false negatives) — oracle = the all-pairs SQL."""
    from beats_ray.dataops.ann import embedding_cosine_dup_pairs

    out = embedding_cosine_dup_pairs(
        _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16), threshold=0.35
    ).to_pandas()  # benchmark-scale collect; the op itself streams
    if out.empty:  # empty map_groups outputs can lose column names
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return out[["a", "b"]].astype("int64")


def q_embed_dup_clusters(sf_dir: str):
    """Duplicate CLUSTERING (iterative graph op): connected components
    over the exact cosine dup-pair graph — min-label propagation via
    bucket joins, one label per node, nothing adjacency-shaped on the
    driver. Oracle: recursive-CTE transitive closure over the same
    all-pairs similarity join."""
    from beats_ray.dataops.ann import embedding_cosine_dup_pairs
    from beats_ray.dataops.graph import connected_components

    emb = _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    edges = embedding_cosine_dup_pairs(emb, threshold=0.35)
    # second scan is DELIBERATE and thin: lazy datasets re-execute per
    # consumer, and re-reading just the pruned int64 vec_id column is
    # cheaper at scale than materializing the full embedding dataset
    # to share it between the pair join and the node list
    nodes = _table(sf_dir, "embeddings", ["vec_id"])
    out = connected_components(edges, nodes, node_col="vec_id")
    return out.to_pandas().sort_values("vec_id").reset_index(drop=True)


def q_semantic_dedup_keep(sf_dir: str):
    """SemDeDup-class semantic dedup (Abbas et al. 2023 class): cluster
    documents whose EMBEDDINGS are near-duplicates in cosine space
    (transitive closure over the exact similarity join) and KEEP one
    representative per cluster (the minimum id) — the dedup POLICY on
    top of the cluster labels, applied back to the corpus with a
    distributed semi-join so nothing id-sized lands on the driver.
    Oracle: recursive-CTE closure + min-per-component + join in SQL."""
    import pyarrow.compute as pc  # noqa: F401  (matches sibling queries)

    from beats_ray.dataops.ann import embedding_cosine_dup_pairs
    from beats_ray.dataops.graph import dup_cluster_survivors
    from beats_ray.dataops.joins import bucket_semi_join, semi_join

    emb = _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    edges = embedding_cosine_dup_pairs(emb, threshold=0.35)
    # second scan is DELIBERATE and thin: lazy datasets re-execute per
    # consumer, and re-reading just the pruned int64 vec_id column is
    # cheaper at scale than materializing the full embedding dataset
    # to share it between the pair join and the node list
    nodes = _table(sf_dir, "embeddings", ["vec_id"])
    keep = dup_cluster_survivors(edges, nodes, node_col="vec_id")
    keep = keep.map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow"
    ).materialize()  # tiny by construction; consumed twice below
    docs = _table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    # survivor count is corpus-proportional in general (most docs are
    # singleton clusters), so apply the repo's adaptive convention
    # (dedup.py apply path): broadcast the keep set below the limit,
    # fall back to the bucket shuffle when it is corpus-sized
    if keep.count() <= 100_000:
        out = semi_join(docs, keep.to_pandas(), on="doc_id").to_pandas()
    else:
        out = bucket_semi_join(docs, keep, on="doc_id", buckets=8).to_pandas()
    # the bucket path's union pads the key side with nulls, floating
    # n_chars; every surviving row is a document row, so the cast is
    # lossless (a no-op on the broadcast path)
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_keep_best(sf_dir: str):
    """Keep-BEST dedup policy: same semantic duplicate clusters as
    `semantic_dedup_keep`, but the survivor is the highest-QUALITY
    member (longest document; ties → smallest id) instead of the
    minimum id — the policy production pipelines actually ship. The
    per-cluster argmax is one co-locating bucket pass over the label
    table; the winner set applies back with the adaptive semi-join."""
    from beats_ray.dataops.ann import embedding_cosine_dup_pairs
    from beats_ray.dataops.graph import dup_cluster_best_survivors
    from beats_ray.dataops.joins import bucket_semi_join, semi_join

    emb = _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    edges = embedding_cosine_dup_pairs(emb, threshold=0.35)
    nodes = _table(sf_dir, "embeddings", ["vec_id"])
    labels = nodes  # node ids align with doc ids in this corpus
    docs = _table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    scores = docs.select_columns(["doc_id", "n_chars"]).map_batches(
        lambda df: df.rename(columns={"doc_id": "vec_id"}),
        batch_format="pandas")
    keep = dup_cluster_best_survivors(
        edges, labels, scores, node_col="vec_id", score_col="n_chars",
        buckets=8)
    keep = keep.map_batches(
        lambda df: df.rename(columns={"vec_id": "doc_id"}),
        batch_format="pandas").materialize()
    if keep.count() <= 100_000:
        out = semi_join(docs, keep.to_pandas(), on="doc_id").to_pandas()
    else:
        out = bucket_semi_join(docs, keep, on="doc_id", buckets=8).to_pandas()
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_media_features(sf_dir: str):
    """Image decode → feature extraction over the deterministic media
    corpus. Output = integer pixel evidence (count + sum); the oracle
    recomputes the tiling/summation math in SQL over the same inlined
    payload bytes."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import image_features, synthesize_media_table

    media = rd.from_arrow(synthesize_media_table(64))
    return image_features(media, fake=True).select_columns(
        ["media_id", "n_px", "px_sum"]
    )


def q_media_real_decode(sf_dir: str):
    """REAL image decode: the corpus payloads are actual PNG files
    (pure-Python zlib decode path, fake=False); pixel contents follow a
    closed-form formula, so the oracle recomputes the decoded pixel sum
    without any codec — byte-level decode correctness, end to end."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        image_features,
        synthesize_real_media_table,
    )

    media = rd.from_arrow(synthesize_real_media_table(24))
    return image_features(media, fake=False).select_columns(
        ["media_id", "n_px", "px_sum"]
    )


def q_jpeg_real_decode(sf_dir: str):
    """REAL compressed-image decode: baseline-JPEG payloads (pure-Python
    Huffman + dequantize + IDCT, codecs.py) through the same
    feature-extraction stage as PNG. The fixture images are flat
    8×8-block patterns, which survive JPEG's lossy pipeline in CLOSED
    FORM (DC-only blocks, exact-integer DC path), so the oracle
    recomputes the decoded pixel sum with integer math and no codec —
    byte-level decode correctness through a genuinely lossy format."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        image_features,
        synthesize_jpeg_media_table,
    )

    media = rd.from_arrow(synthesize_jpeg_media_table(24))
    return image_features(media, fake=False).select_columns(
        ["media_id", "n_px", "px_sum"]
    )


def q_audio_real_decode(sf_dir: str):
    """REAL audio decode: actual RIFF/WAVE PCM16 payloads through the
    pure-Python decoder; sample contents are closed-form, oracle
    recomputes the amplitude sum independently."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        audio_features,
        synthesize_real_media_table,
    )

    media = rd.from_arrow(synthesize_real_media_table(24))
    return audio_features(media)


def q_gif_real_decode(sf_dir: str):
    """REAL LZW decode: GIF payloads (the third compression family
    after PNG's DEFLATE and JPEG's DCT — variable-width LZW codes)
    through the image-feature stage. GIF is LOSSLESS, so the oracle
    recomputes the decoded pixel sum straight from the generating
    formula (×3 — the gray palette replicates into RGB)."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        image_features,
        synthesize_gif_media_table,
    )

    media = rd.from_arrow(synthesize_gif_media_table(24))
    return image_features(media, fake=False).select_columns(
        ["media_id", "n_px", "px_sum"]
    )


def q_g711_audio_decode(sf_dir: str):
    """COMPRESSED audio decode: G.711 μ-law/A-law WAVs (fmt 7/6 — the
    8-bit companded telephony formats) through the same audio-feature
    stage as PCM. The payload code bytes follow a closed formula and
    each law is pure integer bit-field math, so the oracle recomputes
    Σ|decoded sample| in SQL with no codec and no shared tables."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        audio_features,
        synthesize_g711_media_table,
    )

    media = rd.from_arrow(synthesize_g711_media_table(24))
    return audio_features(media)


def q_mjpeg_video_decode(sf_dir: str):
    """COMPRESSED video decode: Motion-JPEG AVI ('MJPG' fourcc —
    per-frame baseline JPEG, the form webcam/security corpora ship)
    through the frame-feature stage. Flat 8×8-block frames survive
    JPEG's lossy pipeline in closed form, so the oracle recomputes each
    sampled frame's pixel sum with integer math — container parse AND
    entropy decode correctness, end to end."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        synthesize_mjpeg_video_table,
        video_frame_features,
    )

    media = rd.from_arrow(synthesize_mjpeg_video_table(8))
    return video_frame_features(media, every_ms=300)


def q_video_real_decode(sf_dir: str):
    """REAL video decode: actual uncompressed-AVI payloads parsed by
    the pure-Python RIFF/DIB codec; frame pixels are closed-form
    ``(i*11 + f*29 + x*7 + y*3) % 256``, so the oracle recomputes each
    sampled frame's pixel sum without any container parser — byte-level
    container decode correctness, end to end."""
    import ray.data as rd

    from beats_ray.dataops.multimodal import (
        synthesize_real_video_table,
        video_frame_features,
    )

    media = rd.from_arrow(synthesize_real_video_table(12))
    return video_frame_features(media, every_ms=300)


def q_frame_samples(sf_dir: str):
    import ray.data as rd

    from beats_ray.dataops.multimodal import sample_frames, synthesize_media_table

    media = rd.from_arrow(synthesize_media_table(64))
    return sample_frames(media, every_ms=500)



def q_multiline_merge(sf_dir: str):
    """Self-reconstruction property: explode every turn into physical
    lines, then multiline-join them back (pattern mode, continuation =
    leading whitespace). Oracle expresses the same with window SQL."""
    from beats_ray.stages.multiline import explode_lines, multiline_merge

    lines = explode_lines(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    )
    merged = multiline_merge(lines, pattern=r"^\s", match="after")
    return merged.select_columns(
        ["conv_id", "turn_idx", "event_id", "text", "n_lines"]
    )


def q_tool_sequences(sf_dir: str):
    """Sequential pattern mining over conversations: corpus-wide
    counts of consecutive tool-call pairs (the 'what do agents do
    after a search' analytics question). One co-locating bucket pass
    keeps each conversation whole (the multiline convention); the
    driver merges per-bucket partials bounded by tool-vocabulary²."""
    from beats_ray.dataops.agg import map_buckets

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df[df["tool"] != "none"]
              .sort_values(["conv_id", "turn_idx"], kind="mergesort"))
        tool = df["tool"].to_numpy(dtype=object)
        conv = df["conv_id"].to_numpy()
        if len(df) < 2:
            return pd.DataFrame({"tool_a": pd.Series(dtype="string"),
                                 "tool_b": pd.Series(dtype="string"),
                                 "n_pairs": pd.Series(dtype="int64")})
        m = conv[1:] == conv[:-1]
        out = pd.DataFrame({"tool_a": tool[:-1][m], "tool_b": tool[1:][m]})
        return (out.groupby(["tool_a", "tool_b"], as_index=False)
                   .size().rename(columns={"size": "n_pairs"}))

    partials = map_buckets(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "tool"]),
        "conv_id", pairs_in_bucket, buckets=16).to_pandas()
    out = (partials.groupby(["tool_a", "tool_b"], as_index=False)
                   ["n_pairs"].sum())
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["tool_a", "tool_b"]).reset_index(drop=True)


def q_rolling_turn_chars(sf_dir: str):
    """Per-key ordered ROLLING window aggregate: each turn's character
    volume summed over its conversation's last 4 turns (ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW) — the moving-context-size signal a
    truncation policy reads. One co-locating bucket pass keeps each
    conversation whole; the frame math is pandas' C rolling kernel,
    integer-exact both sides."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import rolling_sum_per_key

    turns = _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(t["text"].combine_chunks(), "")), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return rolling_sum_per_key(
        turns, key="conv_id", order="turn_idx", value="n_chars",
        window=4, out="roll_chars", buckets=16,
    ).select_columns(["conv_id", "turn_idx", "roll_chars"])


def q_running_turn_chars(sf_dir: str):
    """Expanding-frame window (ROWS UNBOUNDED PRECEDING): each turn's
    cumulative conversation character volume — the running context
    size a truncation/budget policy tracks. Same co-locating machinery
    as the rolling frame, per-key cumsum inside the bucket."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import rolling_sum_per_key

    turns = _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(t["text"].combine_chunks(), "")), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return rolling_sum_per_key(
        turns, key="conv_id", order="turn_idx", value="n_chars",
        window=None, out="cum_chars", buckets=16,
    ).select_columns(["conv_id", "turn_idx", "cum_chars"])


def q_embedding_gram(sf_dir: str):
    """Distributed exact-integer Gram matrix over the embedding corpus
    (the PCA/whitening second-moment precursor): per-batch dims×dims
    int64 matmul partials, arbitrary-precision driver accumulation,
    upper triangle out. Oracle replays floor(1e6·x) products via
    unnest + self-join in SQL."""
    from beats_ray.dataops.ann import gram_matrix

    return gram_matrix(
        _table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    )


def q_lang_char_ranks(sf_dir: str):
    """Distributed window function: SQL `rank()` of every document's
    length within its language partition (+ the partition size) — the
    per-group percentile machinery quality pipelines normalize scores
    with. One co-locating bucket pass; each group ranks vectorized
    inside its bucket (hot groups can take the skew_aware lever)."""
    from beats_ray.dataops.agg import map_buckets

    def rank_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang")["n_chars"]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang": df["lang"].to_numpy(),
            "rnk": g.rank(method="min").astype("int64").to_numpy(),
            "n_group": g.transform("size").astype("int64").to_numpy(),
        })

    return map_buckets(
        _table(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        "lang", rank_in_bucket, buckets=8)


def q_conv_stats(sf_dir: str):
    """Per-conversation stats: turn count + time span (min/max/sum
    aggregate coverage with per-batch partial combine)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(df: pd.DataFrame) -> pa.Table:
        sec = df["ts"].astype("datetime64[s]").astype("int64")
        g = (
            pd.DataFrame({"conv_id": df["conv_id"], "sec": sec})
            .groupby("conv_id", as_index=False)
            .agg(n_turns=("sec", "size"), first_s=("sec", "min"), last_s=("sec", "max"))
        )
        g["n_turns"] = g["n_turns"].astype("int64")
        # Arrow out → global aggregate stays on the fast C++ path
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        _transcripts(sf_dir, ["conv_id", "ts"])
        .map_batches(partial, batch_format="pandas")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Min("first_s", alias_name="first_s"),
            Max("last_s", alias_name="last_s"),
        )
    )

    def span(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "span_s", pc.subtract(t["last_s"], t["first_s"])
        )

    return agg.map_batches(span, batch_format="pyarrow")



def q_q3_top_orders(sf_dir: str):
    """TPC-H Q3-shaped: customer (filter segment, semi-join) ⨝ orders ⨝
    lineitem via explicit bucket hash join → top-10 revenue orders.
    Exercises both join strategies + sort/limit with deterministic
    tie-break."""
    from beats_ray.dataops.joins import bucket_hash_join, semi_join

    import pyarrow.compute as pc

    cust = (
        _table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    # moderate block counts: the sort shuffle's cost is dominated by
    # per-sub-block scheduling (blocks × buckets), so 16 fat blocks
    # beat Ray's default fine split ~4× here; the map work per block
    # is light enough that 16 tasks still saturate the readers
    orders = semi_join(
        _table(sf_dir, "orders", ["o_orderkey", "o_custkey"], blocks=16),
        cust.rename(columns={"c_custkey": "o_custkey"}),
        on="o_custkey",
    )

    def li_cents(df: pd.DataFrame) -> pd.DataFrame:
        px = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round((1 - df["l_discount"].to_numpy()) * 100).astype(np.int64)
        flat = pd.DataFrame({"l_orderkey": df["l_orderkey"], "rev_um": px * disc})
        # pre-aggregate per batch (avg ~4 lineitems/order): the bucket
        # join then shuffles one row per (order, batch), not per lineitem
        return flat.groupby("l_orderkey", as_index=False).agg(
            rev_um=("rev_um", "sum")
        )

    li = _table(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
        blocks=16,
    ).map_batches(li_cents, batch_format="pandas")

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        # grouped on the JOIN KEY inside the bucket merge: every
        # l_orderkey lives in exactly one bucket, so this is the EXACT
        # final aggregate — no second global shuffle (the NaN padding of
        # the union had promoted ints to float64; restore)
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue_um=("rev_um", "sum")
        )
        return g.astype({"l_orderkey": "int64", "revenue_um": "int64"})

    agg = bucket_hash_join(
        li, orders, "l_orderkey", "o_orderkey", post=per_order
    )

    from beats_ray.dataops.agg import top_k_by

    # distributed top-10: per-block combiner + global sort over
    # blocks×k rows — the driver only ever receives the 10 winners,
    # never the full per-order aggregate
    top = top_k_by(agg, "revenue_um", "l_orderkey", 10).to_pandas()
    # the union inside the bucket join NaN-pads the other side's columns
    # (int64 → float64); restore exact integer types for the oracle
    return top.astype({"l_orderkey": "int64", "revenue_um": "int64"}).reset_index(
        drop=True
    )


def q_customers_per_region(sf_dir: str):
    """customer ⨝ nation ⨝ region via chained broadcast joins →
    count per region name (the small-dimension star-join shape)."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.dataops.joins import broadcast_join

    nation = _table(sf_dir, "nation").to_pandas()
    region = _table(sf_dir, "region").to_pandas()
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"})
    joined = broadcast_join(
        _table(sf_dir, "customer", ["c_custkey", "c_nationkey"]), dim,
        on="c_nationkey",
    )
    return grouped_count(joined, ["r_name"])



def q_unique_tools(sf_dir: str):
    """Distinct values (ds.unique-class op): the set of tools seen in
    tool-role turns."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import grouped_count

    def distinct(t: pa.Table) -> pa.Table:
        return pa.table({"tool": pc.unique(t["tool"].combine_chunks())})

    # per-batch distinct (combiner) -> global distinct via the Arrow
    # grouped-count reduce (one vectorized aggregate, no per-distinct-key
    # map_groups python call) -> project the key back out
    ds = _transcripts(sf_dir, ["tool"]).map_batches(
        distinct, batch_format="pyarrow"
    )
    return grouped_count(ds, ["tool"]).select_columns(["tool"])


def q_text_len_histogram(sf_dir: str):
    """Histogram of text lengths in 20-char buckets (bucketed count —
    the monitoring-metrics shape)."""
    from beats_ray.dataops.agg import grouped_count

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ln = pc.utf8_length(pc.fill_null(t["text"].combine_chunks(), ""))
        bucket = pc.multiply(pc.divide(ln, 20), 20)
        return pa.table({"len_bucket": pc.cast(bucket, pa.int64())})

    ds = _transcripts(sf_dir, ["text"]).map_batches(
        bucketize, batch_format="pyarrow"
    )
    return grouped_count(ds, ["len_bucket"])


def q_hot_conversations(sf_dir: str):
    """Skew probe: top-10 heaviest conversations by turn count
    (dataops.agg.key_histogram — the pre-count that drives salting
    decisions)."""
    from beats_ray.dataops.agg import key_histogram

    return key_histogram(
        _transcripts(sf_dir, ["conv_id"]), "conv_id", top=10
    )



def q_source_ndjson_counts(sf_dir: str):
    """Source-surface check: read the corpus from NDJSON log FILES
    through the harvester-style line-reader chain + json parser, count
    by role. The oracle reads the same .log files with DuckDB
    read_json — full source round-trip equality."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.sources import read_ndjson_logs, write_ndjson_fixture

    log_dir = write_ndjson_fixture(sf_from_dir(sf_dir))
    ds = read_ndjson_logs(
        sorted(glob.glob(log_dir + "/*.log")), expected={"role": "string"}
    )
    return grouped_count(ds.select_columns(["role"]), ["role"])


def _journal_export_ds(sf_dir: str, keys: list[str] | None = None):
    from beats_ray.sources import read_journal_export, write_journal_export_fixture

    d = write_journal_export_fixture(sf_from_dir(sf_dir))
    return read_journal_export(sorted(glob.glob(d + "/*.export")), keys=keys)


def q_journald_messages(sf_dir: str):
    """journald input round-trip: the corpus exported as
    ``journalctl -o export`` journals (binary framing for multiline
    texts), re-read through the export scanner + the journalfield
    converter (filebeat/input/journald/pkg/journalfield/conv.go), custom
    fields surfaced as typed columns. Per-turn text AND timestamp
    equality — the north rule's row invariant through the journald
    surface."""
    import pyarrow.compute as pc

    from beats_ray.sources import journald_conv

    ds = journald_conv(
        # projection pushdown at the scan: the query consumes only the
        # message, the two custom columns, and the out-of-band ts
        _journal_export_ds(sf_dir, keys=["MESSAGE", "CONV_ID", "TURN_IDX"]),
        custom_columns=["conv_id", "turn_idx"],
        custom_json=False,  # only the typed custom columns are consumed
    )

    def pick(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["journald.custom.conv_id"],
                "turn_idx": pc.cast(t["journald.custom.turn_idx"], pa.int64()),
                "message": t["message"],
                "ts": t["ts"],
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def q_journald_unit_counts(sf_dir: str):
    """journald conversion + journalctl-style filtering: include_matches
    given in ECS vocabulary ('+' = OR-group separator, matcher.go Build
    translates names back to journal keys) keep journal-transport
    entries OR bash-identified ones; counts per (systemd unit, syslog
    priority)."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.sources import journald_conv

    ds = journald_conv(
        # pushdown keeps the consumed unit/priority keys AND the two
        # keys the include_matches filter probes
        _journal_export_ds(sf_dir, keys=[
            "_SYSTEMD_UNIT", "PRIORITY", "_TRANSPORT", "SYSLOG_IDENTIFIER",
        ]),
        include_matches=[
            "systemd.transport=journal", "+", "log.syslog.appname=bash",
        ],
        custom_json=False,  # only unit+priority are consumed
    )

    def pick(t: pa.Table) -> pa.Table:
        return pa.table(
            {"unit": t["systemd.unit"], "priority": t["log.syslog.priority"]}
        )

    return grouped_count(
        ds.map_batches(pick, batch_format="pyarrow"), ["unit", "priority"]
    )


def _winlog_xml_ds(sf_dir: str):
    from beats_ray.sources import read_winlog_xml, write_winlog_xml_fixture

    d = write_winlog_xml_fixture(sf_from_dir(sf_dir))
    return read_winlog_xml(sorted(glob.glob(d + "/*.xml")))


def q_winlog_messages(sf_dir: str):
    """winlog input round-trip: the corpus exported as event XML
    (``wevtutil /f:xml`` interchange format), re-read through the
    exported-XML scanner + the winevent decode/ToEvent mapping
    (winlogbeat/eventlog/eventlog.go:71-103).  Per-turn message AND
    timestamp equality — the north rule's row invariant through the
    winlog surface (empty texts decode to null: AddOptional skips
    zero values)."""
    import pyarrow.compute as pc

    from beats_ray.sources import winlog_events

    ds = winlog_events(
        _winlog_xml_ds(sf_dir), event_data_columns=["ConvId", "TurnIdx"],
        winlog_json=False,  # JSON map unused -> all-Arrow decode path
    )

    def pick(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["winlog.event_data.ConvId"],
                "turn_idx": pc.cast(t["winlog.event_data.TurnIdx"],
                                    pa.int64()),
                "message": t["message"],
                "ts": t["ts"],
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def q_winlog_eventid_counts(sf_dir: str):
    """winlog recordFilter semantics (record_filter.go:78-120): event_id
    include ranges with a '-' exclusion, 'information,error' level
    aliasing (info = raw 0 OR 4), then counts per (provider,
    event.code)."""
    from beats_ray.dataops.agg import grouped_count
    from beats_ray.sources import winlog_events

    ds = winlog_events(
        _winlog_xml_ds(sf_dir),
        event_id="1000-1007,-1003",
        level="information,error",
        winlog_json=False,  # JSON map unused -> all-Arrow decode path
    )

    def pick(t: pa.Table) -> pa.Table:
        return pa.table(
            {"provider": t["event.provider"], "event_code": t["event.code"]}
        )

    return grouped_count(
        ds.map_batches(pick, batch_format="pyarrow"),
        ["provider", "event_code"],
    )


def _kafka_ds(sf_dir: str, topics, isolation_level="read_uncommitted"):
    from beats_ray.sources import (
        read_kafka_segments,
        write_kafka_segments_fixture,
    )

    d = write_kafka_segments_fixture(sf_from_dir(sf_dir))
    return read_kafka_segments(d, topics,
                               isolation_level=isolation_level)


def q_kafka_messages(sf_dir: str):
    """kafka input round-trip over the broker's public on-disk segment
    format (RecordBatch v2, KIP-98) at isolation_level=read_committed:
    CRC32C-checked batches (alternating gzip codec), control batches
    skipped, aborted transactions (the fixture's role='system' turns)
    dropped, event mapping per input.go:436-470 (message=value,
    kafka.{partition,offset,key,headers}, ts=CreateTime).  Per-record
    message+ts+offset+partition equality — committed offsets are dense
    0..n-1 in (conv_id, turn_idx) order, so SQL replays them with
    ROW_NUMBER."""
    import pyarrow.compute as pc

    ds = _kafka_ds(sf_dir, ["transcripts"], "read_committed")

    def pick(t: pa.Table) -> pa.Table:
        hdr0 = pc.list_element(t["kafka.headers"], 0)  # "turn_idx: N"
        turn = pc.cast(pc.utf8_slice_codeunits(hdr0, 10, 99), pa.int64())
        return pa.table({
            "conv_id": t["kafka.key"],
            "turn_idx": turn,
            "partition": pc.cast(t["kafka.partition"], pa.int64()),
            "offset": t["kafka.offset"],
            "message": t["message"],
            "ts": t["ts"],
        })

    return ds.map_batches(pick, batch_format="pyarrow")


def q_kafka_partition_offsets(sf_dir: str):
    """kafka segment scan at isolation_level=read_uncommitted: aborted
    transactional records ARE delivered (sarama only ever hides control
    batches), and offset assignment around the abort markers (which
    consume offsets but carry no event) is checked in aggregate: per
    partition, event count and the offset checksum."""
    from ray.data.aggregate import Sum

    ds = _kafka_ds(sf_dir, ["transcripts"], "read_uncommitted")

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = (pa.table({
            "partition": pc.cast(t["kafka.partition"], pa.int64()),
            "offset": t["kafka.offset"],
        }).group_by(["partition"])
           .aggregate([("offset", "count"), ("offset", "sum")]))
        return g.rename_columns(["partition", "n", "sum_offset"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("partition")
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sum_offset", alias_name="sum_offset")))


def q_kafka_expanded_turns(sf_dir: str):
    """expand_event_list_from_field (input.go:369-434): the 'bundles'
    topic carries one azure-fileset-shaped record per conversation
    ({"records": [...]}); each array element is re-emitted as its own
    message with the record's kafka metadata repeated, then JSON-parsed
    back to typed columns (pyarrow's C++ JSON reader per batch)."""
    from beats_ray.sources import kafka_events

    ds = kafka_events(_kafka_ds(sf_dir, ["bundles"]),
                      expand_event_list_from_field="records")

    def pick(t: pa.Table) -> pa.Table:
        from pyarrow import json as pajson

        msgs = t["message"]
        if len(msgs) == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "role": pa.array([], pa.string()),
                "message": pa.array([], pa.string()),
                "key": pa.array([], pa.string()),
            })
        blob = "\n".join(msgs.to_pylist()).encode()
        parsed = pajson.read_json(pa.BufferReader(blob))
        return pa.table({
            "conv_id": parsed["conv_id"],
            "turn_idx": parsed["turn_idx"],
            "role": parsed["role"],
            "message": parsed["text"],
            "key": t["kafka.key"],
        })

    return ds.map_batches(pick, batch_format="pyarrow")


def _redis_slowlog_ds(sf_dir: str):
    """Spin the deterministic 4-host scripted RESP fleet (the stand-in
    for live redis, like the reference's mocked-conn input tests),
    harvest it over real localhost TCP with the pipelined SLOWLOG
    GET/RESET/ROLE cycle, and return the materialized event table —
    a SLOWLOG is a small bounded buffer per host (slowlog-max-len), so
    materializing the harvest is a bounded collect by construction;
    the scale axis is the host fan-out inside read_redis_slowlog."""
    from beats_ray.sources import read_redis_slowlog, start_scripted_redis

    servers, addrs = start_scripted_redis(sf_from_dir(sf_dir))
    try:
        return read_redis_slowlog(addrs).materialize()
    finally:
        for s in servers:
            s.close()


def q_redis_slowlog_events(sf_dir: str):
    """redis input round-trip (filebeat/input/redis harvester.go): the
    full pipelined SLOWLOG GET + RESET + ROLE exchange over real RESP2
    TCP against the scripted fleet, 4-field (pre-6.0, hosts 2-3) and
    6-field (6.0+, hosts 0-1) entry shapes, args->cmd/key split, and
    the event mapping (message = args joined, redis.slowlog.*,
    @timestamp = the entry's unix seconds).  Oracle replays the
    deterministic fixture mapping documented at
    scripted_slowlog_entries."""

    def pick(t: pa.Table) -> pa.Table:
        return t.drop_columns(["redis.slowlog.args"])  # list col: pytest-only

    return _redis_slowlog_ds(sf_dir).map_batches(
        pick, batch_format="pyarrow")


def q_redis_cmd_durations(sf_dir: str):
    """Slowlog events composed with the ordinary aggregate tier:
    total duration and count per command across the whole fleet."""
    from ray.data.aggregate import Count, Sum

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({
            "cmd": t["redis.slowlog.cmd"],
            "dur": t["redis.slowlog.duration.us"],
        })

    return (_redis_slowlog_ds(sf_dir)
            .map_batches(pick, batch_format="pyarrow")
            .groupby("cmd")
            .aggregate(Count(alias_name="n"),
                       Sum("dur", alias_name="total_us")))


def _mqtt_ds(sf_dir: str, topics, qos: int = 1):
    """Spin the deterministic 4-broker scripted fleet, run one full
    MQTT 3.1.1 session per broker (real localhost TCP, CONNECT/
    SUBSCRIBE/PUBLISH+acks until broker close) broker-parallel, and
    return the materialized message table — each script is a bounded
    per-window replay; the scale axis is the broker fan-out."""
    from beats_ray.sources import read_mqtt, start_scripted_mqtt

    brokers, addrs = start_scripted_mqtt(sf_from_dir(sf_dir))
    try:
        return read_mqtt(addrs, topics, qos=qos).materialize()
    finally:
        for b in brokers:
            b.close()


def q_mqtt_messages(sf_dir: str):
    """mqtt input round-trip (filebeat/input/mqtt input.go:111-135):
    QoS1 subscriptions to conv/+/user and conv/+/assistant — the '+'
    single-level wildcard selects two of the four roles at the broker
    — delivered qos = min(publish qos, granted), packet ids assigned
    per broker in delivery order of qos>0 messages, retained flag on
    turn 0.  Oracle replays the scripted_mqtt_messages mapping."""
    ds = _mqtt_ds(sf_dir, ["conv/+/user", "conv/+/assistant"], qos=1)

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({
            "topic": t["mqtt.topic"],
            "message": t["message"],
            "qos": t["mqtt.qos"],
            "retained": t["mqtt.retained"],
            "message_id": t["mqtt.message_id"],
        })

    return ds.map_batches(pick, batch_format="pyarrow")


def q_mqtt_topic_counts(sf_dir: str):
    """The '#' multi-level wildcard (the input's default topics
    config) + aggregation: per role level of the topic, message count
    and total payload bytes."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _mqtt_ds(sf_dir, ["#"], qos=0)

    def pick(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["mqtt.topic"], "/")
        return pa.table({
            "role": pc.list_element(parts, 2),
            "nbytes": pc.binary_length(t["message"]),
        })

    return (ds.map_batches(pick, batch_format="pyarrow")
              .groupby("role")
              .aggregate(Count(alias_name="n"),
                         Sum("nbytes", alias_name="total_bytes")))


def q_mask_pii_rows(sf_dir: str):
    """PII masking chain (email/IP/phone/SSN regex substitution) over
    turn text — vectorized replace kernels, oracle = the identical
    nested regexp_replace chain."""
    from beats_ray.dataops.pii import mask_pii

    ds = mask_pii(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]),
        field="text",
        target="masked_text",
    )
    return ds.select_columns(["conv_id", "turn_idx", "masked_text"])


def q_top_words(sf_dir: str):
    """Corpus vocabulary: top-20 words across documents (map-reduce
    word count with per-batch Arrow partials)."""
    from beats_ray.dataops.pii import top_words

    return top_words(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16), k=20
    )



def q_asof_click_view(sf_dir: str):
    """As-of join: each click event matched to the user's most recent
    prior view event (backward, exact-ts allowed). Oracle: DuckDB
    ASOF LEFT JOIN."""
    from beats_ray.dataops.joins import asof_join

    import pyarrow.compute as pc

    # moderate fat blocks: the asof join's sort cost scales with
    # map-blocks × buckets (same lever as q3)
    ev = _table(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts"],
        blocks=16,
    )

    def pick(kind: str, id_name: str):
        def go(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], kind)).drop_columns(
                ["event_type"]
            )
            return t.rename_columns(
                [id_name if c == "event_id" else c for c in t.column_names]
            )

        return go

    clicks = ev.map_batches(pick("click", "event_id"), batch_format="pyarrow")
    views = ev.map_batches(pick("view", "view_id"), batch_format="pyarrow")
    # equal-ts views resolve to the max view_id — deterministic across
    # runs and mirrored in the oracle's pre-dedupe
    joined = asof_join(clicks, views, key="user_id", ts_col="ts",
                       tie_cols=["view_id"])

    def out(df: pd.DataFrame) -> pd.DataFrame:
        res = df[["event_id", "user_id", "view_id"]].copy()
        res["event_id"] = res["event_id"].astype("int64")
        res["user_id"] = res["user_id"].astype("int64")
        # no-prior-view sentinel -1 on BOTH sides (nullable-int vs
        # float-NaN dtype drift across engines is not worth the risk)
        res["view_id"] = res["view_id"].fillna(-1).astype("int64")
        return res

    return joined.map_batches(out, batch_format="pandas")


def q_distinct_tools_per_role(sf_dir: str):
    """Grouped distinct count: per role, how many distinct tools —
    two-level distinct (per-batch pair dedup → global pair dedup →
    count), shuffle moves unique pairs only."""
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        g = t.select(["role", "tool"]).group_by(["role", "tool"]).aggregate([])
        return g

    uniq = (
        _transcripts(sf_dir, ["role", "tool"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["role", "tool"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    return uniq.groupby("role").aggregate(Count(alias_name="n_tools"))



def q_normalized_docs(sf_dir: str):
    """Canonical text normalization (NFC + lower + whitespace collapse)."""
    from beats_ray.dataops.textnorm import normalize_text

    ds = normalize_text(_table(sf_dir, "documents", ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "norm_text"])


def q_repetition_score(sf_dir: str):
    """Degenerate-repetition signal: words + top-word count per doc."""
    from beats_ray.dataops.textnorm import repetition_score

    return repetition_score(_table(sf_dir, "documents", ["doc_id", "text"]))


def q_lexical_diversity(sf_dir: str):
    """Type-token ratio inputs: words / distinct words / hapax per doc."""
    from beats_ray.dataops.textnorm import lexical_diversity

    return lexical_diversity(_table(sf_dir, "documents", ["doc_id", "text"]))


def q_boilerplate_clean_turns(sf_dir: str):
    """RefinedWeb-style boilerplate-line removal over the transcript
    corpus: any line present in >= 20 distinct conversations is dropped
    from every turn (repeated stack frames, nav chrome)."""
    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    corpus = _transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    return remove_boilerplate_lines(
        corpus, keys=("conv_id", "turn_idx"), id_col="conv_id", min_docs=20
    )


def q_contamination_screen(sf_dir: str):
    """Benchmark-overlap screen: 3-gram hits of each doc against a probe
    set built from the first 5 documents (self-probe → those 5 are fully
    contaminated; unrelated docs are not). Rows-only (hash-set op)."""
    from beats_ray.dataops.textnorm import contamination_screen

    import pyarrow.compute as pc

    probe = (
        _table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 5)), batch_format="pyarrow"
        )
        .to_pandas()["text"]
        .tolist()
    )
    return contamination_screen(
        _table(sf_dir, "documents", ["doc_id", "text"]), probe
    )



def q_flow_sessions(sf_dir: str):
    """Packetbeat-flow expiry semantics: inactivity-split flows per
    (user, event_type) with start/end/count (30 s timeout)."""
    from beats_ray.dataops.flows import flow_sessions

    return flow_sessions(
        _table(sf_dir, "events", ["user_id", "event_type", "ts"], blocks=16),
        timeout_s=30,
    )



def q_tpch_q6(sf_dir: str):
    """TPC-H Q6-shaped: filtered revenue (pruned read -> per-batch
    partial -> one-row global sum; no wide shuffle at all)."""
    from ray.data.aggregate import Sum

    li = _table(
        sf_dir, "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            (df["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (df["l_shipdate"] < pd.Timestamp("1997-01-01"))
            & (df["l_discount"] >= 0.05)
            & (df["l_discount"] <= 0.07)
            & (df["l_quantity"] < 24)
        )
        sub = df[m]
        um = (
            np.round(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * np.round(sub["l_discount"].to_numpy() * 100).astype(np.int64)
        )
        return pd.DataFrame({"_g": [0], "revenue_um": [int(um.sum())],
                             "n": [int(m.sum())]})

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("_g")
        .aggregate(Sum("revenue_um", alias_name="revenue_um"),
                   Sum("n", alias_name="n"))
    )
    return agg.drop_columns(["_g"])



def q_role_level_pivot(sf_dir: str):
    """Pivot-style conditional aggregation: per role, counts of each
    dissect level as columns (wide matrix from long data — one partial
    pass, tiny global sum)."""
    from ray.data.aggregate import Sum

    from beats_ray.processors import build_processor

    proc = build_processor(
        {
            "dissect": {
                "tokenizer": 'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg="%{msg}"',
                "ignore_failure": True,
            }
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = proc(t)
        lvl = t["dissect.level"].combine_chunks()
        cols = {"role": t["role"]}
        for name in ("info", "warn", "error", "debug"):
            cols[f"n_{name}"] = pc.cast(
                pc.fill_null(pc.equal(lvl, name), False), pa.int64()
            )
        flat = pa.table(cols)
        g = flat.group_by(["role"]).aggregate(
            [(f"n_{n}", "sum") for n in ("info", "warn", "error", "debug")]
        )
        return g.rename_columns(
            ["role", "n_info", "n_warn", "n_error", "n_debug"]
        )

    return (
        _transcripts(sf_dir, ["role", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("role")
        .aggregate(
            *[Sum(f"n_{n}", alias_name=f"n_{n}")
              for n in ("info", "warn", "error", "debug")]
        )
    )


# adaptive-join broadcast cutoffs (module-level so tests can force the
# bucket-join fallback paths and assert equality)
_Q5_BROADCAST_LIMIT = 2_000_000
_Q18_BROADCAST_LIMIT = 100_000


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5-shaped: the 6-table local-supplier-volume chain.
    region→nation prune as driver-side dims (tiny), customer⨝orders
    and lineitem⨝(orders⨝customer) as bucket hash joins (both sides
    grow with the corpus — no broadcast), supplier as a broadcast
    suppkey→nationkey lookup (the smallest fact dim; ships once via
    ray.put, probed with one searchsorted per batch), the same-nation
    filter + per-nation partial aggregate fused into the join merge
    task. Revenue in integer cents-of-cents (house exactness rule)."""
    from beats_ray.dataops.joins import _resolve_ref, bucket_hash_join
    from beats_ray.dataops.stagecache import task_stage

    import pyarrow.compute as pc

    nation = _table(sf_dir, "nation").to_pandas()
    region = _table(sf_dir, "region").to_pandas()
    asia_rk = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    nsel = nation.loc[nation["n_regionkey"].isin(asia_rk)]
    nkeys = pa.array(nsel["n_nationkey"].to_numpy(dtype="int64"))
    name_of = dict(zip(nsel["n_nationkey"], nsel["n_name"]))

    cust = _table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=nkeys)),
        batch_format="pyarrow",
    )
    lo = pd.Timestamp("1996-01-01").to_datetime64()
    hi = pd.Timestamp("1997-01-01").to_datetime64()
    orders = _table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=16
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        ).drop_columns(["o_orderdate"]),
        batch_format="pyarrow",
    )
    # first join, same adaptive rule: the region-filtered customer dim
    # broadcasts into the orders scan when bounded (zero shuffles);
    # bucket join is the unbounded fallback
    cust = cust.materialize()
    if cust.count() <= _Q5_BROADCAST_LIMIT:
        cp = cust.to_pandas().sort_values("c_custkey")
        ck_ref = ray.put((cp["c_custkey"].to_numpy(dtype="int64"),
                          cp["c_nationkey"].to_numpy(dtype="int64")))

        class _OrdProbe:
            def __init__(self, ref):
                self.ck, self.cn = _resolve_ref(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ok = t["o_custkey"].to_numpy()
                if not len(self.ck):
                    found = np.zeros(len(ok), dtype=bool)
                    pos = np.zeros(len(ok), dtype=np.int64)
                else:
                    pos = np.minimum(np.searchsorted(self.ck, ok),
                                     len(self.ck) - 1)
                    found = self.ck[pos] == ok
                return pa.table({
                    "o_orderkey": pa.array(
                        t["o_orderkey"].to_numpy()[found], pa.int64()),
                    "c_nationkey": pa.array(self.cn[pos][found], pa.int64()),
                })

        oc = orders.map_batches(task_stage(_OrdProbe, ref=ck_ref),
                                batch_format="pyarrow").materialize()
    else:
        oc = bucket_hash_join(
            orders, cust, "o_custkey", "c_custkey",
            post=lambda df: df[["o_orderkey", "c_nationkey"]],
        ).materialize()

    supp = _table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    order_idx = np.argsort(supp["s_suppkey"].to_numpy())
    supp_ref = ray.put((
        supp["s_suppkey"].to_numpy(dtype="int64")[order_idx],
        supp["s_nationkey"].to_numpy(dtype="int64")[order_idx],
    ))

    class _LiRev:
        """Per-batch: integer-cents revenue + supplier nation via one
        searchsorted probe, pre-aggregated per (orderkey, nation).
        With ``oc_ref`` set, the orders⨝customer side is a broadcast
        sorted array probed in the SAME pass (found-mask drops
        lineitems outside the date/region window) and the per-nation
        aggregate fuses here too — the whole query is then one
        lineitem scan with no second shuffle."""

        def __init__(self, ref, oc_ref=None):
            self.keys, self.nats = _resolve_ref(ref)
            self.oc = _resolve_ref(oc_ref) if oc_ref is not None else None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            px = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            disc = np.round((1 - df["l_discount"].to_numpy()) * 100).astype(np.int64)
            pos = np.searchsorted(self.keys, df["l_suppkey"].to_numpy())
            flat = pd.DataFrame({
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "s_nationkey": self.nats[pos],
                "rev_um": px * disc,
            })
            if self.oc is None:
                return flat.groupby(["l_orderkey", "s_nationkey"],
                                    as_index=False).agg(rev_um=("rev_um", "sum"))
            okeys, onats = self.oc
            if not len(okeys):
                return pd.DataFrame({"s_nationkey": pd.array([], "int64"),
                                     "revenue_um": pd.array([], "int64")})
            p = np.searchsorted(okeys, flat["l_orderkey"].to_numpy())
            p_c = np.minimum(p, len(okeys) - 1)
            found = okeys[p_c] == flat["l_orderkey"].to_numpy()
            m = flat.loc[found & (onats[p_c] == flat["s_nationkey"].to_numpy())]
            g = m.groupby("s_nationkey", as_index=False).agg(
                revenue_um=("rev_um", "sum"))
            return g.astype({"s_nationkey": "int64", "revenue_um": "int64"})

    li_cols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    # adaptive second join (house minhash broadcast_limit pattern): the
    # date/region-windowed oc table is usually far smaller than
    # lineitem — broadcast it and fuse join+aggregate into the scan;
    # the bucket join below is the unbounded-window scale path
    if oc.count() <= _Q5_BROADCAST_LIMIT:
        ocp = oc.to_pandas().sort_values("o_orderkey")
        oc_ref = ray.put((
            ocp["o_orderkey"].to_numpy(dtype="int64"),
            ocp["c_nationkey"].to_numpy(dtype="int64"),
        ))
        parts = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_LiRev, ref=supp_ref, oc_ref=oc_ref),
            batch_format="pandas",
        ).to_pandas()
    else:
        li = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_LiRev, ref=supp_ref), batch_format="pandas")

        def per_nation(df: pd.DataFrame) -> pd.DataFrame:
            # fused into the merge task: same-nation filter + per-nation
            # partial sum (final tiny combine happens on the driver — the
            # result space is |nations| × buckets rows)
            m = df.loc[df["s_nationkey"] == df["c_nationkey"]]
            g = m.groupby("s_nationkey", as_index=False).agg(
                revenue_um=("rev_um", "sum"))
            return g.astype({"s_nationkey": "int64", "revenue_um": "int64"})

        parts = bucket_hash_join(
            li, oc, "l_orderkey", "o_orderkey", post=per_nation
        ).to_pandas()
    out = parts.groupby("s_nationkey", as_index=False).agg(
        revenue_um=("revenue_um", "sum"))
    out["n_name"] = out["s_nationkey"].map(name_of)
    out = out.sort_values(["revenue_um", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["n_name", "revenue_um"]].astype({"revenue_um": "int64"})


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18-shaped: large-volume-customer. The HAVING over the
    per-order lineitem quantity sum is fused into the lineitem⨝orders
    bucket merge (orderkey is the join key, so the grouped sum is
    exact there — no extra shuffle); survivors join customer via a
    second bucket join; top-100 by (totalprice desc, date, orderkey)
    via per-block prefilter + one tiny global sort."""
    from beats_ray.dataops.joins import bucket_hash_join

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        qty = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        flat = pd.DataFrame({"l_orderkey": df["l_orderkey"], "sum_qty": qty})
        return flat.groupby("l_orderkey", as_index=False).agg(
            sum_qty=("sum_qty", "sum"))

    li = _table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"],
                blocks=16).map_batches(li_part, batch_format="pandas")
    orders = _table(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"], blocks=16,
    )

    def having(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            as_index=False,
        ).agg(sum_qty=("sum_qty", "sum"))
        g = g.loc[g["sum_qty"] > 140]
        out = pd.DataFrame({
            "o_orderkey": g["l_orderkey"].astype("int64"),
            "o_custkey": g["o_custkey"].astype("int64"),
            "o_orderdate": g["o_orderdate"],
            "o_totalprice_um": np.round(
                g["o_totalprice"].to_numpy() * 100).astype(np.int64),
            "sum_qty": g["sum_qty"].astype("int64"),
        })
        return out

    big = bucket_hash_join(li, orders, "l_orderkey", "o_orderkey",
                           post=having).materialize()
    cust = _table(sf_dir, "customer", ["c_custkey", "c_name"])
    cols = ["c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice_um", "sum_qty"]
    # the HAVING survivors are rare (TPC-H Q18 returns ~1 order per
    # 15k): when bounded, finish driver-side — filter the customer
    # scan by the survivor key set (broadcast semi-join) and do the
    # tiny top-100 locally, no second shuffle. Bucket join fallback
    # for a non-selective HAVING.
    if big.count() <= _Q18_BROADCAST_LIMIT:
        import pyarrow.compute as _pc

        bp = big.to_pandas()
        keys = pa.array(np.unique(bp["o_custkey"].to_numpy()), pa.int64())
        cp = cust.map_batches(
            lambda t: t.filter(_pc.is_in(t["c_custkey"], value_set=keys)),
            batch_format="pyarrow",
        ).to_pandas()
        top = (bp.merge(cp, left_on="o_custkey", right_on="c_custkey")
               .sort_values(["o_totalprice_um", "o_orderdate", "o_orderkey"],
                            ascending=[False, True, True])
               .head(100).reset_index(drop=True))
    else:
        joined = bucket_hash_join(big, cust, "o_custkey", "c_custkey")

        def block_top(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(
                ["o_totalprice_um", "o_orderdate", "o_orderkey"],
                ascending=[False, True, True],
            ).head(100)

        top = (
            joined.map_batches(block_top, batch_format="pandas")
            .map_batches(lambda df: df.assign(_neg=-df["o_totalprice_um"]),
                         batch_format="pandas")
            .sort(["_neg", "o_orderdate", "o_orderkey"])
            .limit(100)
            .to_pandas()
        )
    return top[cols].astype(
        {"o_custkey": "int64", "o_orderkey": "int64",
         "o_totalprice_um": "int64", "sum_qty": "int64"}
    ).reset_index(drop=True)


def q_line_dedup_turns(sf_dir: str):
    """Corpus-global first-occurrence line dedup over the transcript
    turns (paragraph-dedup archetype at line granularity): every
    distinct non-blank line survives only at its first
    (conv_id, turn_idx, line_idx) position."""
    from beats_ray.dataops.textnorm import dedup_lines_global

    return dedup_lines_global(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]),
        text_col="text", keys=("conv_id", "turn_idx"),
    )


def q_unigram_logprob(sf_dir: str):
    """Perplexity-filter archetype: fit an add-one-smoothed unigram LM
    on the documents corpus (top-5000 vocab), score every doc in
    integer micro-nats."""
    from beats_ray.dataops.lm import unigram_nll

    return unigram_nll(
        _table(sf_dir, "documents", ["doc_id", "text"]), model_k=5000
    )


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023 class): hashed
    unigram+bigram feature distributions fit for the lang='en' target
    slice vs the raw corpus (one bounded-key shuffle), per-doc integer
    micro-nat log-ratio sums via a broadcast 1024-entry table."""
    from beats_ray.dataops.lm import dsir_weights

    return dsir_weights(
        _table(sf_dir, "documents", ["doc_id", "text", "lang"]),
        target_col="lang", target_value="en",
    )


def q_bigram_logprob(sf_dir: str):
    """Conditional extension of the unigram perplexity filter (KenLM
    n-gram class): fit a bounded add-one bigram LM (top-5000 unigram
    vocab, top-20000 bigrams restricted to in-vocab contexts), score
    every doc's adjacent pairs in integer micro-nats."""
    from beats_ray.dataops.lm import bigram_nll

    return bigram_nll(
        _table(sf_dir, "documents", ["doc_id", "text"]),
        model_k=5000, bigram_k=20000,
    )


def q_ccnet_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail split (Wenzek et al. 2020): unigram-LM
    avg NLL per doc, exact tercile boundaries via distributed
    rank-select (integer tercile ranks both sides), per-doc bucket
    tags; token-less docs land in 'empty'."""
    from beats_ray.dataops.lm import ccnet_ppl_buckets

    return ccnet_ppl_buckets(
        _table(sf_dir, "documents", ["doc_id", "text"]), model_k=5000
    )


def q_nb_quality_docs(sf_dir: str):
    """fastText-class quality-filter archetype (GPT-3 pipeline): fit a
    binary multinomial Naive Bayes on lang='en' vs rest (top-5000
    vocab, one grouped shuffle), score every doc with the broadcast
    integer micro-nat log-odds table; pred = posterior log-odds > 0."""
    from beats_ray.dataops.lm import nb_classify

    return nb_classify(
        _table(sf_dir, "documents", ["doc_id", "text", "lang"]),
        label_col="lang", positive_value="en", model_k=5000,
    )


def q_chunk_docs(sf_dir: str):
    """Sliding-window chunking for retrieval/context prep: 64-token
    windows every 48 tokens (overlapped), shuffle-free expansion."""
    from beats_ray.dataops.sampling import chunk_documents

    return chunk_documents(
        _table(sf_dir, "documents", ["doc_id", "text"]),
        size=64, stride=48,
    )


_BM25_QUERIES = {
    "q_sort": "fast sort merge",
    "q_scan": "table scan filter",
    "q_win": "window agg group",
}


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval: top-10 documents for each of three fixed
    queries. Bounded fit pass (N, Σdl, per-term df), broadcast idf,
    shuffle-free scoring with per-block top-k, one tiny grouped
    finish. Integer micro-unit scores (floor per (term, doc) BEFORE
    the per-doc sum) so the SQL oracle is bit-exact."""
    from beats_ray.dataops.invindex import bm25_topk

    return bm25_topk(
        _table(sf_dir, "documents", ["doc_id", "text"]),
        queries=_BM25_QUERIES, k=10,
    )


def q_trending_terms(sf_dir: str):
    """Trending terms per hour: top-5 ws-tokens per tumbling hourly
    window over the transcript timeline (count desc, term asc) —
    per-batch partial counts, one window-keyed co-locating shuffle."""
    from beats_ray.dataops.textstats import windowed_top_terms

    return windowed_top_terms(
        _transcripts(sf_dir, ["ts", "text"]), k=5, window="h")


def q_embedding_outliers(sf_dir: str):
    """Embedding-quality screen: per-vector squared distance to its
    label's centroid in exact integer micro-units (fit = bounded
    labels×dims driver state; score = one shuffle-free broadcast
    pass). The curation step that drops far-from-prototype vectors."""
    from beats_ray.dataops.ann import centroid_outliers

    return centroid_outliers(_table(sf_dir, "embeddings"))


def q_embedding_kmeans(sf_dir: str):
    """Full-corpus distributed k-means (SemDeDup / cluster-curation
    archetype): 2 Lloyd iterations over the whole embedding table, each
    a distributed partials pass against broadcast centroids (driver
    state = k×dims int64s, bounded however large the corpus), exact
    integer micro-unit arithmetic so the SQL oracle replays every
    iteration bit-for-bit. Returns (vec_id, cluster, dist2_um2)."""
    from beats_ray.dataops.ann import kmeans_clusters

    return kmeans_clusters(_table(sf_dir, "embeddings"), k=4, iters=2)


def q_cluster_balanced_sample(sf_dir: str):
    """Cluster-balanced diversity sampling (the SemDeDup-style
    curation step after clustering): k-means partitions the embedding
    space, then exactly 30 vectors per LEARNED cluster survive by
    smallest content hash — the balanced-subset sampler applied to a
    computed group column instead of a label. Both stages stream;
    driver state is k×dims ints + nothing from the sampler."""
    from beats_ray.dataops.ann import kmeans_clusters
    from beats_ray.dataops.sampling import sample_exact_k_per_group

    assign = kmeans_clusters(_table(sf_dir, "embeddings"), k=4, iters=2)
    return sample_exact_k_per_group(assign, 30, group="cluster",
                                    key="vec_id")


def q_shuffled_shards(sf_dir: str):
    """Deterministic equal-size shuffle-sharding (pre-training 'global
    shuffle then split into N shards'): a distributed ntile over the
    md5 hash order — histogram rank-select finds the 7 boundary
    (hash, key) pairs (no global sort, nothing row-sized on the
    driver), one broadcast pass assigns shards."""
    from beats_ray.dataops.sampling import shuffle_shards

    return shuffle_shards(
        _table(sf_dir, "documents", ["doc_id"]), n_shards=8)


def q_textrank_keywords(sf_dir: str):
    """TextRank corpus keywords (Mihalcea & Tarau 2004): damped
    PageRank over the adjacent-word co-occurrence graph of the
    top-300 vocabulary. Nodes are the bounded vocab (driver holds the
    k-row model), edges stay a Dataset, and each of the 3 power
    iterations is one distributed pass — exact integer micro-unit
    arithmetic replayed by the unrolled SQL oracle."""
    from beats_ray.dataops.graph import textrank_scores

    return textrank_scores(
        _table(sf_dir, "documents", ["text"]), vocab_k=300, iters=3)


def q_bpe_token_counts(sf_dir: str):
    """BPE tokenization (Sennrich et al. 2016): fit 20 merges on the
    corpus's top-5000 words (one grouped shuffle + a bounded driver
    merge loop), then count per-doc tokens under the learned merges
    (broadcast merge list, per-DISTINCT-word memoized apply)."""
    from beats_ray.dataops.bpe import bpe_token_counts, fit_bpe

    docs = _table(sf_dir, "documents", ["doc_id", "text"])
    merges = fit_bpe(docs, n_merges=20, vocab_k=5000)
    return bpe_token_counts(docs, merges)


def _bpe_merges_replica(parquet: str, n_merges: int,
                        vocab_k: int) -> list[tuple[str, str]]:
    """Independent scalar BPE fit for the oracle: DuckDB word counts +
    an in-place list-splice merge loop (different implementation from
    beats_ray.dataops.bpe.fit_bpe; same count-desc/pair-asc rule)."""
    from collections import Counter

    import duckdb

    con = duckdb.connect()
    rows = con.execute(rf"""
        SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(list_filter(regexp_split_to_array(
                 lower(coalesce(text, '')), '\s+'), x -> x <> '')) AS t
              FROM read_parquet('{parquet}'))
        GROUP BY 1 ORDER BY c DESC, word LIMIT {vocab_k}""").fetchall()
    vocab = [(list(w), int(c)) for w, c in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cnt: Counter = Counter()
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += c
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for syms, _ in vocab:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [a + b]
                i += 1
    return merges


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4-shaped: order-priority checking — count orders in a
    date window having at least one returned lineitem. The EXISTS is a
    distributed bucket semi-join (per-batch key dedup shrinks the
    shuffled key set), then a tiny grouped count."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import grouped_count
    from beats_ray.dataops.joins import bucket_semi_join

    lo = pd.Timestamp("1996-01-01").to_datetime64()
    hi = pd.Timestamp("1996-04-01").to_datetime64()
    orders = _table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
        blocks=16,
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        ).drop_columns(["o_orderdate"]),
        batch_format="pyarrow",
    )

    def ret_keys(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.equal(t["l_returnflag"], "R"))["l_orderkey"]
        return pa.table({"o_orderkey": pc.unique(keys.combine_chunks())})

    keys = _table(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"],
                  blocks=16).map_batches(ret_keys, batch_format="pyarrow")
    hit = bucket_semi_join(orders, keys, on="o_orderkey")
    return grouped_count(hit, ["o_orderpriority"])


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14-shaped: promotion revenue share for one ship month.
    Lineitem pre-aggregates to per-partkey integer revenue partials
    inside map_batches (the join input shrinks from rows to distinct
    keys), the promo flag applies as a distributed bucket semi-join,
    and both sums finish as one-row aggregates — revenue carried as
    exact cents×percent integers end to end."""
    import pyarrow.compute as pc

    from beats_ray.dataops.joins import bucket_semi_join

    lo = pd.Timestamp("1996-01-01").to_datetime64()
    hi = pd.Timestamp("1996-02-01").to_datetime64()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        sub = df[m]
        um = (
            np.round(sub["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * (100 - np.round(sub["l_discount"].to_numpy() * 100)
               .astype(np.int64))
        )
        return (pd.DataFrame({"l_partkey": sub["l_partkey"].to_numpy(),
                              "um": um})
                .groupby("l_partkey", as_index=False)["um"].sum())

    partials = _table(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        blocks=16,
    ).map_batches(partial, batch_format="pandas").materialize()
    total_um = int(partials.sum("um") or 0)

    def promo_keys(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.equal(t["p_type"], "PROMO"))["p_partkey"]
        return pa.table({"l_partkey": pc.unique(keys.combine_chunks())})

    keys = _table(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        promo_keys, batch_format="pyarrow")
    promo_um = int(
        bucket_semi_join(partials, keys, on="l_partkey").sum("um") or 0)
    return pd.DataFrame({"promo_um": pd.array([promo_um], dtype="int64"),
                         "total_um": pd.array([total_um], dtype="int64")})


def q_tpch_q13(sf_dir: str, broadcast_limit: int = 1_000_000):
    """TPC-H Q13-shaped: customer order-count DISTRIBUTION through a
    LEFT OUTER join — customers whose every order is excluded (or who
    never ordered) land in the c_count=0 bin, the bin an inner join
    silently drops. Order counts pre-aggregate per custkey (bounded by
    |customer|); the outer join is adaptive — under the limit the
    sorted count table broadcasts and each customer batch probes it
    with searchsorted (miss → 0) while emitting its histogram partial
    in the same pass, else bucket_hash_join(how='left') + per-batch
    partials; the final histogram merges via grouped_sum."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import grouped_count, grouped_sum
    from beats_ray.dataops.joins import _resolve_ref, bucket_hash_join

    orders = _table(
        sf_dir, "orders", ["o_custkey", "o_orderpriority"], blocks=16
    ).map_batches(
        lambda t: t.filter(pc.invert(pc.match_like(
            t["o_orderpriority"], "%SPECIFIED%"
        ))).drop_columns(["o_orderpriority"]),
        batch_format="pyarrow",
    )
    counts = grouped_count(orders, ["o_custkey"], name="c_count")
    counts = counts.materialize()
    cust = _table(sf_dir, "customer", ["c_custkey"])

    def hist_table(cc: np.ndarray) -> pa.Table:
        u, n = np.unique(cc, return_counts=True)
        return pa.table({"c_count": pa.array(u, pa.int64()),
                         "custdist": pa.array(n.astype(np.int64))})

    if counts.count() <= broadcast_limit:
        df = counts.to_pandas()
        kk = df["o_custkey"].to_numpy(np.int64)
        vv = df["c_count"].to_numpy(np.int64)
        o = np.argsort(kk)
        ref = ray.put((kk[o], vv[o]))

        def attach(t: pa.Table) -> pa.Table:
            kk2, vv2 = _resolve_ref(ref)
            keys = t["c_custkey"].to_numpy()
            pos = np.searchsorted(kk2, keys)
            posc = np.minimum(pos, max(len(kk2) - 1, 0))
            hit = (pos < len(kk2)) & (kk2[posc] == keys)
            return hist_table(np.where(hit, vv2[posc], 0))

        parts = cust.map_batches(attach, batch_format="pyarrow")
    else:
        joined = bucket_hash_join(cust, counts, "c_custkey", "o_custkey",
                                  how="left")

        def hist(df: pd.DataFrame) -> pa.Table:
            cc = df["c_count"].fillna(0).to_numpy(np.int64)
            return hist_table(cc)

        parts = joined.map_batches(hist, batch_format="pandas")

    out = grouped_sum(parts, "c_count", "custdist").to_pandas()
    out = out.sort_values(["custdist", "c_count"],
                          ascending=[False, False]).reset_index(drop=True)
    return out.astype({"c_count": "int64", "custdist": "int64"})


def q_word_freq_spectrum(sf_dir: str):
    """Zipf/Good-Turing frequency spectrum of the documents corpus:
    (word frequency f → count of distinct words at f); two bounded
    co-locating shuffles, nothing corpus-sized anywhere."""
    from beats_ray.dataops.textstats import word_freq_spectrum

    return word_freq_spectrum(_table(sf_dir, "documents", ["doc_id", "text"]))


def q_cross_source_dups(sf_dir: str, broadcast_limit: int = 1_000_000):
    """Dedup analytics: where do near-duplicates cross corpus sources?
    The MinHash→Jaccard-verified pair graph is RESULT-sized, so the
    adaptive convention applies: when it fits ``broadcast_limit`` the
    endpoint→source label table is built with ONE semi-filtered scan
    of the corpus (broadcast endpoint set, bounded collect), pairs tag
    their endpoints against the broadcast dict, and per-batch combo
    partials merge on the driver (≤ |sources|² cells) — zero shuffles
    after the pair sketch. Above the limit it falls back to the two
    bucket hash joins + distributed grouped count (nothing driver-sized
    in that path)."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import grouped_count
    from beats_ray.dataops.dedup import ngram_jaccard_pairs
    from beats_ray.dataops.joins import bucket_hash_join, semi_join

    pairs = ngram_jaccard_pairs(
        _table(sf_dir, "documents", ["doc_id", "text"], blocks=16),
        n=3, threshold=0.6,
    ).select_columns(["a", "b"]).materialize()
    src = _table(sf_dir, "documents", ["doc_id", "source"])

    if pairs.count() <= broadcast_limit:
        import ray as _ray

        ends: set = set()
        for p in pairs.iter_batches(batch_format="pandas"):
            ends.update(p["a"].tolist())
            ends.update(p["b"].tolist())
        lab = semi_join(
            src, pd.DataFrame({"doc_id": sorted(ends)}), on="doc_id"
        ).to_pandas()  # bounded: ≤ 2·|pairs| rows
        ref = _ray.put(dict(zip(lab["doc_id"], lab["source"])))

        def combos(df: pd.DataFrame) -> pd.DataFrame:
            from beats_ray.dataops.joins import _resolve_ref

            m = _resolve_ref(ref)
            sa = df["a"].map(m)
            sb = df["b"].map(m)
            lo = np.where(sa <= sb, sa, sb)
            hi = np.where(sa <= sb, sb, sa)
            return (pd.DataFrame({"source_lo": lo, "source_hi": hi})
                    .groupby(["source_lo", "source_hi"], as_index=False)
                    .size().rename(columns={"size": "n_pairs"}))

        parts = pairs.map_batches(combos, batch_format="pandas").to_pandas()
        out = (parts.groupby(["source_lo", "source_hi"], as_index=False)
               ["n_pairs"].sum())
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    ja = bucket_hash_join(pairs, src, left_on="a", right_on="doc_id"
                          ).map_batches(
        lambda t: pa.table({"b": t["b"], "source_a": t["source"]}),
        batch_format="pyarrow",
    )
    jb = bucket_hash_join(ja, src, left_on="b", right_on="doc_id")

    def norm(t: pa.Table) -> pa.Table:
        sa, sb = t["source_a"], t["source"]
        lo = pc.if_else(pc.less_equal(sa, sb), sa, sb)
        hi = pc.if_else(pc.less_equal(sa, sb), sb, sa)
        return pa.table({"source_lo": lo, "source_hi": hi})

    return grouped_count(jb.map_batches(norm, batch_format="pyarrow"),
                         ["source_lo", "source_hi"], name="n_pairs")


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22-shaped: per-nation count + balance of above-average
    customers with no RECENT orders (orders since 1999 — the literal
    no-orders-ever predicate is degenerate on this corpus). The average
    is applied as the exact integer cross-product test
    um·n_pos > sum_pos (no float division anywhere), the NOT EXISTS is
    a distributed bucket ANTI-join against per-batch-deduped order
    custkeys, and the finish is a combiner-first grouped sum over
    ≤nations keys."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from beats_ray.dataops.joins import bucket_semi_join

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(),
            "c_nationkey": df["c_nationkey"].to_numpy().astype(np.int64),
            "um": np.round(df["c_acctbal"].to_numpy() * 100).astype(np.int64),
        })

    cu = _table(sf_dir, "customer",
                ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        quant, batch_format="pandas").materialize()

    def pos_part(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["um"].to_numpy()
        pos = pos[pos > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    stats = cu.map_batches(pos_part, batch_format="pandas").materialize()
    s_pos = int(stats.sum("s") or 0)
    n_pos = int(stats.sum("n") or 0)

    rich = cu.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t["um"],
                                                  pa.scalar(n_pos, pa.int64())),
                                      pa.scalar(s_pos, pa.int64()))),
        batch_format="pyarrow",
    )

    cutoff = pd.Timestamp("1999-01-01").to_datetime64()

    def cust_keys(t: pa.Table) -> pa.Table:
        keys = t.filter(
            pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff)))["o_custkey"]
        return pa.table({"c_custkey": pc.unique(keys.combine_chunks())})

    keys = _table(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                  blocks=16).map_batches(cust_keys, batch_format="pyarrow")
    noord = bucket_semi_join(rich, keys, on="c_custkey", anti=True)

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["c_nationkey", "um"]).group_by(["c_nationkey"])
             .aggregate([("um", "sum"), ([], "count_all")]))
        return g.rename_columns(["c_nationkey", "totacctbal_um", "numcust"]
                                ).replace_schema_metadata(None)

    out = (
        noord.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("totacctbal_um", alias_name="totacctbal_um"))
    )

    def typed(t: pa.Table) -> pa.Table:
        # empty anti-join groups ride through pandas and upcast to
        # float; pin the contract dtypes
        return pa.table({c: pc.cast(t[c], pa.int64())
                         for c in ("c_nationkey", "numcust",
                                   "totacctbal_um")})

    return out.map_batches(typed, batch_format="pyarrow")


def _sorted_cols(ds_or_df, by: str, cols: list[str]):
    """Collect a SMALL (dim-sized / pre-bounded) Dataset or frame and
    return the named int64 columns sorted by ``by``. An empty filtered
    Dataset reaches pandas schemaless — this is the house guard for the
    broadcast-side collects in the adaptive joins."""
    df = ds_or_df if isinstance(ds_or_df, pd.DataFrame) else ds_or_df.to_pandas()
    if by not in df.columns:
        return tuple(np.array([], dtype=np.int64) for _ in cols)
    df = df.sort_values(by)
    return tuple(df[c].to_numpy(dtype="int64") for c in cols)


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15-shaped: top supplier(s) by 3-month shipped revenue.
    Lineitem pre-aggregates per-suppkey integer revenue partials inside
    map_batches (the shuffle input shrinks from rows to distinct keys
    per block), ``grouped_sum`` bounds the exchange at |suppliers|
    keys, the MAX + equality filter (the reference's revenue view +
    subquery) run distributed, and only the tie set — result-sized —
    ever reaches the driver, where names attach from the supplier dim."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import grouped_sum

    lo = pd.Timestamp("1996-01-01").to_datetime64()
    hi = pd.Timestamp("1996-04-01").to_datetime64()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        sub = df[m]
        um = (np.round(sub["l_extendedprice"].to_numpy() * 100)
              .astype(np.int64)
              * (100 - np.round(sub["l_discount"].to_numpy() * 100)
                 .astype(np.int64)))
        return (pd.DataFrame({"s_suppkey": sub["l_suppkey"].to_numpy(),
                              "total_revenue_um": um})
                .groupby("s_suppkey", as_index=False)["total_revenue_um"]
                .sum())

    parts = _table(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        blocks=16,
    ).map_batches(partial, batch_format="pandas")
    total = grouped_sum(parts, "s_suppkey", "total_revenue_um").materialize()
    mx_raw = total.max("total_revenue_um") if total.count() else None
    if mx_raw is None:
        return pd.DataFrame({"s_suppkey": pd.array([], "int64"),
                             "s_name": pd.array([], dtype=object),
                             "total_revenue_um": pd.array([], "int64")})
    mx = int(mx_raw)
    best = total.map_batches(
        lambda t: t.filter(pc.equal(t["total_revenue_um"],
                                    pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()  # tie set only — result-sized
    supp = _table(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: t.filter(pc.is_in(
            t["s_suppkey"],
            value_set=pa.array(best["s_suppkey"].to_numpy(dtype="int64")))),
        batch_format="pyarrow",
    ).to_pandas()
    out = best.merge(supp, on="s_suppkey").sort_values("s_suppkey")
    return (out[["s_suppkey", "s_name", "total_revenue_um"]]
            .astype({"s_suppkey": "int64", "total_revenue_um": "int64"})
            .reset_index(drop=True))


def q_tpch_q10(sf_dir: str, broadcast_limit: int = 2_000_000):
    """TPC-H Q10-shaped: top-20 customers by returned-item revenue in a
    quarter. The date-windowed orders side joins adaptively (sorted
    o_orderkey→o_custkey broadcast probed per batch under the limit;
    bucket hash join above it — both paths tested equal), revenue
    partials pre-aggregate per custkey inside the lineitem scan,
    ``grouped_sum`` bounds the exchange at |customers|, the top 20
    resolve via the distributed ``top_k_by`` combiner (the driver only
    ever sees k rows), and customer/nation attributes attach to just
    those 20 keys."""
    import pyarrow.compute as pc

    from beats_ray.dataops.agg import grouped_sum, top_k_by
    from beats_ray.dataops.joins import _resolve_ref, bucket_hash_join
    from beats_ray.dataops.stagecache import task_stage

    lo = pd.Timestamp("1995-10-01").to_datetime64()
    hi = pd.Timestamp("1996-01-01").to_datetime64()
    orders = _table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        blocks=16,
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        ).drop_columns(["o_orderdate"]),
        batch_format="pyarrow",
    ).materialize()

    li_cols = ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]

    class _RetRev:
        """Per-batch: returned rows only, revenue um, probe the
        broadcast order window, partial-aggregate per custkey."""

        def __init__(self, ref):
            self.ok, self.oc = _resolve_ref(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["l_returnflag"].to_numpy() == "R"]
            key = sub["l_orderkey"].to_numpy()
            if not len(self.ok):
                return pd.DataFrame({"o_custkey": pd.array([], "int64"),
                                     "revenue_um": pd.array([], "int64")})
            pos = np.minimum(np.searchsorted(self.ok, key), len(self.ok) - 1)
            found = self.ok[pos] == key
            sub = sub.loc[found]
            um = (np.round(sub["l_extendedprice"].to_numpy() * 100)
                  .astype(np.int64)
                  * (100 - np.round(sub["l_discount"].to_numpy() * 100)
                     .astype(np.int64)))
            return (pd.DataFrame({"o_custkey": self.oc[pos[found]], "revenue_um": um})
                    .groupby("o_custkey", as_index=False)["revenue_um"].sum())

    if orders.count() <= broadcast_limit:
        ref = ray.put(_sorted_cols(orders, "o_orderkey",
                                   ["o_orderkey", "o_custkey"]))
        parts = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_RetRev, ref=ref), batch_format="pandas")
    else:
        def li_partial(df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["l_returnflag"].to_numpy() == "R"]
            um = (np.round(sub["l_extendedprice"].to_numpy() * 100)
                  .astype(np.int64)
                  * (100 - np.round(sub["l_discount"].to_numpy() * 100)
                     .astype(np.int64)))
            return (pd.DataFrame({"l_orderkey": sub["l_orderkey"].to_numpy(),
                                  "revenue_um": um})
                    .groupby("l_orderkey", as_index=False)["revenue_um"].sum())

        li = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            li_partial, batch_format="pandas")

        def per_cust(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("o_custkey", as_index=False)["revenue_um"].sum()
            return g.astype({"o_custkey": "int64", "revenue_um": "int64"})

        parts = bucket_hash_join(li, orders, "l_orderkey", "o_orderkey",
                                 post=per_cust)

    per_cust_rev = grouped_sum(parts, "o_custkey", "revenue_um")
    top = top_k_by(per_cust_rev, "revenue_um", "o_custkey", 20).to_pandas()
    if "o_custkey" not in top.columns:  # empty corpus slice
        return pd.DataFrame({
            "c_custkey": pd.array([], "int64"),
            "c_name": pd.array([], dtype=object),
            "n_name": pd.array([], dtype=object),
            "acctbal_um": pd.array([], "int64"),
            "revenue_um": pd.array([], "int64")})
    keys = pa.array(top["o_custkey"].to_numpy(dtype="int64"))
    cust = _table(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=keys)),
        batch_format="pyarrow",
    ).to_pandas()  # exactly the 20 winners
    nation = _table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = (top.merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    out["acctbal_um"] = np.round(out["c_acctbal"].to_numpy() * 100).astype(np.int64)
    out = out.sort_values(["revenue_um", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "c_name", "n_name", "acctbal_um", "revenue_um"]
               ].astype({"c_custkey": "int64", "revenue_um": "int64"})


def q_tpch_q7(sf_dir: str, broadcast_limit: int = 2_000_000):
    """TPC-H Q7-shaped: bilateral shipping volume between two nations
    by year. Supplier (the smallest fact dim) broadcasts as a sorted
    suppkey→nationkey probe restricted to the two nations; the
    two-nation customer dim joins orders adaptively (broadcast probe /
    bucket hash join); the lineitem scan fuses the date window, both
    probes, the bilateral-pair filter and the per-(supp_nation,
    cust_nation, year) partial aggregate into one pass when the order
    side fits, else the partials meet the order side in a bucket join
    with the aggregate fused into the merge task. Revenue in exact
    integer cents×percent."""
    from beats_ray.dataops.joins import _resolve_ref, bucket_hash_join
    from beats_ray.dataops.stagecache import task_stage

    import pyarrow.compute as pc

    n1, n2 = "NATION_1", "NATION_2"
    nation = _table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    k1 = int(nation.loc[nation["n_name"] == n1, "n_nationkey"].iloc[0])
    k2 = int(nation.loc[nation["n_name"] == n2, "n_nationkey"].iloc[0])
    kset = pa.array([k1, k2], pa.int64())

    supp = _table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["s_nationkey"], value_set=kset)),
        batch_format="pyarrow",
    )
    supp_ref = ray.put(_sorted_cols(supp, "s_suppkey",
                                    ["s_suppkey", "s_nationkey"]))

    cust = _table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=kset)),
        batch_format="pyarrow",
    ).materialize()
    orders = _table(sf_dir, "orders", ["o_orderkey", "o_custkey"], blocks=16)
    if cust.count() <= broadcast_limit:
        ck_ref = ray.put(_sorted_cols(cust, "c_custkey",
                                      ["c_custkey", "c_nationkey"]))

        class _OrdProbe:
            def __init__(self, ref):
                self.ck, self.cn = _resolve_ref(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ok = t["o_custkey"].to_numpy()
                if not len(self.ck):
                    found = np.zeros(len(ok), dtype=bool)
                    pos = np.zeros(len(ok), dtype=np.int64)
                else:
                    pos = np.minimum(np.searchsorted(self.ck, ok),
                                     len(self.ck) - 1)
                    found = self.ck[pos] == ok
                return pa.table({
                    "o_orderkey": pa.array(
                        t["o_orderkey"].to_numpy()[found], pa.int64()),
                    "c_nationkey": pa.array(self.cn[pos][found], pa.int64()),
                })

        oc = orders.map_batches(task_stage(_OrdProbe, ref=ck_ref),
                                batch_format="pyarrow").materialize()
    else:
        oc = bucket_hash_join(
            orders, cust, "o_custkey", "c_custkey",
            post=lambda df: df[["o_orderkey", "c_nationkey"]],
        ).materialize()

    lo = pd.Timestamp("1996-01-01").to_datetime64()
    hi = pd.Timestamp("1998-01-01").to_datetime64()
    li_cols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
               "l_shipdate"]

    class _LiVol:
        """Date window + supplier probe (+ fused order-side probe and
        bilateral filter when ``oc_ref`` is set) + partial aggregate."""

        def __init__(self, ref, oc_ref=None):
            self.sk, self.sn = _resolve_ref(ref)
            self.oc = _resolve_ref(oc_ref) if oc_ref is not None else None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
            sub = df[m]
            key = sub["l_suppkey"].to_numpy()
            if not len(self.sk):
                found = np.zeros(len(key), dtype=bool)
                pos = np.zeros(len(key), dtype=np.int64)
            else:
                pos = np.minimum(np.searchsorted(self.sk, key),
                                 len(self.sk) - 1)
                found = self.sk[pos] == key
            sub = sub.loc[found]
            um = (np.round(sub["l_extendedprice"].to_numpy() * 100)
                  .astype(np.int64)
                  * (100 - np.round(sub["l_discount"].to_numpy() * 100)
                     .astype(np.int64)))
            flat = pd.DataFrame({
                "l_orderkey": sub["l_orderkey"].to_numpy(),
                "supp_nat": self.sn[pos[found]],
                "l_year": sub["l_shipdate"].dt.year.to_numpy(np.int64),
                "um": um,
            })
            if self.oc is None:
                return flat.groupby(["l_orderkey", "supp_nat", "l_year"],
                                    as_index=False)["um"].sum()
            okeys, onats = self.oc
            if not len(okeys):
                return pd.DataFrame({
                    "supp_nat": pd.array([], "int64"),
                    "cust_nat": pd.array([], "int64"),
                    "l_year": pd.array([], "int64"),
                    "um": pd.array([], "int64")})
            p = np.minimum(np.searchsorted(okeys, flat["l_orderkey"].to_numpy()),
                           len(okeys) - 1)
            hit = okeys[p] == flat["l_orderkey"].to_numpy()
            flat = flat.loc[hit].assign(cust_nat=onats[p[hit]])
            flat = flat.loc[flat["supp_nat"] != flat["cust_nat"]]
            g = flat.groupby(["supp_nat", "cust_nat", "l_year"],
                             as_index=False)["um"].sum()
            return g.astype({"supp_nat": "int64", "cust_nat": "int64",
                             "l_year": "int64", "um": "int64"})

    if oc.count() <= broadcast_limit:
        oc_ref = ray.put(_sorted_cols(oc, "o_orderkey",
                                      ["o_orderkey", "c_nationkey"]))
        parts = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_LiVol, ref=supp_ref, oc_ref=oc_ref),
            batch_format="pandas").to_pandas()
    else:
        li = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_LiVol, ref=supp_ref), batch_format="pandas")

        def bilateral(df: pd.DataFrame) -> pd.DataFrame:
            m = df.loc[df["supp_nat"] != df["c_nationkey"]]
            g = (m.rename(columns={"c_nationkey": "cust_nat"})
                 .groupby(["supp_nat", "cust_nat", "l_year"],
                          as_index=False)["um"].sum())
            return g.astype({"supp_nat": "int64", "cust_nat": "int64",
                             "l_year": "int64", "um": "int64"})

        parts = bucket_hash_join(li, oc, "l_orderkey", "o_orderkey",
                                 post=bilateral).to_pandas()
    if "supp_nat" not in parts.columns:  # empty corpus slice
        parts = pd.DataFrame({c: pd.array([], "int64") for c in
                              ("supp_nat", "cust_nat", "l_year", "um")})
    out = parts.groupby(["supp_nat", "cust_nat", "l_year"],
                        as_index=False)["um"].sum()
    out["supp_nation"] = out["supp_nat"].map(name_of)
    out["cust_nation"] = out["cust_nat"].map(name_of)
    out = out.rename(columns={"um": "revenue_um"}).sort_values(
        ["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    return out[["supp_nation", "cust_nation", "l_year", "revenue_um"]
               ].astype({"l_year": "int64", "revenue_um": "int64"})


def q_tpch_q8(sf_dir: str, broadcast_limit: int = 2_000_000):
    """TPC-H Q8-shaped: national market share — per order-year, the
    target nation's supplied volume (numerator) and all-nations volume
    (denominator) over PROMO parts sold to one region's customers.
    Exactness rule: both sums are returned as integer cents×percent
    columns instead of dividing to a float share. Part keys and the
    supplier nation map broadcast once; the region-filtered customer
    dim joins the date-windowed orders adaptively; the lineitem scan
    fuses part filter + supplier probe + order probe + per-year partial
    sums into one pass under the limit (bucket-join fallback above)."""
    from beats_ray.dataops.joins import _resolve_ref, bucket_hash_join
    from beats_ray.dataops.stagecache import task_stage

    import pyarrow.compute as pc

    nation = _table(sf_dir, "nation",
                    ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _table(sf_dir, "region").to_pandas()
    amer_rk = region.loc[region["r_name"] == "AMERICA", "r_regionkey"]
    amer_keys = pa.array(
        nation.loc[nation["n_regionkey"].isin(amer_rk), "n_nationkey"]
        .to_numpy(dtype="int64"))
    k_target = int(
        nation.loc[nation["n_name"] == "NATION_3", "n_nationkey"].iloc[0])

    promo = _table(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], "PROMO")),
        batch_format="pyarrow",
    )
    (pk,) = _sorted_cols(promo, "p_partkey", ["p_partkey"])
    pk_ref = ray.put(pk)

    supp_ref = ray.put(_sorted_cols(
        _table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", ["s_suppkey", "s_nationkey"]))

    cust = _table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=amer_keys))
        .drop_columns(["c_nationkey"]),
        batch_format="pyarrow",
    ).materialize()
    lo = pd.Timestamp("1996-01-01").to_datetime64()
    hi = pd.Timestamp("1998-01-01").to_datetime64()
    orders = _table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=16
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))),
        batch_format="pyarrow",
    )
    if cust.count() <= broadcast_limit:
        (ck,) = _sorted_cols(cust, "c_custkey", ["c_custkey"])
        ck_ref = ray.put(ck)

        class _OrdYear:
            def __init__(self, ref):
                self.ck = _resolve_ref(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ok = t["o_custkey"].to_numpy()
                if not len(self.ck):
                    found = np.zeros(len(ok), dtype=bool)
                else:
                    pos = np.minimum(np.searchsorted(self.ck, ok),
                                     len(self.ck) - 1)
                    found = self.ck[pos] == ok
                yr = (t["o_orderdate"].to_pandas().dt.year
                      .to_numpy(np.int64)[found])
                return pa.table({
                    "o_orderkey": pa.array(
                        t["o_orderkey"].to_numpy()[found], pa.int64()),
                    "o_year": pa.array(yr, pa.int64()),
                })

        oc = orders.map_batches(task_stage(_OrdYear, ref=ck_ref),
                                batch_format="pyarrow").materialize()
    else:
        def keep_year(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["o_orderkey"]].copy()
            out["o_year"] = df["o_orderdate"].dt.year.to_numpy(np.int64)
            return out.astype({"o_orderkey": "int64", "o_year": "int64"})

        oc = bucket_hash_join(
            orders, cust, "o_custkey", "c_custkey", post=keep_year,
        ).materialize()

    li_cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
               "l_discount"]

    class _LiShare:
        def __init__(self, pk, sup, oc_ref=None):
            self.pk = _resolve_ref(pk)
            self.sk, self.sn = _resolve_ref(sup)
            self.oc = _resolve_ref(oc_ref) if oc_ref is not None else None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = df["l_partkey"].to_numpy()
            if not len(self.pk):
                keep = np.zeros(len(key), dtype=bool)
            else:
                pos = np.minimum(np.searchsorted(self.pk, key),
                                 len(self.pk) - 1)
                keep = self.pk[pos] == key
            sub = df.loc[keep]
            sp = np.minimum(np.searchsorted(self.sk,
                                            sub["l_suppkey"].to_numpy()),
                            max(len(self.sk) - 1, 0))
            um = (np.round(sub["l_extendedprice"].to_numpy() * 100)
                  .astype(np.int64)
                  * (100 - np.round(sub["l_discount"].to_numpy() * 100)
                     .astype(np.int64)))
            flat = pd.DataFrame({
                "l_orderkey": sub["l_orderkey"].to_numpy(),
                "num_um": np.where(self.sn[sp] == k_target, um, 0),
                "den_um": um,
            })
            if self.oc is None:
                return flat.groupby("l_orderkey", as_index=False)[
                    ["num_um", "den_um"]].sum()
            okeys, oyears = self.oc
            if not len(okeys):
                return pd.DataFrame({"o_year": pd.array([], "int64"),
                                     "num_um": pd.array([], "int64"),
                                     "den_um": pd.array([], "int64")})
            p = np.minimum(np.searchsorted(okeys,
                                           flat["l_orderkey"].to_numpy()),
                           len(okeys) - 1)
            hit = okeys[p] == flat["l_orderkey"].to_numpy()
            g = (flat.loc[hit].assign(o_year=oyears[p[hit]])
                 .groupby("o_year", as_index=False)[["num_um", "den_um"]]
                 .sum())
            return g.astype({"o_year": "int64", "num_um": "int64",
                             "den_um": "int64"})

    if oc.count() <= broadcast_limit:
        oc_ref = ray.put(_sorted_cols(oc, "o_orderkey",
                                      ["o_orderkey", "o_year"]))
        parts = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_LiShare, pk=pk_ref, sup=supp_ref, oc_ref=oc_ref),
            batch_format="pandas").to_pandas()
    else:
        li = _table(sf_dir, "lineitem", li_cols, blocks=16).map_batches(
            task_stage(_LiShare, pk=pk_ref, sup=supp_ref),
            batch_format="pandas")

        def per_year(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("o_year", as_index=False)[["num_um", "den_um"]].sum()
            return g.astype({"o_year": "int64", "num_um": "int64",
                             "den_um": "int64"})

        parts = bucket_hash_join(li, oc, "l_orderkey", "o_orderkey",
                                 post=per_year).to_pandas()
    if "o_year" not in parts.columns:  # empty corpus slice
        parts = pd.DataFrame({c: pd.array([], "int64") for c in
                              ("o_year", "num_um", "den_um")})
    out = (parts.groupby("o_year", as_index=False)[["num_um", "den_um"]].sum()
           .sort_values("o_year").reset_index(drop=True))
    return out.astype({"o_year": "int64", "num_um": "int64",
                       "den_um": "int64"})


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17-shaped: revenue from small-quantity orders of one
    part family (brand+type stand in for the reference's
    brand+container — this corpus carries no p_container). The
    correlated AVG becomes the exact integer cross-product test
    5·qty·cnt < sum_qty (no division): pass 1 computes per-partkey
    (sum_qty, cnt) over the family-pruned lineitem scan (bounded by
    the filtered part count via ``grouped_sum``), the stats broadcast
    back, and pass 2 re-scans the same pruned rows applying the mask +
    price sum — both scans prune columns AND rows at the batch level."""
    from beats_ray.dataops.agg import grouped_sum
    from beats_ray.dataops.joins import _resolve_ref
    from beats_ray.dataops.stagecache import task_stage

    import pyarrow.compute as pc

    fam = _table(sf_dir, "part", ["p_partkey", "p_brand", "p_type"]).map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["p_brand"], "Brand#23"),
                                   pc.equal(t["p_type"], "MEDIUM"))),
        batch_format="pyarrow",
    )
    (pk,) = _sorted_cols(fam, "p_partkey", ["p_partkey"])
    pk_ref = ray.put(pk)

    class _QtyStats:
        def __init__(self, pk):
            self.pk = _resolve_ref(pk)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = df["l_partkey"].to_numpy()
            if not len(self.pk):
                keep = np.zeros(len(key), dtype=bool)
            else:
                pos = np.minimum(np.searchsorted(self.pk, key),
                                 len(self.pk) - 1)
                keep = self.pk[pos] == key
            sub = df.loc[keep]
            qty = np.round(sub["l_quantity"].to_numpy()).astype(np.int64)
            return (pd.DataFrame({"l_partkey": sub["l_partkey"].to_numpy(),
                                  "sum_qty": qty,
                                  "cnt": np.ones(len(qty), dtype=np.int64)})
                    .groupby("l_partkey", as_index=False)[["sum_qty", "cnt"]]
                    .sum())

    stats = grouped_sum(
        _table(sf_dir, "lineitem", ["l_partkey", "l_quantity"], blocks=16)
        .map_batches(task_stage(_QtyStats, pk=pk_ref), batch_format="pandas"),
        "l_partkey", ["sum_qty", "cnt"],
    )  # bounded by the filtered part family
    st_ref = ray.put(_sorted_cols(stats, "l_partkey",
                                  ["l_partkey", "sum_qty", "cnt"]))

    class _SmallQty:
        def __init__(self, st):
            self.pk, self.sq, self.ct = _resolve_ref(st)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = df["l_partkey"].to_numpy()
            if not len(self.pk):
                return pd.DataFrame({"total_um": pd.array([0], "int64")})
            pos = np.minimum(np.searchsorted(self.pk, key), len(self.pk) - 1)
            keep = self.pk[pos] == key
            qty = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
            small = keep & (5 * qty * self.ct[pos] < self.sq[pos])
            cents = np.round(
                df["l_extendedprice"].to_numpy()[small] * 100).astype(np.int64)
            return pd.DataFrame({"total_um": pd.array([int(cents.sum())],
                                                      "int64")})

    parts = _table(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"],
        blocks=16,
    ).map_batches(task_stage(_SmallQty, st=st_ref), batch_format="pandas")
    total = int(parts.sum("total_um") or 0)
    return pd.DataFrame({"total_um": pd.array([total], dtype="int64")})


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19-shaped: discounted revenue under a DISJUNCTION of
    brand×size×quantity range predicates — the multi-clause pushdown
    shape (the reference's shipmode/container clauses map to the
    corpus' brand/size columns; documented adaptation). Part attrs
    broadcast once as sorted arrays; the lineitem scan evaluates all
    three conjunctive clauses vectorized and pre-sums revenue per
    batch — one pass, no shuffle."""
    from beats_ray.dataops.joins import _resolve_ref
    from beats_ray.dataops.stagecache import task_stage

    part = _table(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                  ).to_pandas().sort_values("p_partkey")
    # brand encoded to its numeric suffix so the broadcast is all-int
    brand_no = (part["p_brand"].str.removeprefix("Brand#")
                .astype(np.int64).to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy(dtype="int64"), brand_no,
                   part["p_size"].to_numpy(dtype="int64")))

    class _Disj:
        CLAUSES = ((12, 5, 1, 11), (23, 10, 10, 20), (24, 15, 20, 30))

        def __init__(self, ref):
            self.pk, self.brand, self.size = _resolve_ref(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = df["l_partkey"].to_numpy()
            if not len(self.pk):
                return pd.DataFrame({"revenue_um": pd.array([0], "int64")})
            pos = np.minimum(np.searchsorted(self.pk, key),
                             len(self.pk) - 1)
            found = self.pk[pos] == key
            qty = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
            brand, size = self.brand[pos], self.size[pos]
            keep = np.zeros(len(df), dtype=bool)
            for b, smax, qlo, qhi in self.CLAUSES:
                keep |= ((brand == b) & (size >= 1) & (size <= smax)
                         & (qty >= qlo) & (qty <= qhi))
            keep &= found
            um = (np.round(df["l_extendedprice"].to_numpy()[keep] * 100)
                  .astype(np.int64)
                  * (100 - np.round(df["l_discount"].to_numpy()[keep] * 100)
                     .astype(np.int64)))
            return pd.DataFrame({"revenue_um": pd.array([int(um.sum())],
                                                        "int64")})

    parts = _table(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        blocks=16,
    ).map_batches(task_stage(_Disj, ref=ref), batch_format="pandas")
    total = int(parts.sum("revenue_um") or 0)
    return pd.DataFrame({"revenue_um": pd.array([total], dtype="int64")})


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16-shaped: distinct suppliers per surviving part family
    (brand, type, size) — grouped COUNT DISTINCT after a join, with
    NOT-predicates pruning the dim side (lineitem supplies the
    part↔supplier evidence; the corpus carries no partsupp —
    documented adaptation). Family attrs broadcast as a sorted-partkey
    code table; the lineitem scan dedups (family, suppkey) pairs per
    batch so the single co-locating shuffle moves ≤ blocks×families×
    suppliers-per-block rows; the distinct count finishes per family
    bucket."""
    from beats_ray.dataops.agg import map_buckets
    from beats_ray.dataops.joins import _resolve_ref
    from beats_ray.dataops.stagecache import task_stage

    import pyarrow.compute as pc

    fam = _table(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.and_(pc.not_equal(t["p_brand"], "Brand#5"),
                            pc.not_equal(t["p_type"], "PROMO")),
                    pc.is_in(t["p_size"], value_set=pa.array(
                        [1, 4, 9, 14, 19, 23, 36, 45], pa.int64())))),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(fam):
        return pd.DataFrame({"p_brand": pd.array([], dtype=object),
                             "p_type": pd.array([], dtype=object),
                             "p_size": pd.array([], "int64"),
                             "supplier_cnt": pd.array([], "int64")})
    fam = fam.sort_values("p_partkey").reset_index(drop=True)
    # family id = row index into the deduped (brand, type, size) table
    attrs = (fam[["p_brand", "p_type", "p_size"]]
             .drop_duplicates().reset_index(drop=True))
    akey = {t: i for i, t in enumerate(
        zip(attrs["p_brand"], attrs["p_type"], attrs["p_size"]))}
    fid = np.array([akey[t] for t in
                    zip(fam["p_brand"], fam["p_type"], fam["p_size"])],
                   dtype=np.int64)
    ref = ray.put((fam["p_partkey"].to_numpy(dtype="int64"), fid))

    class _Pairs:
        def __init__(self, ref):
            self.pk, self.fid = _resolve_ref(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = df["l_partkey"].to_numpy()
            pos = np.minimum(np.searchsorted(self.pk, key),
                             len(self.pk) - 1)
            found = self.pk[pos] == key
            out = pd.DataFrame({"fid": self.fid[pos[found]],
                                "supp": df["l_suppkey"].to_numpy()[found]})
            return out.drop_duplicates()

    pairs = _table(sf_dir, "lineitem", ["l_partkey", "l_suppkey"],
                   blocks=16).map_batches(task_stage(_Pairs, ref=ref),
                                          batch_format="pandas")

    def ndistinct(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates().groupby("fid", as_index=False)["supp"]
               .size().rename(columns={"size": "supplier_cnt"}))
        return out.astype({"fid": "int64", "supplier_cnt": "int64"})

    counts = map_buckets(pairs, "fid", ndistinct, buckets=16).to_pandas()
    out = attrs.iloc[counts["fid"].to_numpy()].reset_index(drop=True)
    out["supplier_cnt"] = counts["supplier_cnt"].to_numpy()
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)
    return out.astype({"p_size": "int64", "supplier_cnt": "int64"})


def q_embedding_pca(sf_dir: str):
    """Top-principal-component projection of every embedding (the PCA
    /whitening first step): exact-integer power iteration on the
    distributed Gram matrix (fit state bounded by dims², never rows),
    then one shuffle-free broadcast projection pass. The oracle inlines
    the component from an INDEPENDENT no-Ray scalar replica (the BPE
    convention) and replays the projection in SQL."""
    from beats_ray.dataops.ann import pca_top_component

    emb = _table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_top_component(emb, iters=3)


def q_embedding_rp(sf_dir: str):
    """Johnson–Lindenstrauss sign projection to 8 components (long
    form: vec_id, j, y_um): the md5-derived ±1 matrix means the
    'model' is dims×8 int64s shipped once however large the corpus,
    and the SQL replay derives the identical signs (the Count-Min
    convention)."""
    from beats_ray.dataops.ann import random_projection

    emb = _table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return random_projection(emb, k=8)


def q_tool_pair_pmi(sf_dir: str):
    """Pointwise mutual information of consecutive tool-call pairs —
    'which tool follows which more often than chance' association
    mining over agent transcripts. Rides the tool_sequences pair
    counts (one co-locating conversation-bucket pass; result bounded
    by tool-vocabulary²); PMI resolves on that bounded table in exact
    integer micro-nats: floor(10⁶·ln((n_xy·N)/(n_x·n_y))) with all
    products exact ints and one double division (< 2⁵³ so the SQL
    replay is bit-exact)."""
    import math

    pairs = q_tool_sequences(sf_dir)
    if not len(pairs):
        return pd.DataFrame({"tool_a": pd.array([], dtype=object),
                             "tool_b": pd.array([], dtype=object),
                             "n_pairs": pd.array([], "int64"),
                             "pmi_um": pd.array([], "int64")})
    n_total = int(pairs["n_pairs"].sum())
    ca = pairs.groupby("tool_a")["n_pairs"].sum()
    cb = pairs.groupby("tool_b")["n_pairs"].sum()
    num = pairs["n_pairs"].to_numpy(np.int64) * n_total
    den = (ca.reindex(pairs["tool_a"]).to_numpy(np.int64)
           * cb.reindex(pairs["tool_b"]).to_numpy(np.int64))
    pairs = pairs.copy()
    pairs["pmi_um"] = pd.array(
        [math.floor(1_000_000 * math.log(int(a) / int(b)))
         for a, b in zip(num, den)], dtype="int64")
    return pairs.reset_index(drop=True)


def q_role_latency(sf_dir: str):
    """Turn-taking latency analytics over agent transcripts: for every
    consecutive turn pair inside a conversation, the (role → role)
    transition count and total inter-turn gap in exact integer
    microseconds — the 'how long does the assistant take after a tool
    result' signal. One co-locating conversation-bucket pass (the
    multiline convention); the driver merge is bounded by roles²."""
    from beats_ray.dataops.agg import map_buckets

    def gaps_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy(dtype=object)
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if len(df) < 2:
            return pd.DataFrame({"role_a": pd.Series(dtype="string"),
                                 "role_b": pd.Series(dtype="string"),
                                 "n_pairs": pd.Series(dtype="int64"),
                                 "sum_dt_us": pd.Series(dtype="int64")})
        m = conv[1:] == conv[:-1]
        out = pd.DataFrame({"role_a": role[:-1][m], "role_b": role[1:][m],
                            "dt_us": (ts_us[1:] - ts_us[:-1])[m]})
        g = out.groupby(["role_a", "role_b"], as_index=False).agg(
            n_pairs=("dt_us", "size"), sum_dt_us=("dt_us", "sum"))
        return g.astype({"n_pairs": "int64", "sum_dt_us": "int64"})

    partials = map_buckets(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "role", "ts"]),
        "conv_id", gaps_in_bucket, buckets=16).to_pandas()
    if not len(partials):
        return pd.DataFrame({"role_a": pd.array([], dtype=object),
                             "role_b": pd.array([], dtype=object),
                             "n_pairs": pd.array([], "int64"),
                             "sum_dt_us": pd.array([], "int64")})
    out = (partials.groupby(["role_a", "role_b"], as_index=False)
           [["n_pairs", "sum_dt_us"]].sum())
    return (out.astype({"n_pairs": "int64", "sum_dt_us": "int64"})
            .sort_values(["role_a", "role_b"]).reset_index(drop=True))


def q_lang_confusion(sf_dir: str):
    """Classifier-eval analytics: confusion matrix of the stored lang
    label vs the LangId prediction. The label rides the same batch as
    the text so scoring is shuffle-free; per-batch Arrow partial counts
    finish in a tiny grouped sum bounded by langs²."""
    from ray.data.aggregate import Sum

    from beats_ray.dataops.stagecache import task_stage
    from beats_ray.dataops.textstats import LangId

    class _Confusion(LangId):
        def __call__(self, t: pa.Table) -> pa.Table:
            preds = super().__call__(t)
            g = (pa.table({"lang": t["lang"],
                           "lang_pred": preds["lang_pred"]})
                 .group_by(["lang", "lang_pred"])
                 .aggregate([([], "count_all")]))
            return (g.rename_columns(["lang", "lang_pred", "n"])
                    .replace_schema_metadata(None))

    out = (
        _table(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(task_stage(_Confusion), batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded by langs²
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def q_hopping_event_counts(sf_dir: str):
    """HOPPING (overlapping) window aggregate: events counted into
    10-minute windows sliding every 5 minutes — the overlap means each
    event expands into exactly window/hop = 2 rows inside map_batches
    (the flat-map shape tumbling windows don't need), partial counts
    per (window_start, event_type) fold per batch, and one tiny
    grouped sum finishes (key space bounded by time span × types, not
    events)."""
    from beats_ray.dataops.agg import grouped_count

    W, H = 600, 300

    def expand(t: pa.Table) -> pa.Table:
        es = (t["ts"].cast(pa.int64()).to_numpy() // 1_000_000)
        ws1 = (es // H) * H
        ws = np.concatenate([ws1, ws1 - H])  # exactly W/H = 2 windows
        et = t["event_type"].to_pandas().to_numpy(dtype=object)
        return pa.table({
            "window_start": pa.array(ws, pa.int64()),
            "event_type": pa.array(np.concatenate([et, et]), pa.string()),
        })

    counts = grouped_count(
        _table(sf_dir, "events", ["ts", "event_type"]).map_batches(
            expand, batch_format="pyarrow"),
        ["window_start", "event_type"],
    ).to_pandas()  # bounded by time-span/hop × event types
    counts["n"] = counts["n"].astype("int64")
    return (counts.sort_values(["window_start", "event_type"])
            .reset_index(drop=True))


def q_user_first_seen_curve(sf_dir: str):
    """Cumulative-adoption curve: per day, how many DISTINCT users have
    been seen so far. Per-user first-seen day is a per-batch min fold →
    one co-locating grouped min (bounded by |users|); the per-day new
    counts and the running sum resolve on the day-bounded table."""
    from beats_ray.dataops.agg import grouped_sum

    def first_seen(t: pa.Table) -> pa.Table:
        day = ((t["ts"].cast(pa.int64()).to_numpy() // 1_000_000)
               // 86_400)
        g = (pd.DataFrame({"user_id": t["user_id"].to_numpy(), "day": day})
             .groupby("user_id", as_index=False)["day"].min())
        return pa.Table.from_pandas(
            g.astype({"user_id": "int64", "day": "int64"}),
            preserve_index=False)

    parts = _table(sf_dir, "events", ["ts", "user_id"]).map_batches(
        first_seen, batch_format="pyarrow")

    def per_user_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)["day"].min()

    from beats_ray.dataops.agg import map_buckets

    firsts = map_buckets(parts, "user_id", per_user_min, buckets=16)

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False).size()
             .rename(columns={"size": "new_users"}))
        return g.astype({"day": "int64", "new_users": "int64"})

    days = grouped_sum(firsts.map_batches(day_partial,
                                          batch_format="pandas"),
                       "day", "new_users").to_pandas()  # bounded by days
    if not len(days):
        return pd.DataFrame({"day": pd.array([], "int64"),
                             "new_users": pd.array([], "int64"),
                             "cum_users": pd.array([], "int64")})
    days = days.sort_values("day")
    days["cum_users"] = days["new_users"].cumsum()
    return (days.astype({"day": "int64", "new_users": "int64",
                         "cum_users": "int64"}).reset_index(drop=True))


def q_tool_cooccurrence(sf_dir: str):
    """Set-overlap analytics: for every unordered tool pair, how many
    conversations used BOTH (intersection) and how many used EITHER
    (union) — the Jaccard numerator/denominator reported as exact
    integers (house rule: no float division). One conversation-bucket
    pass emits each conversation's distinct tool set as local pair +
    singleton partials; the driver merge is bounded by tools²."""
    from beats_ray.dataops.agg import map_buckets

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["tool"] != "none"]
        if not len(df):
            return pd.DataFrame({"tool_a": pd.Series(dtype="string"),
                                 "tool_b": pd.Series(dtype="string"),
                                 "n": pd.Series(dtype="int64")})
        dt = df[["conv_id", "tool"]].drop_duplicates()
        # pairs within each conversation (a < b) + per-tool singletons
        pairs = dt.merge(dt, on="conv_id", suffixes=("_a", "_b"))
        pairs = pairs[pairs["tool_a"] < pairs["tool_b"]]
        pair_n = (pairs.groupby(["tool_a", "tool_b"], as_index=False)
                  .size().rename(columns={"size": "n"}))
        single = (dt.groupby("tool", as_index=False).size()
                  .rename(columns={"tool": "tool_a", "size": "n"}))
        single["tool_b"] = single["tool_a"]
        return (pd.concat([pair_n, single[["tool_a", "tool_b", "n"]]],
                          ignore_index=True).astype({"n": "int64"}))

    parts = map_buckets(
        _transcripts(sf_dir, ["conv_id", "tool"]),
        "conv_id", partials, buckets=16).to_pandas()  # ≤ buckets×tools²
    if not len(parts):
        return pd.DataFrame({"tool_a": pd.array([], dtype=object),
                             "tool_b": pd.array([], dtype=object),
                             "n_both": pd.array([], "int64"),
                             "n_either": pd.array([], "int64")})
    tot = (parts.groupby(["tool_a", "tool_b"], as_index=False)["n"].sum())
    single = dict(zip(
        tot.loc[tot["tool_a"] == tot["tool_b"], "tool_a"],
        tot.loc[tot["tool_a"] == tot["tool_b"], "n"]))
    out = tot[tot["tool_a"] < tot["tool_b"]].copy()
    out["n_both"] = out["n"].astype("int64")
    out["n_either"] = (out["tool_a"].map(single).astype("int64")
                       + out["tool_b"].map(single).astype("int64")
                       - out["n_both"])
    return (out[["tool_a", "tool_b", "n_both", "n_either"]]
            .sort_values(["tool_a", "tool_b"]).reset_index(drop=True))


def q_conv_dedup(sf_dir: str):
    """CONVERSATION-level exact dedup: conversations whose full
    transcript (turn texts joined in turn order) is byte-identical
    form one identity group; the min conv_id survives (first-
    occurrence-wins, the line-dedup convention) and the group size is
    reported. Two co-locating shuffles — conversations assemble whole
    in their bucket (the multiline convention), then the md5-keyed
    groups resolve in theirs; nothing id-sized on the driver beyond
    the group-bounded result."""
    import hashlib

    from beats_ray.dataops.agg import map_buckets

    def conv_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        full = (df.assign(text=df["text"].fillna(""))
                .groupby("conv_id", sort=False)["text"]
                .agg("\n".join))
        return pd.DataFrame({
            "conv_id": full.index.to_numpy(dtype=object),
            "hh": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in full],
        })

    hashes = map_buckets(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]),
        "conv_id", conv_hash, buckets=16)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("hh", as_index=False)
               .agg(conv_id=("conv_id", "min"), n_convs=("conv_id", "size")))
        return out[["conv_id", "n_convs"]].astype({"n_convs": "int64"})

    out = map_buckets(hashes, "hh", resolve, buckets=16).to_pandas()
    if not len(out):
        return pd.DataFrame({"conv_id": pd.array([], dtype=object),
                             "n_convs": pd.array([], "int64")})
    return (out.astype({"n_convs": "int64"})
            .sort_values("conv_id").reset_index(drop=True))


def q_conv_prefix_groups(sf_dir: str):
    """Retry/fork + prompt-template detection: conversations whose
    OPENING turn is byte-identical form a prefix group (shared system
    prompts, retry storms, template forks); groups with ≥2 members are
    reported as (min conv_id, n_convs). Same two-co-locating-shuffle
    plan as conv_dedup, but hashing only the first turn by turn
    order."""
    import hashlib

    from beats_ray.dataops.agg import map_buckets

    def prefix_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        head = (df.assign(text=df["text"].fillna(""))
                .groupby("conv_id", sort=False).head(1))
        full = head.groupby("conv_id", sort=False)["text"].agg("\n".join)
        return pd.DataFrame({
            "conv_id": full.index.to_numpy(dtype=object),
            "hh": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in full],
        })

    hashes = map_buckets(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "text"]),
        "conv_id", prefix_hash, buckets=16)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("hh", as_index=False)
               .agg(conv_id=("conv_id", "min"),
                    n_convs=("conv_id", "size")))
        out = out[out["n_convs"] >= 2]
        return out[["conv_id", "n_convs"]].astype({"n_convs": "int64"})

    out = map_buckets(hashes, "hh", resolve, buckets=16).to_pandas()
    if not len(out) or "conv_id" not in out.columns:
        return pd.DataFrame({"conv_id": pd.array([], dtype=object),
                             "n_convs": pd.array([], "int64")})
    return (out.astype({"n_convs": "int64"})
            .sort_values("conv_id").reset_index(drop=True))


def q_events_rollup(sf_dir: str):
    """Multi-level ROLLUP aggregate: event counts at (event_type, day),
    (event_type), and grand-total levels with NULL level markers — the
    OLAP cube edge SQL spells GROUP BY ROLLUP. Only the FINEST level is
    computed distributed (partial counts → grouped sum, bounded by
    types×days); the coarser levels are exact sums over that bounded
    table on the driver, so the rollup costs one shuffle however large
    the corpus."""
    from beats_ray.dataops.agg import grouped_count

    def keyed(t: pa.Table) -> pa.Table:
        day = ((t["ts"].cast(pa.int64()).to_numpy() // 1_000_000)
               // 86_400)
        return pa.table({
            "event_type": t["event_type"],
            "day": pa.array(day, pa.int64()),
        })

    fine = grouped_count(
        _table(sf_dir, "events", ["ts", "event_type"]).map_batches(
            keyed, batch_format="pyarrow"),
        ["event_type", "day"],
    ).to_pandas()  # bounded by types × days
    fine = fine.astype({"day": "int64", "n": "int64"})
    # rolled-up levels use explicit sentinels (day=-1, type='<all>')
    # instead of SQL's NULL markers — NULL + BIGINT degrades to float64
    # through pandas, which breaks the exact-dtype compare
    by_type = fine.groupby("event_type", as_index=False)["n"].sum()
    by_type["day"] = np.int64(-1)
    total = pd.DataFrame({"event_type": ["<all>"], "day": [-1],
                          "n": [int(fine["n"].sum())]})
    out = pd.concat([fine[["event_type", "day", "n"]],
                     by_type[["event_type", "day", "n"]],
                     total], ignore_index=True)
    out = out.astype({"day": "int64", "n": "int64"})
    return (out.sort_values(["event_type", "day"])
            .reset_index(drop=True))


def q_event_burst_pairs(sf_dir: str):
    """Time-bounded THETA self-join: per user, the number of ordered
    event pairs with 0 < Δt ≤ 60 s — the burst/flood-detection shape.
    NOT materialized as a pair table (that's quadratic in burst size):
    one co-locating user-bucket pass sorts each user's timestamps once
    and counts partners with two vectorized searchsorted sweeps
    (right(ts+60) − right(ts)); output is bounded by |users|."""
    from beats_ray.dataops.agg import pair_counts_within

    out = pair_counts_within(
        _table(sf_dir, "events", ["ts", "user_id"]),
        key="user_id", ts_col="ts", window_us=60_000_000,
        buckets=16).to_pandas()  # bounded by |users|
    if not len(out):
        return pd.DataFrame({"user_id": pd.array([], "int64"),
                             "n_pairs": pd.array([], "int64")})
    return (out.astype({"user_id": "int64", "n_pairs": "int64"})
            .sort_values("user_id").reset_index(drop=True))


def q_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: distinct users active ``age`` days
    after their cohort's first-seen day, per (first_day, age). One
    co-locating user-bucket pass sees each user's full (user, day)
    activity set (deduped per batch first), computes first_day + ages
    locally, and emits partial counts; the grouped finish is bounded
    by days² — classic product-analytics shape on the engine's keyed
    co-location machinery."""
    from beats_ray.dataops.agg import grouped_sum, map_buckets

    def user_days(t: pa.Table) -> pa.Table:
        day = ((t["ts"].cast(pa.int64()).to_numpy() // 1_000_000)
               // 86_400)
        g = (pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "day": day}).drop_duplicates())
        return pa.Table.from_pandas(
            g.astype({"user_id": "int64", "day": "int64"}),
            preserve_index=False)

    pairs = _table(sf_dir, "events", ["ts", "user_id"]).map_batches(
        user_days, batch_format="pyarrow")

    def cohort_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        first = g.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame({"first_day": first.to_numpy(),
                            "age": (g["day"] - first).to_numpy()})
        return (out.groupby(["first_day", "age"], as_index=False)
                .size().rename(columns={"size": "n_users"})
                .astype({"first_day": "int64", "age": "int64",
                         "n_users": "int64"}))

    parts = map_buckets(pairs, "user_id", cohort_partial, buckets=16)
    merged = grouped_sum(parts.map_batches(
        lambda df: df.assign(
            _k=df["first_day"] * 100_000 + df["age"]),
        batch_format="pandas"), "_k", "n_users").to_pandas()
    if not len(merged):
        return pd.DataFrame({"first_day": pd.array([], "int64"),
                             "age": pd.array([], "int64"),
                             "n_users": pd.array([], "int64")})
    out = pd.DataFrame({
        "first_day": merged["_k"].to_numpy(np.int64) // 100_000,
        "age": merged["_k"].to_numpy(np.int64) % 100_000,
        "n_users": merged["n_users"].to_numpy(np.int64),
    })
    return (out.sort_values(["first_day", "age"]).reset_index(drop=True))


def q_tool_funnel(sf_dir: str):
    """Funnel analytics: for every ordered tool pair (a, b), how many
    conversations used a BEFORE b (first occurrence of a strictly
    before the last occurrence of b; a ≠ b) — the 'search → edit
    conversion' question. One conversation-bucket pass reduces each
    conversation to its per-tool (first_idx, last_idx) extremes
    (bounded by convs×tools) and counts qualifying pairs inside the
    bucket (each conversation lives whole in one bucket, so the pair
    count is exact there); the driver merge is bounded by tools²."""
    from beats_ray.dataops.agg import map_buckets

    def funnel_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["tool"] != "none"]
        if not len(df):
            return pd.DataFrame({"tool_a": pd.Series(dtype="string"),
                                 "tool_b": pd.Series(dtype="string"),
                                 "n_convs": pd.Series(dtype="int64")})
        ext = (df.groupby(["conv_id", "tool"])["turn_idx"]
               .agg(["min", "max"]).reset_index())
        pairs = ext.merge(ext, on="conv_id", suffixes=("_a", "_b"))
        hit = pairs[(pairs["tool_a"] != pairs["tool_b"])
                    & (pairs["min_a"] < pairs["max_b"])]
        out = (hit.groupby(["tool_a", "tool_b"], as_index=False)
               .size().rename(columns={"size": "n_convs"}))
        return out.astype({"n_convs": "int64"})

    partials = map_buckets(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "tool"]),
        "conv_id", funnel_in_bucket, buckets=16).to_pandas()
    if not len(partials):
        return pd.DataFrame({"tool_a": pd.array([], dtype=object),
                             "tool_b": pd.array([], dtype=object),
                             "n_convs": pd.array([], "int64")})
    out = (partials.groupby(["tool_a", "tool_b"], as_index=False)
           ["n_convs"].sum())
    return (out.astype({"n_convs": "int64"})
            .sort_values(["tool_a", "tool_b"]).reset_index(drop=True))


def q_role_latency_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of the inter-turn gap per (role → role)
    transition — the tail-latency view of turn-taking. Two co-locating
    shuffles: conversation buckets emit the raw (pair, dt_us)
    transitions (gaps need conversation contiguity), then the
    pair-bucketed grouped-quantile pass sorts each pair's gaps once
    (quantiles don't merge, so the second exchange is irreducible)."""
    from beats_ray.dataops.agg import map_buckets
    from beats_ray.dataops.quantiles import grouped_quantiles

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy(dtype=object)
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if len(df) < 2:
            return pd.DataFrame({"pair": pd.Series(dtype="string"),
                                 "dt_us": pd.Series(dtype="int64")})
        m = conv[1:] == conv[:-1]
        pair = np.char.add(np.char.add(role[:-1][m].astype(str), "->"),
                           role[1:][m].astype(str))
        return pd.DataFrame({"pair": pair,
                             "dt_us": (ts_us[1:] - ts_us[:-1])[m]})

    raw = map_buckets(
        _transcripts(sf_dir, ["conv_id", "turn_idx", "role", "ts"]),
        "conv_id", gaps, buckets=16)
    return grouped_quantiles(raw, "dt_us", "pair", [0.5, 0.9, 0.99])


def q_doc_word_info(sf_dir: str):
    """Per-document Shannon information of the unigram distribution
    (10⁶·T·H in integer micro-nats) — the entropy-based
    templated-text/degenerate-output quality signal. Shuffle-free
    per-batch kernel; ln once per distinct (T, c) pair via libm so the
    SQL replay is bit-exact."""
    from beats_ray.dataops.textnorm import word_info

    docs = _table(sf_dir, "documents", ["doc_id", "text"])
    return word_info(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship parse→enrich→route
        "route_counts": q_route_counts,
        "routed_rows": q_routed_rows,
        "parse_kinds": q_parse_kinds,
        "error_rows": q_error_rows,
        "enrich_counts": q_enrich_counts,
        # parsers / processors
        "dissect_parse": q_dissect_parse,
        "grok_parse": q_grok_parse,
        "ndjson_parse": q_ndjson_parse,
        "syslog_parse": q_syslog_parse,
        "multiline_stats": q_multiline_stats,
        "syslog_sd_parse": q_syslog_sd_parse,
        "dead_letter_counts": q_dead_letter_counts,
        "multiline_merge": q_multiline_merge,
        "conv_stats": q_conv_stats,
        "unique_tools": q_unique_tools,
        "source_ndjson_counts": q_source_ndjson_counts,
        "journald_messages": q_journald_messages,
        "journald_unit_counts": q_journald_unit_counts,
        "winlog_messages": q_winlog_messages,
        "winlog_eventid_counts": q_winlog_eventid_counts,
        "kafka_messages": q_kafka_messages,
        "kafka_partition_offsets": q_kafka_partition_offsets,
        "kafka_expanded_turns": q_kafka_expanded_turns,
        "redis_slowlog_events": q_redis_slowlog_events,
        "redis_cmd_durations": q_redis_cmd_durations,
        "mqtt_messages": q_mqtt_messages,
        "mqtt_topic_counts": q_mqtt_topic_counts,
        "text_len_histogram": q_text_len_histogram,
        "hot_conversations": q_hot_conversations,
        "truncate_preview": q_truncate_preview,
        "replace_mask_numbers": q_replace_mask_numbers,
        "timestamp_parse": q_timestamp_parse,
        "format_index": q_format_index,
        "fingerprint_docs": q_fingerprint_docs,
        "rate_limited_counts": q_rate_limited_counts,
        "rate_limit_tokens": q_rate_limit_tokens,
        "stage_rate_limited_counts": q_stage_rate_limited_counts,
        "cache_hits": q_cache_hits,
        "dns_cache_hits": q_dns_cache_hits,
        # aggregation / windows / sort
        "flow_agg": q_flow_agg,
        "flow_sessions": q_flow_sessions,
        "sessionize": q_sessionize,
        "event_session_windows": q_event_session_windows,
        "top_users": q_top_users,
        "events_type_counts": q_events_type_counts,
        "tpch_q1": q_tpch_q1,
        "tpch_q6": q_tpch_q6,
        "tpch_q5": q_tpch_q5,
        "tpch_q18": q_tpch_q18,
        "tpch_q4": q_tpch_q4,
        "tpch_q13": q_tpch_q13,
        "tpch_q14": q_tpch_q14,
        "tpch_q22": q_tpch_q22,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q10": q_tpch_q10,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q16": q_tpch_q16,
        "embedding_pca": q_embedding_pca,
        "embedding_rp": q_embedding_rp,
        "tool_pair_pmi": q_tool_pair_pmi,
        "tool_funnel": q_tool_funnel,
        "hopping_event_counts": q_hopping_event_counts,
        "user_first_seen_curve": q_user_first_seen_curve,
        "retention_cohorts": q_retention_cohorts,
        "event_burst_pairs": q_event_burst_pairs,
        "events_rollup": q_events_rollup,
        "conv_dedup": q_conv_dedup,
        "conv_prefix_groups": q_conv_prefix_groups,
        "tool_cooccurrence": q_tool_cooccurrence,
        "doc_word_info": q_doc_word_info,
        "role_latency": q_role_latency,
        "role_latency_quantiles": q_role_latency_quantiles,
        "lang_confusion": q_lang_confusion,
        "cross_source_dups": q_cross_source_dups,
        "word_freq_spectrum": q_word_freq_spectrum,
        "bm25_topk": q_bm25_topk,
        "q3_top_orders": q_q3_top_orders,
        "customers_per_region": q_customers_per_region,
        "asof_click_view": q_asof_click_view,
        "distinct_tools_per_role": q_distinct_tools_per_role,
        "role_level_pivot": q_role_level_pivot,
        # dedup family
        "dedup_exact": q_dedup_exact,
        "minhash_dedup": q_minhash_dedup,
        "simhash_pairs": q_simhash_pairs,
        "ngram_dup_pairs": q_ngram_dup_pairs,
        "ngram_dup_clusters": q_ngram_dup_clusters,
        "substring_dup_spans": q_substring_dup_spans,
        # text analysis
        "c4_clean_docs": q_c4_clean_docs,
        "bigram_coverage": q_bigram_coverage,
        "sample_docs": q_sample_docs,
        "sample_exact_k": q_sample_exact_k,
        "weighted_sample_docs": q_weighted_sample_docs,
        "sample_k_per_lang": q_sample_k_per_lang,
        "stratified_sample": q_stratified_sample,
        "token_budget_docs": q_token_budget_docs,
        "inverted_index": q_inverted_index,
        "tfidf_top_terms": q_tfidf_top_terms,
        "hll_distinct_convs": q_hll_distinct_convs,
        "gopher_quality_docs": q_gopher_quality_docs,
        "doc_len_quantiles": q_doc_len_quantiles,
        "lang_len_quantiles": q_lang_len_quantiles,
        "mix_corpora": q_mix_corpora,
        "split_docs": q_split_docs,
        "pack_sequences": q_pack_sequences,
        "packed_sequences_text": q_packed_sequences_text,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "curate_corpus": q_curate_corpus,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "mask_pii_rows": q_mask_pii_rows,
        "normalized_docs": q_normalized_docs,
        "lexical_diversity": q_lexical_diversity,
        "boilerplate_clean_turns": q_boilerplate_clean_turns,
        "line_dedup_turns": q_line_dedup_turns,
        "unigram_logprob": q_unigram_logprob,
        "dsir_weights": q_dsir_weights,
        "nb_quality_docs": q_nb_quality_docs,
        "bigram_logprob": q_bigram_logprob,
        "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
        "chunk_docs": q_chunk_docs,
        "bpe_token_counts": q_bpe_token_counts,
        "embedding_outliers": q_embedding_outliers,
        "embedding_kmeans": q_embedding_kmeans,
        "embedding_gram": q_embedding_gram,
        "cluster_balanced_sample": q_cluster_balanced_sample,
        "textrank_keywords": q_textrank_keywords,
        "shuffled_shards": q_shuffled_shards,
        "tool_sequences": q_tool_sequences,
        "rolling_turn_chars": q_rolling_turn_chars,
        "running_turn_chars": q_running_turn_chars,
        "lang_char_ranks": q_lang_char_ranks,
        "trending_terms": q_trending_terms,
        "repetition_score": q_repetition_score,
        "contamination_screen": q_contamination_screen,
        "bloom_contamination": q_bloom_contamination,
        "cms_word_counts": q_cms_word_counts,
        "top_words": q_top_words,
        # similarity search
        "ann_brute_topk": q_ann_brute_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "embed_dup_pairs": q_embed_dup_pairs,
        "embed_dup_clusters": q_embed_dup_clusters,
        "semantic_dedup_keep": q_semantic_dedup_keep,
        "dedup_keep_best": q_dedup_keep_best,
        # multimodal plumbing
        "media_features": q_media_features,
        "frame_samples": q_frame_samples,
        "media_real_decode": q_media_real_decode,
        "jpeg_real_decode": q_jpeg_real_decode,
        "g711_audio_decode": q_g711_audio_decode,
        "gif_real_decode": q_gif_real_decode,
        "mjpeg_video_decode": q_mjpeg_video_decode,
        "audio_real_decode": q_audio_real_decode,
        "video_real_decode": q_video_real_decode,
    }


# -------------------------------------------------------------- oracle SQL


def _tr_sql(sf: float = 0.01) -> str:
    """Shared transcript-parse CTE prefix (reads the exact parquet files
    the Ray pipeline reads). Regex/JSON predicates mirror the engine's
    kernels 1:1 (RE2 both sides)."""
    path = transcripts_dir(sf) + "/part-*.parquet"
    # mirror of parse._SYSLOG_PATTERN incl. the OPTIONAL tag
    syslog_rx = (
        r"(?s)^<(\d{1,3})>([A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
        r"(\S+) (([^\[\s:]+)(\[(\d+)\])?: )?(.*)$"
    )
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}')),
p AS (
  SELECT *,
    regexp_matches(text, '{DISSECT_RX}') AS dissect_ok,
    (substr(text,1,1)='{{' AND try_cast(text AS JSON) IS NOT NULL) AS json_parse_ok,
    (substr(text,1,1) IN ('{{','[')) AS looks_json,
    regexp_matches(text, '{syslog_rx}') AS syslog_ok,
    starts_with(text, 'Exception in thread ') AS multi_ok
  FROM t
),
k AS (
  SELECT *,
    CASE WHEN json_parse_ok
         THEN json_extract_string(try_cast(text AS JSON),'$.event') END AS event,
    (json_parse_ok AND
     json_extract_string(try_cast(text AS JSON),'$.event') IS NOT NULL) AS ndjson_ok
  FROM p
),
c AS (
  SELECT *,
    CASE WHEN dissect_ok THEN 'dissect'
         WHEN ndjson_ok THEN 'ndjson'
         WHEN syslog_ok THEN 'syslog'
         WHEN multi_ok THEN 'multiline'
         ELSE 'none' END AS kind,
    CASE WHEN looks_json AND NOT json_parse_ok THEN 'failed to decode json'
         WHEN NOT (dissect_ok OR ndjson_ok OR syslog_ok OR multi_ok)
           THEN 'no parser matched' END AS error_message
  FROM k
),
r AS (
  SELECT *,
    CASE WHEN regexp_matches(text, 'level=error|<\\d+>') THEN 'errors'
         WHEN event = 'tool_call' THEN 'tool_events'
         WHEN role = 'assistant' AND error_message IS NULL THEN 'assistant'
         ELSE 'default' END AS sink
  FROM c
)
"""


def _lookup_values_sql() -> str:
    tool_rows = ", ".join(
        f"('{k}', '{v[0]}', '{v[1]}')" for k, v in sorted(TOOL_LOOKUP.items())
    )
    role_rows = ", ".join(f"('{k}', '{v}')" for k, v in sorted(ROLE_LOOKUP.items()))
    return (
        f"tl(tool, tool_category, risk_level) AS (VALUES {tool_rows}), "
        f"rl(role, role_tag) AS (VALUES {role_rows})"
    )


def _pii_chain_sql(col: str) -> str:
    from beats_ray.dataops.pii import PII_PATTERNS

    expr = col
    for _, pat, repl in PII_PATTERNS:
        esc = pat.replace("'", "''")  # duckdb '' strings are raw
        expr = f"regexp_replace({expr}, '{esc}', '{repl}', 'g')"
    return expr


def _h32(expr: str) -> str:
    """DuckDB replica of dedup._stable_hash: big-endian first 4 md5
    bytes as an unsigned 32-bit value."""
    return f"('0x'||substr(md5({expr}),1,8))::UBIGINT"


def _lsh_cte() -> str:
    """Shared MinHash-LSH CTE block: replays the ENGINE's pipeline in
    SQL — identical word shingles, identical md5-32 token hashes,
    identical (a*x+b) mod 2^31-1 minhash (coefficients inlined from the
    same seeded generator), identical 4-row band keys, identical
    a<b candidate pairs. Defaults match lsh_candidate_pairs
    (num_perm=64, bands=16, shingle_k=3)."""
    from beats_ray.dataops.dedup import minhash_coefficients

    a, b = minhash_coefficients(64)
    perm_rows = ", ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(64)
    )
    g3 = _h32("array_to_string(w[i:i+2], ' ')")
    return f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     w -> w <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE
      WHEN len(w) = 0 THEN CAST([] AS UBIGINT[])
      WHEN len(w) < 3 THEN [{_h32("array_to_string(w, ' ')")}]
      ELSE list_distinct([{g3} for i in generate_series(1, len(w)-2)])
    END AS hs
  FROM ws
),
perm(pi, pa, pb) AS (VALUES {perm_rows}),
sig AS (
  SELECT s.doc_id, p.pi,
    CASE WHEN len(s.hs) = 0 THEN 2147483647::UBIGINT
         ELSE list_min(list_transform(
                s.hs, h -> (p.pa * h + p.pb) % 2147483647::UBIGINT))
    END AS mv
  FROM sh s CROSS JOIN perm p
),
bandkey AS (
  SELECT doc_id, pi // 4 AS band,
         string_agg(CAST(mv AS VARCHAR), ',' ORDER BY pi) AS bkey
  FROM sig GROUP BY doc_id, pi // 4
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bandkey l
  JOIN bandkey r ON l.band = r.band AND l.bkey = r.bkey
                AND l.doc_id < r.doc_id
)
"""


def _minhash_dedup_sql() -> str:
    # threshold 0.5 → inter*2 >= union*1 (exact integer comparison,
    # same math as minhash_dedup's threshold_fraction path)
    return _lsh_cte() + """
, ver AS (
  SELECT c.a, c.b,
    len(list_intersect(sa.hs, sb.hs)) AS inter_n,
    len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)) AS union_n
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT b FROM ver WHERE inter_n * 2 >= union_n * 1)
"""


def _ngram_pairs_sql() -> str:
    # candidates from word-shingle MinHash (same as the engine); verify
    # on char-3-gram Jaccard; threshold 0.6 → inter*5 >= union*3
    c3 = _h32("substr(lower(text), i, 3)")
    return _lsh_cte() + f"""
, cg AS (
  SELECT doc_id,
    CASE
      WHEN length(text) = 0 THEN CAST([] AS UBIGINT[])
      WHEN length(text) < 3 THEN [{_h32("lower(text)")}]
      ELSE list_distinct([{c3} for i in generate_series(1, length(text)-2)])
    END AS hs
  FROM documents
),
ver AS (
  SELECT c.a, c.b,
    CAST(len(list_intersect(sa.hs, sb.hs)) AS BIGINT) AS inter_n,
    CAST(len(sa.hs) + len(sb.hs)
         - len(list_intersect(sa.hs, sb.hs)) AS BIGINT) AS union_n
  FROM cand c
  JOIN cg sa ON sa.doc_id = c.a
  JOIN cg sb ON sb.doc_id = c.b
)
SELECT a, b, inter_n, union_n FROM ver WHERE inter_n * 5 >= union_n * 3
"""


def _simhash_pairs_sql(max_hamming: int = 10) -> str:
    """Full SimHash replay: per-word 64-bit md5 hash (duplicates
    counted), per-bit ±1 voting, hash reassembly, then ALL pairs with
    hamming ≤ max_hamming — the engine's chunk banding is exact
    (pigeonhole, chunks > max_hamming) so all-pairs is the equivalent
    ground truth."""
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
wh AS (
  SELECT doc_id, ('0x'||substr(md5(w),1,16))::UBIGINT AS h FROM w
),
bits AS (
  SELECT doc_id, i,
         SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
  FROM wh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) gi
  GROUP BY doc_id, i
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (1::UBIGINT << i)
                       ELSE 0::UBIGINT END) AS UBIGINT) AS s
  FROM bits GROUP BY doc_id
),
alld AS (
  SELECT d.doc_id, COALESCE(sh.s, 0::UBIGINT) AS s
  FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
)
SELECT l.doc_id AS a, r.doc_id AS b,
       CAST(bit_count(xor(l.s, r.s)) AS BIGINT) AS hamming
FROM alld l JOIN alld r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.s, r.s)) <= {max_hamming}
"""


def _curate_sql(punct: str, stop_rx: str) -> str:
    """curate_corpus oracle: the same four stages as the composed Ray
    pipeline, each reusing the standalone query's SQL fragment verbatim
    (lang CTE = _lang_id_sql() as a subquery; quality CASE = the
    quality_score oracle; mask = _pii_chain_sql; dedup = the
    dedup_exact md5 grouping) — filtered-then-deduped in the same
    order."""
    return f"""
WITH q AS (
  SELECT doc_id, length(text) AS n_chars,
    CASE WHEN length(text) < 50
           OR length(regexp_extract_all(text, '{punct}')) > length(text)*0.3
         THEN 'low'
         WHEN length(regexp_extract_all(lower(text), '{stop_rx}')) > 0
         THEN 'high' ELSE 'mid' END AS quality
  FROM documents),
f AS (
  SELECT d.doc_id, d.text, l.lang_pred, q.quality, q.n_chars
  FROM documents d
  JOIN ({_lang_id_sql()}) l USING (doc_id)
  JOIN q USING (doc_id)
  WHERE l.lang_pred = 'en' AND q.quality <> 'low'),
s AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text))
SELECT f.doc_id, f.lang_pred, f.quality, f.n_chars,
       {_pii_chain_sql('f.text')} AS masked_text
FROM f JOIN s USING (doc_id)
"""


def _lang_id_sql() -> str:
    from beats_ray.dataops.textstats import _LANG_MARKERS

    cols = []
    for lang, marks in _LANG_MARKERS.items():
        inlist = ", ".join(f"'{m}'" for m in sorted(marks))
        cols.append(
            f"len(list_filter(ws, w -> w IN ({inlist}))) AS c_{lang}"
        )
    # first-max-wins in the engine's iteration order (strict > chain)
    langs = list(_LANG_MARKERS)
    gmax = "greatest(" + ", ".join(f"c_{l}" for l in langs) + ")"
    case = f"CASE WHEN {gmax} = 0 THEN 'unknown' " + " ".join(
        f"WHEN c_{l} = {gmax} THEN '{l}'" for l in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH m AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS ws
  FROM documents
),
c AS (SELECT doc_id, {', '.join(cols)} FROM m)
SELECT doc_id, {case} AS lang_pred FROM c
"""


def _media_values_sql() -> str:
    """The deterministic media corpus inlined as a VALUES table (the
    INPUT data, in byte-list + hex form); the feature math itself runs
    in SQL."""
    from beats_ray.dataops.multimodal import synthesize_media_table

    rows = []
    for r in synthesize_media_table(64).to_pylist():
        bs = ", ".join(str(b) for b in r["payload"])
        rows.append(
            f"({r['media_id']}, '{r['kind']}', {r['width']}, {r['height']}, "
            f"{r['duration_ms']}, '{r['payload'].hex()}', [{bs}])"
        )
    return (
        "media(media_id, kind, width, height, duration_ms, payload_hex, bs)"
        " AS (VALUES " + ", ".join(rows) + ")"
    )


def _media_features_sql() -> str:
    # fake decode = payload bytes tiled to width*height pixels:
    # px_sum = full_cycles * sum(bytes) + sum(first remainder bytes)
    need = "(greatest(width,1) * greatest(height,1))"
    return f"""
WITH {_media_values_sql()}
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST({need} AS BIGINT) AS n_px,
       CAST({need} // len(bs) * list_sum(bs)
            + CASE WHEN {need} % len(bs) > 0
                   THEN list_sum(bs[1:{need} % len(bs)])
                   ELSE 0 END AS BIGINT) AS px_sum
FROM media WHERE kind = 'image'
"""


def _frame_samples_sql() -> str:
    return f"""
WITH {_media_values_sql()}
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(frame_ms AS BIGINT) AS frame_ms,
       substr(md5(payload_hex || '-' || CAST(frame_ms AS VARCHAR)), 1, 16)
         AS frame_hash
FROM (
  SELECT media_id, payload_hex,
         unnest(generate_series(0, duration_ms - 1, 500)) AS frame_ms
  FROM media WHERE kind = 'video'
)
"""


def _bloom_contamination_sql() -> str:
    # same shingle extraction as _contamination_sql, but membership is
    # the 4-position Bloom test against the probe's 4096-bit filter —
    # false positives and all (position math is md5-derived on both
    # sides, so the bit patterns are identical)
    pos = ("('0x'||substr(md5(CAST(j AS VARCHAR)||':'||{v}),1,16))::UBIGINT"
           " % 4096")
    return f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     w -> w <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE
      WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
      WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                          for i in generate_series(1, len(w)-2)])
    END AS ss
  FROM ws
),
pshingle AS (
  SELECT DISTINCT unnest(ss) AS s FROM sh WHERE doc_id < 5
),
pbits AS (
  SELECT list_distinct(flatten(list(
           [{pos.format(v='s')} for j in generate_series(1, 4)]))) AS bits
  FROM pshingle
)
SELECT d.doc_id,
       CAST(len(d.ss) AS BIGINT) AS n_ngrams,
       CAST(len(list_filter(d.ss, x -> list_has_all(p.bits,
              [{pos.format(v='x')} for j in generate_series(1, 4)])))
            AS BIGINT) AS n_bloom_hits,
       (len(list_filter(d.ss, x -> list_has_all(p.bits,
              [{pos.format(v='x')} for j in generate_series(1, 4)]))) * 2
        >= greatest(len(d.ss), 1)) AS contaminated
FROM sh d CROSS JOIN pbits p
"""


def _contamination_sql() -> str:
    # probe set = word-3-gram hashes of docs 0-4 (same as the query);
    # threshold 0.5 → hits*2 >= max(n,1)*1
    g3 = _h32("array_to_string(w[i:i+2], ' ')")
    return f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     w -> w <> '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE
      WHEN len(w) = 0 THEN CAST([] AS UBIGINT[])
      WHEN len(w) < 3 THEN [{_h32("array_to_string(w, ' ')")}]
      ELSE list_distinct([{g3} for i in generate_series(1, len(w)-2)])
    END AS hs
  FROM ws
),
probe AS (
  SELECT list_distinct(flatten(list(hs ORDER BY doc_id))) AS phs
  FROM sh WHERE doc_id < 5
)
SELECT s.doc_id,
       CAST(len(s.hs) AS BIGINT) AS n_ngrams,
       CAST(len(list_intersect(s.hs, p.phs)) AS BIGINT) AS n_probe_hits,
       (len(list_intersect(s.hs, p.phs)) * 2 >= greatest(len(s.hs), 1))
         AS contaminated
FROM sh s CROSS JOIN probe p
"""


# exact brute-force top-k ground truth — shared by all three ANN
# queries (brute is exact; IVF/LSH run at full probe, provably equal)
_ANN_ORACLE = """
            SELECT q.vec_id AS query_id,
                   CAST(row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id) AS BIGINT) AS rank,
                   e.vec_id
            FROM embeddings e
            CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4) q
            QUALIFY rank <= 10"""


# distributed-k-means replay, shared by the embedding_kmeans and
# cluster_balanced_sample oracles: identical integer pipeline —
# floor(1e6·x) quantize, seeds = the 4 smallest vec_ids (cluster = id
# rank), two unrolled Lloyd iterations (assign = min integer squared
# distance with ties → smallest cluster; update = exact int sums with
# DuckDB // truncating division, empty clusters keep the old
# centroid), `af` = final assignment vs the iter-2 means
_KMEANS_AF_SQL = """
    WITH xm AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS d,
             CAST(FLOOR(1000000 * CAST(unnest(embedding)
                  AS DOUBLE)) AS BIGINT) AS um
      FROM embeddings
    ), seed AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
      FROM (SELECT DISTINCT vec_id FROM embeddings
            ORDER BY vec_id LIMIT 4)
    ), c0 AS (
      SELECT seed.cluster, xm.d, xm.um AS c
      FROM seed JOIN xm USING (vec_id)
    ), a0 AS (
      SELECT xm.vec_id, c0.cluster,
             CAST(SUM((xm.um - c0.c) * (xm.um - c0.c)) AS BIGINT) AS dist2
      FROM xm JOIN c0 ON xm.d = c0.d
      GROUP BY xm.vec_id, c0.cluster
      QUALIFY row_number() OVER (PARTITION BY xm.vec_id
              ORDER BY dist2, c0.cluster) = 1
    ), c1 AS (
      SELECT c0.cluster, c0.d, COALESCE(u.c, c0.c) AS c
      FROM c0 LEFT JOIN (
        SELECT a0.cluster, xm.d,
               CAST(SUM(xm.um) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
        FROM a0 JOIN xm USING (vec_id)
        GROUP BY a0.cluster, xm.d
      ) u ON u.cluster = c0.cluster AND u.d = c0.d
    ), a1 AS (
      SELECT xm.vec_id, c1.cluster,
             CAST(SUM((xm.um - c1.c) * (xm.um - c1.c)) AS BIGINT) AS dist2
      FROM xm JOIN c1 ON xm.d = c1.d
      GROUP BY xm.vec_id, c1.cluster
      QUALIFY row_number() OVER (PARTITION BY xm.vec_id
              ORDER BY dist2, c1.cluster) = 1
    ), c2 AS (
      SELECT c1.cluster, c1.d, COALESCE(u.c, c1.c) AS c
      FROM c1 LEFT JOIN (
        SELECT a1.cluster, xm.d,
               CAST(SUM(xm.um) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
        FROM a1 JOIN xm USING (vec_id)
        GROUP BY a1.cluster, xm.d
      ) u ON u.cluster = c1.cluster AND u.d = c1.d
    ), af AS (
      SELECT xm.vec_id, c2.cluster,
             CAST(SUM((xm.um - c2.c) * (xm.um - c2.c)) AS BIGINT)
               AS dist2_um2
      FROM xm JOIN c2 ON xm.d = c2.d
      GROUP BY xm.vec_id, c2.cluster
      QUALIFY row_number() OVER (PARTITION BY xm.vec_id
              ORDER BY dist2_um2, c2.cluster) = 1
    )"""


def _grok_rx_sql() -> str:
    """The grok_parse oracle regex: the SAME expanded RE2 pattern the
    Ray side compiles (DuckDB's regexp_* are RE2 too, so both engines
    run one identical regex — bit-faithful by construction). Named
    groups become DuckDB's numbered capture indices in order."""
    from beats_ray.processors.grok import expand_pattern

    rx, _ = expand_pattern("^" + GROK_PATTERN + "$")
    return rx.replace("'", "''")


def oracle_sql() -> dict[str, str]:
    # make sure the corpus the SQL reads exists (driver runs at sf0.01)
    ensure_transcripts(0.01)
    from beats_ray.sources import write_ndjson_fixture

    ndjson_dir = write_ndjson_fixture(0.01)
    tr = _tr_sql(0.01)
    path = transcripts_dir(0.01) + "/part-*.parquet"
    punct = "[!\\\"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"
    stop_rx = r"\b(the|and|of|a|to|in|is|for|on|it)\b"
    # explicit ASCII class == RE2 \s (Python's unicode \s diverges);
    # identical values in RE2 before/after, but keeps both sides synced
    # to beats_ray.dataops.textstats.BPE_TOKEN
    bpe_rx = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"
    # BPE oracle: merges come from an INDEPENDENT scalar fit replica
    # (DuckDB counts + list-splice loop) and are inlined as the
    # recursive CTE's replace patterns (driver runs at sf0.01)
    _bpe_m = _bpe_merges_replica(
        "/root/testdata/sf0.01/documents.parquet", n_merges=20,
        vocab_k=5000)
    _q = lambda s: s.replace("'", "''")  # noqa: E731
    bpe_vals = ", ".join(
        f"({i}, ' {_q(a)} {_q(b)} ', ' {_q(a)}{_q(b)} ')"
        for i, (a, b) in enumerate(_bpe_m)
    ) or "(0, ' \x00 \x00 ', ' \x00\x00 ')"  # unreachable filler
    bpe_n = len(_bpe_m)
    # PCA oracle: component from an INDEPENDENT no-Ray scalar replica
    # (same exact-integer Gram + power iteration), inlined as VALUES
    from beats_ray.dataops.ann import pca_component_replica

    _pca_v = pca_component_replica(
        "/root/testdata/sf0.01/embeddings.parquet", iters=3)
    pca_vals = ", ".join(
        f"({d + 1}, {v})" for d, v in enumerate(_pca_v)) or "(1, 0)"
    return {
        "route_counts": tr + "SELECT sink, COUNT(*) AS n FROM r GROUP BY sink",
        "routed_rows": tr + "SELECT conv_id, turn_idx, sink, text FROM r",
        "parse_kinds": tr + "SELECT kind, COUNT(*) AS n FROM c GROUP BY kind",
        "error_rows": tr
        + "SELECT conv_id, turn_idx, error_message FROM c WHERE error_message IS NOT NULL",
        "enrich_counts": tr.rstrip()
        + f", {_lookup_values_sql()} "
        + "SELECT tl.tool_category, tl.risk_level, rl.role_tag, COUNT(*) AS n "
        "FROM r LEFT JOIN tl ON r.tool = tl.tool LEFT JOIN rl ON r.role = rl.role "
        "GROUP BY tl.tool_category, tl.risk_level, rl.role_tag",
        "role_level_pivot": tr
        + f"""SELECT role,
              CAST(COUNT(*) FILTER (WHERE regexp_extract(text, '{DISSECT_RX}', 1) = 'info'
                    AND dissect_ok) AS BIGINT) AS n_info,
              CAST(COUNT(*) FILTER (WHERE regexp_extract(text, '{DISSECT_RX}', 1) = 'warn'
                    AND dissect_ok) AS BIGINT) AS n_warn,
              CAST(COUNT(*) FILTER (WHERE regexp_extract(text, '{DISSECT_RX}', 1) = 'error'
                    AND dissect_ok) AS BIGINT) AS n_error,
              CAST(COUNT(*) FILTER (WHERE regexp_extract(text, '{DISSECT_RX}', 1) = 'debug'
                    AND dissect_ok) AS BIGINT) AS n_debug
              FROM p GROUP BY role""",
        "grok_parse": tr
        + f"""SELECT conv_id, turn_idx,
              regexp_extract(text, '{_grok_rx_sql()}', 1) AS level,
              regexp_extract(text, '{_grok_rx_sql()}', 2) AS ts_str,
              regexp_extract(text, '{_grok_rx_sql()}', 3) AS tool_name,
              regexp_extract(text, '{_grok_rx_sql()}', 4) AS status,
              CAST(regexp_extract(text, '{_grok_rx_sql()}', 5) AS BIGINT)
                AS n_cmds
              FROM t WHERE regexp_matches(text, '{_grok_rx_sql()}')""",
        "dissect_parse": tr
        + f"""SELECT conv_id, turn_idx,
              regexp_extract(text, '{DISSECT_RX}', 1) AS level,
              regexp_extract(text, '{DISSECT_RX}', 2) AS ts_str,
              regexp_extract(text, '{DISSECT_RX}', 3) AS tool_name,
              regexp_extract(text, '{DISSECT_RX}', 4) AS status,
              regexp_extract(text, '{DISSECT_RX}', 5) AS msg
              FROM p WHERE dissect_ok""",
        "ndjson_parse": tr
        + """SELECT conv_id, turn_idx, event,
             json_extract_string(try_cast(text AS JSON),'$.tool') AS json_tool,
             CAST(json_extract(try_cast(text AS JSON),'$.duration_ms') AS BIGINT) AS duration_ms
             FROM k WHERE ndjson_ok""",
        "syslog_parse": tr
        + r"""SELECT conv_id, turn_idx,
              CAST(regexp_extract(text, '^<(\d{1,3})>', 1) AS BIGINT) AS pri,
              CAST(regexp_extract(text, '^<(\d{1,3})>', 1) AS BIGINT) // 8 AS facility,
              CAST(regexp_extract(text, '^<(\d{1,3})>', 1) AS BIGINT) % 8 AS severity,
              regexp_extract(text, '^<\d{1,3}>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2} (\S+) ', 1) AS host,
              NULLIF(regexp_extract(text, '^<\d{1,3}>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2} \S+ ([^\[\s:]+)(?:\[\d+\])?: ', 1), '') AS app,
              CAST(NULLIF(regexp_extract(text, '^<\d{1,3}>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2} \S+ [^\[\s:]+\[(\d+)\]: ', 1), '') AS BIGINT) AS pid,
              regexp_extract(text, '^<\d{1,3}>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2} \S+ (?:[^\[\s:]+(?:\[\d+\])?: )?(?s)(.*)$', 1) AS msg
              FROM p WHERE syslog_ok""",
        "multiline_merge": tr
        + r"""SELECT conv_id, turn_idx, event_id,
              string_agg(line, chr(10) ORDER BY line_idx) AS text,
              CAST(COUNT(*) AS BIGINT) AS n_lines
              FROM (
                SELECT conv_id, turn_idx, line_idx, line,
                  CAST(SUM(is_start) OVER (PARTITION BY conv_id, turn_idx
                       ORDER BY line_idx) - 1 AS BIGINT) AS event_id
                FROM (
                  SELECT conv_id, turn_idx,
                    unnest(generate_series(1, array_length(string_split(text, chr(10))))) AS line_idx,
                    unnest(string_split(text, chr(10))) AS line,
                    unnest([CASE WHEN regexp_matches(l, '^\s') THEN 0 ELSE 1 END
                            FOR l IN string_split(text, chr(10))]) AS is_start
                  FROM t
                )
              ) GROUP BY conv_id, turn_idx, event_id""",
        "lang_char_ranks": """
            SELECT doc_id, lang,
                   CAST(rank() OVER (PARTITION BY lang
                        ORDER BY n_chars) AS BIGINT) AS rnk,
                   CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT)
                     AS n_group
            FROM documents""",
        "tool_sequences": tr
        + """SELECT tool_a, tool_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
             FROM (
               SELECT conv_id, tool AS tool_a,
                      lead(tool) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS tool_b
               FROM t WHERE tool <> 'none'
             ) WHERE tool_b IS NOT NULL
             GROUP BY tool_a, tool_b""",
        "tool_pair_pmi": tr
        + """, pr AS (
               SELECT tool_a, tool_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
               FROM (
                 SELECT conv_id, tool AS tool_a,
                        lead(tool) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx) AS tool_b
                 FROM t WHERE tool <> 'none'
               ) WHERE tool_b IS NOT NULL
               GROUP BY tool_a, tool_b
             ),
             tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n FROM pr),
             ma AS (SELECT tool_a, CAST(SUM(n_pairs) AS BIGINT) AS ca
                    FROM pr GROUP BY 1),
             mb AS (SELECT tool_b, CAST(SUM(n_pairs) AS BIGINT) AS cb
                    FROM pr GROUP BY 1)
             SELECT pr.tool_a, pr.tool_b, pr.n_pairs,
                    CAST(FLOOR(1000000 * ln(
                      CAST(pr.n_pairs * tot.n AS DOUBLE)
                      / CAST(ma.ca * mb.cb AS DOUBLE))) AS BIGINT)
                      AS pmi_um
             FROM pr
             CROSS JOIN tot
             JOIN ma ON pr.tool_a = ma.tool_a
             JOIN mb ON pr.tool_b = mb.tool_b""",
        "hopping_event_counts": """
            SELECT window_start, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (
              SELECT ((epoch_us(ts) // 1000000) // 300) * 300
                       AS window_start, event_type
              FROM events
              UNION ALL
              SELECT ((epoch_us(ts) // 1000000) // 300) * 300 - 300,
                     event_type
              FROM events
            ) GROUP BY 1, 2
            ORDER BY 1, 2""",
        "user_first_seen_curve": """
            WITH f AS (
              SELECT user_id,
                     MIN((epoch_us(ts) // 1000000) // 86400) AS day
              FROM events GROUP BY 1
            ),
            d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
                  FROM f GROUP BY 1)
            SELECT CAST(day AS BIGINT) AS day, new_users,
                   CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM d ORDER BY day""",
        "events_rollup": """
            SELECT COALESCE(event_type, '<all>') AS event_type,
                   CAST(COALESCE((epoch_us(ts) // 1000000) // 86400, -1)
                        AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            GROUP BY ROLLUP (event_type,
                             (epoch_us(ts) // 1000000) // 86400)
            ORDER BY 1, 2""",
        "event_burst_pairs": """
            SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM events a JOIN events b ON a.user_id = b.user_id
            WHERE b.ts > a.ts
              AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
            GROUP BY a.user_id
            ORDER BY a.user_id""",
        "retention_cohorts": """
            WITH ud AS (
              SELECT DISTINCT user_id,
                     (epoch_us(ts) // 1000000) // 86400 AS day
              FROM events
            ),
            f AS (SELECT user_id, MIN(day) AS first_day
                  FROM ud GROUP BY 1)
            SELECT CAST(first_day AS BIGINT) AS first_day,
                   CAST(day - first_day AS BIGINT) AS age,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ud JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "conv_dedup": tr
        + """, convfull AS (
               SELECT conv_id,
                      string_agg(coalesce(text, ''), chr(10)
                                 ORDER BY turn_idx) AS fulltext
               FROM t GROUP BY conv_id
             )
             SELECT MIN(conv_id) AS conv_id,
                    CAST(COUNT(*) AS BIGINT) AS n_convs
             FROM (SELECT conv_id, md5(fulltext) AS hh FROM convfull) sub
             GROUP BY hh""",
        "conv_prefix_groups": tr
        + """, firstturn AS (
               SELECT conv_id, text, turn_idx FROM (
                 SELECT conv_id, coalesce(text, '') AS text, turn_idx,
                        row_number() OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS rn
                 FROM t
               ) WHERE rn <= 1
             ),
             pfx AS (
               SELECT conv_id,
                      md5(string_agg(text, chr(10) ORDER BY turn_idx))
                        AS hh
               FROM firstturn GROUP BY conv_id
             )
             SELECT MIN(conv_id) AS conv_id,
                    CAST(COUNT(*) AS BIGINT) AS n_convs
             FROM pfx GROUP BY hh
             HAVING COUNT(*) >= 2""",
        "tool_cooccurrence": tr
        + """, dtl AS (SELECT DISTINCT conv_id, tool FROM t
                       WHERE tool <> 'none'),
             stool AS (SELECT tool, CAST(COUNT(*) AS BIGINT) AS n
                   FROM dtl GROUP BY 1),
             ptool AS (SELECT a.tool AS tool_a, b.tool AS tool_b,
                          CAST(COUNT(*) AS BIGINT) AS n_both
                   FROM dtl a JOIN dtl b
                     ON a.conv_id = b.conv_id AND a.tool < b.tool
                   GROUP BY 1, 2)
             SELECT ptool.tool_a, ptool.tool_b, ptool.n_both,
                    CAST(sa.n + sb.n - ptool.n_both AS BIGINT) AS n_either
             FROM ptool
             JOIN stool sa ON ptool.tool_a = sa.tool
             JOIN stool sb ON ptool.tool_b = sb.tool""",
        "tool_funnel": tr
        + """SELECT tool_a, tool_b, CAST(COUNT(*) AS BIGINT) AS n_convs
             FROM (
               SELECT a.conv_id, a.tool AS tool_a, b.tool AS tool_b
               FROM (SELECT conv_id, tool, MIN(turn_idx) AS mn
                     FROM t WHERE tool <> 'none' GROUP BY 1, 2) a
               JOIN (SELECT conv_id, tool, MAX(turn_idx) AS mx
                     FROM t WHERE tool <> 'none' GROUP BY 1, 2) b
                 USING (conv_id)
               WHERE a.tool <> b.tool AND a.mn < b.mx
             ) GROUP BY 1, 2""",
        "role_latency": tr
        + """SELECT role_a, role_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(dt_us) AS BIGINT) AS sum_dt_us
             FROM (
               SELECT conv_id, role AS role_a,
                      lead(role) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS role_b,
                      epoch_us(lead(ts) OVER (PARTITION BY conv_id
                                              ORDER BY turn_idx))
                        - epoch_us(ts) AS dt_us
               FROM t
             ) WHERE role_b IS NOT NULL
             GROUP BY role_a, role_b""",
        "role_latency_quantiles": tr
        + """SELECT role_a || '->' || role_b AS pair,
                    quantile_disc(dt_us, 0.5) AS q0_5,
                    quantile_disc(dt_us, 0.9) AS q0_9,
                    quantile_disc(dt_us, 0.99) AS q0_99
             FROM (
               SELECT role AS role_a,
                      lead(role) OVER w AS role_b,
                      epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt_us
               FROM t
               WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
             ) WHERE role_b IS NOT NULL
             GROUP BY 1""",
        "rolling_turn_chars": tr
        + """SELECT conv_id, turn_idx,
             CAST(SUM(length(coalesce(text, ''))) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS roll_chars
             FROM t""",
        "running_turn_chars": tr
        + """SELECT conv_id, turn_idx,
             CAST(SUM(length(coalesce(text, ''))) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_chars
             FROM t""",
        "conv_stats": tr
        + """SELECT conv_id, COUNT(*) AS n_turns,
             CAST(min(floor(epoch(ts))) AS BIGINT) AS first_s,
             CAST(max(floor(epoch(ts))) AS BIGINT) AS last_s,
             CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS span_s
             FROM t GROUP BY conv_id""",
        "syslog_sd_parse": f"""
            SELECT conv_id, turn_idx, conv_id AS sd_conv,
                   CAST(turn_idx AS BIGINT) AS sd_idx,
                   'a " b' AS sd_esc
            FROM read_parquet('{path}')""",
        "dead_letter_counts": tr
        + """SELECT CASE WHEN strlen(text) > 100 THEN 'dead_letter'
                         ELSE sink END AS sink,
                    COUNT(*) AS n
             FROM r GROUP BY 1""",
        "multiline_stats": tr
        + """SELECT conv_id, turn_idx,
             length(text) - length(replace(text, chr(10), '')) + 1 AS n_lines,
             split_part(text, chr(10), 1) AS first_line
             FROM p WHERE multi_ok""",
        "truncate_preview": f"""
            SELECT conv_id, turn_idx, left(text, 40) AS text_trunc,
                   length(text) > 40 AS truncated
            FROM read_parquet('{path}')""",
        "replace_mask_numbers": f"""
            SELECT conv_id, turn_idx,
                   regexp_replace(text, '\\d+', 'N', 'g') AS masked
            FROM read_parquet('{path}')""",
        "timestamp_parse": tr
        + f"""SELECT conv_id, turn_idx,
              strptime(regexp_extract(text, '{DISSECT_RX}', 2),
                       '%Y-%m-%dT%H:%M:%SZ') AS ts_parsed
              FROM p WHERE dissect_ok""",
        "format_index": f"""
            SELECT conv_id, turn_idx,
                   'logs-' || role || '-' || strftime(ts, '%Y.%m.%d') AS idx_name
            FROM read_parquet('{path}')""",
        "unique_tools": f"SELECT DISTINCT tool FROM read_parquet('{path}')",
        "source_ndjson_counts": f"""
            SELECT role, COUNT(*) AS n
            FROM read_json_auto('{ndjson_dir}/*.log', format='newline_delimited')
            GROUP BY role""",
        # replay of write_journal_export_fixture's mapping: per-turn text
        # + timestamp equality through export framing + journald_conv
        "journald_messages": f"""
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   text AS message, ts
            FROM read_parquet('{path}')""",
        "journald_unit_counts": f"""
            SELECT tool || '.service' AS unit,
                   CAST(CASE role WHEN 'user' THEN 6 WHEN 'assistant' THEN 5
                        WHEN 'tool' THEN 4 ELSE 3 END AS BIGINT) AS priority,
                   COUNT(*) AS n
            FROM read_parquet('{path}')
            WHERE (CASE WHEN role='tool' THEN 'stdout' ELSE 'journal' END)
                    = 'journal'
               OR tool = 'bash'
            GROUP BY unit, priority""",
        # replay of write_winlog_xml_fixture's mapping: empty texts
        # decode to NULL message (AddOptional skips zero values); the
        # corpus has no \r\n / trailing newlines for the line-ending
        # normalization to touch (asserted in tests/test_winlog.py)
        "winlog_messages": f"""
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   NULLIF(text, '') AS message, ts
            FROM read_parquet('{path}')""",
        # level filter 'information,error' = raw {{0,4,2}} = roles
        # user/assistant/system; event_id '1000-1007,-1003' over
        # EventID = 1000 + turn_idx % 16, exclusion wins
        "winlog_eventid_counts": f"""
            SELECT tool AS provider,
                   CAST(1000 + turn_idx % 16 AS VARCHAR) AS event_code,
                   COUNT(*) AS n
            FROM read_parquet('{path}')
            WHERE (CASE role WHEN 'user' THEN 4 WHEN 'assistant' THEN 0
                   WHEN 'tool' THEN 5 ELSE 2 END) IN (0, 2, 4)
              AND (1000 + turn_idx % 16) BETWEEN 1000 AND 1007
              AND (1000 + turn_idx % 16) <> 1003
            GROUP BY provider, event_code""",
        # replay of write_kafka_segments_fixture's mapping: partition =
        # numeric conv_id suffix % 4; committed log order = (conv_id,
        # turn_idx) per partition so offsets are ROW_NUMBER-1;
        # role='system' turns ride in aborted transactions (dropped at
        # read_committed)
        "kafka_messages": f"""
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   CAST(SUBSTR(conv_id, 6) AS BIGINT) % 4 AS partition,
                   ROW_NUMBER() OVER (
                     PARTITION BY CAST(SUBSTR(conv_id, 6) AS BIGINT) % 4
                     ORDER BY conv_id, turn_idx) - 1 AS offset,
                   text AS message, ts
            FROM read_parquet('{path}')
            WHERE role <> 'system'""",
        # read_uncommitted sees aborted records too; each abort's
        # control marker consumes one offset at the partition tail, so
        # sum(offset) = committed run 0..n-1 + tail data entries at
        # n_norm, n_norm+2, ... (markers at the odd slots)
        "kafka_partition_offsets": f"""
            WITH agg AS (
              SELECT CAST(SUBSTR(conv_id, 6) AS BIGINT) % 4 AS partition,
                     COUNT(*) FILTER (WHERE role <> 'system') AS n_norm,
                     COUNT(*) FILTER (WHERE role = 'system') AS n_ab
              FROM read_parquet('{path}') GROUP BY partition)
            SELECT partition, n_norm + n_ab AS n,
                   CAST(n_norm * (n_norm - 1) / 2
                        + n_ab * n_norm + n_ab * (n_ab - 1)
                        AS BIGINT) AS sum_offset
            FROM agg""",
        "kafka_expanded_turns": f"""
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
                   text AS message, conv_id AS key
            FROM read_parquet('{path}')""",
        # replay of scripted_slowlog_entries' mapping: host = numeric
        # conv_id suffix % 4 over turns with turn_idx % 8 = 0; slowlog
        # id = per-host append order (conv_id, turn_idx); hosts 0-1
        # serve the redis>=6.0 6-field shape (client fields), 2-3 the
        # pre-6.0 4-field shape (client fields null); host 0 is master
        "redis_slowlog_events": f"""
            WITH e AS (
              SELECT conv_id, turn_idx, role, text, ts,
                     CAST(SUBSTR(conv_id, 6) AS BIGINT) AS convnum,
                     CAST(SUBSTR(conv_id, 6) AS BIGINT) % 4 AS h,
                     CASE WHEN tool <> 'none' THEN upper(tool)
                          ELSE 'GET' END AS cmd
              FROM read_parquet('{path}')
              WHERE turn_idx % 8 = 0)
            SELECT 'redis-' || h AS host,
                   cmd || ' ' || conv_id || ' '
                       || CAST(turn_idx AS VARCHAR) AS message,
                   CAST(to_timestamp(CAST(epoch(ts) AS BIGINT))
                        AS TIMESTAMP) AS ts,
                   ROW_NUMBER() OVER (PARTITION BY h
                     ORDER BY conv_id, turn_idx) - 1 AS "redis.slowlog.id",
                   cmd AS "redis.slowlog.cmd",
                   conv_id AS "redis.slowlog.key",
                   CAST(length(text) * 10 + turn_idx AS BIGINT)
                       AS "redis.slowlog.duration.us",
                   CASE WHEN h = 0 THEN 'master' ELSE 'slave' END
                       AS "redis.slowlog.role",
                   CASE WHEN h < 2 THEN '10.0.0.' || (convnum % 200 + 1)
                        || ':' || (40000 + turn_idx) END
                       AS "redis.slowlog.clientAddr",
                   CASE WHEN h < 2 THEN role END
                       AS "redis.slowlog.clientName"
            FROM e""",
        "redis_cmd_durations": f"""
            SELECT CASE WHEN tool <> 'none' THEN upper(tool)
                        ELSE 'GET' END AS cmd,
                   COUNT(*) AS n,
                   CAST(SUM(length(text) * 10 + turn_idx) AS BIGINT)
                       AS total_us
            FROM read_parquet('{path}')
            WHERE turn_idx % 8 = 0
            GROUP BY cmd""",
        # replay of scripted_mqtt_messages + the broker's delivery
        # rules: broker = conv suffix % 4, delivery order = (conv_id,
        # turn_idx), delivered qos = min(turn_idx % 3, granted 1),
        # packet ids count qos>0 deliveries per broker from 1
        "mqtt_messages": f"""
            WITH d AS (
              SELECT conv_id, turn_idx, role, text,
                     CAST(SUBSTR(conv_id, 6) AS BIGINT) % 4 AS broker,
                     CASE WHEN turn_idx % 3 = 0 THEN 0 ELSE 1 END AS q
              FROM read_parquet('{path}')
              WHERE turn_idx % 4 = 0 AND role IN ('user', 'assistant'))
            SELECT 'conv/' || conv_id || '/' || role AS topic,
                   text AS message,
                   CAST(q AS BIGINT) AS qos,
                   (turn_idx = 0) AS retained,
                   CAST(CASE WHEN q > 0 THEN
                     SUM(q) OVER (PARTITION BY broker
                       ORDER BY conv_id, turn_idx
                       ROWS UNBOUNDED PRECEDING)
                   ELSE 0 END AS BIGINT) AS message_id
            FROM d""",
        "mqtt_topic_counts": f"""
            SELECT role, COUNT(*) AS n,
                   CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
            FROM read_parquet('{path}')
            WHERE turn_idx % 4 = 0
            GROUP BY role""",
        "text_len_histogram": f"""
            SELECT CAST(length(text) // 20 * 20 AS BIGINT) AS len_bucket,
                   COUNT(*) AS n
            FROM read_parquet('{path}') GROUP BY len_bucket""",
        "hot_conversations": f"""
            SELECT conv_id, COUNT(*) AS n FROM read_parquet('{path}')
            GROUP BY conv_id ORDER BY n DESC, conv_id LIMIT 10""",
        "fingerprint_docs": "SELECT doc_id, md5(text) AS fp FROM documents",
        "rate_limited_counts": f"""
            SELECT conv_id, COUNT(*) AS n_kept FROM (
              SELECT conv_id FROM read_parquet('{path}')
              QUALIFY row_number() OVER (
                PARTITION BY conv_id, CAST(floor(epoch(ts)/60) AS BIGINT)
                ORDER BY turn_idx) <= 3
            ) GROUP BY conv_id""",
        "stage_rate_limited_counts": tr
        + """SELECT sink, COUNT(*) AS n FROM (
               SELECT sink FROM r
               QUALIFY row_number() OVER (
                 PARTITION BY conv_id,
                              CAST(floor(epoch(ts)/60) AS BIGINT)
                 ORDER BY turn_idx) <= 2
             ) GROUP BY sink""",
        # token bucket: recursive CTE replays the exact integer
        # recurrence (unit = per_s*1e6 sub-tokens; cap=2 tokens,
        # cost=1 token, refill = limit_n * delta_us)
        "rate_limit_tokens": """
            WITH RECURSIVE ev AS (
              SELECT user_id, epoch_us(ts) AS tus,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events
            ),
            tb(user_id, rn, tus, tok, allowed) AS (
              SELECT user_id, rn, tus,
                     7200000000 - 3600000000,
                     TRUE
              FROM ev WHERE rn = 1
              UNION ALL
              SELECT e.user_id, e.rn, e.tus,
                     CASE WHEN least(7200000000, t.tok + (e.tus - t.tus))
                               >= 3600000000
                          THEN least(7200000000, t.tok + (e.tus - t.tus))
                               - 3600000000
                          ELSE least(7200000000, t.tok + (e.tus - t.tus)) END,
                     least(7200000000, t.tok + (e.tus - t.tus)) >= 3600000000
              FROM tb t
              JOIN ev e ON e.user_id = t.user_id AND e.rn = t.rn + 1
            )
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE allowed) AS BIGINT) AS n_kept
            FROM tb GROUP BY user_id""",
        # dns TTL lookup cache: recursive CTE replaying the anchored
        # expiry chain (miss installs expiry=ts+ttl; ts<=expiry hits)
        "dns_cache_hits": """
            WITH RECURSIVE ev AS (
              SELECT event_id, epoch_us(ts) AS tus,
                     'host-' || CAST(user_id % 40 AS VARCHAR)
                             || '.example' AS query,
                     user_id % 40 AS hk,
                     row_number() OVER (PARTITION BY user_id % 40
                                        ORDER BY ts, event_id) AS rn
              FROM events WHERE event_type = 'click'
            ),
            ch(hk, rn, tus, expiry, hit) AS (
              SELECT hk, rn, tus,
                     tus + CASE WHEN hk < 30 THEN 600000000
                                ELSE 120000000 END,
                     FALSE
              FROM ev WHERE rn = 1
              UNION ALL
              SELECT e.hk, e.rn, e.tus,
                     CASE WHEN e.tus <= c.expiry THEN c.expiry
                          ELSE e.tus + CASE WHEN e.hk < 30 THEN 600000000
                                            ELSE 120000000 END END,
                     e.tus <= c.expiry
              FROM ch c JOIN ev e ON e.hk = c.hk AND e.rn = c.rn + 1
            )
            SELECT e.event_id, e.query,
                   CASE WHEN e.hk < 30
                        THEN '10.0.0.' || CAST(e.hk AS VARCHAR)
                        ELSE '' END AS answer,
                   CASE WHEN e.hk < 30 THEN 'OK'
                        ELSE 'NXDOMAIN' END AS status,
                   CASE WHEN c.hit THEN 'hit' ELSE 'miss' END AS cache
            FROM ev e JOIN ch c ON c.hk = e.hk AND c.rn = e.rn""",
        # cache put/get/delete+TTL: ASOF join onto the state stream
        "cache_hits": """
            WITH st AS (
              SELECT user_id, ts, event_type AS sop, event_id AS sv,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sts
              FROM events WHERE event_type IN ('view', 'purchase')
              QUALIFY row_number() OVER (
                PARTITION BY user_id, ts
                ORDER BY sop DESC, sv DESC) = 1
            ),
            g AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
            SELECT g.user_id, g.ts,
                   CASE WHEN st.sop = 'view'
                         AND CAST(floor(epoch(g.ts)) AS BIGINT) - st.sts <= 50000
                        THEN st.sv ELSE -1 END AS cached,
                   COALESCE(st.sop = 'view'
                         AND CAST(floor(epoch(g.ts)) AS BIGINT) - st.sts <= 50000,
                        FALSE) AS hit
            FROM g ASOF LEFT JOIN st
              ON g.user_id = st.user_id AND g.ts >= st.ts""",
        "flow_agg": """
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS window_s,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY user_id, event_type, window_s""",
        "flow_sessions": """
            WITH s AS (
              SELECT user_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 30
                          THEN 1 ELSE 0 END AS new_flow
              FROM events
              WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)
            ), f AS (
              SELECT *, SUM(new_flow) OVER (
                PARTITION BY user_id, event_type ORDER BY sec
                ROWS UNBOUNDED PRECEDING) AS flow_id
              FROM s
            )
            SELECT user_id, event_type,
                   CAST(min(sec) AS BIGINT) AS start_s,
                   CAST(max(sec) AS BIGINT) AS end_s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM f GROUP BY user_id, event_type, flow_id""",
        "sessionize": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN prev IS NULL OR epoch(ts)-epoch(prev) > 1800
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                  FROM events)
            GROUP BY user_id""",
        "event_session_windows": """
            WITH s AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS nf
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), f AS (
              SELECT *, SUM(nf) OVER (
                PARTITION BY user_id ORDER BY sec
                ROWS UNBOUNDED PRECEDING) AS fid
              FROM s
            )
            SELECT event_id, user_id, sec,
                   CAST(min(sec) OVER p AS BIGINT) AS start_s,
                   CAST(max(sec) OVER p AS BIGINT) AS end_s,
                   CAST(count(*) OVER p AS BIGINT) AS n
            FROM f WINDOW p AS (PARTITION BY user_id, fid)""",
        "top_users": """
            SELECT user_id, COUNT(*) AS n FROM events
            GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""",
        "events_type_counts": "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                       * CAST(round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_um,
                   COUNT(*) AS n
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "tpch_q6": """
            SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT) AS revenue_um,
                   COUNT(*) AS n
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24""",
        "q3_top_orders": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_um
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue_um DESC, l_orderkey LIMIT 10""",
        "tpch_q5": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round((1-l_discount)*100) AS BIGINT)) AS BIGINT)
                     AS revenue_um
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue_um DESC, n_name""",
        "tpch_q18": """
            SELECT c_name, o_custkey, o_orderkey, o_orderdate,
                   o_totalprice_um, sum_qty
            FROM (
              SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
                     CAST(round(o.o_totalprice*100) AS BIGINT) AS o_totalprice_um,
                     CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty
              FROM customer c
              JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON o.o_orderkey = l.l_orderkey
              GROUP BY 1, 2, 3, 4, 5
              HAVING SUM(CAST(round(l.l_quantity) AS BIGINT)) > 140
            )
            ORDER BY o_totalprice_um DESC, o_orderdate, o_orderkey
            LIMIT 100""",
        "tpch_q4": """
            SELECT o_orderpriority, COUNT(*) AS n
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority""",
        # Q13: LEFT OUTER join keeps the zero-order customers
        "tpch_q13": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
              FROM customer c
              LEFT OUTER JOIN orders o
                ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority NOT LIKE '%SPECIFIED%'
              GROUP BY c.c_custkey)
            GROUP BY c_count""",
        # Q14 revenue carried as exact cents×percent integers
        # (round(ep·100) · (100 − round(disc·100))) on both sides
        "tpch_q14": """
            WITH li AS (
              SELECT l_partkey,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                       AS um
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-02-01'
            )
            SELECT CAST(COALESCE(SUM(um) FILTER (WHERE l_partkey IN
                     (SELECT p_partkey FROM part
                      WHERE p_type = 'PROMO')), 0) AS BIGINT) AS promo_um,
                   CAST(COALESCE(SUM(um), 0) AS BIGINT) AS total_um
            FROM li""",
        # Q22: the avg threshold is the exact integer test
        # um·n_pos > sum_pos — no float division on either side
        "tpch_q22": """
            WITH c AS (
              SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                     CAST(ROUND(c_acctbal * 100) AS BIGINT) AS um
              FROM customer
            ), avgc AS (
              SELECT CAST(COALESCE(SUM(um) FILTER (WHERE um > 0), 0)
                          AS BIGINT) AS s,
                     CAST(COUNT(*) FILTER (WHERE um > 0) AS BIGINT) AS n
              FROM c
            ), sel AS (
              SELECT c.* FROM c, avgc
              WHERE um * n > s
                AND c_custkey NOT IN
                    (SELECT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1999-01-01')
            )
            SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
                   CAST(SUM(um) AS BIGINT) AS totacctbal_um
            FROM sel GROUP BY c_nationkey""",
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT)))
                        AS BIGINT) AS revenue_um
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3""",
        "tpch_q8": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(COALESCE(SUM(CASE WHEN sn.n_name = 'NATION_3'
                        THEN CAST(round(l_extendedprice*100) AS BIGINT)
                           * (100 - CAST(round(l_discount*100) AS BIGINT))
                        ELSE 0 END), 0) AS BIGINT) AS num_um,
                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT)))
                        AS BIGINT) AS den_um
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1 ORDER BY 1""",
        "tpch_q10": """
            WITH rev AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(round(l_discount*100) AS BIGINT)))
                          AS BIGINT) AS revenue_um
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE o_orderdate >= TIMESTAMP '1995-10-01'
                AND o_orderdate < TIMESTAMP '1996-01-01'
                AND l_returnflag = 'R'
              GROUP BY o_custkey)
            SELECT c_custkey, c_name, n_name,
                   CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_um,
                   revenue_um
            FROM rev
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue_um DESC, c_custkey
            LIMIT 20""",
        "tpch_q15": """
            WITH rev AS (
              SELECT l_suppkey AS s_suppkey,
                     CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(round(l_discount*100) AS BIGINT)))
                          AS BIGINT) AS total_revenue_um
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY 1)
            SELECT supplier.s_suppkey, s_name, total_revenue_um
            FROM supplier JOIN rev ON supplier.s_suppkey = rev.s_suppkey
            WHERE total_revenue_um =
                  (SELECT MAX(total_revenue_um) FROM rev)
            ORDER BY supplier.s_suppkey""",
        "tpch_q17": """
            WITH fam AS (
              SELECT p_partkey FROM part
              WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
            ), st AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS s,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM lineitem JOIN fam ON p_partkey = l_partkey
              GROUP BY 1)
            SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice*100)
                                          AS BIGINT)), 0) AS BIGINT)
                     AS total_um
            FROM lineitem JOIN st ON lineitem.l_partkey = st.l_partkey
            WHERE 5 * CAST(round(l_quantity) AS BIGINT) * c < s""",
        "tpch_q19": """
            SELECT CAST(COALESCE(SUM(
                     CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))), 0)
                   AS BIGINT) AS revenue_um
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""",
        "tpch_q16": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
                     AS supplier_cnt
            FROM part JOIN lineitem ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
        "embedding_pca": f"""
            WITH v(d, val) AS (VALUES {pca_vals}),
            q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                     CAST(floor(1e6 * unnest(embedding)) AS BIGINT) AS x
              FROM embeddings
            )
            SELECT q.vec_id,
                   CAST(SUM(q.x * v.val) AS BIGINT) AS proj_um
            FROM q JOIN v USING (d) GROUP BY q.vec_id""",
        "embedding_rp": """
            WITH q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                     CAST(floor(1e6 * unnest(embedding)) AS BIGINT) AS x
              FROM embeddings
            ),
            js AS (SELECT unnest(generate_series(1, 8)) AS j),
            s AS (
              SELECT d, j,
                     CASE WHEN ('0x' || substr(md5('rp:' || d || ':' || j),
                                               1, 16))::UBIGINT % 2 = 0
                          THEN 1 ELSE -1 END AS sgn
              FROM (SELECT DISTINCT d FROM q) CROSS JOIN js
            )
            SELECT q.vec_id, CAST(s.j AS BIGINT) AS j,
                   CAST(SUM(q.x * s.sgn) AS BIGINT) AS y_um
            FROM q JOIN s USING (d) GROUP BY q.vec_id, s.j""",
        "doc_word_info": r"""
            WITH w AS (
              SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                x -> x <> '')) AS word
              FROM documents
            ),
            c AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM w GROUP BY 1, 2),
            t AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t
                  FROM c GROUP BY 1),
            terms AS (
              SELECT c.doc_id,
                     CAST(FLOOR((1000000 * c.c)
                          * ln(CAST(t.t AS DOUBLE) / c.c)) AS BIGINT)
                       AS term_um
              FROM c JOIN t USING (doc_id)
            ),
            info AS (SELECT doc_id, CAST(SUM(term_um) AS BIGINT) AS info_um
                     FROM terms GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(t.t, 0) AS BIGINT) AS n_words,
                   CAST(COALESCE(info.info_um, 0) AS BIGINT) AS info_um
            FROM documents d
            LEFT JOIN t USING (doc_id)
            LEFT JOIN info USING (doc_id)""",
        # BM25 replay: identical double expression per (term, doc) —
        # floor to micro-units BEFORE the per-doc sum, same literal
        # k1/b constants and op order as the numpy kernel
        "bm25_topk": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), d AS (
              SELECT doc_id, ws, len(ws) AS dl FROM w
            ), consts AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS dls
              FROM d
            ), q(query_id, term) AS (VALUES
              ('q_sort','fast'), ('q_sort','merge'), ('q_sort','sort'),
              ('q_scan','filter'), ('q_scan','scan'), ('q_scan','table'),
              ('q_win','agg'), ('q_win','group'), ('q_win','window')
            ), tok AS (
              SELECT doc_id, unnest(ws) AS t FROM d
            ), tf AS (
              SELECT tok.t AS term, tok.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok JOIN (SELECT DISTINCT term FROM q) qt
                ON tok.t = qt.term
              GROUP BY 1, 2
            ), dfv AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
              GROUP BY term
            ), sc AS (
              SELECT q.query_id, tf.doc_id,
                     CAST(FLOOR(1000000.0
                       * ln((n - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * (1.2 + 1.0))
                       / (tf + 1.2 * (1.0 - 0.75
                          + 0.75 * dl / (CAST(dls AS DOUBLE) / n))))
                       AS BIGINT) AS s
              FROM q JOIN tf USING (term) JOIN dfv USING (term)
                   JOIN d ON d.doc_id = tf.doc_id, consts
            ), per AS (
              SELECT query_id, doc_id, CAST(SUM(s) AS BIGINT) AS score_um
              FROM sc GROUP BY 1, 2
            )
            SELECT query_id, doc_id, score_um FROM per
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY score_um DESC, doc_id) <= 10""",
        # BPE apply replay: per DISTINCT word, the recursive CTE runs
        # each merge's leftmost replace to fixpoint in rank order —
        # the identical loop bpe_apply_ntok runs in Python
        "bpe_token_counts": rf"""
            WITH RECURSIVE
            m(mi, pat, rep) AS (VALUES {bpe_vals}),
            w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS word FROM w
            ), words AS (
              SELECT DISTINCT word FROM tok
            ), sp AS (
              SELECT word,
                     ' ' || array_to_string(string_split(word, ''), ' ')
                         || ' ' AS s
              FROM words
            ), bpe(word, s, mi) AS (
              SELECT word, s, 0 FROM sp
              UNION ALL
              SELECT b.word,
                     CASE WHEN replace(b.s, m.pat, m.rep) <> b.s
                          THEN replace(b.s, m.pat, m.rep) ELSE b.s END,
                     CASE WHEN replace(b.s, m.pat, m.rep) <> b.s
                          THEN b.mi ELSE b.mi + 1 END
              FROM bpe b JOIN m ON m.mi = b.mi
              WHERE b.mi < {bpe_n}
            ), nt AS (
              SELECT word,
                     CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS ntok
              FROM bpe WHERE mi = {bpe_n}
            ), per AS (
              SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST(SUM(nt.ntok) AS BIGINT) AS n_bpe_tokens
              FROM tok JOIN nt USING (word) GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_words, 0) AS BIGINT) AS n_words,
                   CAST(COALESCE(per.n_bpe_tokens, 0) AS BIGINT)
                     AS n_bpe_tokens
            FROM documents d LEFT JOIN per USING (doc_id)""",
        "customers_per_region": """
            SELECT r_name, COUNT(*) AS n
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "asof_click_view": """
            SELECT c.event_id, c.user_id,
                   COALESCE(v.event_id, -1) AS view_id
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (
              SELECT * FROM events WHERE event_type = 'view'
              QUALIFY row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            ) v
              ON c.user_id = v.user_id AND c.ts >= v.ts""",
        "distinct_tools_per_role": f"""
            SELECT role, CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools
            FROM read_parquet('{path}') GROUP BY role""",
        "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
        # C4 cleaning rules replayed with list lambdas
        "c4_clean_docs": rf"""
            WITH d AS (
              SELECT ('0x'||substr(md5(conv_id),1,8))::UBIGINT::BIGINT
                       * 100000 + turn_idx AS doc_id,
                text,
                (contains(lower(text), 'lorem ipsum')
                 OR contains(lower(text), 'javascript')
                 OR contains(lower(text), '{{')) AS blocked,
                string_split(text, chr(10)) AS lines
              FROM read_parquet('{path}')
            ),
            k AS (
              SELECT doc_id, blocked, lines,
                list_filter(lines, ln ->
                  regexp_matches(ln, '[.!?"]\s*$')
                  AND len(list_filter(regexp_split_to_array(ln, '\s+'),
                                      w -> w <> '')) >= 5) AS kept
              FROM d
            )
            SELECT doc_id,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   blocked,
                   CASE WHEN blocked THEN ''
                        ELSE COALESCE(array_to_string(kept, chr(10)), '')
                   END AS clean_text
            FROM k""",
        # fit-then-score: the oracle re-fits the same top-k model
        "bigram_coverage": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '') AS ws
              FROM documents
            ),
            bi AS (
              SELECT doc_id,
                unnest([ws[i] || ' ' || ws[i+1]
                        for i in generate_series(1, len(ws)-1)]) AS g
              FROM w
            ),
            model AS (
              SELECT g FROM (
                SELECT g, count(*) AS n FROM bi GROUP BY g
              ) ORDER BY n DESC, g LIMIT 500
            ),
            scored AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_bi,
                     CAST(count(*) FILTER (
                       WHERE g IN (SELECT g FROM model)) AS BIGINT) AS n_in
              FROM bi GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(s.n_bi, 0) AS n_bigrams,
                   COALESCE(s.n_in, 0) AS n_in_model
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id""",
        # sampling / splits: identical md5-threshold integer math
        "sample_docs": """
            SELECT doc_id FROM documents
            WHERE ('0x'||substr(md5('sample:'||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT
                    * 4 < 1 * 4294967296""",
        "sample_exact_k": """
            SELECT doc_id FROM documents
            ORDER BY ('0x'||substr(md5('xk:'||CAST(doc_id AS VARCHAR)),1,16))::UBIGINT,
                     doc_id
            LIMIT 100""",
        # A-Res selection key replayed with the identical IEEE op
        # sequence: u = (double(h)+1)/2^64, key = -(ln(u)/w)
        "weighted_sample_docs": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars > 0
            ORDER BY -(ln((CAST(('0x'||substr(md5('wk:'||CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                           AS DOUBLE) + 1) / 18446744073709551616.0)
                       / CAST(n_chars AS DOUBLE)),
                     doc_id
            LIMIT 100""",
        "sample_k_per_lang": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ('0x'||substr(md5('xk:'||CAST(doc_id AS VARCHAR)),1,16))::UBIGINT,
                                doc_id) AS rn
              FROM documents) WHERE rn <= 25""",
        "mix_corpora": _mix_corpora_sql(),
        "token_budget_docs": """
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS c
              FROM documents)
            WHERE c <= (SELECT (SUM(n_chars) * 2) // 5 FROM documents)""",
        "hll_distinct_convs": _hll_convs_sql(),
        "inverted_index": r"""
            WITH tok AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(
                    lower(coalesce(text, '')), '\s+'), x -> x <> '')) AS term
                FROM documents)
            ), d AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM tok GROUP BY term
              HAVING COUNT(*) BETWEEN 2 AND 400
            ), ranked AS (
              SELECT t.term, t.doc_id,
                     row_number() OVER (PARTITION BY t.term
                                        ORDER BY t.doc_id) AS rn
              FROM tok t JOIN d USING (term)
            ), posts AS (
              SELECT term,
                     string_agg(CAST(doc_id AS VARCHAR), ','
                                ORDER BY doc_id) AS postings
              FROM ranked WHERE rn <= 20 GROUP BY term
            )
            SELECT d.term, d.df, posts.postings
            FROM d JOIN posts USING (term)""",
        # fit (top-500 df vocab) + score replay; idf carried as
        # floor(1e6*ln(N/df)) — integer compare, ln bit-identical
        "tfidf_top_terms": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS term FROM w
            ), tf AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, term
            ), dfm AS (
              SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY term
              ORDER BY df DESC, term LIMIT 500
            ), scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfm.df,
                     tf.tf * CAST(FLOOR(1000000 * ln(
                       CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                       / dfm.df)) AS BIGINT) AS score
              FROM tf JOIN dfm USING (term)
            )
            SELECT doc_id, term, tf, df, score FROM scored
            QUALIFY row_number() OVER (
              PARTITION BY doc_id ORDER BY score DESC, term) = 1""",
        # Gopher rules replayed with DuckDB list lambdas; same ASCII
        # ws class, same non-overlapping '...' count, integer rules
        "gopher_quality_docs": r"""
            WITH base AS (
              SELECT doc_id, coalesce(text, '') AS text,
                list_filter(string_split_regex(coalesce(text, ''),
                  '[ \t\n\f\r]+'), x -> x <> '') AS words,
                string_split(coalesce(text, ''), chr(10)) AS lines
              FROM documents
            ), m AS (
              SELECT doc_id,
                CAST(len(words) AS BIGINT) AS n_words,
                CAST(length(regexp_replace(text, '[ \t\n\f\r]', '', 'g'))
                     AS BIGINT) AS n_word_chars,
                CAST(len(lines) AS BIGINT) AS n_lines,
                CAST(len(list_filter(words,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
                  AS n_alpha_words,
                CAST(length(text) - length(replace(text, '#', ''))
                     AS BIGINT) AS n_hash,
                CAST((length(text) - length(replace(text, '...', ''))) // 3
                     AS BIGINT) AS n_ellipsis,
                CAST(len(list_filter(lines,
                  x -> regexp_matches(x, '^[-*]'))) AS BIGINT) AS n_bullet,
                CAST(len(list_filter(lines,
                  x -> regexp_matches(x, '\.\.\.$'))) AS BIGINT) AS n_ell_end,
                CAST(list_contains(list_transform(words, x -> lower(x)), 'the') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'be') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'to') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'of') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'and') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'that') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'have') AS BIGINT)
                + CAST(list_contains(list_transform(words, x -> lower(x)), 'with') AS BIGINT)
                  AS n_stop_hits
              FROM base)
            SELECT doc_id, n_words, n_word_chars, n_lines, n_alpha_words,
                   n_stop_hits,
                   (n_words BETWEEN 20 AND 100000
                    AND n_word_chars BETWEEN 3 * n_words AND 10 * n_words
                    AND 10 * (n_hash + n_ellipsis) <= n_words
                    AND 10 * n_bullet <= 9 * n_lines
                    AND 10 * n_ell_end <= 3 * n_lines
                    AND 5 * n_alpha_words >= 4 * n_words
                    AND n_stop_hits >= 1) AS gopher_ok
            FROM m""",
        "doc_len_quantiles": " UNION ALL ".join(
            f"SELECT '{q:g}' AS q, quantile_disc(n_chars, {q!r}) AS value"
            " FROM documents"
            for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
        ),
        "lang_len_quantiles": """
            SELECT lang, quantile_disc(n_chars, 0.5) AS q0_5,
                   quantile_disc(n_chars, 0.9) AS q0_9,
                   quantile_disc(n_chars, 0.99) AS q0_99
            FROM documents GROUP BY lang""",
        # per-stratum exact cutoffs: 0.125/0.5/0.25 of 2^32
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x'||substr(md5('stratified:'||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT
                  < CASE lang WHEN 'en' THEN 536870912
                              WHEN 'zh' THEN 2147483648
                              WHEN 'es' THEN 2147483648
                              ELSE 1073741824 END""",
        "split_docs": """
            WITH h AS (
              SELECT doc_id,
                ('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT AS hv
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN hv * 5 < 4 * 4294967296 THEN 'train'
                        WHEN hv * 10 < 9 * 4294967296 THEN 'val'
                        ELSE 'test' END AS split
            FROM h""",
        # greedy packing replayed by a recursive CTE (same recurrence)
        "pack_sequences": r"""
            WITH RECURSIVE d AS (
              SELECT doc_id, doc_id % 16 AS bucket,
                len(list_filter(regexp_split_to_array(text, '\s+'),
                                w -> w <> '')) AS tok,
                row_number() OVER (PARTITION BY doc_id % 16
                                   ORDER BY doc_id) AS rn
              FROM documents
            ),
            p(bucket, rn, doc_id, tok, run, bin) AS (
              SELECT bucket, rn, doc_id, tok, tok, 0 FROM d WHERE rn = 1
              UNION ALL
              SELECT e.bucket, e.rn, e.doc_id, e.tok,
                CASE WHEN t.run + e.tok > 512 THEN e.tok
                     ELSE t.run + e.tok END,
                CASE WHEN t.run + e.tok > 512 THEN t.bin + 1 ELSE t.bin END
              FROM p t JOIN d e ON e.bucket = t.bucket AND e.rn = t.rn + 1
            )
            SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
                   CAST(bin AS BIGINT) AS bin_id,
                   CAST(tok AS BIGINT) AS n_tokens
            FROM p""",
        # same recursive packing replay, then string_agg per bin
        "packed_sequences_text": r"""
            WITH RECURSIVE d AS (
              SELECT doc_id, doc_id % 16 AS bucket, text,
                len(list_filter(regexp_split_to_array(text, '\s+'),
                                w -> w <> '')) AS tok,
                row_number() OVER (PARTITION BY doc_id % 16
                                   ORDER BY doc_id) AS rn
              FROM documents
            ),
            p(bucket, rn, doc_id, tok, run, bin) AS (
              SELECT bucket, rn, doc_id, tok, tok, 0 FROM d WHERE rn = 1
              UNION ALL
              SELECT e.bucket, e.rn, e.doc_id, e.tok,
                CASE WHEN t.run + e.tok > 512 THEN e.tok
                     ELSE t.run + e.tok END,
                CASE WHEN t.run + e.tok > 512 THEN t.bin + 1 ELSE t.bin END
              FROM p t JOIN d e ON e.bucket = t.bucket AND e.rn = t.rn + 1
            )
            SELECT p.bucket::BIGINT AS bucket, p.bin::BIGINT AS bin_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(p.tok) AS BIGINT) AS n_tokens,
                   string_agg(d.text, chr(10) ORDER BY p.doc_id) AS text
            FROM p JOIN d ON d.doc_id = p.doc_id
            GROUP BY p.bucket, p.bin""",
        "token_stats": f"""
            SELECT doc_id, length(text) AS n_chars,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   w -> w <> '')) AS n_ws_tokens,
                   length(regexp_extract_all(text, '{bpe_rx}')) AS n_bpe_tokens,
                   length(regexp_extract_all(text, '{punct}')) AS n_punct,
                   length(regexp_extract_all(lower(text), '{stop_rx}')) AS n_stopwords
            FROM documents""",
        "quality_score": f"""
            SELECT doc_id, length(text) AS n_chars,
                   length(regexp_extract_all(text, '{punct}')) AS n_punct,
                   length(regexp_extract_all(lower(text), '{stop_rx}')) AS n_stopwords,
                   CASE WHEN length(text) < 50
                          OR length(regexp_extract_all(text, '{punct}')) > length(text)*0.3
                        THEN 'low'
                        WHEN length(regexp_extract_all(lower(text), '{stop_rx}')) > 0
                        THEN 'high' ELSE 'mid' END AS quality
            FROM documents""",
        "doc_fingerprint": "SELECT doc_id, substr(md5(text),1,16) AS fingerprint FROM documents",
        "normalized_docs": r"""
            SELECT doc_id,
                   trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_text
            FROM documents""",
        "lexical_diversity": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS w
              FROM documents
            ), f AS (SELECT * FROM w WHERE length(w) >= 1),
            per AS (SELECT doc_id, w, COUNT(*) AS c FROM f GROUP BY doc_id, w)
            SELECT d.doc_id,
                   CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_words,
                   CAST(COUNT(per.w) AS BIGINT) AS n_distinct,
                   CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hapax
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            GROUP BY d.doc_id""",
        "boilerplate_clean_turns": f"""
            WITH t AS (SELECT conv_id, turn_idx, text FROM read_parquet('{path}')),
            l AS (
              SELECT conv_id, turn_idx,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS li
              FROM t
            ),
            h AS (
              SELECT *, ('0x'||substr(md5(line),1,16))::UBIGINT AS lh,
                     line <> '' AS nb
              FROM l
            ),
            bad AS (
              SELECT lh FROM h WHERE nb
              GROUP BY lh HAVING count(DISTINCT conv_id) >= 20
            ),
            m AS (SELECT h.*, (h.nb AND h.lh IN (SELECT lh FROM bad)) AS rm FROM h)
            SELECT conv_id, turn_idx,
                   coalesce(string_agg(line, chr(10) ORDER BY li)
                            FILTER (WHERE NOT rm), '') AS clean_text,
                   count(*) FILTER (WHERE rm) AS n_removed
            FROM m GROUP BY conv_id, turn_idx""",
        # global first-occurrence line dedup: same md5-64 line hash as
        # the Ray side, blanks ranked in their own (nb, lh) partition
        "line_dedup_turns": f"""
            WITH t AS (SELECT conv_id, turn_idx, coalesce(text, '') AS text
                       FROM read_parquet('{path}')),
            l AS (
              SELECT conv_id, turn_idx,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS li
              FROM t
            ),
            h AS (
              SELECT *, ('0x'||substr(md5(line),1,16))::UBIGINT AS lh,
                     line <> '' AS nb
              FROM l
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY nb, lh
                         ORDER BY conv_id, turn_idx, li) AS rn
              FROM h
            ),
            m AS (SELECT *, (NOT nb) OR rn = 1 AS keep FROM r)
            SELECT conv_id, turn_idx,
                   coalesce(string_agg(line, chr(10) ORDER BY li)
                            FILTER (WHERE keep), '') AS dedup_text,
                   count(*) FILTER (WHERE NOT keep) AS n_dropped
            FROM m GROUP BY conv_id, turn_idx""",
        # unigram LM replay: same top-5000 vocab (c desc, term asc),
        # same add-one smoothing, per-word floor(1e6*ln(denom/(c+1)))
        "unigram_logprob": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS term FROM w
            ), cnt AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY term
            ), vocab AS (
              SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 5000
            ), consts AS (
              SELECT (SELECT COALESCE(SUM(c), 0) FROM cnt)
                   + (SELECT COUNT(*) FROM vocab) + 1 AS denom
            ), nll AS (
              SELECT t.doc_id,
                     CAST(FLOOR(1000000 * ln(
                       CAST((SELECT denom FROM consts) AS DOUBLE)
                       / (COALESCE(v.c, 0) + 1))) AS BIGINT) AS wnll
              FROM tok t LEFT JOIN vocab v USING (term)
            ), per AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(SUM(wnll) AS BIGINT) AS nll_sum
              FROM nll GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(per.nll_sum, 0) AS BIGINT) AS nll_sum,
                   CAST(CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0
                        ELSE per.nll_sum // per.n_tokens END AS BIGINT)
                     AS avg_nll
            FROM documents d LEFT JOIN per USING (doc_id)""",
        "trending_terms": rf"""
            WITH t AS (SELECT ts, coalesce(text, '') AS text
                       FROM read_parquet('{path}')),
            tok AS (
              SELECT date_trunc('hour', ts) AS w_start,
                     unnest(list_filter(regexp_split_to_array(lower(text),
                            '\s+'), x -> x <> '')) AS term
              FROM t
            ), c AS (
              SELECT w_start, term, CAST(COUNT(*) AS BIGINT) AS n
              FROM tok GROUP BY 1, 2
            )
            SELECT w_start, term, n FROM c
            QUALIFY row_number() OVER (PARTITION BY w_start
                    ORDER BY n DESC, term) <= 5""",
        # centroid-outlier replay: identical integer pipeline —
        # floor(1e6·x) quantize, exact per-(label,dim) sums, DuckDB //
        # (truncating) centroid, exact integer squared distance
        "embedding_outliers": """
            WITH xm AS (
              SELECT vec_id, label,
                     generate_subscripts(embedding, 1) AS d,
                     CAST(FLOOR(1000000 * CAST(unnest(embedding)
                          AS DOUBLE)) AS BIGINT) AS um
              FROM embeddings
            ), cent AS (
              SELECT label, d,
                     CAST(SUM(um) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                       AS c
              FROM xm GROUP BY label, d
            )
            SELECT xm.vec_id, xm.label,
                   CAST(SUM((um - c) * (um - c)) AS BIGINT) AS dist2_um2
            FROM xm JOIN cent USING (label, d)
            GROUP BY xm.vec_id, xm.label""",
        # distributed-k-means replay (see _KMEANS_AF_SQL for the
        # unrolled two-iteration Lloyd CTE both entries share)
        "embedding_kmeans": _KMEANS_AF_SQL + """
            SELECT vec_id, cluster, dist2_um2 FROM af""",
        # cluster-balanced diversity sample: the SAME k-means replay,
        # then exactly 30 rows per cluster by smallest md5-64 of
        # 'xk:vec_id' (ties by vec_id) — the balanced-subset sampler
        # applied to learned clusters instead of a label column
        "cluster_balanced_sample": _KMEANS_AF_SQL + """
            SELECT vec_id, cluster, dist2_um2 FROM (
              SELECT af.*, row_number() OVER (
                       PARTITION BY cluster
                       ORDER BY ('0x'||substr(md5('xk:'||CAST(vec_id
                                 AS VARCHAR)),1,16))::UBIGINT,
                                vec_id) AS rn
              FROM af) WHERE rn <= 30""",
        # shuffle-shard replay: same 63-bit md5 hash, shard =
        # (0-based row_number in (hash, key) order × N) // n — the
        # window form of the engine's rank-select boundary assignment
        "shuffled_shards": """
            WITH h AS (
              SELECT doc_id,
                     CAST(('0x'||substr(md5('shuf:'||CAST(doc_id
                            AS VARCHAR)),1,16))::UBIGINT
                          & 9223372036854775807 AS BIGINT) AS hv
              FROM documents
            ), r AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY hv, doc_id) - 1 AS rn,
                     COUNT(*) OVER () AS n
              FROM h
            )
            SELECT doc_id, CAST((rn * 8) // n AS BIGINT) AS shard
            FROM r""",
        # TextRank replay: same tokenize → top-300 vocab (count desc,
        # term asc) → vocab-restricted adjacent-bigram edge weights →
        # three unrolled damped power iterations in the identical
        # integer micro-unit arithmetic (start = 1e9 // V, per-edge
        # (r·w) // out_w, rank' = (15·start)//100 + (85·Σ)//100,
        # dangling mass dropped)
        "textrank_keywords": r"""
            WITH wsd AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS term,
                     generate_subscripts(ws, 1) AS i
              FROM wsd
            ), cnt AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY term
            ), vocab AS (
              SELECT term FROM cnt ORDER BY c DESC, term LIMIT 300
            ), eg AS (
              SELECT a.term AS src, b.term AS dst,
                     CAST(COUNT(*) AS BIGINT) AS w
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.i = a.i + 1
              WHERE a.term IN (SELECT term FROM vocab)
                AND b.term IN (SELECT term FROM vocab)
              GROUP BY a.term, b.term
            ), ow AS (
              SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM eg GROUP BY src
            ), consts AS (
              SELECT CAST(1000000000 AS BIGINT)
                       // (SELECT COUNT(*) FROM vocab) AS start
            ), r0 AS (
              SELECT term, (SELECT start FROM consts) AS r FROM vocab
            ), c1 AS (
              SELECT eg.dst AS term,
                     CAST(SUM((r.r * eg.w) // ow.ow) AS BIGINT) AS s
              FROM eg JOIN r0 r ON r.term = eg.src
                      JOIN ow ON ow.src = eg.src
              GROUP BY eg.dst
            ), r1 AS (
              SELECT v.term,
                     (15 * (SELECT start FROM consts)) // 100
                       + (85 * COALESCE(c1.s, 0)) // 100 AS r
              FROM vocab v LEFT JOIN c1 USING (term)
            ), c2 AS (
              SELECT eg.dst AS term,
                     CAST(SUM((r.r * eg.w) // ow.ow) AS BIGINT) AS s
              FROM eg JOIN r1 r ON r.term = eg.src
                      JOIN ow ON ow.src = eg.src
              GROUP BY eg.dst
            ), r2 AS (
              SELECT v.term,
                     (15 * (SELECT start FROM consts)) // 100
                       + (85 * COALESCE(c2.s, 0)) // 100 AS r
              FROM vocab v LEFT JOIN c2 USING (term)
            ), c3 AS (
              SELECT eg.dst AS term,
                     CAST(SUM((r.r * eg.w) // ow.ow) AS BIGINT) AS s
              FROM eg JOIN r2 r ON r.term = eg.src
                      JOIN ow ON ow.src = eg.src
              GROUP BY eg.dst
            )
            SELECT v.term,
                   CAST((15 * (SELECT start FROM consts)) // 100
                     + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT)
                     AS rank_ur
            FROM vocab v LEFT JOIN c3 USING (term)""",
        # DSIR replay: same md5-64 % 1024 feature hashing (unigrams +
        # adjacent bigrams of lower(text), WITH multiplicity), same
        # add-one smoothing, lam in integer micro-nats
        "dsir_weights": r"""
            WITH w AS (
              SELECT doc_id, lang,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, lang, unnest(ws) AS t,
                     generate_subscripts(ws, 1) AS i
              FROM w
            ), feat AS (
              SELECT doc_id, lang, t AS f FROM tok
              UNION ALL
              SELECT a.doc_id, a.lang, a.t || ' ' || b.t AS f
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), hb AS (
              SELECT doc_id, lang,
                     CAST(('0x'||substr(md5(f),1,16))::UBIGINT % 1024
                          AS BIGINT) AS b
              FROM feat
            ), cnt AS (
              SELECT b,
                     CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct,
                     CAST(COUNT(*) AS BIGINT) AS cr
              FROM hb GROUP BY b
            ), tot AS (
              SELECT COALESCE(SUM(ct), 0) AS tt, COALESCE(SUM(cr), 0) AS tr
              FROM cnt
            ), lam AS (
              SELECT b, CAST(FLOOR(1000000 * ln(
                       CAST((ct + 1) * (tr + 1024) AS DOUBLE)
                       / ((cr + 1) * (tt + 1024)))) AS BIGINT) AS lam
              FROM cnt, tot
            ), per AS (
              SELECT hb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                     CAST(SUM(lam.lam) AS BIGINT) AS dsir_um
              FROM hb JOIN lam USING (b) GROUP BY hb.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_feats, 0) AS BIGINT) AS n_feats,
                   CAST(COALESCE(per.dsir_um, 0) AS BIGINT) AS dsir_um
            FROM documents d LEFT JOIN per USING (doc_id)""",
        # CCNet-bucket replay: the unigram scoring body, then the
        # tercile boundaries as integer 1-based ranks (n+2)//3 and
        # (2n+2)//3 via ORDER BY + OFFSET (ties fall to the lower
        # bucket, exactly the engine's <= comparison)
        "ccnet_ppl_buckets": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS term FROM w
            ), cnt AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY term
            ), vocab AS (
              SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 5000
            ), consts AS (
              SELECT (SELECT COALESCE(SUM(c), 0) FROM cnt)
                   + (SELECT COUNT(*) FROM vocab) + 1 AS denom
            ), nll AS (
              SELECT t.doc_id,
                     CAST(FLOOR(1000000 * ln(
                       CAST((SELECT denom FROM consts) AS DOUBLE)
                       / (COALESCE(v.c, 0) + 1))) AS BIGINT) AS wnll
              FROM tok t LEFT JOIN vocab v USING (term)
            ), per AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(SUM(wnll) AS BIGINT) AS nll_sum
              FROM nll GROUP BY doc_id
            ), scored AS (
              SELECT d.doc_id,
                     CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                     CAST(CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0
                          ELSE per.nll_sum // per.n_tokens END AS BIGINT)
                       AS avg_nll
              FROM documents d LEFT JOIN per USING (doc_id)
            ), ne AS (
              SELECT avg_nll FROM scored WHERE n_tokens > 0
            ), nn AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ne
            ), b1 AS (
              SELECT avg_nll AS v FROM ne ORDER BY avg_nll
              LIMIT 1 OFFSET GREATEST(((SELECT n FROM nn) + 2) // 3 - 1, 0)
            ), b2 AS (
              SELECT avg_nll AS v FROM ne ORDER BY avg_nll
              LIMIT 1
              OFFSET GREATEST((2 * (SELECT n FROM nn) + 2) // 3 - 1, 0)
            )
            SELECT doc_id, avg_nll,
                   CASE WHEN n_tokens = 0 THEN 'empty'
                        WHEN avg_nll <= (SELECT v FROM b1) THEN 'head'
                        WHEN avg_nll <= (SELECT v FROM b2) THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored""",
        # bigram-LM replay: same bounded vocabs (count desc, joined
        # string asc tie-break; bigrams restricted to in-vocab
        # contexts), same add-one conditional NLL in integer micro-nats
        "bigram_logprob": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS t,
                     generate_subscripts(ws, 1) AS i
              FROM w
            ), cnt AS (
              SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY t
            ), vocab AS (
              SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 5000
            ), pair AS (
              SELECT a.doc_id, a.t AS w1, a.t || ' ' || b.t AS bg
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), bcnt AS (
              SELECT bg, w1, CAST(COUNT(*) AS BIGINT) AS c12
              FROM pair GROUP BY bg, w1
            ), bvocab AS (
              SELECT bg, c12 FROM bcnt
              WHERE w1 IN (SELECT term FROM vocab)
              ORDER BY c12 DESC, bg LIMIT 20000
            ), nllp AS (
              SELECT p.doc_id,
                     CAST(FLOOR(1000000 * ln(
                       CAST(COALESCE(v.c, 0)
                            + (SELECT COUNT(*) FROM vocab) + 1 AS DOUBLE)
                       / (COALESCE(bv.c12, 0) + 1))) AS BIGINT) AS nll
              FROM pair p
              LEFT JOIN vocab v ON p.w1 = v.term
              LEFT JOIN bvocab bv ON p.bg = bv.bg
            ), per AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(nll) AS BIGINT) AS s
              FROM nllp GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(per.s, 0) AS BIGINT) AS nll2_sum,
                   CAST(CASE WHEN COALESCE(per.n_bigrams, 0) = 0 THEN 0
                        ELSE per.s // per.n_bigrams END AS BIGINT)
                     AS avg_nll2
            FROM documents d LEFT JOIN per USING (doc_id)""",
        # Naive-Bayes replay: same top-5000 vocab (cp+cn desc, term
        # asc), same add-one log-odds in integer micro-nats, same
        # doc-count prior; pred = posterior log-odds > 0
        "nb_quality_docs": r"""
            WITH d0 AS (
              SELECT doc_id,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
                     list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '\s+'),
                       x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, is_pos, unnest(ws) AS term FROM d0
            ), cnt AS (
              SELECT term,
                     CAST(SUM(is_pos) AS BIGINT) AS cp,
                     CAST(SUM(1 - is_pos) AS BIGINT) AS cn
              FROM tok GROUP BY term
            ), vocab AS (
              SELECT term, cp, cn FROM cnt
              ORDER BY cp + cn DESC, term LIMIT 5000
            ), consts AS (
              SELECT (SELECT COALESCE(SUM(cp), 0) FROM cnt)
                   + (SELECT COUNT(*) FROM vocab) + 1 AS dp,
                     (SELECT COALESCE(SUM(cn), 0) FROM cnt)
                   + (SELECT COUNT(*) FROM vocab) + 1 AS dn,
                     CAST(FLOOR(1000000 * ln(
                       CAST((SELECT COALESCE(SUM(is_pos), 0) FROM d0) + 1
                            AS DOUBLE)
                       / ((SELECT COALESCE(SUM(1 - is_pos), 0) FROM d0)
                          + 1))) AS BIGINT) AS prior
            ), wt AS (
              SELECT t.doc_id,
                     CAST(FLOOR(1000000 * ln(
                       CAST((COALESCE(v.cp, 0) + 1)
                            * (SELECT dn FROM consts) AS DOUBLE)
                       / ((COALESCE(v.cn, 0) + 1)
                          * (SELECT dp FROM consts)))) AS BIGINT) AS w_um
              FROM tok t LEFT JOIN vocab v USING (term)
            ), per AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(SUM(w_um) AS BIGINT) AS s
              FROM wt GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST((SELECT prior FROM consts) + COALESCE(per.s, 0)
                        AS BIGINT) AS nb_um,
                   CAST(CASE WHEN (SELECT prior FROM consts)
                                  + COALESCE(per.s, 0) > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS pred
            FROM documents d LEFT JOIN per USING (doc_id)""",
        # sliding-window chunking: starts 0, 48, 96, ... while < len;
        # 1-based inclusive list_slice mirrors tokens[start:start+64]
        "chunk_docs": r"""
            WITH w AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(coalesce(text, ''),
                            '\s+'), x -> x <> '') AS ws
              FROM documents
            ), n AS (
              SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0
            ), s AS (
              SELECT doc_id, ws, n, unnest(range(0, n, 48)) AS st FROM n
            )
            SELECT doc_id, CAST(st // 48 AS BIGINT) AS chunk_idx,
                   array_to_string(list_slice(ws, st + 1,
                                              LEAST(st + 64, n)), ' ')
                     AS chunk_text,
                   CAST(LEAST(st + 64, n) - st AS BIGINT) AS n_tokens
            FROM s""",
        "repetition_score": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS w
              FROM documents
            ), f AS (SELECT * FROM w WHERE length(w) >= 1),
            per AS (SELECT doc_id, w, COUNT(*) AS c FROM f GROUP BY doc_id, w)
            SELECT d.doc_id,
                   CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_words,
                   CAST(COALESCE(MAX(c), 0) AS BIGINT) AS top_word_n
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            GROUP BY d.doc_id""",
        "mask_pii_rows": f"""
            SELECT conv_id, turn_idx, {_pii_chain_sql('text')} AS masked_text
            FROM read_parquet('{path}')""",
        "top_words": r"""
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
              FROM documents
            ) WHERE length(word) >= 1
            GROUP BY word ORDER BY n DESC, word LIMIT 20""",
        "ann_brute_topk": _ANN_ORACLE,
        # IVF at full probe is provably exact → same oracle as brute
        "ann_lsh_topk": _ANN_ORACLE,
        "ann_pq_topk": _ANN_ORACLE,
        "ann_ivf_topk": _ANN_ORACLE,
        # iterative clustering → recursive-CTE transitive closure
        "embed_dup_clusters": """
            WITH RECURSIVE pairs AS (
              SELECT l.vec_id AS a, r.vec_id AS b
              FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
              WHERE list_cosine_similarity(
                      CAST(l.embedding AS DOUBLE[]),
                      CAST(r.embedding AS DOUBLE[])) >= 0.35
            ), sym AS (
              SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
            ), reach(node, lab) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            )
            SELECT CAST(node AS BIGINT) AS vec_id,
                   CAST(MIN(lab) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node""",
        # SemDeDup policy: closure over the similarity join, keep the
        # min id per component, join back to the document corpus
        "semantic_dedup_keep": """
            WITH RECURSIVE pairs AS (
              SELECT l.vec_id AS a, r.vec_id AS b
              FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
              WHERE list_cosine_similarity(
                      CAST(l.embedding AS DOUBLE[]),
                      CAST(r.embedding AS DOUBLE[])) >= 0.35
            ), sym AS (
              SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
            ), reach(node, lab) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            ), labels AS (
              SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang,
                   CAST(d.n_chars AS BIGINT) AS n_chars
            FROM documents d
            JOIN labels l ON l.node = d.doc_id AND l.node = l.cluster_id""",
        # keep-best policy: the same closure, survivor = argmax
        # (n_chars desc, doc_id asc) per component instead of min id
        "dedup_keep_best": """
            WITH RECURSIVE pairs AS (
              SELECT l.vec_id AS a, r.vec_id AS b
              FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
              WHERE list_cosine_similarity(
                      CAST(l.embedding AS DOUBLE[]),
                      CAST(r.embedding AS DOUBLE[])) >= 0.35
            ), sym AS (
              SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
            ), reach(node, lab) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            ), labels AS (
              SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node
            ), best AS (
              SELECT l.node AS doc_id
              FROM labels l JOIN documents d ON d.doc_id = l.node
              QUALIFY row_number() OVER (PARTITION BY l.cluster_id
                      ORDER BY d.n_chars DESC, d.doc_id) = 1
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang,
                   CAST(d.n_chars AS BIGINT) AS n_chars
            FROM documents d JOIN best USING (doc_id)""",
        # exact similarity join → all-pairs ground truth
        "embed_dup_pairs": """
            SELECT l.vec_id AS a, r.vec_id AS b
            FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
            WHERE list_cosine_similarity(
                    CAST(l.embedding AS DOUBLE[]),
                    CAST(r.embedding AS DOUBLE[])) >= 0.35""",
        # near-dup sketch family: the oracle REPLAYS the full pipeline
        # in SQL (md5-based token hashes + inlined minhash coefficients
        # make every step reproducible in DuckDB)
        "minhash_dedup": _minhash_dedup_sql(),
        "ngram_dup_pairs": _ngram_pairs_sql(),
        "word_freq_spectrum": r"""
            WITH tok AS (
              SELECT unnest(list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '\s+'),
                       x -> x <> '')) AS term
              FROM documents
            ), cnt AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY term
            )
            SELECT c AS freq, CAST(COUNT(*) AS BIGINT) AS n_terms
            FROM cnt GROUP BY c""",
        # cross-source matrix over the same verified pair graph
        "cross_source_dups": f"""
            SELECT least(da.source, db.source) AS source_lo,
                   greatest(da.source, db.source) AS source_hi,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM ({_ngram_pairs_sql()}) p
            JOIN documents da ON p.a = da.doc_id
            JOIN documents db ON p.b = db.doc_id
            GROUP BY 1, 2""",
        # sketch -> verify -> transitive closure (the full near-dup
        # dedup pipeline replayed, wrapped in a recursive-CTE closure)
        "ngram_dup_clusters": f"""
            WITH RECURSIVE pairs AS ({_ngram_pairs_sql()}),
            sym AS (
              SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
            ), reach(node, lab) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            )
            SELECT CAST(node AS BIGINT) AS doc_id,
                   CAST(MIN(lab) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node""",
        # exact substring-span dedup: identical window hashing + the
        # content-defined hash%4 sampling, replayed over every 10-token
        # window (DuckDB list slice l[i:j] is 1-based inclusive)
        "substring_dup_spans": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS w
              FROM documents
            ),
            starts AS (
              -- scalar generate_series returns the [1..n] list; unnest
              -- explodes it per row (the lateral-table form can't see
              -- columns in this DuckDB build)
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM toks WHERE len(w) >= 10
            ),
            wins AS (
              SELECT DISTINCT doc_id, h FROM (
                SELECT doc_id,
                       ('0x'||substr(md5(array_to_string(w[i:i+9], ' ')),
                                     1, 16))::UBIGINT AS h
                FROM starts
              ) WHERE h % 4 = 0
            ),
            shared AS (
              SELECT h FROM wins GROUP BY h
              HAVING count(DISTINCT doc_id) > 1
            )
            SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_shared
            FROM wins w JOIN shared s ON s.h = w.h
            GROUP BY w.doc_id""",
        "simhash_pairs": _simhash_pairs_sql(6),
        "lang_id": _lang_id_sql(),
        "lang_confusion": f"""
            WITH pred AS ({_lang_id_sql()})
            SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY 1, 2""",
        "curate_corpus": _curate_sql(punct, stop_rx),
        "contamination_screen": _contamination_sql(),
        "bloom_contamination": _bloom_contamination_sql(),
        "embedding_gram": """
            WITH q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                     CAST(floor(1e6 * unnest(embedding)) AS BIGINT) AS xi
              FROM embeddings
            )
            SELECT a.i AS i, b.i AS j,
                   CAST(SUM(a.xi * b.xi) AS BIGINT) AS s_um2
            FROM q a JOIN q b USING (vec_id) WHERE b.i >= a.i
            GROUP BY a.i, b.i""",
        "cms_word_counts": r"""
            WITH w AS (
              SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '\s+'),
                x -> x <> '')) AS word
              FROM documents
            ),
            cnt AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
            js AS (SELECT unnest(generate_series(1, 4)) AS j),
            grid AS (
              SELECT j,
                     ('0x'||substr(md5(CAST(j AS VARCHAR)||':'||word),1,16))::UBIGINT % 1024 AS pos,
                     SUM(c) AS n
              FROM cnt CROSS JOIN js GROUP BY j, pos
            ),
            probe AS (
              SELECT DISTINCT unnest(list_filter(
                regexp_split_to_array(lower(text), '\s+'),
                x -> x <> '')) AS word
              FROM documents WHERE doc_id < 1
            ),
            est AS (
              SELECT p.word, MIN(COALESCE(g.n, 0)) AS est_n
              FROM probe p CROSS JOIN js
              LEFT JOIN grid g ON g.j = js.j AND g.pos =
                ('0x'||substr(md5(CAST(js.j AS VARCHAR)||':'||p.word),1,16))::UBIGINT % 1024
              GROUP BY p.word
            )
            SELECT e.word, CAST(e.est_n AS BIGINT) AS est_n,
                   CAST(COALESCE(c.c, 0) AS BIGINT) AS exact_n
            FROM est e LEFT JOIN cnt c ON c.word = e.word""",
        # media plumbing: input bytes inlined, feature math replayed in SQL
        "media_features": _media_features_sql(),
        "frame_samples": _frame_samples_sql(),
        # REAL codecs: payload contents are closed-form, so the oracle
        # recomputes decoded features from the generating formula —
        # independent of any decoder implementation
        "media_real_decode": """
            WITH px AS (
              SELECT m.i AS media_id, ((m.i*31 + x.x*7 + y.y*3) % 256) AS v
              FROM (SELECT unnest(generate_series(0, 23)) AS i) m,
                   (SELECT unnest(generate_series(0, 31)) AS x) x,
                   (SELECT unnest(generate_series(0, 23)) AS y) y
              WHERE m.i % 2 = 0
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(768 AS BIGINT) AS n_px,
                   CAST(SUM(v) AS BIGINT) AS px_sum
            FROM px GROUP BY media_id""",
        # flat 8x8 blocks through baseline JPEG decode in closed form:
        # DC-only block, Q[0,0]=16 -> decoded px =
        # clamp(2*floor((v-128)/2 + 0.5) + 128); 64 px per block
        "jpeg_real_decode": """
            WITH blk AS (
              SELECT m.i AS media_id,
                     ((m.i*31 + bx.bx*7 + by.by*3) % 256) AS v
              FROM (SELECT unnest(generate_series(0, 23)) AS i) m,
                   (SELECT unnest(generate_series(0, 3)) AS bx) bx,
                   (SELECT unnest(generate_series(0, 2)) AS by) by
            ), px AS (
              SELECT media_id,
                     LEAST(255, GREATEST(0,
                       2*CAST(floor((v - 128)/2.0 + 0.5) AS BIGINT) + 128
                     )) AS pxv
              FROM blk
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(768 AS BIGINT) AS n_px,
                   CAST(SUM(64*pxv) AS BIGINT) AS px_sum
            FROM px GROUP BY media_id""",
        "video_real_decode": """
            WITH px AS (
              SELECT m.i AS media_id, t.t AS frame_ms,
                     ((m.i*11 + LEAST(7, (t.t*10)//1000)*29
                       + x.x*7 + y.y*3) % 256) AS v
              FROM (SELECT unnest(generate_series(0, 11)) AS i) m,
                   (SELECT unnest(generate_series(0, 799, 300)) AS t) t,
                   (SELECT unnest(generate_series(0, 31)) AS x) x,
                   (SELECT unnest(generate_series(0, 23)) AS y) y
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(frame_ms AS BIGINT) AS frame_ms,
                   CAST(768 AS BIGINT) AS n_px,
                   CAST(SUM(v) AS BIGINT) AS px_sum
            FROM px GROUP BY media_id, frame_ms""",
        # GIF is lossless: decoded pixels == the generating formula;
        # the gray palette triples every pixel into RGB
        "gif_real_decode": """
            WITH px AS (
              SELECT m.i AS media_id, ((m.i*31 + x.x*7 + y.y*3) % 256) AS v
              FROM (SELECT unnest(generate_series(0, 23)) AS i) m,
                   (SELECT unnest(generate_series(0, 31)) AS x) x,
                   (SELECT unnest(generate_series(0, 23)) AS y) y
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(2304 AS BIGINT) AS n_px,
                   CAST(3*SUM(v) AS BIGINT) AS px_sum
            FROM px GROUP BY media_id""",
        # G.711 decode magnitudes from the ITU-T bit-field math alone:
        # μ-law (even ids): u = 255-c; mag = (((u&15)*8+132) << ((u>>4)&7)) - 132
        # A-law (odd ids):  a = c XOR 85; seg = (a>>4)&7; m = a&15;
        #   mag = (m*16+8 if seg=0 else m*16+264) << max(seg-1, 0)
        # amp_sum = Σ mag (abs collapses the sign branch)
        "g711_audio_decode": """
            WITH s AS (
              SELECT m.i AS media_id, ((m.i*17 + t.t*13) % 256) AS c
              FROM (SELECT unnest(generate_series(0, 23)) AS i) m,
                   (SELECT unnest(generate_series(0, 483)) AS t) t
              WHERE t.t < 300 + 8*m.i
            ), d AS (
              SELECT media_id,
                CASE WHEN media_id % 2 = 0 THEN
                  ((((255 - c) & 15) * 8 + 132)
                     << (((255 - c) >> 4) & 7)) - 132
                ELSE
                  (CASE WHEN ((xor(c, 85) >> 4) & 7) = 0
                        THEN (xor(c, 85) & 15) * 16 + 8
                        ELSE (xor(c, 85) & 15) * 16 + 264 END)
                    << GREATEST(((xor(c, 85) >> 4) & 7) - 1, 0)
                END AS mag
              FROM s
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(300 + 8*media_id AS BIGINT) AS n_samples,
                   CAST(8000 AS BIGINT) AS sample_rate,
                   CAST(SUM(mag) AS BIGINT) AS amp_sum
            FROM d GROUP BY media_id""",
        # flat 8x8 blocks through MJPEG: same closed form as
        # jpeg_real_decode, per sampled frame (8 frames @ 10 fps,
        # sampled every 300 ms -> frames 0/3/6)
        "mjpeg_video_decode": """
            WITH blk AS (
              SELECT m.i AS media_id, t.t AS frame_ms,
                     ((m.i*11 + LEAST(7, (t.t*10)//1000)*29
                       + bx.bx*7 + by.by*3) % 256) AS v
              FROM (SELECT unnest(generate_series(0, 7)) AS i) m,
                   (SELECT unnest(generate_series(0, 799, 300)) AS t) t,
                   (SELECT unnest(generate_series(0, 3)) AS bx) bx,
                   (SELECT unnest(generate_series(0, 2)) AS by) by
            ), px AS (
              SELECT media_id, frame_ms,
                     LEAST(255, GREATEST(0,
                       2*CAST(floor((v - 128)/2.0 + 0.5) AS BIGINT) + 128
                     )) AS pxv
              FROM blk
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(frame_ms AS BIGINT) AS frame_ms,
                   CAST(768 AS BIGINT) AS n_px,
                   CAST(SUM(64*pxv) AS BIGINT) AS px_sum
            FROM px GROUP BY media_id, frame_ms""",
        "audio_real_decode": """
            WITH s AS (
              SELECT m.i AS media_id, abs((m.i*17 + t.t*5) % 2048 - 1024) AS a
              FROM (SELECT unnest(generate_series(0, 23)) AS i) m,
                   (SELECT unnest(generate_series(0, 767)) AS t) t
              WHERE m.i % 2 = 1 AND t.t < 400 + 16*m.i
            )
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(400 + 16*media_id AS BIGINT) AS n_samples,
                   CAST(16000 AS BIGINT) AS sample_rate,
                   CAST(SUM(a) AS BIGINT) AS amp_sum
            FROM s GROUP BY media_id""",
    }
