"""The flagship parse → enrich → route pipeline (config-driven).

Mirrors the reference's publisher processing composition
(libbeat/publisher/processing/default.go:278-416 — a deterministic
config → ordered-transform-list builder) and Filebeat's end-to-end flow
(SURVEY §3.1): read transcript Parquet partitions (the harvester pool,
filebeat/input/filestream/input.go:208-276) → fused stateless parse
chain (§2.2-2.4) → actor-pool enrichment (§2.3 lookup processors) →
routing (§2.7 selectors) → per-sink partitioned Parquet + per-sink
counts (§2.8).

Scale notes
-----------
- The whole stateless chain is FUSED into one ``map_batches`` callable:
  one task launch per block, zero-copy Arrow throughout.
- Enrichment is an actor pool with the lookup tables broadcast via
  ``ray.put`` once (not re-shipped per batch).
- No full materialization: read → map_batches → write streams with
  backpressure; the only aggregates are per-sink counts read from
  parquet footers after the write (no second pass over the data).
- ``part_id`` (FNV-1a of conv_id mod P) is the ONE partitioning key
  reused everywhere: output layout, lineage, resume, groupby stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .fixtures import fnv1a32_bucket
from .processors import build_chain, run_chain
from .routing import Router

# Default flagship config — the YAML surface a Beats user would write.
FLAGSHIP_TOKENIZER = (
    'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg="%{msg}"'
)

FLAGSHIP_CONFIG: dict = {
    "processors": [
        {"dissect": {"tokenizer": FLAGSHIP_TOKENIZER, "ignore_failure": True}},
        {
            "decode_json_fields": {
                "fields": ["text"],
                "target": "parsed",
                "add_error_key": True,
                "expected": {
                    "event": "string",
                    "tool": "string",
                    "duration_ms": "int64",
                },
            }
        },
        {"syslog": {"field": "text", "target_prefix": "syslog"}},
    ],
    "routes": [
        {"name": "errors", "when": {"regexp": {"text": "level=error|<\\d+>"}}},
        {"name": "tool_events", "when": {"equals": {"parsed.event": "tool_call"}}},
        {
            "name": "assistant",
            "when": {
                "and": [
                    {"equals": {"role": "assistant"}},
                    {"not": {"has_fields": ["error.message"]}},
                ]
            },
        },
        {"name": "default"},
    ],
}

_MULTILINE_START = r"^Exception in thread "


def classify_kind(t: pa.Table) -> pa.Table:
    """Derive ``parsed.kind`` + fallback ``error.message`` after the parse
    chain ran. Precedence: dissect > ndjson > syslog > multiline > none.
    Unparseable rows are tagged, never dropped (Beats tag-and-keep,
    SetErrorWithOption, event.go:303-316)."""
    n = t.num_rows
    # processors may have dropped/renamed `text` — classification then
    # relies on whatever parse outputs still exist
    if "text" in t.column_names:
        text = pc.fill_null(t["text"].combine_chunks(), "")
    else:
        text = pa.nulls(n, pa.string()).fill_null("")
    dissect_ok = (
        pc.is_valid(t["dissect.level"].combine_chunks())
        if "dissect.level" in t.column_names
        else pa.array([False] * n, pa.bool_())
    )
    json_ok = (
        pc.is_valid(t["parsed.event"].combine_chunks())
        if "parsed.event" in t.column_names
        else pa.array([False] * n, pa.bool_())
    )
    syslog_ok = (
        pc.fill_null(t["syslog.ok"].combine_chunks(), False)
        if "syslog.ok" in t.column_names
        else pa.array([False] * n, pa.bool_())
    )
    multi_ok = pc.match_substring_regex(text, _MULTILINE_START)
    kind = pa.nulls(n, pa.string())
    for mask, name in (
        (dissect_ok, "dissect"),
        (json_ok, "ndjson"),
        (syslog_ok, "syslog"),
        (multi_ok, "multiline"),
    ):
        kind = pc.if_else(pc.and_(pc.is_null(kind), pc.fill_null(mask, False)),
                          pa.scalar(name), kind)
    none_mask = pc.is_null(kind)
    kind = pc.fill_null(kind, "none")
    if "parsed.kind" in t.column_names:
        t = t.set_column(t.column_names.index("parsed.kind"), "parsed.kind", kind)
    else:
        t = t.append_column("parsed.kind", kind)
    # fallback error for rows no parser claimed (decode_json already set
    # its own message for truncated JSON; set_error keeps the first one)
    from .processors.base import set_error

    return set_error(t, none_mask, "no parser matched")


def add_part_id(t: pa.Table, num_parts: int) -> pa.Table:
    """Stable partition key: FNV-1a(conv_id) % P — matches the corpus
    file layout so lineage/resume can skip whole input files."""
    conv = t["conv_id"].combine_chunks()
    # vectorized FNV over the utf8 buffer — bit-identical to the old
    # per-unique fnv1a32(u) loop, so lineage/resume part keys are stable
    col = pc.cast(fnv1a32_bucket(conv, num_parts), pa.int32())
    if "part_id" in t.column_names:
        return t.set_column(t.column_names.index("part_id"), "part_id", col)
    return t.append_column("part_id", col)


class ParseStage:
    """Fused stateless chain for ``map_batches`` (tasks): processors +
    kind classification. Compiled once per worker on deserialize."""

    def __init__(self, config: dict | None = None):
        self.config = config or FLAGSHIP_CONFIG
        self._chain = None

    def _ensure(self):
        if self._chain is None:
            self._chain = build_chain(self.config.get("processors", []))
        return self._chain

    def __call__(self, t: pa.Table) -> pa.Table:
        input_cols = list(t.column_names)
        t = run_chain(t, self._ensure())
        t = classify_kind(t)
        # canonical column order: processors may add columns in
        # data-dependent order (e.g. error.message only when a batch has
        # bad rows) — every block must present an identical schema.
        # Processors may also DROP/RENAME input columns, so keep only
        # the survivors of the original order.
        surviving = [c for c in input_cols if c in t.column_names]
        derived = sorted(c for c in t.column_names if c not in input_cols)
        return t.select(surviving + derived)


class RouteStage:
    """Sink assignment + partition key (stateless tasks)."""

    def __init__(self, config: dict | None = None, num_parts: int = 8):
        self.config = config or FLAGSHIP_CONFIG
        self.num_parts = num_parts
        self._router = None

    def _ensure(self) -> Router:
        if self._router is None:
            self._router = Router(self.config.get("routes", []))
        return self._router

    def __call__(self, t: pa.Table) -> pa.Table:
        t = self._ensure()(t)
        return add_part_id(t, self.num_parts)


# Dataset-level stages reachable from the YAML config (`stages:`) —
# keyed/stateful ops a per-batch processor cannot express (they need a
# co-locating shuffle). Beats configures these as processors in the
# chain (rate_limit, dedup-by-id); the batch engine applies them after
# parse+enrich, before routing. Each entry: cfg dict → (ds → ds).
def rate_limit_stage_kwargs(cfg: dict) -> dict:
    """The k-per-window rate-limit parameters a stage spec carries —
    shared by the in-pipeline stage and the streaming runner's state
    carry (boundary-window admitted counts)."""
    return {
        "k": int(cfg.get("k", 3)),
        "window_s": int(cfg.get("window_s", 60)),
        "key_col": cfg.get("key", "conv_id"),
        "order_col": cfg.get("order", "turn_idx"),
        "ts_col": cfg.get("ts_field", "ts"),
        "buckets": int(cfg.get("buckets", 32)),
    }


def _stage_rate_limit(ds, cfg: dict, initial_state=None):
    from .dataops.flows import rate_limit

    return rate_limit(
        ds, initial_state=initial_state, **rate_limit_stage_kwargs(cfg)
    )


def token_bucket_stage_kwargs(cfg: dict) -> dict:
    """The token-bucket parameters a stage spec carries — shared by the
    in-pipeline stage and the streaming runner's state carry."""
    return {
        "key": cfg.get("key", "conv_id"),
        "limit_n": int(cfg.get("limit_n", 1)),
        "per_s": int(cfg.get("per_s", 1)),
        "burst": int(cfg["burst"]) if "burst" in cfg else None,
        "ts_col": cfg.get("ts_field", "ts"),
        "order_col": cfg.get("order", "turn_idx"),
        # shuffle-partition knob: the sort shuffle behind map_buckets
        # costs ∝ blocks × buckets, so window-sized micro-batches want
        # far fewer than the batch default
        "buckets": int(cfg.get("buckets", 32)),
    }


def _stage_token_bucket(ds, cfg: dict, initial_state=None):
    from .dataops.flows import token_bucket_limit

    return token_bucket_limit(
        ds, initial_state=initial_state, **token_bucket_stage_kwargs(cfg)
    )


def dedup_stage_kwargs(cfg: dict) -> dict:
    """The dedup parameters a stage spec carries — shared by the
    in-pipeline stage and the streaming runner's state carry.
    ``ttl_s`` (optional) bounds the carried seen-id state the way the
    reference's cache TTL does; without it the state is the reference's
    ES-side create-dedup (grows with distinct ids — the ES index holds
    it there)."""
    return {
        "id_col": cfg.get("field", "meta.doc_id"),
        "ts_col": cfg.get("ts_field", "ts"),
        "buckets": int(cfg.get("buckets", 32)),
    }


def _stage_dedup(ds, cfg: dict, initial_state=None):
    from .sinks import dedup_by_doc_id

    return dedup_by_doc_id(ds, seen_state=initial_state,
                           **dedup_stage_kwargs(cfg))


STAGE_REGISTRY = {
    "rate_limit": _stage_rate_limit,
    "token_bucket": _stage_token_bucket,
    "dedup": _stage_dedup,
}
# stages whose per-key/per-id state carries across streaming windows
# (the others are window-local; SURVEY §2.6 / stream.py docstring)
STATEFUL_STAGES = ("token_bucket", "dedup", "rate_limit")


def apply_stages(ds, stages: list[dict], stage_state: dict | None = None):
    """Apply configured dataset-level stages in order. Unknown stage
    names fail EAGERLY on the driver (checks.go behaviour).
    ``stage_state``: optional {stage_index: state DataFrame} carried in
    from a previous event-time segment (streaming continuity)."""
    stage_state = stage_state or {}
    for i, spec in enumerate(stages):
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(
                f"stage spec must be a single-key mapping like "
                f"'- rate_limit: {{k: 3}}', got: {spec!r}"
            )
        (name, cfg), = spec.items()
        if name not in STAGE_REGISTRY:
            raise ValueError(
                f"unknown stage {name!r}; available: {sorted(STAGE_REGISTRY)}"
            )
        if i in stage_state and name in STATEFUL_STAGES:
            ds = STAGE_REGISTRY[name](ds, cfg or {},
                                      initial_state=stage_state[i])
        else:
            ds = STAGE_REGISTRY[name](ds, cfg or {})
    return ds


def build_dataset(ds, config: dict | None = None, num_parts: int = 8,
                  enrich: bool = True, enrich_concurrency=(1, 8),
                  enrich_mode: str = "task", stage_state: dict | None = None,
                  pre_staged: bool = False, skip_stages: bool = False):
    """Compose the lazy flagship pipeline over a ``ray.data.Dataset``.

    ``enrich_mode="task"`` (default): lookup enrich as a plain fused
    task stage — the small lookup tables load once per worker process
    (module cache), and read→parse→enrich→route→write fuses into ONE
    operator with zero intermediate object-store hops.
    ``enrich_mode="actor"``: the actor-pool form (setup in __init__) —
    the right shape when per-worker setup is heavy (models, dns caches);
    costs an operator boundary.
    Batches are whole blocks (``batch_size=None``): every kernel here is
    vectorized, so bigger batches amortize per-call overhead.

    ``pre_staged=True``: ``ds`` is ALREADY the parse+enrich output
    (``build_pre_stage``) — used by the streaming runner, which
    materializes the pre-stage once per window so the routed output and
    the carried-state replay share a single parse execution."""
    if not pre_staged:
        ds = build_pre_stage(ds, config, enrich=enrich,
                             enrich_concurrency=enrich_concurrency,
                             enrich_mode=enrich_mode)
    RouteStage(config, num_parts)._ensure()  # eager route validation
    # skip_stages: the caller (streaming runner) already applied the
    # stage chain — in its single rows+state pass — and ds is the
    # post-stage row set; only routing + partitioning remain
    stages = [] if skip_stages else (config or {}).get("stages", [])
    if stages:
        ds = apply_stages(ds, stages, stage_state=stage_state)
    ds = ds.map_batches(
        RouteStage(config, num_parts), batch_format="pyarrow", batch_size=None
    )
    return ds


def build_pre_stage(ds, config: dict | None = None, enrich: bool = True,
                    enrich_concurrency=(1, 8), enrich_mode: str = "task"):
    """The parse+enrich composition BEFORE stages/routing — exposed so
    the streaming runner's carried-state replay sees exactly the same
    rows (including any the processor chain dropped) as the in-pipeline
    stage does."""
    from .enrich import LookupEnricher, broadcast_lookups, enrich_batch

    # validate the config EAGERLY on the driver (checks.go behaviour):
    # a typo'd processor key must fail here, not as a RayTaskError deep
    # inside a worker. Workers still compile their own chain instances.
    ParseStage(config)._ensure()

    ds = ds.map_batches(ParseStage(config), batch_format="pyarrow", batch_size=None)
    if enrich and enrich_mode == "task":
        ds = ds.map_batches(enrich_batch, batch_format="pyarrow", batch_size=None)
    elif enrich:
        ds = ds.map_batches(
            LookupEnricher,
            fn_constructor_kwargs=broadcast_lookups(),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=enrich_concurrency,
        )
    return ds
