"""Metadata / routing-key processors: constant enrichment structs and
event-format-string computed columns.

Models add_host_metadata / add_observer_metadata / add_agent_metadata /
add_locale (constant per-worker structs, libbeat/processors/
add_host_metadata/), add_data_stream (add_data_stream/:68) and
add_formatted_index (actions/add_formatted_index.go:61) with the
reference's event format string mini-language ``%{[field.path]}`` +
``%{+yyyy.MM.dd}`` date math (common/fmtstr/formatevents.go:35-44).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .base import _named, get_col, register, set_col

_FMT_TOKEN = re.compile(r"%\{([^}]+)\}")

# Joda-style date tokens → strftime (fmtstr timestamp formats)
_DATE_MAP = [
    ("yyyy", "%Y"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("mm", "%M"),
    ("ss", "%S"),
]


def compile_format_string(fmt: str, ts_field: str = "ts"):
    """Compile ``"x-%{[field]}-%{+yyyy.MM.dd}"`` into table → string array.

    Tokens: ``%{[a.b]}`` field ref (with ``%{[field]:default}`` fallback),
    ``%{+<datefmt>}`` formats the event timestamp."""
    parts: list[tuple[str, str, str | None]] = []  # (kind, payload, default)
    pos = 0
    for m in _FMT_TOKEN.finditer(fmt):
        if m.start() > pos:
            parts.append(("lit", fmt[pos : m.start()], None))
        token = m.group(1)
        if token.startswith("+"):
            sfmt = token[1:]
            for joda, strf in _DATE_MAP:
                sfmt = sfmt.replace(joda, strf)
            parts.append(("date", sfmt, None))
        else:
            default = None
            if ":" in token:
                token, default = token.split(":", 1)
            field = token.strip("[]").replace("][", ".")
            parts.append(("field", field, default))
        pos = m.end()
    if pos < len(fmt):
        parts.append(("lit", fmt[pos:], None))

    def render(t: pa.Table) -> pa.Array:
        n = t.num_rows
        arrays = []
        for kind, payload, default in parts:
            if kind == "lit":
                arrays.append(pa.nulls(n, pa.string()).fill_null(payload))
            elif kind == "date":
                ts = get_col(t, ts_field)
                if ts is None:
                    arrays.append(pa.nulls(n, pa.string()).fill_null(""))
                else:
                    # a NULL ts value must not null the whole rendered
                    # string (binary_join propagates null)
                    arrays.append(pc.fill_null(
                        pc.strftime(ts.combine_chunks(), format=payload), ""
                    ))
            else:
                col = get_col(t, payload)
                if col is None:
                    arrays.append(
                        pa.nulls(n, pa.string()).fill_null(default or "")
                    )
                else:
                    col = pc.cast(col.combine_chunks(), pa.string())
                    # a null VALUE resolves like a missing field: the
                    # token default, else '' — never a null that nulls
                    # the entire rendered index/path for the row
                    col = pc.fill_null(col, default or "")
                    arrays.append(col)
        if len(arrays) == 1:
            return arrays[0]
        return pc.binary_join_element_wise(*arrays, "")

    return render


@register("add_formatted_index")
def add_formatted_index(cfg: dict):
    """Compute the sink-path / index column from a format string
    (actions/add_formatted_index.go:61 → @metadata.raw_index)."""
    fmt = cfg["index"]
    target = cfg.get("target", "meta.raw_index")
    render = compile_format_string(fmt)

    @_named("add_formatted_index")
    def run(t: pa.Table) -> pa.Table:
        return set_col(t, target, render(t))

    return run


@register("add_host_metadata")
def add_host_metadata(cfg: dict):
    """Attach a constant host.* snapshot (add_host_metadata/:119).
    Deterministic in tests: values come from config (``host``), not the
    live machine; the per-worker-snapshot behaviour is modeled by the
    enrichment actor loading once in __init__."""
    host = cfg.get(
        "host", {"name": "worker", "os.family": "linux", "architecture": "x86_64"}
    )

    @_named("add_host_metadata")
    def run(t: pa.Table) -> pa.Table:
        for k, v in host.items():
            t = set_col(
                t, f"host.{k}", pa.nulls(t.num_rows, pa.string()).fill_null(str(v))
            )
        return t

    return run


def _const_struct_processor(reg_name: str, prefix: str, defaults: dict):
    """Factory for the constant-struct metadata family
    (add_observer_metadata/:82, addagentmetadata/, add_cloud_metadata/:123
    — each attaches a per-worker snapshot under its own prefix; values
    come from config for determinism, probing replaced by env lookup)."""

    @register(reg_name)
    def factory(cfg: dict):
        fields = {**defaults, **cfg.get("fields", {})}

        @_named(reg_name)
        def run(t: pa.Table) -> pa.Table:
            for k, v in fields.items():
                t = set_col(
                    t,
                    f"{prefix}.{k}",
                    pa.nulls(t.num_rows, pa.string()).fill_null(str(v)),
                )
            return t

        return run

    return factory


_const_struct_processor(
    "add_observer_metadata", "observer", {"type": "engine", "vendor": "beats_ray"}
)
_const_struct_processor(
    "add_agent_metadata", "agent", {"type": "beats_ray", "version": "0.1.0"}
)
_const_struct_processor(
    "add_cloud_metadata", "cloud", {"provider": "none", "region": "local"}
)


@register("add_locale")
def add_locale(cfg: dict):
    """event.timezone constant (add_locale/add_locale.go:88) — pinned to
    UTC offset for determinism."""
    tz = cfg.get("timezone", "+00:00")

    @_named("add_locale")
    def run(t: pa.Table) -> pa.Table:
        return set_col(
            t, "event.timezone", pa.nulls(t.num_rows, pa.string()).fill_null(tz)
        )

    return run


@register("add_data_stream")
def add_data_stream(cfg: dict):
    """data_stream.{type,dataset,namespace} + routing index name
    (add_data_stream/:68)."""
    ds_type = cfg.get("type", "logs")
    dataset = cfg.get("dataset", "generic")
    namespace = cfg.get("namespace", "default")

    @_named("add_data_stream")
    def run(t: pa.Table) -> pa.Table:
        n = t.num_rows
        for k, v in (
            ("data_stream.type", ds_type),
            ("data_stream.dataset", dataset),
            ("data_stream.namespace", namespace),
            ("meta.index", f"{ds_type}-{dataset}-{namespace}"),
        ):
            t = set_col(t, k, pa.nulls(n, pa.string()).fill_null(v))
        return t

    return run


def _keyed_lookup_processor(reg_name: str, default_key_field: str,
                            default_prefix: str, value_fields: tuple[str, ...]):
    """Factory for the watcher-index enrichment family
    (add_docker_metadata/:150, add_kubernetes_metadata/:335,
    add_process_metadata/:207): a keyed table — kept fresh by a watcher
    in the reference, supplied via config/snapshot here — probed per
    event. Vectorized probe via index_in/take; the table rides the task
    closure (broadcast once per worker)."""

    @register(reg_name)
    def factory(cfg: dict):
        key_field = cfg.get("match_field", default_key_field)
        prefix = cfg.get("target_prefix", default_prefix)
        index: dict[str, dict] = cfg.get("index", {})
        keys = pa.array([str(k) for k in index])
        columns = {
            vf: pa.array(
                [str(index[k].get(vf, "")) or None for k in index], pa.string()
            )
            for vf in value_fields
        }

        @_named(reg_name)
        def run(t: pa.Table) -> pa.Table:
            col = get_col(t, key_field)
            if col is None or len(keys) == 0:
                return t
            idx = pc.index_in(
                pc.cast(col.combine_chunks(), pa.string()), value_set=keys
            )
            for vf, vals in columns.items():
                name = f"{prefix}.{vf}"
                looked = pc.take(vals, idx)
                existing = get_col(t, name)
                if existing is not None:
                    # reference watchers only ADD fields on a lookup
                    # match — rows whose key misses the table keep any
                    # value they already carried instead of being
                    # nulled by the wholesale column replace
                    looked = pc.if_else(
                        pc.is_valid(looked), looked,
                        pc.cast(existing.combine_chunks(), looked.type,
                                safe=False),
                    )
                t = set_col(t, name, looked)
            return t

        return run

    return factory


_keyed_lookup_processor(
    "add_docker_metadata", "container.id", "container",
    ("name", "image", "labels"),
)
_keyed_lookup_processor(
    "add_kubernetes_metadata", "container.id", "kubernetes",
    ("pod", "namespace", "node", "labels"),
)
_keyed_lookup_processor(
    "add_process_metadata", "process.pid", "process",
    ("name", "exe", "owner"),
)


@register("registered_domain")
def registered_domain(cfg: dict):
    """eTLD+1 extraction (registered_domain/:76). Without the full public
    suffix list (no network), uses a builtin multi-label suffix set +
    last-two-labels fallback — the lookup-table-in-worker pattern."""
    field = cfg.get("field", "domain")
    target = cfg.get("target_field", "registered_domain")
    suffixes2 = {"co.uk", "com.au", "co.jp", "com.br", "gov.uk", "ac.uk"}

    @_named("registered_domain")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        out = []
        for v in col.to_pylist():
            if not v:
                out.append(None)
                continue
            labels = v.lower().rstrip(".").split(".")
            if len(labels) >= 3 and ".".join(labels[-2:]) in suffixes2:
                out.append(".".join(labels[-3:]))
            elif len(labels) >= 2:
                out.append(".".join(labels[-2:]))
            else:
                out.append(v)
        return set_col(t, target, pa.array(out, pa.string()))

    return run
