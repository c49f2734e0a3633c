"""Remaining processor classes: XML decode, array extraction, network
processors (community_id, add_network_direction), generic translate
lookups, and the Python-UDF ``script`` processor (the engine's
user-extension surface, replacing the reference's JavaScript VM,
libbeat/processors/script/javascript/).
"""

from __future__ import annotations

import hashlib
import ipaddress
import socket
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import _named, get_col, register, set_col, set_error


def _xml_to_dict(elem) -> dict:
    node: dict = {}
    if elem.attrib:
        node.update({f"@{k}": v for k, v in elem.attrib.items()})
    children = list(elem)
    if children:
        for c in children:
            val = _xml_to_dict(c)
            if c.tag in node:
                prev = node[c.tag]
                node[c.tag] = prev + [val] if isinstance(prev, list) else [prev, val]
            else:
                node[c.tag] = val
    text = (elem.text or "").strip()
    if text and not children and not elem.attrib:
        return text  # type: ignore[return-value]
    if text:
        node["#text"] = text
    return node


@register("decode_xml")
def decode_xml(cfg: dict):
    """XML → JSON-string column (decode_xml/decode_xml.go:88). The
    parsed tree is stored as a canonical JSON string (schema-first:
    open-ended trees don't get Arrow columns)."""
    import json

    field = cfg.get("field", "message")
    target = cfg.get("target_field", "xml")

    @_named("decode_xml")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        out, bad = [], np.zeros(t.num_rows, dtype=bool)
        for i, v in enumerate(col.to_pylist()):
            if v is None:
                out.append(None)
                continue
            try:
                root = ET.fromstring(v)  # parse ONCE (dominant cost)
                out.append(
                    json.dumps(
                        {root.tag: _xml_to_dict(root)}, sort_keys=True
                    )
                )
            except ET.ParseError:
                out.append(None)
                bad[i] = True
        t = set_col(t, target, pa.array(out, pa.string()))
        if bad.any():
            t = set_error(t, pa.array(bad), "failed to decode xml")
        return t

    return run


_WINEVT_NS_RE = None  # compiled lazily (module import stays cheap)

_KEYWORD_AUDIT_FAILURE = 0x10000000000000
_KEYWORD_AUDIT_SUCCESS = 0x20000000000000


def _winevt_tag(el) -> str:
    global _WINEVT_NS_RE
    if _WINEVT_NS_RE is None:
        import re as _re

        _WINEVT_NS_RE = _re.compile(r"\{[^}]*\}")
    return _WINEVT_NS_RE.sub("", el.tag)


def _win_opt(m: dict, key: str, val) -> None:
    """AddOptional (winevent/maputil.go): skip zero values."""
    if val in (None, "", 0, []):
        return
    m[key] = val


def decode_winevent(xml_str: str) -> tuple[dict, dict]:
    """Windows Event Log XML → (winlog map, ecs map), mirroring
    winevent.Event.Fields (winlogbeat/sys/winevent/event.go:91-152) and
    the processor's ECS projection
    (decode_xml_wineventlog/processor.go:139-157)."""
    root = ET.fromstring(xml_str)
    parts = {_winevt_tag(c): c for c in root}
    sys_el = parts.get("System")
    rend = parts.get("RenderingInfo")
    sysmap = {_winevt_tag(c): c for c in sys_el} if sys_el is not None else {}
    rmap = {_winevt_tag(c): c for c in rend} if rend is not None else {}

    def txt(el) -> str:
        return (el.text or "") if el is not None else ""

    win: dict = {}
    provider = sysmap.get("Provider")
    _win_opt(win, "channel", txt(sysmap.get("Channel")))
    _win_opt(win, "event_id", txt(sysmap.get("EventID")).strip())
    if provider is not None:
        _win_opt(win, "provider_name", provider.get("Name", ""))
        _win_opt(win, "provider_guid", provider.get("Guid", ""))
    rec = txt(sysmap.get("EventRecordID")).strip()
    _win_opt(win, "record_id", int(rec) if rec.isdigit() else 0)
    _win_opt(win, "task", txt(rmap.get("Task")))
    _win_opt(win, "computer_name", txt(sysmap.get("Computer")))
    kw_el = rmap.get("Keywords")
    if kw_el is not None:
        _win_opt(win, "keywords", [txt(k) for k in kw_el])
    _win_opt(win, "opcode", txt(rmap.get("Opcode")))
    ver = txt(sysmap.get("Version")).strip()
    _win_opt(win, "version", int(ver) if ver.isdigit() else 0)
    tc = sysmap.get("TimeCreated")
    if tc is not None:
        _win_opt(win, "time_created", tc.get("SystemTime", ""))
    kraw = txt(sysmap.get("Keywords")).strip()
    try:
        kbits = int(kraw, 16) if kraw else 0
    except ValueError:
        kbits = 0
    if kbits & _KEYWORD_AUDIT_FAILURE:
        win["outcome"] = "failure"
    elif kbits & _KEYWORD_AUDIT_SUCCESS:
        win["outcome"] = "success"
    _win_opt(win, "level", txt(rmap.get("Level")).lower())
    # RemoveWindowsLineEndings (winlogbeat/sys/strings.go:43-46)
    msg = txt(rmap.get("Message")).replace("\r\n", "\n").rstrip("\n")
    _win_opt(win, "message", msg)
    sec = sysmap.get("Security")
    if sec is not None and sec.get("UserID"):
        win["user"] = {"identifier": sec.get("UserID")}
    evd = parts.get("EventData")
    if evd is not None:
        pairs = {}
        for i, d in enumerate(evd):
            pairs[d.get("Name") or f"param{i + 1}"] = txt(d)
        _win_opt(win, "event_data", pairs)
    ud = parts.get("UserData")
    if ud is not None and len(ud):
        inner = ud[0]
        pairs = {_winevt_tag(c): txt(c) for c in inner}
        pairs["xml_name"] = _winevt_tag(inner)
        win["user_data"] = pairs
    corr = sysmap.get("Correlation")
    if corr is not None:
        _win_opt(win, "activity_id", corr.get("ActivityID", ""))
        _win_opt(win, "related_activity_id", corr.get("RelatedActivityID", ""))
    exc = sysmap.get("Execution")
    if exc is not None:
        for attr, key in (
            ("ProcessID", "process.pid"),
            ("ThreadID", "process.thread.id"),
            ("ProcessorID", "processor_id"),
            ("SessionID", "session_id"),
            ("KernelTime", "kernel_time"),
            ("UserTime", "user_time"),
            ("ProcessorTime", "processor_time"),
        ):
            v = exc.get(attr, "")
            _win_opt(win, key, int(v) if v.isdigit() else 0)

    ecs: dict = {
        "event.code": win.get("event_id"),
        "event.kind": "event",
        "event.provider": win.get("provider_name"),
    }
    _win_opt(ecs, "event.action", win.get("task"))
    _win_opt(ecs, "host.name", win.get("computer_name"))
    _win_opt(ecs, "event.outcome", win.get("outcome"))
    _win_opt(ecs, "log.level", win.get("level"))
    _win_opt(ecs, "message", win.get("message"))
    return win, ecs


@register("decode_xml_wineventlog")
def decode_xml_wineventlog(cfg: dict):
    """Windows Event Log XML → winlog + ECS fields — the full field
    mapping of decode_xml_wineventlog (processor.go fields(), winevent
    Fields()), not a generic tree decode. The winlog map lands as a
    canonical JSON string column (open schema); the fixed ECS
    projection lands as real columns."""
    import json

    field = cfg.get("field", "message")
    target = cfg.get("target_field", "winlog")
    map_ecs = cfg.get("map_ecs_fields", True)
    ecs_cols = ("event.code", "event.kind", "event.provider", "event.action",
                "host.name", "event.outcome", "log.level", "message")

    @_named("decode_xml_wineventlog")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        n = t.num_rows
        win_out: list[str | None] = []
        ecs_out: dict[str, list] = {c: [] for c in ecs_cols}
        bad = np.zeros(n, dtype=bool)
        for i, v in enumerate(col.to_pylist()):
            if v is None:
                win_out.append(None)
                for c in ecs_cols:
                    ecs_out[c].append(None)
                continue
            try:
                win, ecs = decode_winevent(v)
            except ET.ParseError:
                win_out.append(None)
                for c in ecs_cols:
                    ecs_out[c].append(None)
                bad[i] = True
                continue
            win_out.append(json.dumps(win, sort_keys=True))
            for c in ecs_cols:
                ecs_out[c].append(ecs.get(c))
        t = set_col(t, target, pa.array(win_out, pa.string()))
        if map_ecs:
            for c in ecs_cols:
                new = pa.array(ecs_out[c], pa.string())
                old = get_col(t, c)
                if old is not None:
                    # AddOptional semantics (winevent ECS mapping):
                    # absent values never overwrite an existing column
                    # — notably 'message', where a wholesale set_col
                    # DESTROYED the original text for parse-failed rows
                    # and events without RenderingInfo/Message
                    new = pc.if_else(
                        pc.is_valid(new), new,
                        pc.cast(old.combine_chunks(), pa.string(),
                                safe=False),
                    )
                t = set_col(t, c, new)
        if bad.any():
            t = set_error(t, pa.array(bad), "failed to decode xml")
        return t

    return run


@register("extract_array")
def extract_array(cfg: dict):
    """Pick array elements into named fields
    (extract_array/extract_array.go:117). Config:
    {field, mappings: {target_name: index}}."""
    field = cfg["field"]
    mappings: dict[str, int] = cfg.get("mappings", {})

    @_named("extract_array")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        col = col.combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0)
        for target, idx in mappings.items():
            # pc.list_element RAISES on any out-of-bounds row (killing
            # the whole batch for one short array — Beats fails
            # per-event); mask short rows to null instead. Negative
            # indices resolve from the end like the reference's Go
            # slice-indexing adaptation.
            import numpy as np

            if idx >= 0:
                in_bounds = pc.greater(lens, idx)
            else:
                in_bounds = pc.greater_equal(lens, -idx)
            # extract via flatten + masked take on validated offsets
            lens_np = lens.to_numpy(zero_copy_only=False).astype("int64")
            ok_np = in_bounds.to_numpy(zero_copy_only=False) & (
                pc.is_valid(col).to_numpy(zero_copy_only=False)
            )
            starts = np.cumsum(lens_np) - lens_np
            pos = (starts + idx) if idx >= 0 else (starts + lens_np + idx)
            flat = pc.list_flatten(col)
            take_idx = pa.array(pos, pa.int64(), mask=~ok_np)
            t = set_col(t, target, pc.take(flat, take_idx))
        return t

    return run


def _community_id_v1(proto: int, sip: str, dip: str, sport: int, dport: int,
                     seed: int = 0) -> str | None:
    """Community ID v1 flow hash (public spec, corelight/community-id):
    seed + ordered 5-tuple → sha1 → base64 with '1:' prefix. Mirrors
    communityid/communityid.go:90."""
    try:
        sb = ipaddress.ip_address(sip).packed
        db = ipaddress.ip_address(dip).packed
    except ValueError:
        return None
    if (sb, sport) > (db, dport):
        sb, db = db, sb
        sport, dport = dport, sport
    data = (
        struct.pack("!H", seed)
        + sb
        + db
        + struct.pack("!BBHH", proto, 0, sport, dport)
    )
    import base64

    return "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()


@register("community_id")
def community_id(cfg: dict):
    """Network 5-tuple flow hash (communityid/communityid.go:90).
    Fields configurable; defaults to ECS-ish names."""
    f_sip = cfg.get("source_ip", "source.ip")
    f_dip = cfg.get("destination_ip", "destination.ip")
    f_sp = cfg.get("source_port", "source.port")
    f_dp = cfg.get("destination_port", "destination.port")
    f_proto = cfg.get("transport", "network.transport")
    target = cfg.get("target", "network.community_id")
    seed = cfg.get("seed", 0)
    proto_num = {"tcp": 6, "udp": 17, "icmp": 1, "sctp": 132}

    @_named("community_id")
    def run(t: pa.Table) -> pa.Table:
        cols = {n: get_col(t, n) for n in (f_sip, f_dip, f_sp, f_dp, f_proto)}
        if any(c is None for c in cols.values()):
            return t
        vals = {n: c.to_pylist() for n, c in cols.items()}
        out = []
        for i in range(t.num_rows):
            proto = vals[f_proto][i]
            pn = proto_num.get(str(proto).lower(), 0) if proto else 0
            sip, dip = vals[f_sip][i], vals[f_dip][i]
            sp, dp = vals[f_sp][i], vals[f_dp][i]
            if None in (sip, dip, sp, dp):
                out.append(None)
                continue
            try:
                spi, dpi = int(sp), int(dp)
            except (ValueError, TypeError):
                out.append(None)  # malformed port fails per-ROW
                continue
            if not (0 <= spi <= 0xFFFF and 0 <= dpi <= 0xFFFF):
                out.append(None)  # struct.pack('!H') would raise
                continue
            out.append(_community_id_v1(pn, sip, dip, spi, dpi, seed))
        return set_col(t, target, pa.array(out, pa.string()))

    return run


@register("add_network_direction")
def add_network_direction(cfg: dict):
    """Classify flow direction by CIDR membership of src/dst
    (actions/add_network_direction.go:65): internal networks given in
    config; direction ∈ {inbound, outbound, internal, external}."""
    f_src = cfg.get("source", "source.ip")
    f_dst = cfg.get("destination", "destination.ip")
    target = cfg.get("target", "network.direction")
    nets = [ipaddress.ip_network(n) for n in cfg.get("internal_networks", [])]

    def _internal(ip: str | None) -> bool | None:
        if ip is None:
            return None
        try:
            a = ipaddress.ip_address(ip)
        except ValueError:
            return None
        return any(a in n for n in nets)

    @_named("add_network_direction")
    def run(t: pa.Table) -> pa.Table:
        src, dst = get_col(t, f_src), get_col(t, f_dst)
        if src is None or dst is None:
            return t
        memo: dict = {}

        def lookup(v):
            # NOT setdefault: Python evaluates the default argument
            # eagerly, so the ip-parse + CIDR scan ran on EVERY row and
            # the memo never saved any work
            if v not in memo:
                memo[v] = _internal(v)
            return memo[v]

        out = []
        for s, d in zip(src.to_pylist(), dst.to_pylist()):
            si = lookup(s)
            di = lookup(d)
            if si is None or di is None:
                out.append(None)
            elif si and di:
                out.append("internal")
            elif si:
                out.append("outbound")
            elif di:
                out.append("inbound")
            else:
                out.append("external")
        return set_col(t, target, pa.array(out, pa.string()))

    return run


@register("translate")
def translate(cfg: dict):
    """Generic keyed dictionary lookup — the translate_sid /
    translate_ldap_attribute archetype (translate_sid/translatesid.go:75)
    with the table inline in config (small side, broadcast by task
    closure)."""
    field = cfg["field"]
    target = cfg.get("target_field", f"{field}.translated")
    table: dict = cfg.get("dictionary", {})
    default = cfg.get("default")

    @_named("translate")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        keys = list(table.keys())
        vals = [str(table[k]) for k in keys]
        idx = pc.index_in(pc.cast(col.combine_chunks(), pa.string()),
                          value_set=pa.array([str(k) for k in keys]))
        mapped = pc.take(pa.array(vals, pa.string()), idx)
        if default is not None:
            # default means "key NOT FOUND" — a null source field means
            # no lookup was attempted at all, so it must stay null
            # (blanket fill_null also translated never-looked-up rows)
            src_valid = pc.is_valid(col.combine_chunks())
            mapped = pc.if_else(
                pc.and_(src_valid, pc.is_null(mapped)),
                pa.scalar(str(default)), mapped,
            )
        return set_col(t, target, mapped)

    return run


@register("translate_sid")
def translate_sid(cfg: dict):
    """Windows SID → account name (translate_sid/translatesid.go:75):
    the keyed-lookup archetype with SID-flavoured field defaults; the
    table is config-fed (no AD endpoint offline)."""
    return translate(
        {
            "field": cfg.get("field", "winlog.user.identifier"),
            "target_field": cfg.get("account_name_target", "user.name"),
            "dictionary": cfg.get("dictionary", {}),
            "default": cfg.get("default"),
        }
    )


@register("translate_ldap_attribute")
def translate_ldap_attribute(cfg: dict):
    """LDAP attribute lookup (translate_ldap_attribute/:141) — same
    keyed-lookup archetype, LDAP-flavoured defaults; connection + live
    directory are external systems, the mapping table is config-fed."""
    return translate(
        {
            "field": cfg.get("field", "user.id"),
            "target_field": cfg.get("target_field", "user.attribute"),
            "dictionary": cfg.get("dictionary", {}),
            "default": cfg.get("default"),
        }
    )


@register("dns")
def dns_proc(cfg: dict):
    """DNS resolution (dns/dns.go:80) modeled offline: a config-fed
    resolution table (hostname → address) probed vectorized; resolution
    FAILURES are tagged in-band (``<target>.status`` = NXDOMAIN) the
    way the reference records failure-cache entries — no live resolver
    in this container.

    ``action`` (config.go:73-78, reference default append): when the
    target field already holds a value, ``append`` joins the new answer
    onto it (the repo's comma-joined list convention, same as
    add_tags); ``replace`` overwrites. ``tag_on_failure`` (config.go:38)
    appends its tags to ``tags`` on rows whose lookup failed.

    The success/failure TTL CACHE semantics (cache.go) are event-time
    state — a per-batch processor cannot see across batches — and live
    in ``dataops.dnscache.dns_cache_replay`` (hit/miss/expiry replay).
    ``success_cache``/``failure_cache`` config keys
    (config.go:32-44: ``{capacity.initial/max, min_ttl|ttl}``) are
    validated here and exposed as ``run.success_min_ttl_s`` /
    ``run.failure_ttl_s`` on the returned processor so an event-time
    caller can feed them straight into ``dns_cache_replay``."""
    kind = cfg.get("type", "forward")
    if kind not in ("forward", "reverse"):
        raise ValueError(f"dns: type must be forward or reverse, got {kind!r}")

    def _ttl_of(key: str, field: str) -> int | None:
        sub = cfg.get(key)
        if sub is None:
            return None
        if not isinstance(sub, dict):
            raise ValueError(f"dns: {key} must be a mapping, got {sub!r}")
        val = sub.get(field)
        if val is None:
            return None
        ttl = int(val)
        if ttl <= 0:
            raise ValueError(f"dns: {key}.{field} must be positive, got {val!r}")
        return ttl

    success_min_ttl_s = _ttl_of("success_cache", "min_ttl")
    failure_ttl_s = _ttl_of("failure_cache", "ttl")
    action = cfg.get("action", "append")  # reference default: append
    if action not in ("append", "replace"):
        raise ValueError(
            f"dns: action must be append or replace, got {action!r}"
        )
    fail_tags = list(cfg.get("tag_on_failure", []))
    # reverse (PTR) mode probes an address field and answers hostnames
    field = cfg.get(
        "field", "source.ip" if kind == "reverse" else "source.domain"
    )
    target = cfg.get(
        "target_field", "dns.hostname" if kind == "reverse" else "dns.answer"
    )
    table: dict = cfg.get("resolutions", cfg.get("dictionary", {}))

    @_named("dns")
    def run(t: pa.Table) -> pa.Table:
        col = get_col(t, field)
        if col is None:
            return t
        keys = [str(k) for k in table]
        vals = [str(table[k]) for k in table]
        src = pc.cast(col.combine_chunks(), pa.string())
        idx = pc.index_in(src, value_set=pa.array(keys, pa.string()))
        mapped = pc.take(pa.array(vals, pa.string()), idx)
        existing = get_col(t, target)
        if existing is not None and action == "append":
            # setFieldValue actionAppend (dns.go:120-134): old value +
            # new answer become a list — comma-joined here
            old = pc.cast(existing.combine_chunks(), pa.string())
            joined = pc.binary_join_element_wise(old, mapped, ",")
            mapped_out = pc.coalesce(joined, mapped, old)
        else:
            mapped_out = mapped
        t = set_col(t, target, mapped_out)
        status = pc.if_else(
            pc.is_valid(mapped),
            pa.array(["OK"] * t.num_rows),
            pa.array(["NXDOMAIN"] * t.num_rows),
        )
        # rows with a null input field have no resolution attempt
        status = pc.if_else(
            pc.is_valid(src), status, pa.nulls(t.num_rows, pa.string()),
        )
        t = set_col(t, f"{target}.status", status)
        if fail_tags:
            # mapstr.AddTags on lookup failure (dns.go:85-88)
            failed = pc.and_(pc.is_valid(src), pc.is_null(mapped))
            tagstr = ",".join(fail_tags)
            cur = get_col(t, "tags")
            cur = (pc.cast(cur.combine_chunks(), pa.string())
                   if cur is not None else pa.nulls(t.num_rows, pa.string()))
            appended = pc.if_else(
                pc.is_null(cur), pa.scalar(tagstr),
                pc.binary_join_element_wise(cur, tagstr, ","),
            )
            t = set_col(t, "tags", pc.if_else(failed, appended, cur))
        return t

    # parsed TTL config for the event-time replay model (None = unset)
    run.success_min_ttl_s = success_min_ttl_s
    run.failure_ttl_s = failure_ttl_s
    return run


@register("now")
def now_proc(cfg: dict):
    """Inject a timestamp column (now/now.go:65). Wall-clock is
    nondeterministic, so the engine requires the time via config
    (``value``: ISO string) — the driver/test injects it, mirroring how
    the reference's tests fix the clock."""
    target = cfg.get("target_field", "event.created")
    value = cfg.get("value")
    if value is None:
        raise ValueError(
            "now: provide 'value' (ISO timestamp) — wall-clock reads are "
            "nondeterministic in a replayable batch pipeline"
        )
    import pandas as pd

    ts = pd.Timestamp(value)

    @_named("now")
    def run(t: pa.Table) -> pa.Table:
        return set_col(
            t, target,
            pa.array([ts.to_pydatetime()] * t.num_rows, pa.timestamp("us")),
        )

    return run


def _stage_only(name: str):
    def factory(cfg: dict):
        raise ValueError(
            f"{name} needs a co-locating keyed shuffle and cannot run as a "
            f"per-batch processor; configure it under 'stages:' instead "
            f"(see beats_ray.pipeline.STAGE_REGISTRY)"
        )

    return factory


# Beats configures these as processors; in the batch engine they are
# dataset-level stages. Registering them here makes the config-surface
# error EAGER and actionable instead of "unknown processor".
register("rate_limit")(_stage_only("rate_limit"))
register("cache")(_stage_only("cache"))


@register("script")
def script(cfg: dict):
    """Python-UDF processor — the user-extension surface replacing the
    reference's JavaScript ``script`` processor (script/javascript/
    javascript.go:42-201; compile-once-per-worker ≈ its session pool).

    Config: ``source`` — Python source defining ``def process(row:
    dict) -> dict | None`` (None drops the row, mirroring nil-return
    drop semantics). Runs per row on a dict view; use builtin
    processors for hot paths — this is the escape hatch."""
    source = cfg["source"]
    compiled = compile(source, "<script-processor>", "exec")

    class _Script:
        name = "script"
        drops_rows = True

        def __init__(self):
            ns: dict = {}
            exec(compiled, ns)  # once per worker (deserialize-time)
            self.process = ns["process"]

        def __call__(self, t: pa.Table) -> pa.Table:
            rows = t.to_pylist()
            out = [self.process(dict(r)) for r in rows]
            kept = [r for r in out if r is not None]
            if not kept:
                return t.slice(0, 0)
            names: list[str] = []
            for r in kept:
                for k in r:
                    if k not in names:
                        names.append(k)
            return pa.table({n: [r.get(n) for r in kept] for n in names})

    return _Script()
