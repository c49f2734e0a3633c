"""Output routing: selector expressions → a ``sink`` column.

Models the reference's selector machinery (outputs/outil/select.go:30-67,
settings.go:18-40): a prioritized rule list, each rule
``{name|index: <format-string>, when: <condition>, default?}``, compiled
to a first-match-wins cascade evaluated vectorized over each batch
(the ES ``index``/``indices`` form, idxmgmt/index_support.go:190-197,
and kafka ``topic``/``topics``, kafka/kafka.go:96-106, share this shape).

Rows matching no rule get the ``default`` sink if present, else null
sink (Beats: event dropped for that output — we keep + null so the
"dropped" count is observable).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .conditions import compile_condition
from .processors.metadata import compile_format_string


class Router:
    def __init__(self, rules: list[dict], target: str = "sink"):
        self.target = target
        self.compiled: list[tuple] = []
        self.sink_names: list[str] = []
        for rule in rules:
            name = rule.get("name") or rule.get("index") or rule.get("topic")
            if name is None:
                raise ValueError(f"routing rule needs a name: {rule!r}")
            fmt = compile_format_string(name) if "%{" in name else None
            # strict FIRST-MATCH-WINS in rule order (outil.Select): an
            # unconditional rule is an all-true condition IN PLACE — it
            # catches everything still unrouted, and later rules are
            # unreachable (exactly the reference's selector order);
            # format-string names are evaluated for unconditional rules
            # too, not stored as a literal fallback
            cond = compile_condition(rule["when"]) if "when" in rule else None
            # `mappings:` table form (outil/select.go:289-296,
            # LookupSelectorExpr): the rule's key expression is looked
            # up in a value → sink table; a missed lookup yields the
            # rule's `default` if set, else the row FALLS THROUGH to
            # the next rule (mapSelector returns "" → listSelector
            # continues, select.go:225-245)
            mapping = rule.get("mappings")
            if mapping is not None:
                mapping = {str(k): str(v) for k, v in mapping.items()}
            default = rule.get("default")
            self.compiled.append((name, fmt, cond, mapping, default))
            if mapping is not None:
                for v in mapping.values():
                    if v not in self.sink_names:
                        self.sink_names.append(v)
            elif fmt is None and name not in self.sink_names:
                self.sink_names.append(name)
            if default is not None and default not in self.sink_names:
                self.sink_names.append(default)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        sink = pa.nulls(n, pa.string())
        for name, fmt, cond, mapping, default in self.compiled:
            if cond is None:
                assign = pc.is_null(sink)
            else:
                mask = pc.fill_null(cond(t), False)
                assign = pc.and_(pc.is_null(sink), mask)
            if fmt is not None:
                value = fmt(t)
            else:
                value = pa.nulls(n, pa.string()).fill_null(name)
            if mapping is not None:
                idx = pc.index_in(
                    value, value_set=pa.array(list(mapping), pa.string())
                )
                value = pc.take(
                    pa.array(list(mapping.values()), pa.string()), idx
                )
            if default is not None:
                # rule-level fallback (select.go:280-286 `otherwise`):
                # catches missed lookups and empty key expressions
                value = pc.if_else(
                    pc.equal(pc.fill_null(value, ""), ""),
                    pa.scalar(default), value,
                )
            # null/empty value = this rule produced nothing for the row
            # → leave it unrouted so later rules may claim it
            assign = pc.and_(
                assign, pc.invert(pc.equal(pc.fill_null(value, ""), ""))
            )
            sink = pc.if_else(assign, value, sink)
        # Beats drops events matching no selector but COUNTS the drops
        # (outputs/metrics.go `dropped`); keep-and-observe equivalent:
        # rows with no matching rule land in an explicit `_unrouted`
        # sink, so nothing is lost and the drop count is a sink count.
        sink = pc.fill_null(sink, "_unrouted")
        # the sink value becomes a FILESYSTEM path segment
        # (`sink=<name>/` hive partition): data-derived names (format
        # strings render event fields) must not smuggle separators or
        # hive metacharacters — 'logs-a/b' would nest a directory and
        # mis-attribute the rows to sink 'logs-a'
        sink = pc.replace_substring_regex(
            sink, pattern=r"[/\\=\x00-\x1f%]", replacement="_"
        )
        if self.target in t.column_names:
            idx = t.column_names.index(self.target)
            return t.set_column(idx, self.target, sink)
        return t.append_column(self.target, sink)


def sink_counts(t: pa.Table, target: str = "sink") -> dict[str, int]:
    """Per-batch partial counts (combiner before the global groupby —
    SURVEY §2.8 per-sink aggregate counts)."""
    vc = t[target].value_counts()
    out = {}
    for entry in vc.to_pylist():
        out[entry["values"]] = entry["counts"]
    return out
