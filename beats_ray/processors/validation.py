"""Per-processor allowed-config-key validation — the reference's
``checkinprocessor`` guards (libbeat/processors/checks.go, e.g.
drop_fields.go:47): unknown keys in a user's YAML fail at BUILD time
with the offending key named, instead of being silently ignored.
"""

from __future__ import annotations

ALLOWED_KEYS: dict[str, set[str]] = {
    "add_fields": {"fields", "target"},
    "add_labels": {"labels"},
    "add_tags": {"tags", "target"},
    "drop_fields": {"fields", "ignore_missing"},
    "include_fields": {"fields"},
    "rename": {"fields", "fail_on_error", "ignore_missing"},
    "copy_fields": {"fields", "fail_on_error", "ignore_missing"},
    "replace": {"fields", "fail_on_error", "ignore_missing"},
    "append": {"target_field", "values", "fields", "allow_duplicate"},
    "lowercase": {"fields"},
    "uppercase": {"fields"},
    "truncate_fields": {"fields", "max_bytes", "max_characters", "fail_on_error"},
    "decode_json_fields": {
        "fields", "target", "expected", "add_error_key", "document_id",
        "max_depth", "overwrite_keys", "process_array", "expand_keys",
    },
    "decode_base64_field": {"field", "ignore_missing", "fail_on_error"},
    "decompress_gzip_field": {"field", "ignore_missing", "fail_on_error"},
    "detect_mime_type": {"field", "target"},
    "extract_field": {"field", "separator", "index", "target"},
    "dissect": {
        "tokenizer", "field", "target_prefix", "ignore_failure",
        "overwrite_keys", "trim_values", "trim_chars",
    },
    "grok": {
        "pattern", "patterns", "field", "target_prefix",
        "pattern_definitions", "ignore_failure", "overwrite_keys",
    },
    "convert": {"fields", "mode", "fail_on_error", "ignore_missing"},
    "timestamp": {"field", "target", "layouts", "ignore_missing",
                  "ignore_failure", "timezone"},
    "fingerprint": {"fields", "method", "encoding", "target_field"},
    "add_id": {"target_field", "key_fields"},
    "timeseries": {"fields"},
    "community_id": {"source_ip", "destination_ip", "source_port",
                     "destination_port", "transport", "target", "seed"},
    "add_network_direction": {"source", "destination", "target",
                              "internal_networks"},
    "registered_domain": {"field", "target_field"},
    "extract_array": {"field", "mappings"},
    "move_fields": {"from", "to", "fields"},
    "decode_csv_fields": {"fields", "separator", "ignore_missing",
                          "fail_on_error"},
    "decode_duration": {"field", "target", "format"},
    "decode_xml": {"field", "target_field", "ignore_missing",
                   "ignore_failure"},
    "urldecode": {"fields", "ignore_missing", "fail_on_error"},
    "syslog": {"field", "target_prefix", "format"},
    "container": {"field", "target_prefix", "stream"},
    "multiline_stats": {"field", "target_prefix", "max_lines"},
    "include_message": {"field", "patterns", "include", "exclude"},
    "script": {"source", "lang"},
    "translate": {"field", "target_field", "dictionary", "default"},
    "drop_event": set(),
    "function": {"name"},
    "add_host_metadata": {"host", "cache.ttl", "replace_fields"},
    "add_docker_metadata": {"match_field", "target_prefix", "index"},
    "add_kubernetes_metadata": {"match_field", "target_prefix", "index"},
    "add_process_metadata": {"match_field", "target_prefix", "index"},
    "decode_xml_wineventlog": {"field", "target_field", "ignore_missing",
                               "ignore_failure", "map_ecs_fields"},
    "translate_sid": {"field", "account_name_target", "dictionary", "default"},
    "translate_ldap_attribute": {"field", "target_field", "dictionary",
                                 "default"},
    "dns": {"field", "target_field", "resolutions", "dictionary", "type",
            "action", "tag_on_failure", "success_cache", "failure_cache"},
    "now": {"target_field", "value"},
    "add_observer_metadata": {"fields"},
    "add_agent_metadata": {"fields"},
    "add_cloud_metadata": {"fields"},
    "add_locale": {"timezone", "format"},
    "add_data_stream": {"type", "dataset", "namespace"},
    "add_formatted_index": {"index", "target"},
}


def validate_config(name: str, cfg: dict) -> None:
    """Raise with the offending key named (checks.go behaviour). A
    processor without an ALLOWED_KEYS entry skips validation (open
    registry — user plugins)."""
    allowed = ALLOWED_KEYS.get(name)
    if allowed is None or not isinstance(cfg, dict):
        return
    unknown = sorted(set(cfg) - allowed)
    if unknown:
        raise ValueError(
            f"processor {name!r}: unsupported config key(s) {unknown}; "
            f"allowed: {sorted(allowed)}"
        )
