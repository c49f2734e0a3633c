"""Named pipeline presets — the engine's ``filebeat.yml`` equivalents.

A preset is a config dict consumable by ``pipeline.build_dataset`` /
the CLI; users compose their own the same way (processors + routes).
"""

from __future__ import annotations

import copy

from ..pipeline import FLAGSHIP_CONFIG, build_dataset


def flagship_config(**overrides) -> dict:
    cfg = copy.deepcopy(FLAGSHIP_CONFIG)
    cfg.update(overrides)
    return cfg


def build_flagship(ds, **kwargs):
    """The default parse→enrich→route composition."""
    return build_dataset(ds, FLAGSHIP_CONFIG, **kwargs)


# A curated alternative preset: security-flavoured routing (models the
# reference's conditional `indices:`/`topics:` configs, SURVEY §2.7).
SECURITY_CONFIG: dict = {
    "processors": [
        {
            "dissect": {
                "tokenizer": 'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg="%{msg}"',
                "ignore_failure": True,
            }
        },
        {"syslog": {"format": "auto"}},
        {
            "add_fields": {"target": "", "fields": {"pipeline": "security"}},
        },
    ],
    "routes": [
        {
            "name": "high_sev",
            "when": {"range": {"syslog.severity": {"lte": 3}}},
        },
        {"name": "failures", "when": {"equals": {"dissect.status": "fail"}}},
        {"name": "audit"},
    ],
}
