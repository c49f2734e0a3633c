"""Processor library — importing this package registers every processor
(mirrors the reference's init-time RegisterPlugin calls,
libbeat/processors/registry.go)."""

from . import actions, convert, extras, fingerprint, grok, metadata, parse  # noqa: F401
from ..functions import registry as _function_registry  # noqa: F401  (registers 'function')
from .base import (  # noqa: F401
    Transform,
    build_chain,
    build_processor,
    registry,
    run_chain,
)
