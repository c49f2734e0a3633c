"""beats_ray — a Ray-Data-native log/telemetry parse → enrich → route →
aggregate engine with the query/data-processing capabilities of the
reference Beats repo (elastic/beats fork), rebuilt from scratch on
``ray.data.Dataset`` + Arrow batches.

Layout
------
- ``schema``      : transcript Arrow schema + derived-column schema
- ``fixtures``    : deterministic synthetic transcript corpus (seed-fixed)
- ``dissect``     : dissect tokenizer → vectorized regex compiler
- ``conditions``  : Beats condition AST → Arrow boolean-mask compiler
- ``processors``  : the per-record transform library (add_fields, rename,
                    drop_event, convert, timestamp, fingerprint, ...)
- ``routing``     : output selector (first-match-wins) → sink column
- ``enrich``      : actor-pool broadcast-lookup enrichment stages
- ``pipeline``    : config → ordered batch-transform composition
- ``state``       : per-partition lineage/checkpoint records + resume
- ``dataops``     : large-scale training-data ops (dedup, ANN, text stats,
                    windowed aggregation, multimodal stubs)

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by bench.py / pytest fixtures / the driver.
"""

__version__ = "0.1.0"

import logging as _logging
import os as _os


class _EmptySortPartitionNoise(_logging.Filter):
    """Drop ONLY the benign empty-schema divergence warning.

    Ray's sort-based shuffle emits schema-less EMPTY blocks for reduce
    partitions that received no rows (fewer distinct keys than
    partitions). The executor then warns "RefBundle with a different
    schema ... new schema: ." once per operator. Our group UDFs are
    provably never invoked for those partitions
    (``_apply_udf_to_groups`` yields nothing on an empty block), so no
    typed-empty-frame fix is possible on the engine side, and the
    divergence is harmless: the executor's own dedupe early-returns
    whenever the tracked schema is empty. REAL schema drift (two
    non-empty schemas) prints both schemas and is NOT filtered."""

    _NEEDLE = "RefBundle with a different schema"
    _EMPTY = ("new schema: .", "new schema: PandasBlockSchema(names=[], types=[]).")

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        if self._NEEDLE not in msg:
            return True
        return not any(e in msg for e in self._EMPTY)


# NOTE: the filter is process-wide (Ray's executor logger is global),
# so it also silences this one warning for any OTHER Ray Data pipelines
# in the same process. The filtered message is only ever emitted for
# schema-LESS empty bundles (real drift prints both schemas and still
# surfaces); set BEATS_RAY_KEEP_RAY_WARNINGS=1 to skip installing it.
if not _os.environ.get("BEATS_RAY_KEEP_RAY_WARNINGS"):
    _logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySortPartitionNoise())
