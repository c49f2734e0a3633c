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
