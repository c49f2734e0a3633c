from .lineage import CheckpointRunner, read_lineage, run_metrics  # noqa: F401
