from .readers import (  # noqa: F401
    line_reader_chain,
    read_log_lines,
    read_ndjson_logs,
    write_ndjson_fixture,
)
