from .mqtt import (  # noqa: F401
    MqttError,
    ScriptedMqttBroker,
    collect_mqtt,
    read_mqtt,
    scripted_mqtt_messages,
    start_scripted_mqtt,
    topic_matches,
)
from .redisslow import (  # noqa: F401
    ScriptedRedisServer,
    harvest_slowlog,
    read_redis_slowlog,
    scripted_slowlog_entries,
    start_scripted_redis,
)
from .kafka import (  # noqa: F401
    kafka_events,
    kafka_segment_paths,
    read_kafka_segments,
    scan_kafka_segment,
    write_kafka_segments_fixture,
)
from .winlog import (  # noqa: F401
    read_winlog_xml,
    winlog_events,
    write_winlog_xml_fixture,
)
from .journald import (  # noqa: F401
    journald_conv,
    read_journal_export,
    write_journal_export_fixture,
)
from .readers import (  # noqa: F401
    line_reader_chain,
    read_log_lines,
    read_ndjson_logs,
    write_ndjson_fixture,
)
from .sockets import (  # noqa: F401
    SocketListener,
    drain_to_dataset,
    read_syslog_socket,
)
