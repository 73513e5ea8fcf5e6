from .sources import (
    events_file_stream,
    kafka_alert_sink,
    kafka_json_stream,
    parse_json_stream,
    rate_stream,
)

__all__ = [
    "events_file_stream",
    "kafka_alert_sink",
    "kafka_json_stream",
    "parse_json_stream",
    "rate_stream",
]
