from .stream_runner import (  # noqa: F401
    stream_apply,
    stream_apply_debezium,
    stream_sessionize,
    stream_windowed_counts,
)
