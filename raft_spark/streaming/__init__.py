from raft_spark.streaming.incremental import (  # noqa: F401
    EVENTS_SCHEMA,
    read_events_stream,
    windowed_moments,
    windowed_histogram,
    windowed_topk_events,
    running_topk_stateful,
)
