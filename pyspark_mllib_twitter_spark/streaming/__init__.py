from .streams import (  # noqa: F401
    FLUSH_EVENT_TYPE,
    foreach_batch_parquet_sink,
    replay_events_dir,
    read_events_stream,
    run_to_memory,
    sessionized,
    sliding_window_stats,
    stream_dedup,
    stream_interval_join,
    stateful_user_stats,
    tumbling_window_counts,
)
