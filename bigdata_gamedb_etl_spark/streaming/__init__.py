from .windowed import (  # noqa: F401
    EVENTS_STREAM_SCHEMA,
    daily_rollup_stream,
    dedup_stream,
    enrich_stream_with_static,
    read_events_stream,
    run_stream_to_memory,
    session_window_stream,
    stream_stream_error_click_join,
    upsert_stream_to_parquet,
    user_running_totals_stream,
    user_running_totals_tws,
)
