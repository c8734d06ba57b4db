from auto_ts_spark.streaming.ops import (  # noqa: F401
    dedup_stream,
    read_event_stream,
    session_agg,
    sliding_agg,
    stateful_rolling_forecast,
    tumbling_agg,
)
