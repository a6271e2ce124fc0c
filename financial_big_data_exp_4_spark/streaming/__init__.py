from financial_big_data_exp_4_spark.streaming.stateful import (
    streaming_user_running_totals,
)
from financial_big_data_exp_4_spark.streaming.windows import (
    read_events_stream,
    read_snapshot,
    run_stream_foreach_batch,
    run_stream_merge,
    run_stream_to_memory,
    seed_snapshot,
    streaming_distinct_keys,
    streaming_error_purchase_join,
    streaming_session_counts,
    streaming_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "read_snapshot",
    "run_stream_foreach_batch",
    "run_stream_merge",
    "run_stream_to_memory",
    "seed_snapshot",
    "streaming_distinct_keys",
    "streaming_error_purchase_join",
    "streaming_session_counts",
    "streaming_tumbling_counts",
    "streaming_user_running_totals",
]
