from .engine import (  # noqa: F401
    conversation_timeout_stream,
    dedup_stream,
    discover_hot_keys,
    hot_keys_stream,
    hll_distinct_stream,
    salted_repartition,
    session_stream,
    sliding_agg_stream,
    sliding_agg_stream_multi,
    sliding_agg_stream_tws,
    sliding_count_stream,
    sliding_panes_stream,
    sliding_panes_stream_multi,
    sliding_panes_stream_tws,
    tumbling_stream,
    tumbling_stream_salted,
)
from .join import (  # noqa: F401
    reply_latency_batch,
    reply_latency_stream,
    user_assistant_join,
    user_assistant_join_batch,
    user_next_reply,
    user_next_reply_batch,
)
from .sink import (  # noqa: F401
    ExactlyOnceParquetSink,
    audit_sink,
    compact_sink,
    expire_sink,
    write_stream_exactly_once,
)
from .state_inspect import (  # noqa: F401
    assert_state_bounded,
    audit_state_bound,
    group_state_stats,
    hot_keys_from_state,
    read_state,
    state_delta,
    state_operators,
)
