from .engine import (  # noqa: F401
    dedup_stream,
    hll_distinct_stream,
    salted_repartition,
    session_stream,
    sliding_agg_stream,
    sliding_count_stream,
    tumbling_stream,
)
from .join import user_assistant_join, user_assistant_join_batch  # noqa: F401
from .sink import ExactlyOnceParquetSink, write_stream_exactly_once  # noqa: F401
