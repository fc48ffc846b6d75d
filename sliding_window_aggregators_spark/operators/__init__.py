from .kernels import (  # noqa: F401
    FlatTree,
    SegmentedSlidingKernel,
    SlidingCountWindow,
    SubtractOnEvictKernel,
    TwoStacksKernel,
    interval_fold,
    sliding_partials,
    sliding_reduce,
    sliding_time_window,
)
from .batch import sliding_rows_auto, sliding_rows_kernel_partitioned  # noqa: F401
from .pane_rollup import (  # noqa: F401
    pane_rollup,
    pane_rollup_monoid,
    pane_rollup_multi,
)
from .ordered import OrderedAggState  # noqa: F401
from .stepwise import ALGORITHMS, make  # noqa: F401
