"""sliding_window_aggregators_spark — a PySpark-native sliding-window
aggregation (SWAG) engine.

A from-scratch re-expression of the capabilities of
IBM/sliding-window-aggregators (reference read-only at /root/reference)
as an idiomatic PySpark engine:

- ``functions``: the aggregation-monoid library (lift/combine/lower/
  inverse), vectorized over NumPy columns (reference:
  cpp/src/AggregationFunctions.hpp).
- ``operators``: window-maintenance kernels — bulk/vectorized
  Two-Stacks, SubtractOnEvict, the ordered out-of-order state
  (FiBA-equivalent), plus per-op parity algorithms (reference:
  cpp/src/{TwoStacks,TwoStacksLite,DABALite,SubtractOnEvict,ReCalc,
  FiBA}.hpp) and DataFrame-level batch operators.
- ``sources``: deterministic transcript synthesizer (the BASELINE
  input_hint table) and test-table loaders.
- ``plans``: batch query library exposed through ``__spark_entry__.py``
  (windowed aggregates, dedup, similarity search, text analysis).
- ``streaming``: Structured Streaming shell — stateful sliding windows
  via applyInPandasWithState, stream-stream join, exactly-once sink.
"""

__version__ = "0.1.0"

# Cheap per-task worker fix, applied wherever this package is imported
# (driver and every executor Python worker): see _zipfix docstring.
from . import _zipfix as _zipfix_mod

_zipfix_mod.apply()

# Env-gated in-worker sampling profiler (no-op unless SWAG_STACK_SAMPLER
# is set): importing the package in a worker arms it for ANY operator.
from . import _prof as _prof_mod

_prof_mod.ensure_sampler()
