"""Checkpoint state inspection: read a streaming query's state store as
DataFrames and audit the engine's bounded-state invariant from the
checkpoint alone.

Spark 4 ships a State Data Source (SPARK-45511): ``spark.read.format(
"state-metadata")`` lists every stateful operator a checkpoint carries
(operator id/name, store names, partition count, committed batch range)
and ``spark.read.format("statestore")`` returns the decoded per-key
state rows of any store, optionally time-travelled to an earlier
``batchId``. That turns two claims this engine makes from "trust the
operator" into checkpoint-verifiable properties:

- **bounded state** — the FiBA-style ordered state behind
  :func:`~sliding_window_aggregators_spark.streaming.engine.sliding_agg_stream`
  evicts to ``youngest − 2·duration`` per key (the admitted-late-row
  fold horizon; see ``_ooo_sliding_step``). :func:`audit_state_bound`
  recomputes each key's retained-span straight from the state files.
- **per-partition lineage** — ``state-metadata`` records the store's
  partition count and min/max committed batch; reading the same store
  at two ``batchId``\\ s shows exactly how state moved between commits.

Scale notes (the reason this is an API and not a debugging one-liner):
the statestore read is partition-parallel over the state files, the
blob decode rides executors inside ``mapInPandas`` (never a driver
collect), and the result is one small stats row per key — on a
1000-executor job this is the "is state growing? which keys?" answer
that needs neither stopping the query nor instrumenting the operator.

All state written by this engine's ``applyInPandasWithState`` operators
is a single pickled blob column (``STATE_SCHEMA = "blob binary"``,
engine.py); :func:`group_state_stats` recognises the engine's blob
layouts (OrderedAggState v1, the multi-duration blob list, the pane
dict) and reports ``kind='opaque'`` with byte sizes for anything else.
Built-in stateful operators (session windows, stream-stream joins)
store NATIVE rows — those decode fully typed with no blob step; see
``read_state(join_side=...)`` for the four symmetricHashJoin stores.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "state_operators",
    "hot_keys_from_state",
    "state_delta",
    "read_state",
    "group_state_stats",
    "audit_state_bound",
    "assert_state_bounded",
]

_STATS_SCHEMA = (
    "key_json string, kind string, state_rows long, ts_min_us long, "
    "ts_max_us long, span_us long, blob_bytes long, partition_id int"
)


def state_operators(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The checkpoint's stateful-operator lineage: one row per state
    store — operatorId, operatorName, stateStoreName, numPartitions,
    min/maxBatchId (the committed batch range the store can be read
    at)."""
    return spark.read.format("state-metadata").load(checkpoint)


def _ensure_state_coordinator(spark: SparkSession) -> None:
    """Materialize the driver's StateStoreCoordinator RPC endpoint.

    Spark creates it lazily when the first STREAMING query starts; a
    fresh session doing a pure batch ``format("statestore")`` read (the
    ops case: inspect a finished job's checkpoint from a new driver)
    never triggers that, and executor-side store loads then die with
    ``CANNOT_LOAD_STATE_STORE`` / ``RpcEndpointNotFoundException:
    StateStoreCoordinator`` — found by driving tools/state_report.py
    against a checkpoint from a different session. Touching the
    StreamingQueryManager's lazy val through py4j creates the endpoint
    without starting a query; best-effort so an internals rename can
    only ever degrade to Spark's own error."""
    try:
        spark._jsparkSession.sessionState().streamingQueryManager() \
            .stateStoreCoordinator()
    except Exception:
        pass


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int | None = None,
    batch_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
    state_var: str | None = None,
) -> DataFrame:
    """Raw per-key state rows of one store as a DataFrame
    (``key struct, value struct, partition_id``).

    ``batch_id`` time-travels to any committed batch in the store's
    ``[minBatchId, maxBatchId]`` range (default: latest). For
    stream-stream joins pass ``join_side='left'|'right'`` instead of a
    ``store_name`` — Spark assembles the keyToNumValues /
    keyWithIndexToValue store pair into plain value rows. For
    ``transformWithState`` operators pass ``state_var`` — the state
    variable name the processor registered (this engine: ``"ordered"``
    for sliding_agg_stream_tws, ``"panes"`` for
    sliding_panes_stream_tws, ``"kernel"`` for
    sliding_count_stream_tws; the full list is in state-metadata's
    ``operatorProperties.stateVariables``)."""
    _ensure_state_coordinator(spark)
    r = spark.read.format("statestore")
    if operator_id is not None:
        r = r.option("operatorId", str(int(operator_id)))
    if batch_id is not None:
        r = r.option("batchId", str(int(batch_id)))
    if store_name is not None:
        r = r.option("storeName", store_name)
    if join_side is not None:
        r = r.option("joinSide", join_side)
    if state_var is not None:
        r = r.option("stateVarName", state_var)
    return r.load(checkpoint)


def _blob_stats(blob: bytes):
    """(kind, rows, ts_min_us, ts_max_us) for one engine state blob.

    Recognised layouts (all produced in streaming/engine.py):
    - OrderedAggState v1 dict  {"ts", "partials", "v"}  — sliding_agg_stream
      and the TWS twin (ordered.py:385);
    - list of such blobs — sliding_agg_stream_multi (one per duration);
    - pane dict {"pane_ts", "partials", "last_emit", "v"} —
      sliding_panes_stream* (one partial per slide-aligned pane);
    - anything else → ("opaque", None, None, None), sizes still reported.
    """
    try:
        obj = pickle.loads(bytes(blob))
    except Exception:
        return "undecodable", None, None, None
    if isinstance(obj, (list, tuple)) and obj and all(
        isinstance(b, (bytes, bytearray)) for b in obj
    ):
        subs = [_blob_stats(b) for b in obj]
        if all(s[0] == "ordered" for s in subs):
            rows = sum(s[1] for s in subs)
            mins = [s[2] for s in subs if s[2] is not None]
            maxs = [s[3] for s in subs if s[3] is not None]
            return (
                "ordered_multi",
                rows,
                min(mins) if mins else None,
                max(maxs) if maxs else None,
            )
        return "opaque", None, None, None
    if isinstance(obj, dict):
        for kind, ts_field in (("ordered", "ts"), ("panes", "pane_ts")):
            ts = obj.get(ts_field)
            if isinstance(ts, np.ndarray) and ts.ndim == 1 \
                    and ts.dtype.kind in "iu":
                if len(ts) == 0:
                    return kind, 0, None, None
                return kind, int(len(ts)), int(ts.min()), int(ts.max())
    return "opaque", None, None, None


def group_state_stats(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int | None = None,
    batch_id: int | None = None,
    state_col: str = "value.groupState.blob",
    state_var: str | None = None,
) -> DataFrame:
    """Per-key state statistics for a blob-state operator, decoded
    distributed (mapInPandas — the blobs never leave the executors):
    one row per key with the blob kind, buffered row count, event-time
    span of the retained state (µs), and blob size.

    ``state_col`` defaults to the engine's ``applyInPandasWithState``
    groupState blob; for a ``transformWithState`` operator pass
    ``state_var`` (the registered variable name — this engine's TWS
    twins store the SAME pickled blobs under ``value.blob``, which
    becomes the default column when ``state_var`` is given).
    """
    if state_var is not None and state_col == "value.groupState.blob":
        state_col = "value.blob"
    st = read_state(
        spark, checkpoint, operator_id=operator_id, batch_id=batch_id,
        state_var=state_var,
    ).select(
        F.to_json(F.col("key")).alias("key_json"),
        F.col(state_col).alias("_blob"),
        "partition_id",
    )

    def decode(batches):
        for pdf in batches:
            out = []
            for kj, blob, pid in zip(
                pdf["key_json"], pdf["_blob"], pdf["partition_id"]
            ):
                kind, rows, tmin, tmax = _blob_stats(blob)
                span = (tmax - tmin) if (tmin is not None and tmax is not None) else None
                out.append((kj, kind, rows, tmin, tmax, span, len(blob), pid))
            yield pd.DataFrame(
                out,
                columns=[
                    "key_json", "kind", "state_rows", "ts_min_us",
                    "ts_max_us", "span_us", "blob_bytes", "partition_id",
                ],
            )

    return st.mapInPandas(decode, _STATS_SCHEMA)


def state_delta(
    spark: SparkSession,
    checkpoint: str,
    batch_a: int,
    batch_b: int,
    *,
    operator_id: int | None = None,
    state_col: str = "value.groupState.blob",
    state_var: str | None = None,
) -> DataFrame:
    """How state moved between two committed batches, per key: the
    same store read at ``batch_a`` and ``batch_b`` (full-outer joined on
    the key), with ``d_rows`` / ``d_bytes`` / ``d_span_us`` deltas and a
    ``change`` verdict — ``'appeared'`` (key had no state at a),
    ``'cleared'`` (state gone by b: timer/eviction closed it), ``'grew'``,
    ``'shrank'``, or ``'steady'``. This is the "which keys is batch N
    responsible for" drilldown behind the per-batch ``stateRows`` /
    ``stateMemoryBytes`` lineage the job prints."""
    a = group_state_stats(
        spark, checkpoint, operator_id=operator_id, batch_id=batch_a,
        state_col=state_col, state_var=state_var,
    ).select(
        "key_json",
        F.col("state_rows").alias("rows_a"),
        F.col("blob_bytes").alias("bytes_a"),
        F.col("span_us").alias("span_a"),
        F.col("ts_max_us").alias("ts_max_a"),
    )
    b = group_state_stats(
        spark, checkpoint, operator_id=operator_id, batch_id=batch_b,
        state_col=state_col, state_var=state_var,
    ).select(
        "key_json",
        F.col("state_rows").alias("rows_b"),
        F.col("blob_bytes").alias("bytes_b"),
        F.col("span_us").alias("span_b"),
        F.col("ts_max_us").alias("ts_max_b"),
    )
    j = a.join(b, "key_json", "full_outer")
    d_rows = F.coalesce("rows_b", F.lit(0)) - F.coalesce("rows_a", F.lit(0))
    return j.select(
        "key_json",
        "rows_a", "rows_b",
        d_rows.alias("d_rows"),
        (F.coalesce("bytes_b", F.lit(0))
         - F.coalesce("bytes_a", F.lit(0))).alias("d_bytes"),
        (F.coalesce("span_b", F.lit(0))
         - F.coalesce("span_a", F.lit(0))).alias("d_span_us"),
        # how far the key's retained horizon moved forward (steady row
        # counts with a sliding horizon = healthy turnover, not stasis)
        (F.col("ts_max_b") - F.col("ts_max_a")).alias("advanced_us"),
        F.when(F.col("rows_a").isNull(), F.lit("appeared"))
        .when(F.col("rows_b").isNull(), F.lit("cleared"))
        .when(d_rows > 0, F.lit("grew"))
        .when(d_rows < 0, F.lit("shrank"))
        .otherwise(F.lit("steady"))
        .alias("change"),
    )


def hot_keys_from_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    key: str = "conv_id",
    top_n: int = 40,
    min_share: float = 0.0,
    operator_id: int | None = None,
    batch_id: int | None = None,
    state_col: str = "value.groupState.blob",
    state_var: str | None = None,
) -> list:
    """Checkpoint-side twin of ``engine.discover_hot_keys``: the keys
    holding the most RETAINED STATE rows right now, hottest first — the
    ``hot_keys=`` input of a chunk-halo re-plan, read from a live job's
    committed state instead of a source scan.

    The two rankings answer different questions: source counts rank
    all-time row volume; state rows rank volume inside each key's live
    2·duration horizon — a conversation that went quiet falls off this
    list even if it dominates the table. ``min_share`` filters to keys
    actually holding at least that fraction of all retained rows (same
    contract as discover_hot_keys: non-skewed state → ``[]``, so a
    monitoring loop can wire it in unconditionally). Ties break on the
    key value for determinism.

    Scale shape: the partition-parallel state read + mapInPandas decode
    of :func:`group_state_stats` (one stats row per key), one TopK
    bounded by ``top_n``, one sum for ``min_share`` — no source scan at
    all."""
    import json

    stats = group_state_stats(
        spark, checkpoint, operator_id=operator_id, batch_id=batch_id,
        state_col=state_col, state_var=state_var,
    ).persist()
    try:
        top = (
            stats.orderBy(F.desc("state_rows"), F.asc("key_json"))
            .limit(top_n)
            .collect()
        )
        if min_share > 0.0:
            total = stats.agg(F.sum("state_rows")).first()[0] or 0
            top = [
                r for r in top
                if total and (r["state_rows"] or 0) / total >= min_share
            ]
    finally:
        stats.unpersist()
    return [json.loads(r["key_json"])[key] for r in top]


def audit_state_bound(
    spark: SparkSession,
    checkpoint: str,
    duration: str,
    *,
    operator_id: int | None = None,
    batch_id: int | None = None,
    state_col: str = "value.groupState.blob",
    state_var: str | None = None,
) -> DataFrame:
    """:func:`group_state_stats` plus the retention verdict: the engine
    evicts ordered state to ``youngest − 2·duration`` per key, so every
    key's retained span must satisfy ``span_us ≤ 2·duration``. Adds
    ``allowed_span_us`` and ``ok`` columns; a key whose blob kind has no
    event-time axis (``opaque``/``undecodable``) gets ``ok = false`` so
    an unrecognised layout can never silently pass an audit."""
    from .engine import _interval_us

    allowed = 2 * _interval_us(duration)
    stats = group_state_stats(
        spark, checkpoint, operator_id=operator_id, batch_id=batch_id,
        state_col=state_col, state_var=state_var,
    )
    return stats.withColumn("allowed_span_us", F.lit(allowed)).withColumn(
        "ok", F.coalesce(F.col("span_us") <= F.lit(allowed), F.lit(False))
    )


def assert_state_bounded(
    spark: SparkSession,
    checkpoint: str,
    duration: str,
    *,
    operator_id: int | None = None,
    batch_id: int | None = None,
    state_col: str = "value.groupState.blob",
    state_var: str | None = None,
    sample: int = 20,
) -> int:
    """Raise ``AssertionError`` naming up to ``sample`` offending keys if
    any key's retained state span exceeds ``2·duration``; returns the
    audited key count. The verdict aggregates distributed; only the
    (bounded) violation sample is collected."""
    audited = audit_state_bound(
        spark, checkpoint, duration,
        operator_id=operator_id, batch_id=batch_id, state_col=state_col,
        state_var=state_var,
    )
    agg = audited.agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("bad"),
    ).collect()[0]
    if agg["bad"]:
        rows = audited.filter(~F.col("ok")).limit(sample).collect()
        detail = ", ".join(
            f"{r['key_json']}: kind={r['kind']} span_us={r['span_us']} "
            f"allowed={r['allowed_span_us']}"
            for r in rows
        )
        raise AssertionError(
            f"{agg['bad']}/{agg['n']} keys exceed the retention bound "
            f"2x{duration}: {detail}"
        )
    return int(agg["n"])
