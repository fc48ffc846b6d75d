"""Structured Streaming shell: stateful sliding-window aggregation.

The streaming re-expression of the reference's event loop
(cpp/src/benchmark_core.h:564-638 — admit, insert, evict-by-duration,
query) as an ``applyInPandasWithState`` kernel over the transcripts
stream, keyed by ``conv_id``:

- each micro-batch per key = FiBA ``bulkInsert`` (FiBA.hpp:1866-1918)
  into the :class:`~..operators.ordered.OrderedAggState`;
- watermark/duration expiry = ``bulkEvict`` (FiBA.hpp:1746-1835);
- one output row per input turn = ``query()`` after that turn's insert,
  computed vectorially for the whole batch via the interval fold;
- late rows older than ``youngest − duration`` are dropped — the
  reference's primitive watermark (cpp/src/benchmark_core.h:577).

Scale design (10^12 turns): the only shuffle is the stateful operator's
groupBy; state per key is O(rows inside 2× the duration window) in
Arrow-friendly arrays. Hot-conversation skew: per-turn SLIDING aggregate
outputs are not distributive over sub-streams, so salting alone cannot
split a key — hot keys are instead cut by the event-time CHUNK-HALO
decomposition (``hot_keys``/``chunk_span`` on the sliding streams — one
state group per elapsed span, each self-sufficient via a duration-long
replicated halo; see :func:`_with_time_chunk_halo`), the streaming twin
of the batch chunked-halo kernel (operators/batch.py). DISTRIBUTIVE
tumbling aggregates get real salting via :func:`tumbling_stream_salted`
(aggregate by (key, bucket, window), merge by (key, window)).
"""

from __future__ import annotations

import pickle
import warnings
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.monoids import get_monoid, p_concat, p_take
from ..operators.batch import _OUT_SPARK_TYPE
from ..operators.ordered import OrderedAggState

STATE_SCHEMA = "blob binary"

# Floor on the number of state partitions for the stateful streaming
# operators. The round-4 scaling study (BENCH/BASELINE.md) measured that
# shuffle.partitions below ~4x the task-slot count makes each micro-batch
# a single task wave whose wall time is set by the Zipf-hot state
# partition; raising 8 -> 32 partitions recovered +19% scaling efficiency
# at every parallelism level. Spark freezes the STATE partition count into
# the checkpoint at first query start (it cannot be changed on resume), so
# the floor must be applied before the stream starts.
STATE_PARTITION_FLOOR = 32


def _apply_state_partition_floor(df: DataFrame, floor) -> None:
    """Raise ``spark.sql.shuffle.partitions`` to ``floor`` if it is lower.

    Stateful pandas operators take their state-partition count from the
    session's ``spark.sql.shuffle.partitions`` at query start; a caller
    who tuned it down for small batch jobs would silently freeze an
    under-packed state layout into every checkpoint. Pass
    ``min_state_partitions=None`` to opt out (e.g. when the session conf
    is already the deliberate production setting)."""
    if floor is None:
        return
    spark = df.sparkSession
    try:
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" under some AQE setups
        return
    if cur < floor:
        warnings.warn(
            f"raising spark.sql.shuffle.partitions {cur} -> {floor} for the "
            f"stateful streaming operator (state-partition packing floor; "
            f"pass min_state_partitions=None to keep {cur})",
            stacklevel=3,
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(floor))


def discover_hot_keys(
    df: DataFrame,
    key: str = "conv_id",
    top_n: int = 40,
    min_share: float = 0.0,
) -> list:
    """Find the keys that need chunk-halo decomposition: one batch
    aggregation over a (sample of the) source, hottest first.

    The grouping expression of a streaming query is fixed at query
    start, so ``hot_keys`` is a plan-time input — a production
    deployment reads it from table statistics or a sampled side job;
    this helper IS that side job. ``min_share`` filters to keys that
    actually hold at least that fraction of all rows (e.g.
    ``1 / STATE_PARTITION_FLOOR``): on a non-skewed input it returns
    ``[]`` and the stream stays unchunked, so callers can wire it in
    unconditionally. Ties break on the key value for determinism.

    Scale shape: one groupBy(key).count() over the source (map-side
    combine, one shuffle of |keys| rows), a TopK collect bounded by
    ``top_n``, and — only when ``min_share`` is set — one count over the
    persisted per-key counts, never a second source scan."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    if min_share > 0.0:
        counts = counts.persist()
    try:
        top = (
            counts.orderBy(F.desc("n"), F.asc(key)).limit(top_n).collect()
        )
        if min_share > 0.0:
            total = counts.agg(F.sum("n")).first()[0] or 0
            top = [r for r in top if total and r["n"] / total >= min_share]
    finally:
        if min_share > 0.0:
            counts.unpersist()
    return [r[key] for r in top]


def hot_keys_stream(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    top_n: int = 40,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming twin of :func:`discover_hot_keys`: per tumbling
    ``window``, the ``top_n`` most-active keys — the live feed an
    operator watches to decide when a re-plan with ``hot_keys`` /
    ``chunk_span`` (chunk-halo decomposition) is warranted.

    Two chained stateful aggregations in one streaming query (Spark
    3.5+ multi-stateful-operator watermark propagation): per-(window,
    key) counts, then a bounded per-window top-k (sort_array over a
    collect_list of at most |distinct keys in window| structs — the
    second agg's state is per-key COUNTS, not rows, so it is bounded by
    key cardinality per window, the same bound discover_hot_keys'
    shuffle carries). Output per closed window: ``(win_start, hot_keys
    array<key>, hot_counts array<bigint>)``, hottest first, ties broken
    on the key value for determinism (same rule as discover_hot_keys).

    Append mode: a window's row emits once, when the watermark passes
    its end — exactly the point where a re-plan decision is safe."""
    per_key = (
        df.select(key, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(key))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # sort hottest-first with deterministic key tie-break: sort_array is
    # ascending over (n, key) struct ordering, so sort on (-n, key)
    ranked = per_key.groupBy("window").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct((-F.col("n")).alias("neg_n"), F.col(key)))
            ),
            1,
            top_n,
        ).alias("top")
    )
    return ranked.select(
        F.col("window.start").alias("win_start"),
        F.col(f"top.{key}").alias("hot_keys"),
        F.transform("top", lambda s: -s.neg_n).alias("hot_counts"),
    )


def _ooo_sliding_step(
    st: OrderedAggState,
    pdfs,
    *,
    monoid,
    vcol: str,
    key_name: str,
    key_val,
    ts_col: str,
    id_cols,
    out_col: str,
    dur_us: int,
    int_values: bool,
    emit_col: str | None = None,
    drop_counter=None,
):
    """One micro-batch of the OOO sliding kernel against a key's
    OrderedAggState — shared by the applyInPandasWithState path
    (:func:`sliding_agg_stream`) and the transformWithStateInPandas path
    (:func:`sliding_agg_stream_tws`), so both production APIs run the
    SAME FiBA-style bulkInsert / interval-fold / bulkEvict semantics
    (FiBA.hpp:1866-1918 / 1746-1835).

    ``pdfs`` is the state API's chunk iterator; chunk order within a
    batch is arbitrary, so chunks are gathered before the event-time
    sort and the late-data rule (drop older than youngest − duration,
    benchmark_core.h:577). Per-turn queries fold over state rows in
    [t − duration, t]; the whole batch is inserted before the queries,
    so same-timestamp ties always see each other (batch-boundary-
    independent fixpoint — see the tie-semantics note in
    sliding_agg_stream's history). Eviction retains TWO durations behind
    the youngest: an admitted late row at the admit horizon folds back
    to youngest − 2·duration. Returns the output DataFrame or None.

    ``emit_col``: name of a boolean column marking HALO rows (the
    chunk-halo decomposition's replicas) — they are inserted into state
    like any row, but no output row is emitted for them."""
    from ..operators.kernels import interval_fold

    # numpy throughout: the per-key hot path runs once per (key, batch),
    # and at sf1.0-scale key counts the pandas API overhead (sort_values,
    # __getitem__, boolean-filter, DataFrame construction) was ~2/3 of
    # the measured 1.03 ms/key — extract every column to an ndarray once,
    # do order/filter with argsort/fancy-indexing, and build ONE output
    # frame with copy=False (profiled at ~0.4 ms/key after the rewrite)
    chunks = list(pdfs)
    if not chunks:
        return None
    carried = [ts_col, vcol] + list(id_cols) + ([emit_col] if emit_col else [])
    if len(chunks) > 1:
        arrs = {
            c: np.concatenate([p[c].to_numpy() for p in chunks]) for c in carried
        }
    else:
        arrs = {c: chunks[0][c].to_numpy() for c in carried}
    ts64 = arrs[ts_col].astype("datetime64[us]")
    ts = ts64.astype(np.int64)
    order = np.argsort(ts, kind="stable")
    ts64, ts = ts64[order], ts[order]
    arrs = {c: a[order] for c, a in arrs.items() if c != ts_col}
    vals = arrs[vcol]
    if int_values:
        vals = vals.astype(np.int64)
    youngest = st.youngest()
    if youngest is not None:
        keep = ts >= (int(youngest) - dur_us)
        dropped = int(len(ts) - keep.sum())
        if dropped:
            if drop_counter is not None:
                # operational metric, not data: accumulators are
                # at-least-once under task retries, so this is a
                # monitoring signal (exact in a healthy run)
                drop_counter.add(dropped)
            ts64, ts, vals = ts64[keep], ts[keep], vals[keep]
            arrs = {c: a[keep] for c, a in arrs.items()}
    if len(ts) == 0:
        return None
    st.bulk_insert(ts, monoid.lift(vals))
    lo = np.searchsorted(st.ts, ts - dur_us, side="left")
    hi = np.searchsorted(st.ts, ts, side="right")
    res = monoid.lower(interval_fold(monoid, st.partials, lo, hi))
    st.bulk_evict(int(st.youngest()) - 2 * dur_us - 1)
    if emit_col is not None:
        own = ~arrs[emit_col].astype(bool)
        if not own.any():
            return None
        cols = {key_name: np.full(int(own.sum()), key_val), ts_col: ts64[own]}
        for c in id_cols:
            cols[c] = arrs[c][own]
        cols[out_col] = res[own]
    else:
        cols = {key_name: np.full(len(ts), key_val), ts_col: ts64}
        for c in id_cols:
            cols[c] = arrs[c]
        cols[out_col] = res
    return pd.DataFrame(cols, copy=False)


def _with_time_chunk_halo(
    df: DataFrame,
    key: str,
    ts_col: str,
    hot_keys: Sequence,
    span_us: int,
    dur_us: int,
    ck_col: str = "_ck",
    halo_col: str = "_halo",
) -> DataFrame:
    """Event-time chunk-halo decomposition for HOT keys — the streaming
    twin of the batch chunked-halo (operators/batch.py
    ``sliding_rows_kernel_parallel``).

    Per-key ordered sliding state is a serial atom: ONE conversation
    carrying 14% of all rows bounds the whole cluster's makespan (the
    measured ceiling in BENCH/BASELINE.md's skew model). For keys listed
    in ``hot_keys``, time is cut into spans of ``span_us``; a row is
    OWNED by chunk ``floor(ts/span)`` under the composite group key
    ``(key, _ck)``, and rows in the last ``dur_us`` of a span are
    REPLICATED (``_halo=true``) into the next chunk so every owned row's
    ``[ts − duration, ts]`` window is complete inside its own chunk.
    Each (key, chunk) is then an independent state partition: a 10^9-turn
    conversation becomes span-many parallel state groups instead of one
    straggler, at a replication cost of ``duration/span``. Cold keys get
    the sentinel chunk −1 — one group per key, exactly the unchunked
    plan. Exact for every monoid (the fold never crosses a chunk's
    replicated horizon); the only behavioural delta is the late-row
    admission heuristic (drop older than youngest − duration), which is
    evaluated per chunk and therefore admits ≥ what the whole-key state
    admits — strictly closer to the batch recompute.

    Implemented as one generator (explode of 1–2 per-row chunk
    assignments), not a self-union: the stream source is scanned ONCE
    per micro-batch."""
    us = F.unix_micros(F.col(ts_col))
    hot = F.col(key).isin(list(hot_keys))
    ck = F.floor(us / F.lit(span_us)).cast("long")
    cold = F.lit(-1).cast("long")
    no = F.lit(False)

    def pair(c, h):
        return F.struct(c.alias("c"), h.alias("h"))

    assign = (
        F.when(
            hot & (us % F.lit(span_us) >= F.lit(span_us - dur_us)),
            F.array(pair(ck, no), pair(ck + 1, F.lit(True))),
        )
        .when(hot, F.array(pair(ck, no)))
        .otherwise(F.array(pair(cold, no)))
    )
    tmp = "swag_assign" if ck_col[0] != "_" else "_a"
    return (
        df.withColumn(tmp, F.explode(assign))
        .withColumn(ck_col, F.col(f"{tmp}.c").cast("long"))
        .withColumn(halo_col, F.col(f"{tmp}.h"))
        .drop(tmp)
    )


def _chunk_timeout(state: GroupState, ck, span_us: int, dur_us: int) -> None:
    """Arm event-time expiry for a finished hot chunk's state: once the
    watermark passes chunk-end + 2·duration no late row can target the
    chunk, so its state is dead weight — without this, chunked hot keys
    would accrete one state entry per elapsed span forever. Cold keys
    (sentinel chunk −1) keep the unchunked lifetime."""
    if ck is None or int(ck) < 0:
        return
    end_ms = ((int(ck) + 1) * span_us + 2 * dur_us) // 1000
    try:
        wm = state.getCurrentWatermarkMs()
    except Exception:
        wm = 0
    # Spark requires a timeout strictly beyond the current watermark
    state.setTimeoutTimestamp(max(end_ms, wm + 1))


def _idle_timeout(state: GroupState, youngest_us, dur_us: int) -> None:
    """Arm idle-key GC: once the event-time watermark strictly passes
    ``youngest + duration``, every future in-watermark row's window
    ``[ts − duration, ts]`` starts after the retained horizon (Spark's
    pre-stateful watermark filter guarantees ts ≥ wm > youngest +
    duration), so removing the WHOLE key cannot change any future
    emission. This is what bounds total state by ACTIVE conversations
    instead of every conversation ever seen — at 10^12 turns the
    difference between O(live convs) and O(all convs) state. The fired
    timeout lands in the caller's ``hasTimedOut`` branch, which
    removes the state."""
    if youngest_us is None:
        return
    deadline_ms = (int(youngest_us) + dur_us) // 1000 + 1
    try:
        wm = state.getCurrentWatermarkMs()
    except Exception:
        wm = 0
    state.setTimeoutTimestamp(max(deadline_ms, wm + 1))


def sliding_agg_stream(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    monoid_name: str = "sum",
    duration: str = "10 minutes",
    watermark: str = "1 minute",
    out_col: str = "wagg",
    id_cols: Sequence[str] = (),
    int_values: bool = False,
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
    hot_keys: Sequence | None = None,
    chunk_span: str | None = None,
    dropped_late_counter=None,
    emit_filter: str | None = None,
) -> DataFrame:
    """Per-turn sliding event-time aggregate over a streaming DataFrame.

    ``emit_filter``: optional SQL boolean over the SOURCE columns (plus
    ``input_file_name()`` for file sources) — rows where it is false (or
    null) are STATE-ONLY: they warm the per-key ordered state like any
    row but never emit an output row (the halo-replica mechanism made
    caller-addressable). This is the zero-duplicate RE-PLAN recipe: a
    chunk-halo re-plan changes the state grouping key, so the old
    checkpoint is unusable by design — instead, start the new plan with
    a FRESH checkpoint over the full source and
    ``emit_filter = "rows the old run has NOT already emitted"`` (e.g.
    ``input_file_name() like '%/c2/%'`` after the old run drained c0/c1,
    or ``ts >= timestamp'...'`` for time-partitioned sources). The
    replayed rows rebuild window state across the cutover; only new rows
    emit, so old-sink ∪ new-sink equals the uninterrupted run exactly.
    Bound the replay by also filtering the source to
    ``ts >= cutover − duration`` (plain pushed-down scan filter).

    ``dropped_late_counter``: optional ``sc.accumulator(0)`` — the
    kernel adds every row the per-key admission rule rejects (older
    than the key's youngest − duration, benchmark_core.h:577), the
    late-data metric an operator alerts on. Spark's own
    ``numRowsDroppedByWatermark`` only counts rows behind the GLOBAL
    watermark; this counts the engine's stricter per-key drops.
    Accumulators are at-least-once under task retries: a monitoring
    signal (exact in a healthy run), never data.

    State lifetime: within a live key, ordered state is evicted to
    ``youngest − 2·duration`` (covers the per-key admission rule's
    ``youngest − duration`` lookback); a key that goes QUIET is removed
    entirely by idle-key GC (:func:`_idle_timeout` — an event-time
    timeout at ``youngest + duration``, past which Spark's watermark
    filter makes the retained rows unreachable by any future window).
    Total state is therefore O(conversations live inside the watermark
    horizon), not O(conversations ever seen) — the difference between
    a bounded and an ever-growing store at 10^12 turns. The cleanup is
    exact, not heuristic (tests/test_idle_gc.py pins byte-identical
    revival emissions); a returning conversation simply starts fresh
    state, which is correct because its new windows cannot reach the
    dropped rows.

    Emits one row per turn: (key, ts, *id_cols, agg of the key's rows
    with ts ∈ [ts − duration, ts] seen so far, in event-time order within
    each micro-batch). ``id_cols`` ride along from the arriving rows —
    they are never inserted into state, only aligned with the per-row
    answers, so a driver/oracle can join on a stable row identity even
    under duplicate timestamps. ``int_values=True`` runs the monoid over
    exact int64 (the cents discipline: bit-identical to a SQL oracle).

    ``hot_keys`` + ``chunk_span``: chunk-halo decomposition for skewed
    keys (see :func:`_with_time_chunk_halo`) — the listed keys' state and
    work spread over one group per elapsed ``chunk_span`` instead of one
    serial group, with expired chunks dropped by event-time timeout.
    ``chunk_span`` must be ≥ ``duration`` (halo replicas come only from
    the immediately preceding chunk)."""
    dur_us = _interval_us(duration)
    monoid = get_monoid(monoid_name, np.int64 if int_values else np.float64)
    chunked = bool(hot_keys) and chunk_span is not None
    muted = emit_filter is not None
    suppress = chunked or muted
    span_us = _interval_us(chunk_span) if chunk_span is not None else None
    if chunked and span_us < dur_us:
        raise ValueError(
            f"chunk_span ({chunk_span}) must be >= duration ({duration}): "
            "the halo only replicates from the immediately preceding chunk"
        )

    id_cols = [c for c in id_cols if c not in (key, ts_col)]
    out_type = _OUT_SPARK_TYPE[monoid_name]
    key_t = df.schema[key].dataType.simpleString()
    id_ts = [df.schema[c].dataType.simpleString() for c in id_cols]
    out_schema = ", ".join(
        [f"{key} {key_t}", f"{ts_col} timestamp"]
        + [f"{c} {t}" for c, t in zip(id_cols, id_ts)]
        + [f"{out_col} {out_type}"]
    )

    def fn(
        key_tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # chunk expiry (chunked hot keys) or idle-key GC: either
            # armed deadline guarantees no admissible future row can
            # still see this state
            state.remove()
            return
        if state.exists:
            st = OrderedAggState.loads(bytes(state.get[0]), monoid)
        else:
            st = OrderedAggState(monoid)
        out = _ooo_sliding_step(
            st, pdfs, monoid=monoid, vcol="__v", key_name=key,
            key_val=key_tuple[0], ts_col=ts_col, id_cols=id_cols,
            out_col=out_col, dur_us=dur_us, int_values=int_values,
            emit_col="_halo" if suppress else None,
            drop_counter=dropped_late_counter,
        )
        state.update((bytearray(st.dumps()),))
        if chunked and key_tuple[1] is not None and int(key_tuple[1]) >= 0:
            _chunk_timeout(state, key_tuple[1], span_us, dur_us)
        else:
            _idle_timeout(state, st.youngest(), dur_us)
        if out is not None:
            yield out

    _apply_state_partition_floor(df, min_state_partitions)
    # prune BEFORE the stateful shuffle: applyInPandasWithState hands the
    # UDF whole rows, so Catalyst cannot column-prune through it — without
    # this select the full payload (the text column dominates the
    # transcripts stream) rides the hash exchange AND the Arrow bridge,
    # turning a kernel-bound operator into a bandwidth-bound one (measured
    # ~6x less stream bytes on the 16M-turn scaling job)
    prepared = df.withColumn("__v", F.expr(value_expr))
    if muted:
        # evaluate on the SOURCE row (input_file_name()/payload columns
        # are gone after the prune); null-safe: null → state-only
        prepared = prepared.withColumn(
            "_mute", ~F.coalesce(F.expr(emit_filter), F.lit(False))
        )
    prepared = prepared.select(
        key, ts_col, *id_cols, "__v", *(["_mute"] if muted else [])
    )
    if chunked:
        prepared = _with_time_chunk_halo(
            prepared, key, ts_col, hot_keys, span_us, dur_us
        )
    if muted:
        if chunked:
            prepared = prepared.withColumn(
                "_halo", F.col("_halo") | F.col("_mute")
            ).drop("_mute")
        else:
            prepared = prepared.withColumnRenamed("_mute", "_halo")
    prepared = prepared.withWatermark(ts_col, watermark)
    group_cols = [key, "_ck"] if chunked else [key]
    return (
        prepared.groupBy(*group_cols)
        .applyInPandasWithState(
            fn, out_schema, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sliding_agg_stream_multi(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    monoids: Sequence[str] = ("sum",),
    durations: Sequence[str] = ("10 minutes",),
    watermark: str = "1 minute",
    int_values: bool = False,
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
    value_exprs: Sequence[str] | None = None,
    hot_keys: Sequence | None = None,
    chunk_span: str | None = None,
    emit_filter: str | None = None,
) -> DataFrame:
    """WINDOW-SHARED multi-aggregate per-turn sliding stream — the
    reference's shared-window mode (cpp/src/benchmark_core.h:472-562:
    one maintained ordered state answers range queries for EVERY window
    size) lifted into the streaming shell, crossed with multi-monoid
    fusion: per key, ONE ordered timestamp spine per monoid serves ALL
    durations via range queries, and all monoids share one stateful
    operator (one shuffle, one state-store roundtrip, one Arrow bridge
    per key per micro-batch).

    Emits one row per turn with ``len(monoids) × len(durations)``
    aggregate columns named ``w{monoid}_{i}`` (i = duration index).

    Scale rationale: the per-key-per-batch framework cost
    (state (de)serialization, Arrow group slicing, state-store commit)
    is FIXED per key; a production job computing K aggregates as K
    separate streams pays it K times and shuffles the stream K times.
    Fused, arithmetic intensity per streamed byte rises ~K-fold, which
    is also what keeps the operator compute-bound instead of
    bandwidth-bound at high core counts (see BENCH/BASELINE.md round-4
    streaming scaling study). Late-data admission and eviction use the
    LONGEST duration, so every window's query range is always fully
    retained.

    ``hot_keys`` + ``chunk_span``: chunk-halo decomposition for skewed
    keys (see :func:`_with_time_chunk_halo`); the halo span uses the
    LONGEST duration, so every window's range stays complete within its
    chunk, and expired chunk state is dropped by event-time timeout.

    ``emit_filter``: state-only row predicate for zero-duplicate
    re-plans — see :func:`sliding_agg_stream`'s docstring for the
    recipe (fresh checkpoint + bounded replay + suppression of rows the
    old run already emitted).

    ``value_exprs`` (one SQL expression per monoid) lifts a DIFFERENT
    input per aggregate — e.g. ``sum(length(text))`` + ``max(turn_idx)``
    + ``mincount(length(tool))`` fused in the one stateful operator, the
    shape of the reference's twin/shared benchmark modes
    (cpp/src/benchmark_core.h:472-562) where each aggregator has its own
    lifted input. Identical expressions are deduplicated to one shuffled
    column; when omitted, every monoid shares ``value_expr``. With
    duplicate monoid names the output columns are disambiguated as
    ``w{mi}_{name}_{i}``."""
    dur_us = [_interval_us(d) for d in durations]
    max_dur = max(dur_us)
    chunked = bool(hot_keys) and chunk_span is not None
    muted = emit_filter is not None
    suppress = chunked or muted
    span_us = _interval_us(chunk_span) if chunk_span is not None else None
    if chunked and span_us < max_dur:
        raise ValueError(
            f"chunk_span ({chunk_span}) must be >= the longest duration: "
            "the halo only replicates from the immediately preceding chunk"
        )
    ms = [
        get_monoid(name, np.int64 if int_values else np.float64)
        for name in monoids
    ]
    if value_exprs is None:
        value_exprs = [value_expr] * len(monoids)
    if len(value_exprs) != len(monoids):
        raise ValueError(
            f"value_exprs has {len(value_exprs)} entries for "
            f"{len(monoids)} monoids"
        )
    # dedupe identical expressions: one shuffled/state column per distinct
    # lift, monoid mi reads column __v{expr_slot[mi]}
    slot_of_expr: dict[str, int] = {}
    expr_slot = []
    for e in value_exprs:
        if e not in slot_of_expr:
            slot_of_expr[e] = len(slot_of_expr)
        expr_slot.append(slot_of_expr[e])
    names_unique = len(set(monoids)) == len(monoids)
    out_cols = [
        (
            f"w{name}_{i}" if names_unique else f"w{mi}_{name}_{i}",
            mi,
            i,
        )
        for mi, name in enumerate(monoids)
        for i in range(len(dur_us))
    ]
    key_t = df.schema[key].dataType.simpleString()
    out_schema = ", ".join(
        [f"{key} {key_t}", f"{ts_col} timestamp"]
        + [f"{c} {_OUT_SPARK_TYPE[monoids[mi]]}" for c, mi, _ in out_cols]
    )

    def fn(
        key_tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from ..operators.kernels import interval_fold

        if state.hasTimedOut:
            # chunk expiry or idle-key GC (see _idle_timeout)
            state.remove()
            return
        if state.exists:
            blobs = pickle.loads(bytes(state.get[0]))
            sts = [
                OrderedAggState.loads(b, m) for b, m in zip(blobs, ms)
            ]
        else:
            sts = [OrderedAggState(m) for m in ms]
        outs = []
        chunks = list(pdfs)
        gathered = pd.concat(chunks) if len(chunks) > 1 else (
            chunks[0] if chunks else None
        )
        for pdf in ([gathered] if gathered is not None else []):
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            youngest = sts[0].youngest()
            if youngest is not None:
                keep = ts >= (int(youngest) - max_dur)
                pdf, ts = pdf[keep], ts[keep]
            if len(ts) == 0:
                continue
            slot_vals = []
            for s in range(len(slot_of_expr)):
                v = pdf[f"__v{s}"].to_numpy()
                slot_vals.append(v.astype(np.int64) if int_values else v)
            own = (
                ~pdf["_halo"].to_numpy()
                if suppress
                else np.ones(len(pdf), dtype=bool)
            )
            cols = {key: key_tuple[0], ts_col: pdf[ts_col].to_numpy()[own]}
            for mi, (m, st) in enumerate(zip(ms, sts)):
                st.bulk_insert(ts, m.lift(slot_vals[expr_slot[mi]]))
            hi = np.searchsorted(sts[0].ts, ts, side="right")
            los = [
                np.searchsorted(sts[0].ts, ts - d, side="left")
                for d in dur_us
            ]
            for c, mi, di in out_cols:
                m, st = ms[mi], sts[mi]
                cols[c] = m.lower(
                    interval_fold(m, st.partials, los[di], hi)
                )[own]
            if own.any():
                outs.append(pd.DataFrame(cols))
            horizon = int(sts[0].youngest()) - 2 * max_dur - 1
            for st in sts:
                st.bulk_evict(horizon)
        state.update(
            (bytearray(pickle.dumps([st.dumps() for st in sts])),)
        )
        if chunked and key_tuple[1] is not None and int(key_tuple[1]) >= 0:
            _chunk_timeout(state, key_tuple[1], span_us, max_dur)
        else:
            _idle_timeout(state, sts[0].youngest(), max_dur)
        if outs:
            yield pd.concat(outs)

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle (see sliding_agg_stream): one
    # column per DISTINCT lift expression rides the exchange
    prepared = df
    for expr, s in slot_of_expr.items():
        prepared = prepared.withColumn(f"__v{s}", F.expr(expr))
    if muted:
        # see sliding_agg_stream's emit_filter note: evaluated on the
        # SOURCE row, null-safe, state-only when false
        prepared = prepared.withColumn(
            "_mute", ~F.coalesce(F.expr(emit_filter), F.lit(False))
        )
    prepared = prepared.select(
        key, ts_col, *[f"__v{s}" for s in range(len(slot_of_expr))],
        *(["_mute"] if muted else []),
    )
    if chunked:
        prepared = _with_time_chunk_halo(
            prepared, key, ts_col, hot_keys, span_us, max_dur
        )
    if muted:
        if chunked:
            prepared = prepared.withColumn(
                "_halo", F.col("_halo") | F.col("_mute")
            ).drop("_mute")
        else:
            prepared = prepared.withColumnRenamed("_mute", "_halo")
    prepared = prepared.withWatermark(ts_col, watermark)
    group_cols = [key, "_ck"] if chunked else [key]
    return prepared.groupBy(*group_cols).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sliding_count_stream(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    value_expr: str = "length(text)",
    monoid_name: str = "sum",
    w: int = 100,
    watermark: str = "1 minute",
    out_col: str = "wagg",
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
) -> DataFrame:
    """COUNT-based sliding window over a stream — the reference's FIFO
    window (evict-oldest when size == w, cpp/src/benchmark_core.h:111-117),
    which Spark Structured Streaming has no primitive for: count windows
    never expire by watermark, so state is bounded by w rows per key
    instead (the same O(w) bound the reference's aggregators carry).

    Emits one row per turn: the aggregate of the key's last ``w`` turns in
    ``order_col`` order seen so far. Within a micro-batch rows are applied
    in (ts, order_col) order; the persistent state is the vectorized
    SWAG kernel itself (SubtractOnEvict / Two-Stacks by monoid), pickled
    into the state store between batches.
    """
    monoid = get_monoid(monoid_name)
    out_type = _OUT_SPARK_TYPE[monoid_name]
    out_schema = (
        f"{key} string, {ts_col} timestamp, {order_col} int, {out_col} {out_type}"
    )

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        from ..operators.kernels import SlidingCountWindow

        if state.exists:
            # versioned dict-of-arrays state (not a pickled kernel object):
            # refactors of the kernel classes can't corrupt checkpoint
            # restores — from_state_dict rebuilds fresh kernels
            kernel = SlidingCountWindow.from_state_dict(
                pickle.loads(bytes(state.get[0])), monoid
            )
        else:
            kernel = SlidingCountWindow(monoid, w)
        chunks = list(pdfs)  # gather: chunk order within a batch is arbitrary
        gathered = pd.concat(chunks) if len(chunks) > 1 else (
            chunks[0] if chunks else None
        )
        for pdf in ([gathered] if gathered is not None else []):
            pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
            res = kernel.process(pdf["__v"].to_numpy())
            yield pd.DataFrame(
                {
                    key: key_tuple[0],
                    ts_col: pdf[ts_col].to_numpy(),
                    order_col: pdf[order_col].to_numpy(),
                    out_col: res,
                }
            )
        state.update(
            (bytearray(pickle.dumps(kernel.state_dict(), protocol=pickle.HIGHEST_PROTOCOL)),)
        )

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle (see sliding_agg_stream)
    prepared = (
        df.withColumn("__v", F.expr(value_expr))
        .select(key, ts_col, order_col, "__v")
        .withWatermark(ts_col, watermark)
    )
    return prepared.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


_PANES_NEG = -(2**62)


def _panes_step(
    d: dict,
    pdf: pd.DataFrame | None,
    wm_us: int,
    *,
    monoid,
    ts_col: str,
    size_us: int,
    slide_us: int,
    int_values: bool,
    drop_counter=None,
    pre_col: str | None = None,
    early: bool = False,
) -> tuple[dict | None, dict]:
    """One micro-batch of the pane-sliced sliding-window kernel against a
    key's pane state ``d`` — pure function (no Spark objects) shared by
    :func:`sliding_panes_stream` and the unit tests, the same factoring
    as :func:`_ooo_sliding_step`.

    ``d`` holds ``pane_ts`` (sorted int64 µs pane starts), ``partials``
    (one monoid partial per pane), and ``last_emit`` (largest window end
    already closed). Returns ``(emitted-or-None, new_state)`` where
    ``emitted`` maps ``window_start``/``window_end`` (int64 µs) to the
    lowered per-window values.

    State is bounded by PANES, not rows: after eviction every retained
    pane still feeds an unemitted window, so the pane count is at most
    ``size/slide`` plus the watermark lag in slides — independent of the
    per-key turn rate (the contrast with the per-turn streams' O(rows in
    2×duration) ordered state)."""
    dm = {"pane_ts": d["pane_ts"], "partials": [d["partials"]],
          "last_emit": d["last_emit"]}
    per_size, dm = _panes_multi_step(
        dm, pdf, wm_us, monoids=[monoid], val_cols=["__v"], ts_col=ts_col,
        sizes_us=[size_us], slide_us=slide_us, int_flags=[int_values],
        drop_counter=drop_counter, pre_col=pre_col, early=early,
    )
    emitted = None
    if per_size[0] is not None:
        e = per_size[0]
        emitted = {
            "window_start": e["window_start"],
            "window_end": e["window_end"],
            "values": e["values"][0],
        }
        if "final" in e:
            emitted["final"] = e["final"]
    return emitted, {
        "pane_ts": dm["pane_ts"], "partials": dm["partials"][0],
        "last_emit": dm["last_emit"], "v": 1,
    }


def _panes_multi_step(
    d: dict,
    pdf: pd.DataFrame | None,
    wm_us: int,
    *,
    monoids: list,
    val_cols: list[str],
    ts_col: str,
    sizes_us: list[int],
    slide_us: int,
    int_flags: list[bool],
    drop_counter=None,
    pre_col: str | None = None,
    early: bool = False,
) -> tuple[list[dict | None], dict]:
    """The SHARED-PANE generalization of :func:`_panes_step`: N monoid
    specs × K window sizes over ONE slide-aligned pane layer — the
    pane-space form of the engine's window sharing (Scotty's slice
    sharing, Traub et al. EDBT 2018; the reference's twin/shared
    benchmark discipline, cpp/src/benchmark_core.h:472-562).

    ``pre_col``: the MAP-SIDE PRE-COMBINE ingestion path — rows are
    per-(key, pane) partials produced by :func:`_pane_precombine`
    upstream of the stateful shuffle (``ts_col`` = pane start,
    ``pre_col`` = pickled list of one single-row partial dict per
    spec), so ingestion stacks partials instead of lifting raw values.
    Commutative monoids only (cross-partition intra-pane fold order is
    arbitrary); ``drop_counter`` then counts dropped PARTIAL rows.

    Every arriving row folds into exactly one pane per spec; a closing
    window of ANY size folds its panes through the disjoint-sparse-table
    interval fold, so K sizes cost K interval folds over the same pane
    array, not K ingestion passes. ``d`` holds the shared ``pane_ts``,
    ``partials`` (one partial dict per spec), and the scalar
    ``last_emit`` (all sizes share the slide, hence the emission
    frontier). The late rule and pane eviction key to ``max(sizes_us)``:
    a pane whose largest window has closed feeds nothing; a late row
    whose pane still feeds a larger open window folds in harmlessly —
    the smaller sizes' closed windows can never re-emit.

    Returns ``(per_size, new_state)`` where ``per_size[k]`` is None or
    ``{"window_start", "window_end", "values": [one array per spec]}``.

    ``early=True`` (the Beam-style early-firing trigger / Scotty's eager
    emission) additionally emits a PROVISIONAL row for every still-OPEN
    nonempty window whenever the key ingested rows this batch — the
    current fold of the panes seen so far, re-emitted (and superseded)
    on every later batch that changes it, with the closure row as the
    single authoritative final. Each ``per_size[k]`` then carries a
    ``"final"`` bool array (True = watermark closure, exactly once;
    False = provisional). Timeout-only invocations emit finals only
    (nothing changed, nothing to re-fire). Downstream must treat
    (key, window) as upsert-keyed — the operator is for update-capable
    sinks, not the exactly-once append sink.
    """
    from ..operators.kernels import interval_fold

    pane_ts = d["pane_ts"]
    partials = d["partials"]
    last_emit = d["last_emit"]
    max_size = max(sizes_us)
    changed = False

    if pdf is not None and len(pdf):
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        pane = ts - ts % slide_us
        # late rule: a row whose LAST window (pane start + max size) has
        # already closed cannot reach any unemitted window of any size
        keep = (pane + max_size) > last_emit
        if pre_col is not None:
            kept_blobs = pdf[pre_col].tolist()
        else:
            kept_cols = [pdf[c].to_numpy() for c in val_cols]
        if not keep.all():
            if drop_counter is not None:
                drop_counter.add(int(len(keep) - keep.sum()))
            pane = pane[keep]
            if pre_col is not None:
                kept_blobs = [
                    b for b, k in zip(kept_blobs, keep) if k
                ]
            else:
                kept_cols = [v[keep] for v in kept_cols]
        if len(pane):
            changed = True
            change = np.flatnonzero(np.diff(pane)) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pane)]))
            bpane = pane[starts]
            # merge batch panes into state panes (state first: earlier
            # arrivals fold left of later ones inside a pane); the
            # hit/fresh geometry is shared by every spec
            pos = np.searchsorted(pane_ts, bpane)
            hit = np.zeros(len(bpane), dtype=bool)
            if len(pane_ts):
                in_rng = pos < len(pane_ts)
                hit[in_rng] = pane_ts[pos[in_rng]] == bpane[in_rng]
            hit_idx = np.flatnonzero(hit)
            fresh = np.flatnonzero(~hit)
            if pre_col is not None:
                loaded = [pickle.loads(bytes(b)) for b in kept_blobs]
                kept_cols = [
                    p_concat(*[row[i] for row in loaded])
                    for i in range(len(monoids))
                ]
            new_partials = []
            for m, vals, int_v, sp in zip(monoids, kept_cols, int_flags,
                                          partials):
                if pre_col is not None:
                    bp = interval_fold(m, vals, starts, ends)
                else:
                    if int_v:
                        vals = vals.astype(np.int64)
                    bp = interval_fold(m, m.lift(vals), starts, ends)
                if len(hit_idx):
                    upd = pos[hit_idx]
                    comb = m.combine(p_take(sp, upd), p_take(bp, hit_idx))
                    for k in sp:
                        sp[k][upd] = comb[k]
                if len(fresh):
                    sp = p_concat(sp, p_take(bp, fresh))
                new_partials.append(sp)
            partials = new_partials
            if len(fresh):
                all_ts = np.concatenate((pane_ts, bpane[fresh]))
                order = np.argsort(all_ts, kind="mergesort")
                pane_ts = all_ts[order]
                partials = [p_take(sp, order) for sp in partials]

    per_size: list[dict | None] = [None] * len(sizes_us)
    emit_hi = wm_us - wm_us % slide_us  # largest closable window end
    if len(pane_ts) and emit_hi > last_emit:
        for k_i, size_us in enumerate(sizes_us):
            n_panes = size_us // slide_us
            # candidate ends come from the panes themselves (never
            # enumerate a long quiet gap): pane p feeds size-W windows
            # ending p+slide..p+W
            cand = np.unique(
                (
                    pane_ts[:, None]
                    + np.arange(1, n_panes + 1, dtype=np.int64) * slide_us
                ).ravel()
            )
            cand = cand[(cand > last_emit) & (cand <= emit_hi)]
            if len(cand):
                lo = np.searchsorted(pane_ts, cand - size_us, side="left")
                hi = np.searchsorted(pane_ts, cand, side="left")
                nz = lo < hi  # empty windows emit nothing
                cand, lo, hi = cand[nz], lo[nz], hi[nz]
            if len(cand):
                per_size[k_i] = {
                    "window_start": cand - size_us,
                    "window_end": cand,
                    "values": [
                        m.lower(interval_fold(m, sp, lo, hi))
                        for m, sp in zip(monoids, partials)
                    ],
                }
    if emit_hi > last_emit:
        last_emit = emit_hi
    if len(pane_ts):
        live = (pane_ts + max_size) > last_emit
        if not live.all():
            keep_idx = np.flatnonzero(live)
            pane_ts = pane_ts[keep_idx]
            partials = [p_take(sp, keep_idx) for sp in partials]
    if early:
        for k_i in range(len(sizes_us)):
            if per_size[k_i] is not None:
                per_size[k_i]["final"] = np.ones(
                    len(per_size[k_i]["window_end"]), dtype=bool
                )
        # provisional rows for every still-open nonempty window, only
        # when this batch changed the key's panes (eviction never drops
        # a pane feeding an open window: pane + size >= end > last_emit)
        if changed and len(pane_ts):
            for k_i, size_us in enumerate(sizes_us):
                n_panes = size_us // slide_us
                cand = np.unique(
                    (
                        pane_ts[:, None]
                        + np.arange(1, n_panes + 1, dtype=np.int64)
                        * slide_us
                    ).ravel()
                )
                cand = cand[cand > last_emit]
                lo = np.searchsorted(pane_ts, cand - size_us, side="left")
                hi = np.searchsorted(pane_ts, cand, side="left")
                nz = lo < hi
                cand, lo, hi = cand[nz], lo[nz], hi[nz]
                if not len(cand):
                    continue
                prov_vals = [
                    m.lower(interval_fold(m, sp, lo, hi))
                    for m, sp in zip(monoids, partials)
                ]
                fin = per_size[k_i]
                if fin is None:
                    per_size[k_i] = {
                        "window_start": cand - size_us,
                        "window_end": cand,
                        "values": prov_vals,
                        "final": np.zeros(len(cand), dtype=bool),
                    }
                else:
                    per_size[k_i] = {
                        "window_start": np.concatenate(
                            (fin["window_start"], cand - size_us)
                        ),
                        "window_end": np.concatenate(
                            (fin["window_end"], cand)
                        ),
                        "values": [
                            np.concatenate((a, b))
                            for a, b in zip(fin["values"], prov_vals)
                        ],
                        "final": np.concatenate(
                            (fin["final"], np.zeros(len(cand), dtype=bool))
                        ),
                    }
    return per_size, {
        "pane_ts": pane_ts, "partials": partials, "last_emit": last_emit,
        "v": 1,
    }


def _pane_precombine(
    df: DataFrame,
    *,
    key: str,
    ts_col: str,
    val_cols: list[str],
    monoids: list,
    int_flags: list[bool],
    slide_us: int,
    pre_col: str = "__pre",
) -> DataFrame:
    """MAP-SIDE pane pre-combine: fold each upstream partition's rows into
    ONE partial per (key, pane, spec) BEFORE the stateful shuffle — the
    hand-built partial aggregation Catalyst cannot inject through a
    pandas-state operator (it cannot see that the fold is decomposable).
    This is the original point of pane slicing (Li et al., "No pane, no
    gain", SIGMOD Record 34(1) 2005 §3: panes make the window fold
    partially aggregable upstream): a Zipf-hot key's serial per-key work
    collapses from O(its rows) to O(live panes × upstream Arrow batches
    — one batch per ≤ ``arrow.maxRecordsPerBatch`` rows per partition),
    and the stateful shuffle moves pane partials, not turns.

    Commutative monoids only (cross-partition intra-pane fold order is
    arbitrary) — raises on a non-commutative spec. Each output row is
    ``(key, ts, pre_col)`` where ``ts`` is the MAX raw event time inside
    the group — so the downstream watermark advances exactly as it would
    on the raw stream (max of maxes = max), while the kernel's
    ``ts − ts % slide`` still lands the row in its pane — and ``pre_col``
    is the pickled list of one single-row partial dict per spec, the
    format :func:`_panes_multi_step` ingests via ``pre_col``.
    """
    from ..operators.kernels import interval_fold

    for m in monoids:
        if not m.commutative:
            raise ValueError(
                f"pre_combine requires commutative monoids; {m.name} is not"
            )
    key_t = df.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_t}, {ts_col} timestamp, {pre_col} binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ts = pdf[ts_col].to_numpy().astype(
                "datetime64[us]"
            ).astype(np.int64)
            pane = ts - ts % slide_us
            keys = pdf[key].to_numpy()
            k_codes = pd.factorize(keys)[0]
            order = np.lexsort((pane, k_codes))
            ts, pane, keys = ts[order], pane[order], keys[order]
            k_codes = k_codes[order]
            newg = np.flatnonzero(
                (k_codes[1:] != k_codes[:-1]) | (pane[1:] != pane[:-1])
            ) + 1
            starts = np.concatenate(([0], newg))
            ends = np.concatenate((newg, [len(pane)]))
            bps = []
            for m, c, int_v in zip(monoids, val_cols, int_flags):
                vals = pdf[c].to_numpy()[order]
                if int_v:
                    vals = vals.astype(np.int64)
                bps.append(interval_fold(m, m.lift(vals), starts, ends))
            blobs = [
                pickle.dumps(
                    [p_take(bp, [g]) for bp in bps],
                    protocol=pickle.HIGHEST_PROTOCOL,
                )
                for g in range(len(starts))
            ]
            yield pd.DataFrame(
                {
                    key: keys[starts],
                    ts_col: np.maximum.reduceat(ts, starts).astype(
                        "datetime64[us]"
                    ),
                    pre_col: blobs,
                }
            )

    return df.mapInPandas(fn, out_schema)


def _panes_empty_state(monoid) -> dict:
    return {
        "pane_ts": np.empty(0, np.int64),
        "partials": monoid.identity(0),
        "last_emit": _PANES_NEG,
        "v": 1,
    }


def sliding_panes_stream(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    monoid_name: str = "sum",
    size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 minute",
    out_col: str = "wagg",
    int_values: bool = False,
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
    pre_combine: bool = False,
    dropped_late_counter=None,
    early: bool = False,
) -> DataFrame:
    """Pane-sliced sliding windows (size ``W``, slide ``p`` — the
    Flink-style sliding window) with BOUNDED per-key state: one monoid
    partial per slide-aligned pane, so state is O(W/p + watermark-lag/p)
    regardless of the key's turn rate.

    The per-turn streams (:func:`sliding_agg_stream`) answer a window per
    TURN — the reference's continuous event loop
    (cpp/src/benchmark_core.h:564-638) — and must therefore retain the
    raw rows inside 2× the duration. For rollup windows (hours-to-days
    spans at per-slide granularity, the dashboard shape of a 10^12-turn
    deployment) pane slicing (Li et al., "No pane, no gain", SIGMOD
    Record 34(1) 2005; generalized in Traub et al., Scotty, EDBT 2018)
    is the scale answer: each arriving row folds into exactly ONE pane
    partial, a closing window folds its ≤ W/p panes in event-time order
    through the disjoint-sparse-table interval fold, and a hot
    conversation's state no longer grows with its rate.

    Emission (append mode): window ``[e−W, e)`` emits exactly once, when
    the event-time watermark first reaches ``e`` — late in-watermark
    rows arriving before closure are included; rows for already-closed
    windows are dropped (and counted via ``dropped_late_counter``).
    Windows containing no rows emit nothing. Keys that go QUIET still
    close their windows: an event-time timeout re-enters the kernel when
    the global watermark passes the oldest open window end, so closure
    never waits for the key's next row.

    Exactness: cross-pane fold order is event time, so every commutative
    monoid is exact under arbitrary in-watermark disorder; a
    non-commutative monoid (dfa, adjsum, maxrun, trend, …) is exact when
    the key's rows arrive pane-contiguously in event-time order
    (in-batch disorder is sorted away; only cross-batch disorder WITHIN
    one pane reorders that pane's intra-pane fold).

    ``pre_combine=True`` inserts the map-side pane pre-combine
    (:func:`_pane_precombine`) upstream of the stateful shuffle: rows
    shuffled per key per micro-batch drop from its turn count to its
    live-pane count × upstream partitions, and the hot key's serial
    in-state fold shrinks the same way. Commutative monoids only.
    ``dropped_late_counter`` then counts dropped pre-combined partials,
    not raw rows.

    ``early=True`` adds Beam-style EARLY FIRING (Scotty's eager
    emission): whenever a key ingests rows, every still-open nonempty
    window re-emits its current provisional value; the watermark-closure
    row remains the single authoritative final. The output gains a
    ``final boolean`` column and the query runs in UPDATE output mode —
    route it to an upsert-keyed sink ((key, window_start, window_end) is
    the upsert key), NOT the exactly-once append sink.

    Output schema: ``(key, window_start, window_end, out_col)``
    (+ ``final`` under ``early=True``).
    """
    size_us = _interval_us(size)
    slide_us = _interval_us(slide)
    if size_us % slide_us:
        raise ValueError(
            f"size ({size}) must be a whole multiple of slide ({slide})"
        )
    monoid = get_monoid(monoid_name, np.int64 if int_values else np.float64)
    out_type = _OUT_SPARK_TYPE[monoid_name]
    key_t = df.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_t}, window_start timestamp, window_end timestamp, "
        f"{out_col} {out_type}"
    )
    if early:
        out_schema += ", final boolean"

    def fn(
        key_tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            d = pickle.loads(bytes(state.get[0]))
        else:
            d = _panes_empty_state(monoid)
        chunks = [] if state.hasTimedOut else list(pdfs)
        gathered = pd.concat(chunks) if len(chunks) > 1 else (
            chunks[0] if chunks else None
        )
        wm_ms = state.getCurrentWatermarkMs()
        emitted, d = _panes_step(
            d, gathered, wm_ms * 1000, monoid=monoid, ts_col=ts_col,
            size_us=size_us, slide_us=slide_us, int_values=int_values,
            drop_counter=dropped_late_counter,
            pre_col="__pre" if pre_combine else None, early=early,
        )
        if len(d["pane_ts"]):
            state.update((bytearray(
                pickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL)
            ),))
            # wake when the watermark can close the oldest open window:
            # its end is the first slide boundary after max(last_emit,
            # oldest pane start)
            next_end_us = max(
                int(d["pane_ts"][0]) + slide_us, d["last_emit"] + slide_us
            )
            state.setTimeoutTimestamp(max(next_end_us // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()
        if emitted is not None:
            frame = {
                key: key_tuple[0],
                "window_start": emitted["window_start"].astype(
                    "datetime64[us]"
                ),
                "window_end": emitted["window_end"].astype(
                    "datetime64[us]"
                ),
                out_col: emitted["values"],
            }
            if early:
                frame["final"] = emitted["final"]
            yield pd.DataFrame(frame)

    _apply_state_partition_floor(df, min_state_partitions)
    prepared = (
        df.withColumn("__v", F.expr(value_expr))
        .select(key, ts_col, "__v")  # prune before the stateful shuffle
    )
    if pre_combine:
        prepared = _pane_precombine(
            prepared, key=key, ts_col=ts_col, val_cols=["__v"],
            monoids=[monoid], int_flags=[int_values], slide_us=slide_us,
        )
    prepared = prepared.withWatermark(ts_col, watermark)
    return prepared.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "update" if early else "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sliding_panes_stream_multi(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    monoids: Sequence[str] = ("sum",),
    sizes: Sequence[str] = ("1 hour",),
    slide: str = "15 minutes",
    watermark: str = "1 minute",
    int_values: bool = False,
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
    value_exprs: Sequence[str] | None = None,
    pre_combine: bool = False,
    dropped_late_counter=None,
    early: bool = False,
) -> DataFrame:
    """SHARED-PANE multi-aggregate rollup stream: N monoids × K window
    sizes over ONE pane layer per key — the pane-space form of the
    engine's window sharing (:func:`sliding_agg_stream_multi` is the
    per-turn form; the reference's twin/shared benchmark discipline,
    cpp/src/benchmark_core.h:472-562; slice sharing per Scotty, Traub et
    al. EDBT 2018).

    All sizes must be whole multiples of the common ``slide``. Each
    arriving row folds into exactly one pane partial per monoid; a
    closing window of ANY size folds its ≤ size/slide panes through the
    disjoint-sparse-table interval fold — so a dashboard computing, say,
    ``(sum, max, mincount) × (1h, 8h, 24h)`` pays ONE shuffle, ONE
    state-store roundtrip, ONE Arrow bridge and ONE pane-ingestion pass
    per key per micro-batch, and per-key state stays
    O(max_size/slide + watermark-lag/slide) regardless of turn rate.

    Emission (append mode): one row per (key, window) at watermark
    closure, all sizes unioned — a row's size is ``window_end −
    window_start``. Columns are ``w{monoid}`` (duplicate monoid names
    disambiguated as ``w{i}_{monoid}``). Late/exactness semantics are
    :func:`sliding_panes_stream`'s, with the late-drop rule and pane
    eviction keyed to the LARGEST size (late rows folding into panes
    whose smaller windows already closed are harmless — closed windows
    never re-emit).

    ``value_exprs`` (one SQL expression per monoid) lifts a DIFFERENT
    input per aggregate; identical expressions are deduplicated to one
    shuffled column; when omitted, every monoid shares ``value_expr``.

    ``pre_combine=True`` inserts the map-side pane pre-combine
    (:func:`_pane_precombine`) upstream of the stateful shuffle — one
    pickled partial row per (key, pane, upstream partition) carrying ALL
    N specs, so the shared-pane discipline survives the pre-combine too.
    Commutative monoids only.

    ``early=True`` adds Beam-style EARLY FIRING (see
    :func:`sliding_panes_stream`): provisional rows for still-open
    windows on every ingesting batch, a ``final boolean`` column, and
    UPDATE output mode — for upsert-keyed sinks only.
    """
    slide_us = _interval_us(slide)
    sizes_us = [_interval_us(s) for s in sizes]
    for s_txt, s_us in zip(sizes, sizes_us):
        if s_us % slide_us:
            raise ValueError(
                f"size ({s_txt}) must be a whole multiple of slide ({slide})"
            )
    if len(set(sizes_us)) != len(sizes_us):
        raise ValueError(f"duplicate window sizes: {sizes}")
    ms = [
        get_monoid(name, np.int64 if int_values else np.float64)
        for name in monoids
    ]
    if value_exprs is None:
        value_exprs = [value_expr] * len(monoids)
    if len(value_exprs) != len(monoids):
        raise ValueError(
            f"value_exprs ({len(value_exprs)}) must match monoids "
            f"({len(monoids)})"
        )
    # deduplicate identical lifts to one shuffled column
    expr_col: dict[str, str] = {}
    for e in value_exprs:
        if e not in expr_col:
            expr_col[e] = f"__v{len(expr_col)}"
    val_cols = [expr_col[e] for e in value_exprs]
    names = list(monoids)
    out_cols = [
        f"w{i}_{n}" if names.count(n) > 1 else f"w{n}"
        for i, n in enumerate(names)
    ]
    int_flags = [int_values] * len(ms)
    key_t = df.schema[key].dataType.simpleString()
    out_schema = ", ".join(
        [f"{key} {key_t}", "window_start timestamp", "window_end timestamp"]
        + [f"{c} {_OUT_SPARK_TYPE[n]}" for c, n in zip(out_cols, names)]
    )
    if early:
        out_schema += ", final boolean"

    def fn(
        key_tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            d = pickle.loads(bytes(state.get[0]))
        else:
            d = {
                "pane_ts": np.empty(0, np.int64),
                "partials": [m.identity(0) for m in ms],
                "last_emit": _PANES_NEG,
                "v": 1,
            }
        chunks = [] if state.hasTimedOut else list(pdfs)
        gathered = pd.concat(chunks) if len(chunks) > 1 else (
            chunks[0] if chunks else None
        )
        wm_ms = state.getCurrentWatermarkMs()
        per_size, d = _panes_multi_step(
            d, gathered, wm_ms * 1000, monoids=ms, val_cols=val_cols,
            ts_col=ts_col, sizes_us=sizes_us, slide_us=slide_us,
            int_flags=int_flags, drop_counter=dropped_late_counter,
            pre_col="__pre" if pre_combine else None, early=early,
        )
        if len(d["pane_ts"]):
            state.update((bytearray(
                pickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL)
            ),))
            next_end_us = max(
                int(d["pane_ts"][0]) + slide_us, d["last_emit"] + slide_us
            )
            state.setTimeoutTimestamp(max(next_end_us // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()
        for emitted in per_size:
            if emitted is None:
                continue
            frame = {
                key: key_tuple[0],
                "window_start": emitted["window_start"].astype(
                    "datetime64[us]"
                ),
                "window_end": emitted["window_end"].astype("datetime64[us]"),
            }
            for c, vals in zip(out_cols, emitted["values"]):
                frame[c] = vals
            if early:
                frame["final"] = emitted["final"]
            yield pd.DataFrame(frame)

    _apply_state_partition_floor(df, min_state_partitions)
    prepared = df
    for e, c in expr_col.items():
        prepared = prepared.withColumn(c, F.expr(e))
    prepared = prepared.select(
        key, ts_col, *expr_col.values()  # prune pre-shuffle
    )
    if pre_combine:
        prepared = _pane_precombine(
            prepared, key=key, ts_col=ts_col, val_cols=val_cols,
            monoids=ms, int_flags=int_flags, slide_us=slide_us,
        )
    prepared = prepared.withWatermark(ts_col, watermark)
    return prepared.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "update" if early else "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sliding_panes_stream_tws(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    monoid_name: str = "sum",
    size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 minute",
    out_col: str = "wagg",
    int_values: bool = False,
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
    pre_combine: bool = False,
    early: bool = False,
) -> DataFrame:
    """:func:`sliding_panes_stream` on Spark 4's
    ``transformWithStateInPandas`` — the pane-sliced rollup state under
    the PRODUCTION arbitrary-state API (RocksDB state store, typed state
    variables, real event-time TIMERS for quiet-key closure), completing
    the both-APIs matrix for the engine's second state discipline (the
    per-turn ordered state has :func:`sliding_agg_stream_tws`; the
    reference's production-API contract is FiBA.hpp:1837-1918).
    Semantics are byte-identical to the applyInPandasWithState path:
    both drive :func:`_panes_multi_step` per key per micro-batch, and
    the parity test replays the same chunked stream through both.

    ``early=True`` adds Beam-style EARLY FIRING exactly as on the
    applyInPandasWithState path (see :func:`sliding_panes_stream`):
    ``final boolean`` column, Update output mode, provisional re-fires
    on ingesting batches, timer expiries emit finals only.

    Requires google.protobuf for the Python↔state-server protocol — a
    real wheel or the vendored mini-runtime (compat.ensure_protobuf),
    and a RocksDB state-store provider on the session."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    size_us = _interval_us(size)
    slide_us = _interval_us(slide)
    if size_us % slide_us:
        raise ValueError(
            f"size ({size}) must be a whole multiple of slide ({slide})"
        )
    monoid = get_monoid(monoid_name, np.int64 if int_values else np.float64)
    out_type = _OUT_SPARK_TYPE[monoid_name]
    key_t = df.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_t}, window_start timestamp, window_end timestamp, "
        f"{out_col} {out_type}"
    )
    if early:
        out_schema += ", final boolean"

    class PanesProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("panes", "blob binary")

        def _load(self):
            blob = self._state.get()  # returns None when absent (no exists() round trip)
            if blob is not None:
                return pickle.loads(bytes(blob[0]))
            return {
                "pane_ts": np.empty(0, np.int64),
                "partials": [monoid.identity(0)],
                "last_emit": _PANES_NEG,
                "v": 1,
            }

        def _step_and_emit(self, key_tuple, gathered, wm_ms):
            d = self._load()
            per_size, d = _panes_multi_step(
                d, gathered, wm_ms * 1000, monoids=[monoid],
                val_cols=["swag_v"], ts_col=ts_col, sizes_us=[size_us],
                slide_us=slide_us, int_flags=[int_values],
                pre_col="swag_pre" if pre_combine else None, early=early,
            )
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            if len(d["pane_ts"]):
                self._state.update((bytearray(
                    pickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL)
                ),))
                # wake when the watermark can close the oldest open
                # window (ms-granular: ceil so the timer never fires
                # before the us-exact end; must also be strictly ahead
                # of the current watermark or it would never fire)
                next_end_us = max(
                    int(d["pane_ts"][0]) + slide_us,
                    d["last_emit"] + slide_us,
                )
                self._handle.registerTimer(
                    max(-(next_end_us // -1000), wm_ms + 1)
                )
            elif self._state.exists():
                self._state.clear()
            emitted = per_size[0]
            if emitted is None:
                return iter([])
            frame = {
                key: key_tuple[0],
                "window_start": emitted["window_start"].astype(
                    "datetime64[us]"
                ),
                "window_end": emitted["window_end"].astype(
                    "datetime64[us]"
                ),
                out_col: emitted["values"][0],
            }
            if early:
                frame["final"] = emitted["final"]
            return iter([pd.DataFrame(frame)])

        def handleInputRows(self, key_tuple, rows, timer_values):
            chunks = list(rows)
            gathered = pd.concat(chunks) if len(chunks) > 1 else (
                chunks[0] if chunks else None
            )
            return self._step_and_emit(
                key_tuple, gathered, timer_values.getCurrentWatermarkInMs()
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # quiet-key closure: the watermark passed the oldest open
            # window end with no new rows — run the kernel's
            # emission/eviction path against the CURRENT watermark
            return self._step_and_emit(
                key, None, timerValues.getCurrentWatermarkInMs()
            )

        def close(self) -> None:
            pass

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle; no leading underscore on the
    # TWS path (namedtuple rename=True mangles those to positional _N)
    prepared = (
        df.withColumn("swag_v", F.expr(value_expr))
        .select(key, ts_col, "swag_v")
    )
    if pre_combine:
        prepared = _pane_precombine(
            prepared, key=key, ts_col=ts_col, val_cols=["swag_v"],
            monoids=[monoid], int_flags=[int_values], slide_us=slide_us,
            pre_col="swag_pre",
        )
    prepared = prepared.withWatermark(ts_col, watermark)
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=PanesProcessor(),
        outputStructType=out_schema,
        outputMode="Update" if early else "Append",
        timeMode="EventTime",
    )


def sliding_count_stream_tws(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    value_expr: str = "length(text)",
    monoid_name: str = "sum",
    w: int = 100,
    watermark: str = "1 minute",
    out_col: str = "wagg",
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
) -> DataFrame:
    """``sliding_count_stream`` on Spark 4's ``transformWithStateInPandas``
    — the modern arbitrary-state API (RocksDB-backed state store, typed
    state variables, timers). Same semantics and the same versioned
    dict-of-arrays checkpoint format as the applyInPandasWithState path;
    kept as a parallel implementation because TWS is where Structured
    Streaming's stateful roadmap lives (state TTL, initial state,
    state-reader introspection) while applyInPandasWithState remains the
    HDFS-backed fallback.

    Requires ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` (rocksdbjni ships with pyspark) AND the
    ``protobuf`` Python package (TWS's Python↔state-server protocol); this
    sandbox ships neither pip nor protobuf, so the pytest for this path is
    skipif-gated on protobuf availability — the applyInPandasWithState
    twin (:func:`sliding_count_stream`) carries the tested semantics."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    monoid = get_monoid(monoid_name)
    out_type = _OUT_SPARK_TYPE[monoid_name]
    out_schema = (
        f"{key} string, {ts_col} timestamp, {order_col} int, {out_col} {out_type}"
    )

    class SlidingCountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("kernel", "blob binary")

        def handleInputRows(self, key_tuple, rows, timer_values):
            from ..operators.kernels import SlidingCountWindow

            blob = self._state.get()  # returns None when absent (no exists() round trip)
            if blob is not None:
                kernel = SlidingCountWindow.from_state_dict(
                    pickle.loads(bytes(blob[0])), monoid
                )
            else:
                kernel = SlidingCountWindow(monoid, w)
            chunks = list(rows)  # gather: chunk order within a batch is arbitrary
            outs = []
            if chunks:
                pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
                res = kernel.process(pdf["swag_v"].to_numpy())
                outs.append(
                    pd.DataFrame(
                        {
                            key: key_tuple[0],
                            ts_col: pdf[ts_col].to_numpy(),
                            order_col: pdf[order_col].to_numpy(),
                            out_col: res,
                        }
                    )
                )
            self._state.update(
                (bytearray(pickle.dumps(kernel.state_dict(), protocol=pickle.HIGHEST_PROTOCOL)),)
            )
            return iter(outs)

        def close(self) -> None:
            pass

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle (see sliding_agg_stream). NB the
    # lifted column must NOT start with an underscore: the TWS input
    # path converts rows through a namedtuple with rename=True, which
    # turns leading-underscore names into positional _N
    prepared = (
        df.withColumn("swag_v", F.expr(value_expr))
        .select(key, ts_col, order_col, "swag_v")
        .withWatermark(ts_col, watermark)
    )
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=SlidingCountProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def sliding_agg_stream_tws(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    monoid_name: str = "sum",
    duration: str = "10 minutes",
    watermark: str = "1 minute",
    out_col: str = "wagg",
    id_cols: Sequence[str] = (),
    int_values: bool = False,
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
    hot_keys: Sequence | None = None,
    chunk_span: str | None = None,
    emit_filter: str | None = None,
) -> DataFrame:
    """:func:`sliding_agg_stream` on Spark 4's
    ``transformWithStateInPandas`` — the OOO ordered-aggregate state
    (FiBA analogue, operators/ordered.py) running under the PRODUCTION
    arbitrary-state API (RocksDB state store, typed state variables),
    the reference contract that the O(log d) out-of-order state must
    execute under the production API (FiBA.hpp:1837-1918). Semantics are
    byte-identical to the applyInPandasWithState path: both call
    :func:`_ooo_sliding_step` per key per micro-batch.

    Requires google.protobuf for the Python↔state-server protocol — a
    real wheel or the vendored mini-runtime (compat.ensure_protobuf),
    and a RocksDB state-store provider on the session.

    ``hot_keys`` + ``chunk_span``: the chunk-halo decomposition (see
    :func:`_with_time_chunk_halo`) under THIS API too — columns are
    named ``swag_ck``/``swag_halo`` (the TWS input path's namedtuple
    ``rename=True`` mangles leading underscores), and expired chunks are
    dropped through the production TIMER protocol (``registerTimer`` at
    chunk-end + 2·duration, state cleared in ``handleExpiredTimer``)
    instead of applyInPandasWithState's GroupStateTimeout.

    ``emit_filter``: state-only row predicate for zero-duplicate
    re-plans — see :func:`sliding_agg_stream` (column named
    ``swag_halo`` on this path)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    dur_us = _interval_us(duration)
    monoid = get_monoid(monoid_name, np.int64 if int_values else np.float64)
    chunked = bool(hot_keys) and chunk_span is not None
    muted = emit_filter is not None
    suppress = chunked or muted
    span_us = _interval_us(chunk_span) if chunk_span is not None else None
    if chunked and span_us < dur_us:
        raise ValueError(
            f"chunk_span ({chunk_span}) must be >= duration ({duration}): "
            "the halo only replicates from the immediately preceding chunk"
        )
    id_cols = [c for c in id_cols if c not in (key, ts_col)]
    out_type = _OUT_SPARK_TYPE[monoid_name]
    key_t = df.schema[key].dataType.simpleString()
    id_ts = [df.schema[c].dataType.simpleString() for c in id_cols]
    out_schema = ", ".join(
        [f"{key} {key_t}", f"{ts_col} timestamp"]
        + [f"{c} {t}" for c, t in zip(id_cols, id_ts)]
        + [f"{out_col} {out_type}"]
    )

    class OooSlidingProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("ordered", "blob binary")

        def handleInputRows(self, key_tuple, rows, timer_values):
            blob = self._state.get()  # returns None when absent (no exists() round trip)
            if blob is not None:
                st = OrderedAggState.loads(bytes(blob[0]), monoid)
            else:
                st = OrderedAggState(monoid)
            out = _ooo_sliding_step(
                st, rows, monoid=monoid, vcol="swag_v", key_name=key,
                key_val=key_tuple[0], ts_col=ts_col, id_cols=id_cols,
                out_col=out_col, dur_us=dur_us, int_values=int_values,
                emit_col="swag_halo" if suppress else None,
            )
            self._state.update((bytearray(st.dumps()),))
            if chunked and key_tuple[1] is not None and int(key_tuple[1]) >= 0:
                # production-timer twin of _chunk_timeout: re-arm expiry
                # at chunk-end + 2·duration (ms-granular, ceil)
                deadline = -(
                    ((int(key_tuple[1]) + 1) * span_us + 2 * dur_us) // -1000
                )
            else:
                # production-timer twin of _idle_timeout: GC the key
                # once the watermark strictly passes youngest + duration
                deadline = (int(st.youngest()) + dur_us) // 1000 + 1
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(deadline)
            return iter([out] if out is not None else [])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # the armed deadline passed (chunk expiry or idle-key GC):
            # no in-watermark row can still target this state — drop it
            self._state.clear()
            return iter([])

        def close(self) -> None:
            pass

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle (see sliding_agg_stream); the
    # lifted column must not start with an underscore on the TWS path
    # (namedtuple rename=True mangles leading-underscore names to _N)
    prepared = df.withColumn("swag_v", F.expr(value_expr))
    if muted:
        # see sliding_agg_stream's emit_filter note (source-row scope,
        # null-safe); no leading underscore on the TWS path
        prepared = prepared.withColumn(
            "swag_mute", ~F.coalesce(F.expr(emit_filter), F.lit(False))
        )
    prepared = prepared.select(
        key, ts_col, *id_cols, "swag_v",
        *(["swag_mute"] if muted else []),
    )
    if chunked:
        prepared = _with_time_chunk_halo(
            prepared, key, ts_col, hot_keys, span_us, dur_us,
            ck_col="swag_ck", halo_col="swag_halo",
        )
    if muted:
        if chunked:
            prepared = prepared.withColumn(
                "swag_halo", F.col("swag_halo") | F.col("swag_mute")
            ).drop("swag_mute")
        else:
            prepared = prepared.withColumnRenamed("swag_mute", "swag_halo")
    prepared = prepared.withWatermark(ts_col, watermark)
    group_cols = [key, "swag_ck"] if chunked else [key]
    return prepared.groupBy(*group_cols).transformWithStateInPandas(
        statefulProcessor=OooSlidingProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )


def conversation_timeout_stream(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
) -> DataFrame:
    """Inactivity-timeout CEP on EVENT-TIME TIMERS (north_rule "CEP
    engine", session shape): when a conversation goes quiet for ``gap``,
    emit ONE closure row (key, session_start, timeout_at, n_turns) the
    moment the watermark passes last-activity + gap — the push-based
    complement of :func:`session_stream` (which aggregates; this one
    *fires*). Runs on ``transformWithStateInPandas`` with
    ``timeMode="EventTime"``: per key the state is a single
    (first_ts, last_ts, n) triple and one registered timer, so state is
    O(1) per conversation regardless of stream length; every arriving
    batch extends the deadline (deleteTimer + registerTimer), and the
    expired-timer callback emits + clears, so a revived conversation
    starts a fresh session.

    Semantics note (CEP, not aggregation): every admitted row joins the
    OPEN session — a row arriving late (but in-watermark) whose event
    time would have split into a separate ``session_window`` session is
    counted into the open one. For in-order-per-key arrival the output
    equals the batch ``session_window`` recompute exactly (test pins
    this); under adversarial cross-session reordering prefer
    :func:`session_stream`.

    Timer protocol: this operator exercises the state server's
    RegisterTimer / DeleteTimer / ListTimers / ExpiryTimerRequest
    messages end-to-end (the full timer surface of the
    StateMessage protocol)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = _interval_us(gap)
    key_t = df.schema[key].dataType.simpleString()
    out_key = key  # the hook parameter below shadows `key` in its scope
    out_schema = (
        f"{key} {key_t}, session_start timestamp, timeout_at timestamp, "
        f"n_turns long"
    )

    class TimeoutProcessor(StatefulProcessor):
        # Protocol economy: every ValueState/timer call is a synchronous
        # proto round trip to the JVM state server — the dominant per-key
        # cost of this operator (measured ~18 ms/key/batch at 32
        # partitions). The processor therefore (a) calls get() directly
        # (it returns None when absent — exists() is a redundant round
        # trip), and (b) carries the armed timer's deadline as a 4th
        # state field so extending the deadline is ONE deleteTimer plus
        # ONE registerTimer, never a listTimers scan.
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "first_ms long, last_ms long, n long, tmr long"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            chunks = list(rows)
            if not chunks:
                return iter([])
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            ts_us = np.sort(
                pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            )
            cur = self._sess.get()
            # vectorized session split: a session break is a sorted-ts
            # step > gap. Sessions that COMPLETE inside this batch (an
            # intra-batch quiet gap) close immediately — only the last
            # one stays open awaiting the timer.
            brk = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk, [len(ts_us)]))
            sessions = [
                [int(ts_us[a]), int(ts_us[b - 1]), int(b - a)]
                for a, b in zip(starts, ends)
            ]
            if cur is not None:
                # merge the carried open session with the batch's first
                # session if the quiet gap between them is within `gap`
                if sessions[0][0] - int(cur[1]) <= gap_us:
                    s = sessions[0]
                    s[0] = min(s[0], int(cur[0]))
                    s[1] = max(s[1], int(cur[1]))
                    s[2] += int(cur[2])
                else:
                    sessions.insert(0, [int(cur[0]), int(cur[1]), int(cur[2])])
            closed, open_s = sessions[:-1], sessions[-1]
            # extend the deadline: drop the previously armed timer (its
            # ms deadline rides in the state — no listTimers round trip)
            # and arm one at last-activity + gap (timers are ms-granular:
            # ceil so the timer never fires before the us-exact deadline;
            # EMITTED timestamps stay microsecond-exact for oracles)
            new_tmr = -((open_s[1] + gap_us) // -1000)
            old_tmr = int(cur[3]) if cur is not None else None
            self._sess.update((open_s[0], open_s[1], open_s[2], new_tmr))
            if old_tmr is not None and old_tmr != new_tmr:
                self._handle.deleteTimer(old_tmr)
            if old_tmr != new_tmr:
                self._handle.registerTimer(new_tmr)
            if not closed:
                return iter([])
            out = pd.DataFrame(
                {
                    out_key: [key_tuple[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(s[0], unit="us") for s in closed
                    ],
                    "timeout_at": [
                        pd.Timestamp(s[1] + gap_us, unit="us") for s in closed
                    ],
                    "n_turns": [s[2] for s in closed],
                }
            )
            return iter([out])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # signature must match the base class exactly: the worker
            # invokes this hook with KEYWORD arguments
            key_tuple = key
            cur = self._sess.get()
            if cur is None:
                return iter([])
            first, last, n = int(cur[0]), int(cur[1]), int(cur[2])
            self._sess.clear()
            out = pd.DataFrame(
                {
                    out_key: [key_tuple[0]],
                    "session_start": [pd.Timestamp(first, unit="us")],
                    "timeout_at": [pd.Timestamp(last + gap_us, unit="us")],
                    "n_turns": [n],
                }
            )
            return iter([out])

        def close(self) -> None:
            pass

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle (see sliding_agg_stream)
    prepared = (
        df.select(key, ts_col)
        .withWatermark(ts_col, watermark)
    )
    return prepared.groupBy(key).transformWithStateInPandas(
        statefulProcessor=TimeoutProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )


def rising_pattern_stream(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    value_expr: str = "length(text)",
    runs: int = 3,
    watermark: str = "1 minute",
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
) -> DataFrame:
    """Streaming CEP: emit every row completing ``runs`` strictly-rising
    consecutive values within its key's stream (the classic three-rising-
    ticks pattern; batch twin = lag windows, plans/events_queries.py
    q_cep_three_rising). State per key = the last ``runs − 1`` values —
    O(1), no window retention — carried across micro-batches so patterns
    spanning a batch boundary still fire."""
    out_schema = f"{key} string, {ts_col} timestamp, {order_col} int, v double"

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        tail = (
            np.asarray(pickle.loads(bytes(state.get[0]))["tail"], dtype=np.float64)
            if state.exists
            else np.empty(0, dtype=np.float64)
        )
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
            v = pdf["__v"].to_numpy(dtype=np.float64)
            seq = np.concatenate([tail, v])
            nt = len(tail)
            if len(seq) >= runs:
                # rising step ending at i; vectorized run-length = distance
                # to the most recent non-rising position
                r = np.concatenate([[False], seq[1:] > seq[:-1]])
                idx = np.arange(len(seq))
                last_stop = np.maximum.accumulate(np.where(~r, idx, -1))
                runlen = idx - last_stop
                fire_batch = (runlen >= (runs - 1))[nt:]
            else:
                fire_batch = np.zeros(len(v), dtype=bool)
            if fire_batch.any():
                sel = pdf[fire_batch]
                yield pd.DataFrame(
                    {
                        key: key_tuple[0],
                        ts_col: sel[ts_col].to_numpy(),
                        order_col: sel[order_col].to_numpy(),
                        "v": sel["__v"].to_numpy(dtype=np.float64),
                    }
                )
            tail = np.concatenate([tail, v])[-(runs - 1) :]
        state.update(
            (bytearray(pickle.dumps({"v": 1, "tail": tail.tolist()})),)
        )

    _apply_state_partition_floor(df, min_state_partitions)
    # prune before the stateful shuffle (see sliding_agg_stream)
    prepared = (
        df.withColumn("__v", F.expr(value_expr))
        .select(key, ts_col, order_col, "__v")
        .withWatermark(ts_col, watermark)
    )
    return prepared.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def dedup_stream(
    df: DataFrame,
    *,
    keys: tuple = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark: str = "1 minute",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication — the streaming twin of
    plans/text_queries.py's dedup_exact, on Spark's built-in stateful
    dedup operator.

    ``within_watermark=True`` (default) uses
    ``dropDuplicatesWithinWatermark``: per-key state expires once the key
    is older than the watermark, so state is bounded by the watermark
    horizon — the only shape that survives 10^12 turns (duplicates in
    real transcript streams are replays/retries that arrive close
    together). ``False`` uses ``dropDuplicates`` — exact over all time,
    state grows with distinct keys (only for bounded key domains)."""
    wm = df.withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(list(keys))
    return wm.dropDuplicates(list(keys))


def hll_distinct_stream(
    df: DataFrame,
    *,
    key: str = "conv_id",
    value_expr: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 minute",
    out_col: str = "hll_est",
    min_state_partitions: int | None = STATE_PARTITION_FLOOR,
) -> DataFrame:
    """Streaming distinct-count sketch per key: the deterministic
    HyperLogLog of plans/pipeline_queries.py (same hash, same 64
    registers, same exact-integer harmonic sum) with the register vector
    as per-key streaming state — emits each key's updated estimate once
    per micro-batch.

    Sketches are the ideal streaming state: the register merge is
    idempotent and commutative (np.maximum), so replayed or reordered
    micro-batches cannot corrupt the estimate — exactly-once output from
    at-least-once replay for free. The md5 → bucket/rank columns are
    computed JVM-side BEFORE the stateful operator; the Python kernel
    only scatter-maxes 64 int8 registers per key per batch (no per-row
    Python, state is 64 bytes per key regardless of stream length)."""
    _apply_state_partition_floor(df, min_state_partitions)
    # spec constants + the one hash definition live with the batch twin
    from ..plans.pipeline_queries import _HLL_C, _HLL_M, _HLL_P, spark_md5_60

    h = spark_md5_60(value_expr)
    prepared = (
        df.withColumn("__h", F.expr(h))
        # NULL values contribute nothing to a distinct count; without this
        # filter md5(NULL) → NULL → NaN would reach the register scatter as
        # an unsafe int cast (INT64_MIN index → executor IndexError)
        .where(F.col("__h").isNotNull())
        .withColumn("__b", F.expr(f"__h % {_HLL_M}"))
        .withColumn("__r", F.expr(f"shiftright(__h, {_HLL_P})"))
        .withColumn(
            "__rho",
            F.expr("case when __r = 0 then 55 else bit_count((__r & -__r) - 1) + 1 end"),
        )
        # prune before the stateful shuffle (see sliding_agg_stream): the
        # kernel reads only (__b, __rho); dropping text/__h here keeps the
        # raw payload out of the hash exchange and the Arrow bridge
        .select(key, ts_col, "__b", "__rho")
        .withWatermark(ts_col, watermark)
    )
    out_schema = f"{key} string, {out_col} double"

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        regs = (
            np.frombuffer(bytes(state.get[0]), dtype=np.int8).copy()
            if state.exists
            else np.zeros(_HLL_M, dtype=np.int8)
        )
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            b = pdf["__b"].to_numpy(dtype=np.int64)
            rho = pdf["__rho"].to_numpy(dtype=np.int64).astype(np.int8)
            np.maximum.at(regs, b, rho)
            s = int(np.sum(1 << (55 - regs.astype(np.int64))))
            yield pd.DataFrame(
                {key: [key_tuple[0]], out_col: [round(_HLL_C / float(s), 4)]}
            )
        state.update((bytearray(regs.tobytes()),))

    return prepared.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def salted_repartition(df: DataFrame, key: str = "conv_id", buckets: int = 8,
                       salt_col: str = "bucket",
                       row_cols: tuple = ("turn_idx",)) -> DataFrame:
    """Deterministic hot-key salting (north_rule): split each key's stream
    into ``buckets`` sub-streams on a stable row hash of ``row_cols``,
    then repartition on (key, bucket).

    Applicability contract: the salt defuses skew only for operators that
    AGGREGATE BY (key, bucket) and re-merge — i.e. distributive aggregates
    (:func:`tumbling_stream_salted` is the streaming instance; the batch
    chunked-halo kernel is the sliding-window instance). A downstream
    ``groupBy(key)`` stateful operator re-shuffles on the bare key and
    collapses the sub-streams again — salting in front of
    :func:`sliding_agg_stream` is a no-op plus one wasted exchange."""
    salted = df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.col(key), *[F.col(c) for c in row_cols]), F.lit(buckets)),
    )
    return salted.repartition(F.col(key), F.col(salt_col))


def tumbling_stream_salted(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    key: str = "conv_id",
    value_expr: str = "length(text)",
    watermark: str = "10 minutes",
    buckets: int = 8,
    row_cols: tuple = ("turn_idx",),
) -> DataFrame:
    """:func:`tumbling_stream` with the north_rule's explicit hot-key
    salting made REAL: phase 1 aggregates by (key, bucket, window) — the
    hot conversation's rows spread over ``buckets`` parallel state keys —
    and phase 2 merges the per-bucket partials by (key, window). Exact for
    distributive aggregates (count/sum here); two chained stateful
    aggregations, both watermark-expirable."""
    salted = df.withWatermark(ts_col, watermark).withColumn(
        "_bucket",
        F.pmod(F.xxhash64(F.col(key), *[F.col(c) for c in row_cols]), F.lit(buckets)),
    )
    partial = (
        salted.groupBy(key, "_bucket", F.window(ts_col, size).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.expr(value_expr)).alias("_s"),
        )
    )
    return (
        partial.groupBy(key, "win")
        .agg(F.sum("_n").alias("n_turns"), F.sum("_s").alias("sum_val"))
        .select(key, F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "n_turns", "sum_val")
    )


def tumbling_stream(df: DataFrame, ts_col: str = "ts", size: str = "1 hour",
                    key: str = "conv_id", value_expr: str = "length(text)",
                    watermark: str = "10 minutes") -> DataFrame:
    """Aligned tumbling window aggregate (built-in path — dynamic fill/
    drain analogue of cpp/src/benchmark_core.h:149-183)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key, F.window(ts_col, size).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.expr(value_expr)).alias("sum_val"),
        )
        .select(key, F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "n_turns", "sum_val")
    )


def session_stream(df: DataFrame, ts_col: str = "ts", gap: str = "30 minutes",
                   key: str = "conv_id", watermark: str = "10 minutes") -> DataFrame:
    """Session windows with an inactivity gap (north_rule addition)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key, F.session_window(ts_col, gap).alias("s"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(key, F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"), "n_turns")
    )


def _interval_us(text: str) -> int:
    n, unit = text.split()
    mult = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }[unit]
    return int(n) * mult
