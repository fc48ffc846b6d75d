"""Property fuzz for compact_sink/audit_sink — pure pyarrow, no JVM.

Random sink layouts (batch count, files per batch incl. empty batches,
rows per file), random keep_last and a small target_rows_per_file (so
output files ROLL — a path the integration tests don't reach), with and
without a crash injected between the segment commit marker and the
cleanup. Invariants: the committed row set is IDENTICAL before and
after (matched by a unique row id, payload included), the deep lineage
audit stays green, per-batch _COMMIT_ markers are untouched, and a
second compaction over the remainder composes."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sliding_window_aggregators_spark.streaming import (
    ExactlyOnceParquetSink,
    audit_sink,
    compact_sink,
)


def _build_sink(out: str, batches: list[list[int]],
                partitioned: bool = False) -> None:
    """A sink dir in exactly ExactlyOnceParquetSink's layout: one dir per
    batch id with ``len(batches[b])`` files of the given row counts
    (possibly zero files — an empty micro-batch), per-batch metrics from
    the footers, and _COMMIT_ markers. ``partitioned`` nests each file
    under a hive-style ``pk=<i%2>/`` subdir (partition columns live in
    the dir name, not the data — Spark's partitionBy layout)."""
    os.makedirs(os.path.join(out, "_commits"))
    os.makedirs(os.path.join(out, "_metrics"))
    rid = 0
    for b, files in enumerate(batches):
        bdir = os.path.join(out, f"batch_id={b}")
        os.makedirs(bdir)
        per_file = {}
        for i, n in enumerate(files):
            name = f"part-{i:05d}.parquet"
            if partitioned:
                name = os.path.join(f"pk={i % 2}", name)
                os.makedirs(os.path.join(bdir, f"pk={i % 2}"),
                            exist_ok=True)
            table = pa.table(
                {
                    "rid": pa.array(range(rid, rid + n), pa.int64()),
                    "conv_id": pa.array(
                        [f"c{(rid + j) % 7}" for j in range(n)],
                        pa.string()),
                    "ts": pa.array(
                        [1_700_000_000_000_000 + (rid + j) * 1_000_000
                         for j in range(n)],
                        pa.timestamp("us"),
                    ),
                    "wsum": pa.array(
                        [float((rid + j) % 101) for j in range(n)],
                        pa.float64()),
                    "_batch_id": pa.array([b] * n, pa.int64()),
                    "_partition_id": pa.array(
                        [(rid + j) % 4 for j in range(n)], pa.int32()),
                }
            )
            pq.write_table(table, os.path.join(bdir, name))
            per_file[name] = n
            rid += n
        with open(
            os.path.join(out, "_metrics", f"batch_{b}.json"), "w"
        ) as fh:
            json.dump(
                {"batch_id": b, "rows": sum(per_file.values()),
                 "partitions": len(per_file), "rows_per_file": per_file},
                fh,
            )
        open(os.path.join(out, "_commits", f"_COMMIT_{b}"), "w").write("ok")


def _row_set(out: str) -> dict[int, tuple]:
    """Every committed row keyed by rid, reading the layout the way
    read_committed does: segments first, covered batch dirs skipped.
    The row tuple leads with the hive partition subdir the file sits in
    ('' when flat) — a compaction must preserve the rid→partition
    mapping, not just the row payload."""
    from sliding_window_aggregators_spark.streaming.sink import (
        _committed_segments,
        _parquet_files_rel,
    )

    sink = ExactlyOnceParquetSink(out)
    segs = _committed_segments(out)
    covered = {b for lo, hi in segs for b in range(lo, hi + 1)}
    dirs = [os.path.join(out, f"segment={lo}-{hi}") for lo, hi in segs] + [
        os.path.join(out, f"batch_id={b}")
        for b in sink.committed_batches()
        if b not in covered
    ]
    rows: dict[int, tuple] = {}
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for rel in _parquet_files_rel(d):
            t = pq.read_table(os.path.join(d, rel)).to_pydict()
            sub = os.path.dirname(rel)
            for j in range(len(t["rid"])):
                rid = t["rid"][j]
                assert rid not in rows, f"duplicate rid {rid}"
                rows[rid] = (sub,) + tuple(
                    t[c][j]
                    for c in ("conv_id", "ts", "wsum", "_batch_id",
                              "_partition_id")
                )
    return rows


@settings(max_examples=40, deadline=None)
@given(
    batches=st.lists(
        st.lists(st.integers(min_value=0, max_value=40),
                 min_size=0, max_size=3),
        min_size=1, max_size=6,
    ),
    keep_last=st.integers(min_value=0, max_value=2),
    target=st.sampled_from([7, 25, 10_000]),
    crash=st.booleans(),
    partitioned=st.booleans(),
)
def test_compact_fuzz(tmp_path_factory, batches, keep_last, target, crash,
                      partitioned):
    out = str(tmp_path_factory.mktemp("fuzz") / "out")
    _build_sink(out, batches, partitioned=partitioned)
    before = _row_set(out)
    base_audit = audit_sink(out, deep=True)
    assert base_audit["ok"], base_audit
    markers_before = ExactlyOnceParquetSink(out).committed_batches()

    will_compact = len(batches) - keep_last >= 2
    if crash and will_compact:
        with pytest.raises(RuntimeError, match="injected fault"):
            compact_sink(out, keep_last=keep_last,
                         target_rows_per_file=target,
                         _fault_after_marker=True)
        mid = audit_sink(out, deep=True)
        assert mid["ok"], mid
        assert _row_set(out) == before  # segments win; never double-read
        rep = compact_sink(out, keep_last=keep_last,
                           target_rows_per_file=target)
        assert rep["segment"] is None  # crash run already committed it
        assert rep["cleaned"]  # ...and this run finished the cleanup
    else:
        rep = compact_sink(out, keep_last=keep_last,
                           target_rows_per_file=target)
        assert (rep["segment"] is not None) == will_compact

    after = audit_sink(out, deep=True)
    assert after["ok"] and not after["notes"], after
    assert _row_set(out) == before
    assert ExactlyOnceParquetSink(out).committed_batches() == markers_before
    if will_compact:
        lo, hi = 0, len(batches) - 1 - keep_last
        seg = os.path.join(out, f"segment={lo}-{hi}")
        assert os.path.isdir(seg)
        from sliding_window_aggregators_spark.streaming.sink import (
            _parquet_files_rel,
        )

        covered_rows = sum(sum(f) for f in batches[: hi + 1])
        n_files = len(_parquet_files_rel(seg))
        n_subdirs = 2 if partitioned else 1
        if covered_rows:
            # rolling honors the target per partition subdir (+1 trailing
            # partial file per subdir)
            assert n_files <= covered_rows // target + n_subdirs
        for b in range(lo, hi + 1):
            assert not os.path.isdir(os.path.join(out, f"batch_id={b}"))

    # a second pass over the remainder composes (fold the tail too)
    rep2 = compact_sink(out, keep_last=0, min_batches=1,
                        target_rows_per_file=target)
    if keep_last and will_compact:
        assert rep2["segment"] == (len(batches) - keep_last,
                                   len(batches) - 1)
    final = audit_sink(out, deep=True)
    assert final["ok"] and not final["notes"], final
    assert _row_set(out) == before
