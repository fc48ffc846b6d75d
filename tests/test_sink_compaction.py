"""Sink compaction: the small-files maintenance job (Iceberg's
rewrite_data_files for the Iceberg-less stand-in sink). A micro-batch
sink writes one dir of small files per trigger — at 10^12 turns that is
millions of files; compact_sink merges contiguous committed batches into
segments while PRESERVING the per-batch/per-partition lineage the audit
verifies, the per-batch _COMMIT_ markers (writer replay-skips keep
working), and byte-identical read_committed results — crash-safe at
every step."""

import glob
import os
import shutil

import pandas as pd
import pytest

from sliding_window_aggregators_spark.sources import transcripts_pandas
from sliding_window_aggregators_spark.streaming import (
    ExactlyOnceParquetSink,
    audit_sink,
    compact_sink,
    sliding_agg_stream,
    write_stream_exactly_once,
)
from test_streaming import SCHEMA, _read_stream, _write_chunk


def _run_stream(spark, src, out, ckpt):
    stream = sliding_agg_stream(
        _read_stream(spark, src), monoid_name="sum",
        value_expr="length(text)", duration="2 minutes", out_col="wsum",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    return sink


@pytest.fixture(scope="module")
def built_sink(spark, tmp_path_factory):
    """A real sink dir with >= 3 committed batches (3 checkpoint-resumed
    runs over a growing file source). Tests copy it before mutating."""
    base = tmp_path_factory.mktemp("sinkbase")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(600, 20)
    for i, chunk in enumerate(
        (pdf.iloc[:200], pdf.iloc[200:400], pdf.iloc[400:])
    ):
        _write_chunk(spark, src, chunk, f"c{i}")
        _run_stream(spark, src, out, ckpt)
    sink = ExactlyOnceParquetSink(out)
    assert len(sink.committed_batches()) >= 3
    return out


def _copy(built: str, tmp_path) -> str:
    work = str(tmp_path / "out")
    shutil.copytree(built, work)
    return work


def _frame(spark, out: str) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out).read_committed(spark).toPandas()
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def _parquet_files(out: str) -> list[str]:
    return [
        p for p in glob.glob(os.path.join(out, "*", "*.parquet"))
        if "/_" not in p.replace(out, "")
    ]


def test_compact_roundtrip(spark, built_sink, tmp_path):
    """Compaction shrinks the file count and changes NOTHING observable:
    read_committed identical (lineage columns included), audit clean
    (deep lineage re-derived from the data), per-batch commit markers
    intact, writer replay of a compacted batch id still a no-op."""
    out = _copy(built_sink, tmp_path)
    before = _frame(spark, out)
    ids_before = ExactlyOnceParquetSink(out).committed_batches()
    files_before = len(_parquet_files(out))
    assert audit_sink(out)["ok"]

    rep = compact_sink(out, keep_last=1)
    assert rep["segment"] == (ids_before[0], ids_before[-2])
    assert rep["files_after"] < rep["files_before"]
    assert len(_parquet_files(out)) < files_before
    assert os.path.isdir(
        os.path.join(out, f"segment={ids_before[0]}-{ids_before[-2]}")
    )

    # the per-batch commit markers survive: replay-skip still works
    sink = ExactlyOnceParquetSink(out)
    assert sink.committed_batches() == ids_before
    sink(spark.range(5).withColumnRenamed("id", "conv_id"), ids_before[0])

    after = _frame(spark, out)
    pd.testing.assert_frame_equal(before, after)
    rep2 = audit_sink(out, deep=True)
    assert rep2["ok"] and not rep2["notes"], rep2
    assert rep2["segments"] == 1
    assert rep2["rows"] == len(before)

    # only keep_last remains uncovered -> nothing to do at min_batches=2
    assert compact_sink(out, keep_last=1)["segment"] is None
    # ...but the tail can be folded into its own segment explicitly
    rep3 = compact_sink(out, keep_last=0, min_batches=1)
    assert rep3["segment"] == (ids_before[-1], ids_before[-1])
    assert audit_sink(out, deep=True)["ok"]
    pd.testing.assert_frame_equal(before, _frame(spark, out))


def test_compact_crash_windows(spark, built_sink, tmp_path):
    """Crash after the segment commit marker: covered batch dirs are a
    pending-cleanup NOTE, readers never double-count, and the next run
    finishes the cleanup. Crash before the marker (orphan segment dir):
    audit flags it, the next run removes and redoes it."""
    out = _copy(built_sink, tmp_path)
    before = _frame(spark, out)

    with pytest.raises(RuntimeError, match="injected fault"):
        compact_sink(out, keep_last=1, _fault_after_marker=True)
    rep = audit_sink(out, deep=True)
    assert rep["ok"], rep
    assert rep["notes"] and all("pending cleanup" in n for n in rep["notes"])
    # the crash window must not double-read: segments win over leftovers
    pd.testing.assert_frame_equal(before, _frame(spark, out))

    rep2 = compact_sink(out, keep_last=1)
    assert rep2["segment"] is None  # nothing new to compact
    assert any(c.startswith("batch_id=") for c in rep2["cleaned"])
    rep3 = audit_sink(out, deep=True)
    assert rep3["ok"] and not rep3["notes"]
    pd.testing.assert_frame_equal(before, _frame(spark, out))

    # orphan segment dir = data without its commit marker
    seg = next(
        n for n in os.listdir(out) if n.startswith("segment=")
    )
    shutil.copytree(
        os.path.join(out, seg), os.path.join(out, "segment=900-901")
    )
    rep4 = audit_sink(out)
    assert not rep4["ok"]
    assert any("orphan uncommitted segment" in p for p in rep4["problems"])
    rep5 = compact_sink(out, keep_last=1)
    assert "segment=900-901" in rep5["cleaned"]
    assert audit_sink(out, deep=True)["ok"]
    pd.testing.assert_frame_equal(before, _frame(spark, out))


def test_compact_audit_detects_doctored_lineage(spark, built_sink, tmp_path):
    """The audit catches a segment whose metrics disagree with its data:
    per-file footer drift shallowly; per-BATCH drift that keeps the total
    constant only via deep=True (re-derived from the _batch_id column)."""
    import json

    out = _copy(built_sink, tmp_path)
    rep = compact_sink(out, keep_last=1)
    lo, hi = rep["segment"]
    assert hi > lo  # the deep check needs two batches to trade rows between
    mpath = os.path.join(out, "_metrics", f"segment_{lo}_{hi}.json")
    m = json.load(open(mpath))

    # shallow: doctor a per-file count
    key = next(iter(m["rows_per_file"]))
    m["rows_per_file"][key] += 1
    json.dump(m, open(mpath, "w"))
    bad = audit_sink(out)
    assert not bad["ok"] and any(
        "rows_per_file" in p for p in bad["problems"])
    m["rows_per_file"][key] -= 1

    # deep: move a row between batches, total unchanged
    m["rows_per_batch"][str(lo)] += 1
    m["rows_per_batch"][str(hi)] -= 1
    json.dump(m, open(mpath, "w"))
    assert audit_sink(out)["ok"]  # totals still agree
    deep = audit_sink(out, deep=True)
    assert not deep["ok"] and any(
        "_batch_id column counts" in p for p in deep["problems"])

    m["rows_per_batch"][str(lo)] -= 1
    m["rows_per_batch"][str(hi)] += 1
    json.dump(m, open(mpath, "w"))
    assert audit_sink(out, deep=True)["ok"]


def test_compact_then_resume_appends(spark, tmp_path):
    """The writer keeps appending after compaction (same checkpoint, new
    source files -> new batch ids after the segment), and a later
    compaction folds the remainder."""
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    os.makedirs(src)
    pdf = transcripts_pandas(400, 12)
    _write_chunk(spark, src, pdf.iloc[:150], "c0")
    _run_stream(spark, src, out, ckpt)
    _write_chunk(spark, src, pdf.iloc[150:300], "c1")
    _run_stream(spark, src, out, ckpt)

    rep = compact_sink(out, keep_last=0, min_batches=1)
    assert rep["segment"] is not None
    n_compacted = _frame(spark, out)
    assert audit_sink(out, deep=True)["ok"]

    _write_chunk(spark, src, pdf.iloc[300:], "c2")
    sink = _run_stream(spark, src, out, ckpt)
    ids = sink.committed_batches()
    assert ids[-1] > rep["segment"][1]
    total = _frame(spark, out)
    assert len(total) == 400  # every turn emitted exactly once
    assert len(total) > len(n_compacted)
    assert audit_sink(out, deep=True)["ok"]

    rep2 = compact_sink(out, keep_last=0, min_batches=1)
    assert rep2["segment"] == (rep["segment"][1] + 1, ids[-1])
    final = audit_sink(out, deep=True)
    assert final["ok"] and final["segments"] == 2
    assert len(_frame(spark, out)) == 400


def test_partitioned_sink_compaction_and_pruning(spark, tmp_path):
    """partition_by on the sink: batch dirs nest hive-style partition
    subdirs (readers prune by the partition column instead of scanning
    every batch — the 10^12-turn read path), lineage metrics key files by
    batch-relative path, and compaction preserves the partition layout
    (and therefore the pruning) inside the segment."""
    from pyspark.sql import functions as F

    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    os.makedirs(src)
    pdf = transcripts_pandas(400, 12)

    def run():
        agg = sliding_agg_stream(
            _read_stream(spark, src), monoid_name="sum",
            value_expr="length(text)", duration="2 minutes", out_col="wsum",
        ).withColumn("part_min", F.minute("ts"))
        q, sink = write_stream_exactly_once(
            agg, out, ckpt, partition_by=("part_min",))
        q.awaitTermination(120)
        return sink

    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    run()
    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    sink = run()
    ids = sink.committed_batches()
    assert len(ids) >= 2

    # hive layout inside each batch dir; metrics key by relative path
    subdirs = os.listdir(os.path.join(out, f"batch_id={ids[0]}"))
    assert any(s.startswith("part_min=") for s in subdirs)
    import json
    m = json.load(
        open(os.path.join(out, "_metrics", f"batch_{ids[0]}.json")))
    assert all("part_min=" in k for k in m["rows_per_file"]), m

    rep0 = audit_sink(out, deep=True)
    assert rep0["ok"], rep0
    before = _frame(spark, out)
    assert len(before) == 400
    assert "part_min" in before.columns  # re-inferred from the dirs

    rep = compact_sink(out, keep_last=0)
    assert rep["segment"] == (ids[0], ids[-1])
    seg = os.path.join(out, f"segment={ids[0]}-{ids[-1]}")
    seg_subdirs = [s for s in os.listdir(seg) if s.startswith("part_min=")]
    assert seg_subdirs  # partition layout survives compaction
    rep2 = audit_sink(out, deep=True)
    assert rep2["ok"] and not rep2["notes"], rep2
    after = _frame(spark, out)
    pd.testing.assert_frame_equal(before, after)

    # the point of it all: a filtered read prunes at the partition level
    mn = int(seg_subdirs[0].split("=", 1)[1])
    sub = spark.read.parquet(seg).where(F.col("part_min") == mn)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "part_min" in plan.split("PartitionFilters")[1][:200]
    exp = before[before["part_min"] == mn]
    assert sub.count() == len(exp)


def test_auto_compaction_inline(spark, tmp_path):
    """compact_every=K on the sink: the stream compacts ITSELF every K-th
    committed batch (Iceberg-style commit-count maintenance scheduling,
    no external job), stays exactly-once, and keeps auditing green across
    a checkpoint resume that adds more batches and more segments."""
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    os.makedirs(src)
    pdf = transcripts_pandas(600, 20)

    def run():
        reader = (
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)  # one chunk = one batch
            .parquet(os.path.join(src, "*"))
        )
        agg = sliding_agg_stream(
            reader, monoid_name="sum", value_expr="length(text)",
            duration="2 minutes", out_col="wsum",
        )
        q, sink = write_stream_exactly_once(
            agg, out, ckpt, compact_every=2)
        q.awaitTermination(180)
        return sink

    for i in range(6):
        _write_chunk(spark, src, pdf.iloc[i * 100:(i + 1) * 100], f"c{i}")
    sink = run()
    # 6 data batches + the drain's no-data watermark-advance batch
    assert len(sink.committed_batches()) == 7
    rep = audit_sink(out, deep=True)
    assert rep["ok"] and not rep["notes"], rep
    assert rep["segments"] >= 1  # the stream compacted itself mid-run
    assert rep["rows"] == 600
    df = _frame(spark, out)
    assert len(df) == 600
    assert df[["conv_id", "ts"]].drop_duplicates().shape[0] == 600

    # resume: two more chunks -> two more batches, maintenance continues
    # (ts shifted FORWARD of run 1's watermark so the rows are
    # admissible new data, not watermark-filtered late arrivals)
    _write_chunk(spark, src, pdf.iloc[500:550].assign(
        turn_idx=lambda d: d.turn_idx + 10_000,
        ts=lambda d: d.ts + pd.Timedelta(hours=1)), "c6")
    _write_chunk(spark, src, pdf.iloc[550:600].assign(
        turn_idx=lambda d: d.turn_idx + 20_000,
        ts=lambda d: d.ts + pd.Timedelta(hours=2)), "c7")
    sink = run()
    # +2 data batches +1 watermark-advance batch (the new ts range
    # moves the watermark, so the drain appends its no-data batch)
    assert len(sink.committed_batches()) == 10
    rep2 = audit_sink(out, deep=True)
    assert rep2["ok"] and not rep2["notes"], rep2
    assert rep2["segments"] > rep["segments"]
    assert rep2["rows"] == 700


def test_compact_sort_by_clustering(spark, built_sink, tmp_path):
    """sort_by on compaction (Iceberg's sort rewrite): segment rows are
    globally clustered on the key, so per-file parquet min/max stats
    become selective — consecutive files cover non-overlapping key
    ranges and a point read touches at most the boundary-straddling
    files. Row set and audit unchanged."""
    import pyarrow.parquet as pq

    out = _copy(built_sink, tmp_path)
    before = _frame(spark, out)

    with pytest.raises(ValueError, match="sort_by column"):
        compact_sink(out, keep_last=0, sort_by=("nope",))

    rep = compact_sink(out, keep_last=0, min_batches=1,
                       sort_by=("conv_id", "ts"), target_rows_per_file=120)
    lo, hi = rep["segment"]
    assert audit_sink(out, deep=True)["ok"]
    pd.testing.assert_frame_equal(before, _frame(spark, out))

    seg = os.path.join(out, f"segment={lo}-{hi}")
    files = sorted(
        os.path.join(seg, n) for n in os.listdir(seg)
        if n.endswith(".parquet"))
    assert len(files) >= 3  # enough files for clustering to mean anything
    ranges = []
    for f in files:
        md = pq.ParquetFile(f)
        ci = md.schema_arrow.get_field_index("conv_id")
        stats = [md.metadata.row_group(g).column(ci).statistics
                 for g in range(md.metadata.num_row_groups)]
        ranges.append((min(s.min for s in stats),
                       max(s.max for s in stats)))
    ranges.sort()
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        # global sort: file key ranges only touch at the boundaries
        assert a_max <= b_min, ranges
    # a point read over the hottest conv touches only the files whose
    # range contains it — a strict subset of the segment
    hot = before["conv_id"].value_counts().idxmax()
    touching = [r for r in ranges if r[0] <= hot <= r[1]]
    assert len(touching) < len(ranges)


def test_expire_sink_retention(spark, built_sink, tmp_path):
    """Retention (write -> compact -> expire): expired segments drop as
    directory removals behind an atomic _EXPIRE_ marker; the visible row
    set shrinks by exactly the expired rows, _COMMIT_ markers survive
    (replay-skip + contiguity evidence intact), audit stays green, and
    both crash sides are covered (pending-removal note; idempotent
    finish). Expiry off a segment boundary is rejected."""
    from sliding_window_aggregators_spark.streaming import expire_sink

    out = _copy(built_sink, tmp_path)
    ids = ExactlyOnceParquetSink(out).committed_batches()
    before = _frame(spark, out)

    # must compact first: nothing is covered yet
    with pytest.raises(ValueError, match="segment boundary"):
        expire_sink(out, upto=ids[0])

    compact_sink(out, keep_last=1)  # segment (0, n-2)
    hi = ids[-2]
    # off-boundary upto rejected, boundary named in the error
    with pytest.raises(ValueError, match=rf"\[{hi}\]"):
        expire_sink(out, upto=hi - 1)

    rep = expire_sink(out, upto=hi)
    assert rep["expired_upto"] == hi
    assert rep["removed_segments"] == [f"segment={ids[0]}-{hi}"]
    assert rep["rows_removed"] > 0
    assert not os.path.isdir(os.path.join(out, f"segment={ids[0]}-{hi}"))

    audit = audit_sink(out, deep=True)
    assert audit["ok"] and not audit["notes"], audit
    assert audit["expired_upto"] == hi
    # markers intact; the visible rows are exactly the kept batch
    sink = ExactlyOnceParquetSink(out)
    assert sink.committed_batches() == ids
    kept = _frame(spark, out)
    exp = (before[before["_batch_id"] > hi]
           .sort_values(sorted(before.columns)).reset_index(drop=True))
    pd.testing.assert_frame_equal(kept, exp)
    assert len(kept) + rep["rows_removed"] == len(before)

    # idempotent re-call is a no-op
    rep2 = expire_sink(out, upto=hi)
    assert rep2["expired_upto"] == hi and not rep2["removed_segments"]


def test_expire_crash_window_and_resume(spark, built_sink, tmp_path):
    """Crash between the _EXPIRE_ marker and the segment drop: the audit
    notes the pending removal (still ok), readers already exclude the
    expired rows, and the next expire call finishes the cleanup."""
    from sliding_window_aggregators_spark.streaming import expire_sink
    from sliding_window_aggregators_spark.streaming.sink import (
        _expired_upto,
    )

    out = _copy(built_sink, tmp_path)
    ids = ExactlyOnceParquetSink(out).committed_batches()
    before = _frame(spark, out)
    # keep the last DATA batch (ids[-2]) live — ids[-1] is the drain's
    # zero-row watermark-advance batch, which carries no rows to keep
    compact_sink(out, keep_last=2)
    hi = ids[-3]

    # simulate the crash: write the marker by hand, leave the segment
    mark = os.path.join(out, "_commits", f"_EXPIRE_{hi}")
    open(mark, "w").write("ok")
    assert _expired_upto(out) == hi

    mid = audit_sink(out, deep=True)
    assert mid["ok"], mid
    assert any("pending removal" in n for n in mid["notes"])
    kept = _frame(spark, out)
    # reader excludes the expired segment already; the only live rows
    # are the last data batch's (the zero-row tail contributes none)
    assert set(kept["_batch_id"]) == {ids[-2]}

    rep = expire_sink(out, upto=hi)  # finishes the drop
    assert rep["removed_segments"] == [f"segment={ids[0]}-{hi}"]
    done = audit_sink(out, deep=True)
    assert done["ok"] and not done["notes"], done
    pd.testing.assert_frame_equal(kept, _frame(spark, out))
    assert len(kept) < len(before)
