"""Pure-Python Iceberg v2: Avro container, table core, Spark write path,
exactly-once streaming sink, DR drill.

Spec anchors (public): https://iceberg.apache.org/spec/ — the murmur3
bucket hash is pinned against the spec's own Appendix-B test vectors,
bounds against Appendix D, the commit protocol against "File System
Tables". Reference repo parity: none (in-memory library) — this is the
north rule's Iceberg surface.
"""

import glob
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from sliding_window_aggregators_spark.iceberg import (
    CommitConflict, IcebergTable, partition_range_filter, ts_micros,
    write_dataframe)
from sliding_window_aggregators_spark.iceberg import avro
from sliding_window_aggregators_spark.iceberg import spec as icespec
from sliding_window_aggregators_spark.iceberg.writer import murmur3_long_np


# ---------------------------------------------------------------------------
# avro object container
# ---------------------------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "sub", "type": ["null", {
            "type": "record", "name": "sub", "fields": [
                {"name": "x", "type": "double"},
                {"name": "b", "type": "bytes"}]}]},
        {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 8}},
        {"name": "fl", "type": "boolean"},
    ]}

AVRO_RECS = [
    {"s": "héllo", "n": -12345678901234, "opt": None, "arr": ["a", "b"],
     "m": {"k1": 1}, "sub": {"x": 3.5, "b": b"\x00\xff"},
     "fx": b"12345678", "fl": True},
    {"s": "", "n": 0, "opt": 7, "arr": [], "m": {},
     "sub": None, "fx": b"abcdefgh", "fl": False},
]


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_avro_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    recs = AVRO_RECS * 100
    nbytes = avro.write_container(p, AVRO_SCHEMA, recs, codec=codec,
                                  metadata={"k": "v"})
    assert nbytes == os.path.getsize(p)
    hdr, out = avro.read_container(p)
    assert out == recs
    assert hdr["k"] == b"v"
    # the reader decodes via the schema EMBEDDED in the header, so a
    # fresh parse of the header schema must round-trip a single record
    emb = json.loads(hdr["avro.schema"].decode())
    import io
    buf = bytearray()
    avro.encode(buf, emb, recs[0])
    assert avro.decode(io.BytesIO(bytes(buf)), emb) == recs[0]


def test_avro_container_header_layout(tmp_path):
    """The on-disk layout is the spec's: magic Obj\\x01, metadata map,
    16-byte sync repeated after each block."""
    p = str(tmp_path / "t.avro")
    avro.write_container(p, AVRO_SCHEMA, AVRO_RECS, codec="null")
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    # sync marker: last 16 bytes == the 16 bytes before the final block
    assert raw[-16:] in raw[4:-17]


def test_avro_zigzag_longs():
    import io
    for v in (0, -1, 1, 63, -64, 2**62, -2**62, 2**63 - 1, -2**63):
        out = bytearray()
        avro.write_long(out, v)
        assert avro.read_long(io.BytesIO(bytes(out))) == v


# ---------------------------------------------------------------------------
# spec: hashes, bounds, transforms
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    """Appendix B's published vectors + the generic murmur3 ones."""
    assert icespec.murmur3_x86_32(b"") == 0
    assert icespec.murmur3_x86_32(b"hello") == 0x248BFA47
    as_i32 = lambda h: struct.unpack("<i", struct.pack("<I", h))[0]
    assert as_i32(icespec.bucket_hash("int", 34)) == 2017239379
    assert as_i32(icespec.bucket_hash("long", 34)) == 2017239379  # widened
    assert as_i32(icespec.bucket_hash("string", "iceberg")) == 1210000089


def test_murmur3_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    vals = rng.integers(-2**62, 2**62, size=1000, dtype=np.int64)
    vec = murmur3_long_np(vals)
    for v, h in zip(vals[:50], vec[:50]):
        assert int(h) == icespec.murmur3_x86_32(struct.pack("<q", int(v)))


def test_bounds_serialization_roundtrip():
    cases = [("int", -5), ("long", 2**40), ("timestamptz", 1_700_000_000_000_000),
             ("double", 3.25), ("string", "αβ"), ("boolean", True),
             ("date", 19000), ("float", 1.5)]
    for t, v in cases:
        assert icespec.deserialize_bound(t, icespec.serialize_bound(t, v)) == v
    # Appendix D: long bounds are 8-byte little-endian
    assert icespec.serialize_bound("long", 1) == b"\x01" + b"\x00" * 7


def test_transforms():
    hour = icespec.parse_transform("hour", "ts")
    micros = 490_000 * 3_600_000_000 + 17
    assert hour.apply("timestamptz", micros) == 490_000
    b16 = icespec.parse_transform("bucket[16]", "conv_id")
    assert b16.spec_name == "bucket[16]"
    assert b16.apply("int", 34) == 2017239379 % 16
    ident = icespec.parse_transform("identity", "x")
    assert ident.apply("string", "q") == "q"


def test_spark_schema_conversion(spark):
    from pyspark.sql import types as T
    st = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.ArrayType(T.DoubleType()), True),
        T.StructField("d", T.StructType([
            T.StructField("x", T.TimestampType(), True)]), True),
    ])
    js, last_id, ids = icespec.spark_to_iceberg_schema(st)
    assert js["fields"][0] == {"id": 1, "name": "a", "required": True,
                               "type": "long"}
    assert ids["d.x"] > ids["d"] > ids["c"]
    from sliding_window_aggregators_spark.iceberg import \
        iceberg_to_spark_schema
    assert iceberg_to_spark_schema(js) == st


# ---------------------------------------------------------------------------
# table core (no Spark)
# ---------------------------------------------------------------------------

def _transcript_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ])


def _fake_file(loc, i, bucket, hour, rows=100):
    return {"path": f"{loc}/data/f{i}.parquet", "record_count": rows,
            "file_size_in_bytes": 1000,
            "partition": {"conv_id_bucket": bucket, "ts_hour": hour},
            "lower_bounds": {"ts": hour * 3_600_000_000},
            "upper_bounds": {"ts": (hour + 1) * 3_600_000_000}}


@pytest.fixture()
def table(tmp_path):
    loc = str(tmp_path / "tbl")
    return IcebergTable.create(
        loc, _transcript_schema(),
        partition_spec=[("conv_id", "bucket[4]"), ("ts", "hour")])


def test_table_create_metadata_shape(table):
    m = table._meta
    assert m["format-version"] == 2
    assert m["current-snapshot-id"] == -1
    assert [f["name"] for f in table.schema["fields"]] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    specf = m["partition-specs"][0]["fields"]
    assert specf[0]["transform"] == "bucket[4]"
    assert specf[0]["field-id"] == 1000 and specf[1]["field-id"] == 1001
    assert os.path.exists(os.path.join(table.meta_dir, "version-hint.text"))


def test_table_append_scan_timetravel(table):
    loc = table.location
    s1 = table.append_files([_fake_file(loc, 0, 0, 490000),
                             _fake_file(loc, 1, 1, 490001)],
                            summary={"spark-graft.batch-id": 0})
    s2 = table.append_files([_fake_file(loc, 2, 2, 490002)],
                            summary={"spark-graft.batch-id": 1})
    assert table.snapshot_by_batch(0)["snapshot-id"] == s1["snapshot-id"]
    assert table.snapshot_by_batch(99) is None
    assert table.total_rows() == 300
    assert table.total_rows(snapshot_id=s1["snapshot-id"]) == 200
    # sequence numbers are monotonic, parent chain holds
    assert s2["sequence-number"] == s1["sequence-number"] + 1
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    # fresh handle reloads from disk identically
    t2 = IcebergTable(table.location)
    assert [s["snapshot-id"] for s in t2.snapshots] == \
        [s1["snapshot-id"], s2["snapshot-id"]]


def test_table_partition_and_bounds_pruning(table):
    loc = table.location
    table.append_files([_fake_file(loc, i, i % 4, 490000 + i)
                        for i in range(8)])
    pf = partition_range_filter(ts_hour=(490006, None))
    got = {f["partition"]["ts_hour"]
           for f in table.plan_files(partition_filter=pf)}
    assert got == {490006, 490007}
    pf2 = partition_range_filter(conv_id_bucket=(2, 2))
    assert all(f["partition"]["conv_id_bucket"] == 2
               for f in table.plan_files(partition_filter=pf2))
    # manifest-level pruning: a filter beyond every summary bound plans
    # nothing without opening any manifest entries
    assert table.plan_files(
        partition_filter=partition_range_filter(ts_hour=(600000, None))) == []
    # file-level ts bounds
    bf = {"ts": (490006 * 3_600_000_000 + 1, None)}
    assert {f["partition"]["ts_hour"]
            for f in table.plan_files(bounds_filter=bf)} == {490006, 490007}


def test_table_commit_conflict_retry(table):
    """Two handles racing from the same base version both land (the
    optimistic-retry loop), with distinct sequence numbers."""
    loc = table.location
    t1 = IcebergTable(loc)
    t2 = IcebergTable(loc)  # same base version as t1
    s1 = t1.append_files([_fake_file(loc, 0, 0, 1)])
    s2 = t2.append_files([_fake_file(loc, 1, 1, 2)])  # conflicts, retries
    assert s2["sequence-number"] == s1["sequence-number"] + 1
    t3 = IcebergTable(loc)
    assert t3.total_rows() == 200


def test_table_commit_conflict_raises_without_refresh(table):
    loc = table.location
    t1 = IcebergTable(loc)
    t2 = IcebergTable(loc)
    t1.append_files([_fake_file(loc, 0, 0, 1)])
    with pytest.raises(CommitConflict):
        t2._try_append([_fake_file(loc, 1, 1, 2)], {})


def test_table_crash_debris_ignored(table):
    loc = table.location
    table.append_files([_fake_file(loc, 0, 0, 1)])
    # tmp metadata from a crashed commit + an unreferenced manifest
    open(os.path.join(table.meta_dir, "v9.metadata.json.tmp-x"), "w").write("{")
    open(os.path.join(table.meta_dir, "manifest-dead.avro"), "wb").write(b"Obj")
    t = IcebergTable(loc)
    assert t.total_rows() == 100


# ---------------------------------------------------------------------------
# Spark write path
# ---------------------------------------------------------------------------


def _sample_df(spark, n=400, convs=7):
    from sliding_window_aggregators_spark.sources.transcripts import \
        transcripts_spark
    return transcripts_spark(spark, n, convs)


def test_write_dataframe_roundtrip(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    df = _sample_df(spark)
    t = IcebergTable.create(loc, df.schema,
                            partition_spec=[("conv_id", "bucket[4]"),
                                            ("ts", "hour")])
    snap, files = write_dataframe(df, t, bounds_columns=("ts",),
                                  summary={"spark-graft.batch-id": 0})
    assert snap["summary"]["spark-graft.batch-id"] == "0"
    assert t.total_rows() == df.count()
    got = t.read(spark).select(*df.columns)
    assert got.count() == df.count()
    # exact content equality
    a = got.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_write_partition_values_match_spec_transforms(spark, tmp_path):
    """The partition values the writer derives Spark-side equal the
    spec transforms applied Python-side to the rows in each file."""
    loc = str(tmp_path / "tbl")
    df = _sample_df(spark)
    t = IcebergTable.create(loc, df.schema,
                            partition_spec=[("conv_id", "bucket[4]"),
                                            ("ts", "hour")])
    write_dataframe(df, t)
    b4 = icespec.parse_transform("bucket[4]", "conv_id")
    hour = icespec.parse_transform("hour", "ts")
    import pyarrow.parquet as pq
    checked = 0
    for f in t.plan_files():
        pdf = pq.read_table(f["path"]).to_pandas()
        assert len(pdf) == f["record_count"]
        for cid, ts in zip(pdf.conv_id, pdf.ts):
            assert b4.apply("string", cid) == f["partition"]["conv_id_bucket"]
            micros = int(pd.Timestamp(ts).value // 1000)
            assert hour.apply("timestamptz", micros) == \
                f["partition"]["ts_hour"]
            checked += 1
    assert checked == df.count()


def test_scan_pruning_on_real_files(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    pdf = _turns_pdf(600, 7)
    # stretch event time to span several hours (hour-partition fixture)
    pdf["ts"] = pdf["ts"].iloc[0] + pd.to_timedelta(
        np.arange(len(pdf)) * 30, unit="s")
    df = spark.createDataFrame(pdf)
    t = IcebergTable.create(loc, df.schema,
                            partition_spec=[("ts", "hour")])
    write_dataframe(df, t)
    all_files = t.plan_files()
    hours = sorted({f["partition"]["ts_hour"] for f in all_files})
    assert len(hours) > 1, "fixture must span hours for this test"
    pf = partition_range_filter(ts_hour=(hours[-1], hours[-1]))
    pruned = t.plan_files(partition_filter=pf)
    assert 0 < len(pruned) < len(all_files)
    got = t.read(spark, partition_filter=pf).count()
    # identical to filtering the source by the same hour window
    from pyspark.sql import functions as F
    expect = df.filter(
        F.expr("cast(floor(unix_micros(ts) / 3600000000) as int)")
        == hours[-1]).count()
    assert got == expect
    # bounds pruning agrees with a ts range filter
    lo = ts_micros(df.agg(F.max("ts")).collect()[0][0])
    bf = {"ts": (lo, None)}
    planned = t.plan_files(bounds_filter=bf)
    assert 0 < len(planned) < len(all_files)


# ---------------------------------------------------------------------------
# exactly-once streaming sink
# ---------------------------------------------------------------------------


def _write_chunk(spark, src, pdf, name):
    import shutil
    p = os.path.join(src, name + ".parquet")
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
    f = glob.glob(p + ".tmp/part-*.parquet")[0]
    shutil.move(f, p)
    shutil.rmtree(p + ".tmp")


def _turns_pdf(n=400, convs=7):
    from sliding_window_aggregators_spark.sources.transcripts import \
        transcripts_pandas
    return transcripts_pandas(n, convs)


def test_iceberg_sink_exactly_once_resume(spark, tmp_path):
    from sliding_window_aggregators_spark.streaming.engine import \
        sliding_agg_stream
    from sliding_window_aggregators_spark.streaming.iceberg_sink import \
        write_stream_exactly_once_iceberg

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    loc = str(tmp_path / "tbl")
    os.makedirs(src)
    pdf = _turns_pdf()
    schema = spark.createDataFrame(pdf.head(2)).schema

    def drain():
        srcdf = spark.readStream.schema(schema).parquet(src)
        res = sliding_agg_stream(srcdf, monoid_name="sum",
                                 value_expr="length(text)",
                                 duration="30 seconds")
        q, sink = write_stream_exactly_once_iceberg(
            res, loc, ckpt, partition_spec=[("ts", "hour")])
        q.awaitTermination()
        return sink

    _write_chunk(spark, src, pdf.iloc[:200], "a")
    drain()
    _write_chunk(spark, src,
                 pdf.iloc[200:].assign(ts=lambda d: d.ts +
                                       pd.Timedelta(hours=1)), "b")
    sink = drain()

    got = sink.read_committed(spark)
    assert got.count() == 400
    assert got.groupBy("conv_id", "ts").count().filter("count > 1").count() == 0
    # lineage columns stamped
    assert {"_batch_id", "_partition_id"} <= set(got.columns)
    # one snapshot per micro-batch, batch ids monotonic and deduped
    bids = sink.committed_batches()
    assert bids == sorted(set(bids))
    # a third drain with NO new data adds no duplicate rows
    sink3 = drain()
    assert sink3.read_committed(spark).count() == 400


def test_iceberg_sink_replay_skips(spark, tmp_path):
    """Calling the sink twice with the same batch id commits once."""
    from sliding_window_aggregators_spark.streaming.iceberg_sink import \
        ExactlyOnceIcebergSink
    loc = str(tmp_path / "tbl")
    df = _sample_df(spark, n=100)
    sink = ExactlyOnceIcebergSink(loc, partition_spec=[("ts", "hour")])
    sink(df, 0)
    sink(df, 0)  # replay
    sink(df, 1)
    assert sink.committed_batches() == [0, 1]
    assert sink.read_committed(spark).count() == 200


# ---------------------------------------------------------------------------
# maintenance: rewrite_data_files + expire_snapshots (the lifecycle)
# ---------------------------------------------------------------------------


def test_rewrite_and_expire_lifecycle(spark, tmp_path):
    """write (many small per-batch files) -> rewrite (one REPLACE
    snapshot, few files, time travel intact) -> expire (old snapshots
    dropped, their files physically GC'd, current read untouched)."""
    from sliding_window_aggregators_spark.iceberg import (
        expire_snapshots, rewrite_data_files)
    from sliding_window_aggregators_spark.streaming.iceberg_sink import (
        ExactlyOnceIcebergSink, audit_iceberg_sink)

    loc = str(tmp_path / "tbl")
    pdf = _turns_pdf(600, 7)
    sink = ExactlyOnceIcebergSink(loc, partition_spec=[("ts", "hour")],
                                  target_partitions=2)
    for b in range(6):  # six micro-batches -> many small files
        sink(spark.createDataFrame(pdf.iloc[b * 100:(b + 1) * 100]), b)
    t = IcebergTable(loc)
    before_files = t.plan_files()
    before_rows = t.total_rows()
    pre_rewrite_snap = t.current_snapshot()["snapshot-id"]
    expect = t.read(spark).toPandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    rep = rewrite_data_files(spark, loc)
    assert rep["rewritten"] and rep["files_after"] < rep["files_before"]
    t.refresh()
    assert t.total_rows() == before_rows
    assert len(t.plan_files()) == rep["files_after"]
    got = t.read(spark).toPandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  expect[sorted(expect.columns)])
    # time travel to the pre-rewrite snapshot still reads the OLD files
    old_plan = t.plan_files(snapshot_id=pre_rewrite_snap)
    assert {f["path"] for f in old_plan} == \
        {f["path"] for f in before_files}
    assert t.read(spark, snapshot_id=pre_rewrite_snap).count() == \
        before_rows
    # the audit tolerates the replace snapshot
    rep_a = audit_iceberg_sink(loc)
    assert rep_a["ok"], rep_a

    # expire: metadata commit first, then physical GC of the old files
    erep = expire_snapshots(loc, keep_last=1)
    assert len(erep["expired_snapshots"]) == 6
    assert erep["removed_data_files"] == len(before_files)
    t.refresh()
    assert len(t.snapshots) == 1
    assert t.total_rows() == before_rows
    for f in before_files:
        assert not os.path.exists(f["path"])
    for f in t.plan_files():
        assert os.path.exists(f["path"])
    with pytest.raises(KeyError):
        t.plan_files(snapshot_id=pre_rewrite_snap)
    # idempotent re-run: nothing left to expire
    assert expire_snapshots(loc, keep_last=1)["expired_snapshots"] == []


def test_replace_aborts_on_concurrent_append(table):
    """A rewrite planned before a concurrent append must NOT retry its
    stale file set over the new base — that would silently drop the
    appended files. It raises; the caller replans."""
    loc = table.location
    table.append_files([_fake_file(loc, 0, 0, 1)])
    t2 = IcebergTable(loc)  # the rewriter's handle (plans here)
    planned = [_fake_file(loc, 9, 0, 1)]
    table.append_files([_fake_file(loc, 1, 1, 2)])  # concurrent append
    with pytest.raises(CommitConflict, match="replan"):
        t2.replace_files(planned)
    # nothing lost: both appends' files still live
    t3 = IcebergTable(loc)
    assert t3.total_rows() == 200


def test_rewrite_sort_by_clusters_files(spark, tmp_path):
    """sort-rewrite: within-file conv_id ranges become disjoint-ish
    (clustering evidence from footer stats), rows unchanged."""
    from sliding_window_aggregators_spark.iceberg import (
        rewrite_data_files, write_dataframe)
    loc = str(tmp_path / "tbl")
    pdf = _turns_pdf(400, 11)
    df = spark.createDataFrame(pdf)
    t = IcebergTable.create(loc, df.schema)  # unpartitioned
    write_dataframe(df.repartition(6), t)
    rep = rewrite_data_files(spark, loc, target_partitions=2,
                             sort_by=("conv_id",),
                             bounds_columns=("ts", "conv_id"))
    assert rep["rewritten"] and rep["files_after"] <= 2
    t.refresh()
    assert t.total_rows() == 400
    # footer-derived conv_id bounds present on the rewritten files
    for f in t.plan_files():
        assert f["record_count"] > 0


# ---------------------------------------------------------------------------
# iceberg as a stream SOURCE + the launch artifact end-to-end
# ---------------------------------------------------------------------------


def test_added_files_incremental(table):
    from sliding_window_aggregators_spark.iceberg.source import added_files
    loc = table.location
    s1 = table.append_files([_fake_file(loc, 0, 0, 1),
                             _fake_file(loc, 1, 1, 2)])
    s2 = table.append_files([_fake_file(loc, 2, 2, 3)])
    s3 = table.append_files([_fake_file(loc, 3, 3, 4)])
    inc = added_files(table, from_snapshot=s1["snapshot-id"],
                      to_snapshot=s2["snapshot-id"])
    assert [f["path"] for f in inc] == [_fake_file(loc, 2, 2, 3)["path"]]
    full = added_files(table, from_snapshot=None)
    assert len(full) == 4
    assert {f["snapshot_id"] for f in full} == {
        s1["snapshot-id"], s2["snapshot-id"], s3["snapshot-id"]}


def test_stream_from_iceberg_source_resume(spark, tmp_path):
    """Iceberg table as the STREAM SOURCE: materialized links + the
    file-source checkpoint give snapshot-incremental exactly-once."""
    from sliding_window_aggregators_spark.iceberg.source import (
        materialize_scan, stream_from_iceberg)
    from sliding_window_aggregators_spark.streaming.engine import \
        sliding_agg_stream
    from sliding_window_aggregators_spark.streaming.iceberg_sink import \
        write_stream_exactly_once_iceberg

    src_loc = str(tmp_path / "src_tbl")
    out_loc = str(tmp_path / "out_tbl")
    ckpt = str(tmp_path / "ckpt")
    links = str(tmp_path / "links")
    pdf = _turns_pdf(400, 7)
    df1 = spark.createDataFrame(pdf.iloc[:200])
    src_t = IcebergTable.create(src_loc, df1.schema,
                                partition_spec=[("ts", "hour")])
    write_dataframe(df1, src_t, summary={"spark-graft.batch-id": 0})

    def drain():
        stream = stream_from_iceberg(spark, src_loc, links)
        res = sliding_agg_stream(stream, monoid_name="sum",
                                 value_expr="length(text)",
                                 duration="30 seconds")
        q, sink = write_stream_exactly_once_iceberg(
            res, out_loc, ckpt, partition_spec=[("ts", "hour")])
        q.awaitTermination()
        return sink

    drain()
    # second snapshot appended to the SOURCE table; links re-materialize
    # idempotently (only the new files appear) and the resumed query's
    # file-source log skips everything already consumed
    df2 = spark.createDataFrame(
        pdf.iloc[200:].assign(ts=lambda d: d.ts + pd.Timedelta(hours=1)))
    src_t.refresh()
    write_dataframe(df2, src_t, summary={"spark-graft.batch-id": 1})
    before = set(os.listdir(links))
    new_links = materialize_scan(src_loc, links)
    assert new_links and set(os.listdir(links)) > before
    sink = drain()

    got = sink.read_committed(spark)
    assert got.count() == 400
    assert got.groupBy("conv_id", "ts").count() \
              .filter("count > 1").count() == 0
    # materialize again: idempotent, zero new links
    assert materialize_scan(src_loc, links) == []


@pytest.mark.slow
def test_streaming_job_iceberg_to_iceberg(spark, tmp_path):
    """The launch artifact with --source-format/--sink-format iceberg:
    Iceberg in, Iceberg out, exactly-once across a process resume,
    lineage audited from the output table's own metadata."""
    import subprocess as sp
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src_loc = str(tmp_path / "src_tbl")
    out_loc = str(tmp_path / "out_tbl")
    ckpt = str(tmp_path / "ckpt")
    pdf = _turns_pdf(300, 10)
    df1 = spark.createDataFrame(pdf.iloc[:150])
    src_t = IcebergTable.create(src_loc, df1.schema,
                                partition_spec=[("ts", "hour")])
    write_dataframe(df1, src_t)

    def run(*extra):
        return sp.run(
            [sys.executable, os.path.join(root, "jobs", "streaming_job.py"),
             "--source", src_loc, "--out", out_loc, "--checkpoint", ckpt,
             "--available-now", "--source-format", "iceberg",
             "--sink-format", "iceberg",
             "--iceberg-partition", "conv_id:bucket[4],ts:hour",
             "--audit", *extra],
            capture_output=True, text=True, cwd=root, timeout=420)

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert '"ok": true' in r1.stderr.split("lineage audit: ", 1)[1]

    src_t.refresh()
    write_dataframe(
        spark.createDataFrame(
            pdf.iloc[150:].assign(ts=lambda d: d.ts +
                                  pd.Timedelta(hours=1))), src_t)
    # resume + post-drain maintenance: rewrite REPLACE + expire, audit
    # runs AFTER maintenance and must still pass on the compacted table
    r2 = run("--iceberg-maintain", "1")
    assert r2.returncode == 0, r2.stderr[-2000:]
    mrep = json.loads(
        r2.stderr.split("iceberg maintenance: ", 1)[1].splitlines()[0])
    assert mrep["rewritten"] and mrep["files_after"] < mrep["files_before"]
    assert mrep["expire"]["expired_snapshots"], mrep
    assert '"ok": true' in r2.stderr.split("lineage audit: ", 1)[1]

    out_t = IcebergTable(out_loc)
    got = out_t.read(spark)
    assert got.count() == 300
    assert got.groupBy("conv_id", "ts").count() \
              .filter("count > 1").count() == 0
    # the sink table is hour+bucket partitioned: planned files carry
    # both partition values
    f = out_t.plan_files()[0]
    assert set(f["partition"]) == {"conv_id_bucket", "ts_hour"}
    from sliding_window_aggregators_spark.streaming.iceberg_sink import \
        audit_iceberg_sink
    rep = audit_iceberg_sink(out_loc)
    assert rep["ok"] and rep["rows"] == 300, rep


DR_SCRIPT = r"""
import os, sys
sys.path.insert(0, "/root/repo")
from sliding_window_aggregators_spark.sources import get_spark
from sliding_window_aggregators_spark.sources.transcripts import \
    transcripts_spark
from sliding_window_aggregators_spark.streaming.iceberg_sink import \
    ExactlyOnceIcebergSink

loc, fault = sys.argv[1], sys.argv[2]
spark = get_spark(app="dr", cpus=2, shuffle_partitions=4)
df = transcripts_spark(spark, 100, 5)
sink = ExactlyOnceIcebergSink(loc, partition_spec=[("ts", "hour")],
                              fault_before_commit=fault or None)
sink(df, 0)
print("COMMITTED", sink.committed_batches())
"""


@pytest.mark.slow
def test_iceberg_sink_dr_drill(tmp_path):
    """Driver dies after data files land but before the snapshot commit:
    the files are invisible orphans; the replay commits exactly once;
    remove_orphan_files clears the debris."""
    loc = str(tmp_path / "tbl")
    fault = str(tmp_path / "fault")
    script = str(tmp_path / "dr.py")
    open(script, "w").write(DR_SCRIPT)
    env = dict(os.environ)
    r1 = subprocess.run([sys.executable, script, loc, fault],
                        capture_output=True, text=True, env=env,
                        timeout=600)
    assert r1.returncode == 70, r1.stderr[-2000:]  # the injected power cut
    # data files exist on disk but the table shows nothing
    t = IcebergTable(loc)
    assert t.total_rows() == 0 and t.current_snapshot() is None
    orphans = glob.glob(loc + "/data/**/*.parquet", recursive=True)
    assert orphans, "the crash left staged data files"

    r2 = subprocess.run([sys.executable, script, loc, ""],
                        capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "COMMITTED [0]" in r2.stdout
    t.refresh()
    assert t.total_rows() == 100

    from sliding_window_aggregators_spark.streaming.iceberg_sink import \
        remove_orphan_files
    removed = remove_orphan_files(loc, older_than_s=0)
    assert removed, "orphans from the crashed attempt were removed"
    t.refresh()
    assert t.total_rows() == 100  # live data untouched
