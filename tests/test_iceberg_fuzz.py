"""Property fuzz for the from-scratch Iceberg layers.

The Avro encoder/decoder and the table commit protocol are load-bearing
(every manifest read goes through them), so they get the same
hypothesis treatment as the sink-compaction and oracle layers:
random values through random schemas round-trip bit-exactly, and random
interleavings of append / replace / expire keep the table's row
accounting and on-disk reachability invariants.
"""

import io
import json
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sliding_window_aggregators_spark.iceberg import avro
from sliding_window_aggregators_spark.iceberg import spec as icespec
from sliding_window_aggregators_spark.iceberg.maintenance import (
    expire_snapshots)
from sliding_window_aggregators_spark.iceberg.table import (
    CommitConflict, IcebergTable)

# ---------------------------------------------------------------------------
# avro: random (schema, value) round-trips
# ---------------------------------------------------------------------------

LONGS = st.integers(min_value=-2**63, max_value=2**63 - 1)
NAMES = st.sampled_from(list("abcdefgh"))


def _values_for(schema):
    t = avro._schema_type(schema)
    if t == "union":
        return st.one_of(*[_values_for(b) for b in schema])
    if t == "null":
        return st.none()
    if t == "boolean":
        return st.booleans()
    if t in ("int", "long"):
        return LONGS if t == "long" else st.integers(-2**31, 2**31 - 1)
    if t == "double":
        return st.floats(allow_nan=False)  # NaN != NaN breaks equality
    if t == "float":
        # round-trippable float32 values only
        return st.sampled_from([0.0, 1.5, -2.25, 1024.0, -0.5])
    if t == "string":
        return st.text(max_size=20)
    if t == "bytes":
        return st.binary(max_size=20)
    if t == "fixed":
        return st.binary(min_size=schema["size"], max_size=schema["size"])
    if t == "record":
        return st.fixed_dictionaries(
            {f["name"]: _values_for(f["type"]) for f in schema["fields"]})
    if t == "array":
        return st.lists(_values_for(schema["items"]), max_size=5)
    if t == "map":
        return st.dictionaries(st.text(max_size=8),
                               _values_for(schema["values"]), max_size=5)
    raise TypeError(t)


@st.composite
def schemas(draw, depth=2):
    prim = st.sampled_from(["null", "boolean", "int", "long", "double",
                            "string", "bytes"])
    if depth == 0:
        return draw(prim)
    kind = draw(st.integers(0, 5))
    if kind == 0:
        return draw(prim)
    if kind == 1:
        n = draw(st.integers(1, 3))
        names = draw(st.lists(NAMES, min_size=n, max_size=n, unique=True))
        return {"type": "record",
                "name": f"r{draw(st.integers(0, 999))}",
                "fields": [{"name": nm,
                            "type": draw(schemas(depth=depth - 1))}
                           for nm in names]}
    if kind == 2:
        return {"type": "array",
                "items": draw(schemas(depth=depth - 1))}
    if kind == 3:
        return {"type": "map",
                "values": draw(schemas(depth=depth - 1))}
    if kind == 4:
        # union: null + one non-null branch (the Iceberg shape)
        branch = draw(st.sampled_from(["boolean", "long", "string",
                                       "bytes"]))
        return ["null", branch]
    return {"type": "fixed", "name": f"f{draw(st.integers(0, 99))}",
            "size": draw(st.integers(1, 8))}


@given(data=st.data())
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_avro_encode_decode_roundtrip_fuzz(data):
    schema = data.draw(schemas())
    value = data.draw(_values_for(schema))
    out = bytearray()
    avro.encode(out, schema, value)
    got = avro.decode(io.BytesIO(bytes(out)), schema)
    assert got == value


@given(vals=st.lists(LONGS, max_size=30))
@settings(max_examples=100, deadline=None)
def test_avro_container_fuzz_longs(tmp_path_factory, vals):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    p = str(tmp_path_factory.mktemp("avf") / "f.avro")
    recs = [{"v": v} for v in vals]
    avro.write_container(p, schema, recs)
    _, got = avro.read_container(p)
    assert got == recs


@given(v=LONGS)
@settings(max_examples=200, deadline=None)
def test_bounds_roundtrip_fuzz(v):
    assert icespec.deserialize_bound(
        "long", icespec.serialize_bound("long", v)) == v


# ---------------------------------------------------------------------------
# table: random append / replace / expire interleavings
# ---------------------------------------------------------------------------


def _mk_table(tmp_path):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    return IcebergTable.create(
        str(tmp_path / "t"), schema,
        partition_spec=[("ts", "hour")])


@given(ops=st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 3)),
        st.tuples(st.just("replace"), st.integers(1, 2)),
        st.tuples(st.just("expire"), st.integers(1, 3)),
    ),
    min_size=1, max_size=12))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_table_lifecycle_invariants_fuzz(tmp_path_factory, ops):
    """Invariants under any append/replace/expire interleaving:
    - total_rows == rows of the current live set (appends accumulate,
      replace resets to its own file set);
    - every planned file is a registered path;
    - after expire(k), len(snapshots) <= k and the current read is
      unchanged;
    - a fresh handle agrees with the mutating handle."""
    tmp = tmp_path_factory.mktemp("icf")
    t = _mk_table(tmp)
    loc = t.location
    fid = [0]
    live_rows = 0

    def fake(rows):
        fid[0] += 1
        # fabricate a registered data file (commit protocol does not
        # open data files; scan accounting is from manifests)
        path = os.path.join(loc, "data", f"f{fid[0]}.parquet")
        return {"path": path, "record_count": rows,
                "file_size_in_bytes": 10,
                "partition": {"ts_hour": fid[0] % 5}}

    for op, n in ops:
        if op == "append":
            t.append_files([fake(100) for _ in range(n)])
            live_rows += 100 * n
        elif op == "replace":
            if t.current_snapshot() is None:
                continue
            t.replace_files([fake(live_rows)] if live_rows else [])
        elif op == "expire":
            before = t.total_rows()
            rep = expire_snapshots(loc, keep_last=n)
            t.refresh()
            assert len(t.snapshots) <= max(
                n, 1) or not rep["expired_snapshots"]
            assert t.total_rows() == before
        assert t.total_rows() == live_rows
        fresh = IcebergTable(loc)
        assert fresh.total_rows() == live_rows
        assert len(fresh.plan_files()) == len(t.plan_files())


def test_expire_preserves_current_read_with_real_gc(tmp_path):
    """expire's physical GC never deletes a file the current snapshot
    references, across a replace that orphans everything older."""
    t = _mk_table(tmp_path)
    loc = t.location
    paths = []

    def fake(i, rows=10):
        p = os.path.join(loc, "data", f"g{i}.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        open(p, "wb").write(b"x" * 10)
        paths.append(p)
        return {"path": p, "record_count": rows,
                "file_size_in_bytes": 10, "partition": {"ts_hour": i}}

    t.append_files([fake(0), fake(1)])
    t.append_files([fake(2)])
    t.replace_files([fake(3, rows=30)])
    rep = expire_snapshots(loc, keep_last=1)
    assert rep["removed_data_files"] == 3
    t.refresh()
    assert t.total_rows() == 30
    assert os.path.exists(paths[3])
    for p in paths[:3]:
        assert not os.path.exists(p)


def test_append_after_failed_replace_still_consistent(tmp_path):
    t = _mk_table(tmp_path)
    loc = t.location
    f = lambda i: {"path": os.path.join(loc, "data", f"h{i}.parquet"),
                   "record_count": 5, "file_size_in_bytes": 1,
                   "partition": {"ts_hour": 0}}
    t.append_files([f(0)])
    stale = IcebergTable(loc)
    t.append_files([f(1)])
    with pytest.raises(CommitConflict):
        stale.replace_files([f(9)])
    t.append_files([f(2)])
    assert IcebergTable(loc).total_rows() == 15
