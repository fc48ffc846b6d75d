"""Iceberg v2 table-format structures, per the public specification.

Everything here is transcribed from https://iceberg.apache.org/spec/
("Manifests", "Manifest Lists", "Appendix C: JSON serialization",
"Appendix D: Single-value serialization", "Partition Transforms"):

- the Avro schemas for ``manifest_entry`` (data-file manifests) and
  ``manifest_file`` (manifest lists), with the spec's field-ids attached
  as ``field-id`` schema attributes the way Iceberg's Java writer does;
- Spark StructType -> Iceberg schema JSON (assigning stable field ids);
- the single-value binary serialization used for column bounds
  (long/timestamp = 8-byte little-endian, int = 4-byte LE, string =
  UTF-8, per Appendix D);
- partition transforms: ``identity``, ``hour`` (timestamps -> hours
  from epoch), and ``bucket[N]`` (murmur3_x86_32 of the little-endian
  value, per "Appendix B: 32-bit Hash Requirements").

The reference repo has no table format (in-memory library); this module
serves the north rule's Iceberg-table requirement without the missing
iceberg-spark runtime jar — the same from-scratch move as the vendored
protobuf runtime.
"""

from __future__ import annotations

import struct

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Avro schemas (spec field-ids in the "field-id" attribute)
# ---------------------------------------------------------------------------


def _kv_map_schema(name: str, map_id: int, key_id: int, value_id: int,
                   key_type="int", value_type="bytes"):
    """Iceberg encodes non-string-key maps as array<record{key,value}>
    with logicalType map (spec: Appendix A — Avro notes)."""
    return ["null", {
        "type": "array", "logicalType": "map",
        "items": {
            "type": "record", "name": f"k{key_id}_v{value_id}",
            "fields": [
                {"name": "key", "type": key_type, "field-id": key_id},
                {"name": "value", "type": value_type, "field-id": value_id},
            ],
        },
    }]


def partition_avro_schema(partition_fields):
    """Avro schema of the ``partition`` struct (r102) for a spec's fields.

    ``partition_fields``: list of dicts with name / field-id / result
    Avro type ("int", "long", "string"...). Partition field ids start at
    1000 per the spec.
    """
    return {
        "type": "record", "name": "r102",
        "fields": [
            {"name": f["name"], "type": ["null", f["avro_type"]],
             "default": None, "field-id": f["field-id"]}
            for f in partition_fields
        ],
    }


def manifest_entry_schema(partition_fields):
    """manifest_entry Avro schema (spec: "Manifests", v2 field set)."""
    data_file = {
        "type": "record", "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134,
             "doc": "0: data, 1: position deletes, 2: equality deletes"},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102,
             "type": partition_avro_schema(partition_fields)},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "column_sizes", "field-id": 108, "default": None,
             "type": _kv_map_schema("column_sizes", 108, 117, 118,
                                    value_type="long")},
            {"name": "value_counts", "field-id": 109, "default": None,
             "type": _kv_map_schema("value_counts", 109, 119, 120,
                                    value_type="long")},
            {"name": "null_value_counts", "field-id": 110, "default": None,
             "type": _kv_map_schema("null_value_counts", 110, 121, 122,
                                    value_type="long")},
            {"name": "lower_bounds", "field-id": 125, "default": None,
             "type": _kv_map_schema("lower_bounds", 125, 126, 127)},
            {"name": "upper_bounds", "field-id": 128, "default": None,
             "type": _kv_map_schema("upper_bounds", 128, 129, 130)},
            {"name": "split_offsets", "field-id": 132, "default": None,
             "type": ["null", {"type": "array", "items": "long",
                               "element-id": 133}]},
            {"name": "sort_order_id", "type": ["null", "int"],
             "default": None, "field-id": 140},
        ],
    }
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0,
             "doc": "0: existing, 1: added, 2: deleted"},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


FIELD_SUMMARY = {
    "type": "record", "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"],
         "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 511},
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517,
         "doc": "0: data, 1: deletes"},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions", "field-id": 507, "default": None,
         "type": ["null", {"type": "array", "items": FIELD_SUMMARY,
                           "element-id": 508}]},
    ],
}


# ---------------------------------------------------------------------------
# Spark schema -> Iceberg schema JSON (spec: Appendix C)
# ---------------------------------------------------------------------------

_SPARK_TO_ICEBERG = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "binary",
    T.DateType: "date",
    T.TimestampType: "timestamptz",   # Spark TimestampType is UTC-adjusted
    T.TimestampNTZType: "timestamp",
}


def spark_to_iceberg_schema(spark_schema: T.StructType, schema_id: int = 0):
    """Convert a Spark StructType to Iceberg schema JSON with field ids.

    Ids are assigned depth-first starting at 1 (the Java writer's fresh
    assignment order). Returns (schema_json, last_column_id,
    name_to_id)."""
    next_id = [0]
    name_to_id: dict[str, int] = {}

    def convert(dt, prefix):
        for cls, s in _SPARK_TO_ICEBERG.items():
            if isinstance(dt, cls):
                return s
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision}, {dt.scale})"
        if isinstance(dt, T.ArrayType):
            next_id[0] += 1
            eid = next_id[0]
            return {"type": "list", "element-id": eid,
                    "element": convert(dt.elementType, prefix + ".element"),
                    "element-required": not dt.containsNull}
        if isinstance(dt, T.MapType):
            next_id[0] += 1
            kid = next_id[0]
            next_id[0] += 1
            vid = next_id[0]
            return {"type": "map", "key-id": kid,
                    "key": convert(dt.keyType, prefix + ".key"),
                    "value-id": vid,
                    "value": convert(dt.valueType, prefix + ".value"),
                    "value-required": not dt.valueContainsNull}
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                next_id[0] += 1
                fid = next_id[0]
                fname = f"{prefix}.{f.name}" if prefix else f.name
                name_to_id[fname] = fid
                fields.append({
                    "id": fid, "name": f.name,
                    "required": not f.nullable,
                    "type": convert(f.dataType, fname),
                })
            return {"type": "struct", "fields": fields}
        raise TypeError(f"no Iceberg mapping for Spark type {dt}")

    struct = convert(spark_schema, "")
    struct["schema-id"] = schema_id
    return struct, next_id[0], name_to_id


# ---------------------------------------------------------------------------
# single-value serialization for bounds (spec: Appendix D)
# ---------------------------------------------------------------------------


def serialize_bound(iceberg_type: str, value) -> bytes:
    if value is None:
        raise ValueError("cannot serialize a null bound")
    if iceberg_type == "int":
        return struct.pack("<i", int(value))
    if iceberg_type in ("long", "timestamp", "timestamptz"):
        return struct.pack("<q", int(value))
    if iceberg_type == "float":
        return struct.pack("<f", float(value))
    if iceberg_type == "double":
        return struct.pack("<d", float(value))
    if iceberg_type == "string":
        return str(value).encode("utf-8")
    if iceberg_type == "boolean":
        return b"\x01" if value else b"\x00"
    if iceberg_type == "date":
        return struct.pack("<i", int(value))
    raise TypeError(f"no bound serialization for {iceberg_type}")


def deserialize_bound(iceberg_type: str, b: bytes):
    if iceberg_type == "int":
        return struct.unpack("<i", b)[0]
    if iceberg_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", b)[0]
    if iceberg_type == "float":
        return struct.unpack("<f", b)[0]
    if iceberg_type == "double":
        return struct.unpack("<d", b)[0]
    if iceberg_type == "string":
        return b.decode("utf-8")
    if iceberg_type == "boolean":
        return b != b"\x00"
    if iceberg_type == "date":
        return struct.unpack("<i", b)[0]
    raise TypeError(f"no bound deserialization for {iceberg_type}")


# ---------------------------------------------------------------------------
# partition transforms (spec: "Partition Transforms" + Appendix B hashes)
# ---------------------------------------------------------------------------


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """murmurhash3_x86_32, the spec's required 32-bit hash (Appendix B)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    m32 = 0xFFFFFFFF
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & m32
        k = ((k << 15) | (k >> 17)) & m32
        k = (k * c2) & m32
        h ^= k
        h = ((h << 13) | (h >> 19)) & m32
        h = (h * 5 + 0xE6546B64) & m32
    tail = data[n - n % 4:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & m32
        k = ((k << 15) | (k >> 17)) & m32
        k = (k * c2) & m32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m32
    h ^= h >> 16
    return h


def bucket_hash(iceberg_type: str, value) -> int:
    """hash input per spec Appendix B: int/long/timestamp hash the
    8-byte little-endian long; strings hash UTF-8 bytes."""
    if iceberg_type in ("int", "long", "date", "timestamp", "timestamptz"):
        data = struct.pack("<q", int(value))
    elif iceberg_type == "string":
        data = str(value).encode("utf-8")
    elif iceberg_type == "binary":
        data = bytes(value)
    else:
        raise TypeError(f"bucket transform undefined for {iceberg_type}")
    return murmur3_x86_32(data)


class Transform:
    """A partition transform: source column -> partition value."""

    def __init__(self, name: str, source: str, n: int | None = None):
        self.name, self.source, self.n = name, source, n

    @property
    def spec_name(self) -> str:
        return f"bucket[{self.n}]" if self.name == "bucket" else self.name

    def result_avro_type(self, source_iceberg_type: str) -> str:
        if self.name == "identity":
            return {"int": "int", "long": "long", "string": "string",
                    "date": "int", "timestamp": "long",
                    "timestamptz": "long"}[source_iceberg_type]
        return "int"  # hour / bucket produce ints

    def result_iceberg_type(self, source_iceberg_type: str) -> str:
        if self.name == "identity":
            return source_iceberg_type
        return "int"

    def sql_expr(self, src_sql: str, source_iceberg_type: str) -> str:
        """Spark SQL expression computing the partition value.

        Used to derive the partition column the writer groups by; the
        bucket transform is evaluated JVM-side only for int/long
        sources (pure arithmetic); string buckets fall back to a
        Python-side pre-pass (not needed by the shipped specs).
        """
        if self.name == "identity":
            return src_sql
        if self.name == "hour":
            # timestamps are micros from epoch; hour = floordiv 3600e6
            return (f"cast(floor(unix_micros({src_sql}) / 3600000000)"
                    " as int)")
        if self.name == "bucket":
            raise NotImplementedError(
                "bucket partition values are computed via mapInPandas "
                "(murmur3), not a SQL expr")
        raise TypeError(self.name)

    def apply(self, iceberg_type: str, value):
        """Python-side evaluation (used when parsing written layouts)."""
        if value is None:
            return None
        if self.name == "identity":
            return value
        if self.name == "hour":
            return int(value) // 3_600_000_000  # micros -> hours
        if self.name == "bucket":
            return (bucket_hash(iceberg_type, value) & 0x7FFFFFFF) % self.n
        raise TypeError(self.name)


def parse_transform(s: str, source: str) -> Transform:
    """'identity' | 'hour' | 'bucket[N]' -> Transform."""
    if s.startswith("bucket[") and s.endswith("]"):
        return Transform("bucket", source, n=int(s[7:-1]))
    if s in ("identity", "hour"):
        return Transform(s, source)
    raise ValueError(f"unsupported transform {s!r}")
