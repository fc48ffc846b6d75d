"""A filesystem-catalog Iceberg v2 table, pure Python.

Implements the Iceberg table spec's metadata tree over a directory
(the HadoopCatalog layout): versioned ``metadata/v{N}.metadata.json``
with an atomic-rename commit protocol + ``version-hint.text``, snapshot
manifest lists and manifests as Avro (iceberg/avro.py), scan planning
with manifest- and file-level pruning, and snapshot time travel.

Spec: https://iceberg.apache.org/spec/ — "Table Metadata",
"Snapshots", "Manifests", "Manifest Lists", "File System Tables"
(version-hint + rename-based atomic swap), "Appendix C".

Commit atomicity on POSIX: ``os.link(tmp, final)`` creates the final
metadata file only if absent (rename() would silently overwrite), which
is exactly the "atomic rename without overwrite" the spec requires of
filesystem tables; a lost race surfaces as ``FileExistsError`` ->
``CommitConflict`` -> the caller re-reads and retries on the new base.

A real iceberg-spark runtime pointed at this directory sees a
conforming v2 table; in this container (no iceberg jar, no network) the
scan path feeds the planned parquet files straight to
``spark.read.parquet`` and re-stamps identity partition columns.

Reference parity: none (the reference is an in-memory library) — this
exists for the north rule's "Iceberg tables / exactly-once Iceberg
sink, per-partition lineage, resumable offsets" clause.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from . import avro
from . import spec as icespec


class CommitAborted(Exception):
    """A retrying commit stopped because its ``abort_if`` predicate held
    on the refreshed table (the work is already committed elsewhere);
    the caller treats it as an idempotent skip. Any staged-but-
    unregistered data files remain invisible orphans for
    remove_orphan_files."""


class CommitConflict(Exception):
    """Another writer committed the same metadata version first."""


def _now_ms() -> int:
    return int(time.time() * 1000)


class IcebergTable:
    def __init__(self, location: str):
        self.location = os.path.abspath(location)
        self.meta_dir = os.path.join(self.location, "metadata")
        self._meta = None
        self._version = None
        self.refresh()

    # -- loading ------------------------------------------------------------

    def refresh(self) -> None:
        v = self._current_version()
        if v is None:
            raise FileNotFoundError(
                f"no Iceberg table at {self.location!r} "
                "(no metadata/v*.metadata.json)")
        with open(self._meta_path(v)) as f:
            self._meta = json.load(f)
        self._version = v

    def _meta_path(self, v: int) -> str:
        return os.path.join(self.meta_dir, f"v{v}.metadata.json")

    def _current_version(self):
        # version-hint is advisory (spec: readers must tolerate a stale
        # hint); authoritative = max existing v*.metadata.json
        best = None
        try:
            names = os.listdir(self.meta_dir)
        except FileNotFoundError:
            return None
        for n in names:
            if n.startswith("v") and n.endswith(".metadata.json"):
                try:
                    v = int(n[1:-len(".metadata.json")])
                except ValueError:
                    continue
                best = v if best is None else max(best, v)
        return best

    # -- creation -----------------------------------------------------------

    @classmethod
    def create(cls, location: str, spark_schema, *,
               partition_spec=(), properties=None) -> "IcebergTable":
        """Create a new table.

        ``partition_spec``: sequence of (source_column, transform_str)
        — e.g. ``[("conv_id", "bucket[16]"), ("ts", "hour")]``.
        """
        location = os.path.abspath(location)
        meta_dir = os.path.join(location, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        schema_json, last_col_id, name_to_id = \
            icespec.spark_to_iceberg_schema(spark_schema)

        fields = []
        pfid = 999
        for src, tname in partition_spec:
            pfid += 1
            tr = icespec.parse_transform(tname, src)
            pname = src if tr.name == "identity" else f"{src}_{tr.name}"
            fields.append({
                "name": pname, "transform": tr.spec_name,
                "source-id": name_to_id[src], "field-id": pfid,
            })
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, location)),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": _now_ms(),
            "last-column-id": last_col_id,
            "schemas": [schema_json],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": fields}],
            "default-spec-id": 0,
            "last-partition-id": pfid,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": dict(properties or {}),
            "current-snapshot-id": -1,
            "refs": {},
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        path = os.path.join(meta_dir, "v1.metadata.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(f"table already exists at {location}")
        finally:
            os.unlink(tmp)
        cls._write_hint(meta_dir, 1)
        return cls(location)

    @staticmethod
    def _write_hint(meta_dir: str, v: int) -> None:
        hint = os.path.join(meta_dir, "version-hint.text")
        tmp = hint + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, hint)  # hint is advisory: overwrite is fine

    # -- schema / spec accessors ---------------------------------------------

    @property
    def schema(self) -> dict:
        sid = self._meta["current-schema-id"]
        return next(s for s in self._meta["schemas"]
                    if s["schema-id"] == sid)

    def field_id(self, name: str) -> int:
        for f in self.schema["fields"]:
            if f["name"] == name:
                return f["id"]
        raise KeyError(name)

    def field_type(self, name: str) -> str:
        for f in self.schema["fields"]:
            if f["name"] == name:
                return f["type"]
        raise KeyError(name)

    @property
    def partition_fields(self):
        """Resolved partition fields: name / transform / source column /
        source+result iceberg types / avro type / field-id."""
        spec_ = next(s for s in self._meta["partition-specs"]
                     if s["spec-id"] == self._meta["default-spec-id"])
        id_to_name = {f["id"]: f["name"] for f in self.schema["fields"]}
        out = []
        for f in spec_["fields"]:
            src = id_to_name[f["source-id"]]
            tr = icespec.parse_transform(f["transform"], src)
            styp = self.field_type(src)
            out.append({
                "name": f["name"], "field-id": f["field-id"],
                "source": src, "transform": tr,
                "source_type": styp,
                "result_type": tr.result_iceberg_type(styp),
                "avro_type": tr.result_avro_type(styp),
            })
        return out

    # -- snapshots ------------------------------------------------------------

    @property
    def snapshots(self):
        return list(self._meta["snapshots"])

    def current_snapshot(self):
        sid = self._meta.get("current-snapshot-id", -1)
        if sid == -1:
            return None
        return next(s for s in self._meta["snapshots"]
                    if s["snapshot-id"] == sid)

    def snapshot_by_batch(self, batch_id: int):
        """The exactly-once hook: find a committed snapshot carrying this
        micro-batch id in its summary (Iceberg's own streaming sink uses
        the same summary-property recipe)."""
        key = str(batch_id)
        for s in self._meta["snapshots"]:
            if s.get("summary", {}).get("spark-graft.batch-id") == key:
                return s
        return None

    # -- commit ---------------------------------------------------------------

    def append_files(self, files, *, summary=None, max_retries: int = 10,
                     abort_if=None):
        """Commit an append snapshot registering ``files``.

        ``files``: list of dicts with keys
          path, record_count, file_size_in_bytes,
          partition (dict partition-field-name -> value, may be {}),
          lower_bounds / upper_bounds (optional dict field-name -> value).

        Retries on CommitConflict with a refreshed base (optimistic
        concurrency per the spec's commit model). Returns the snapshot.

        ``abort_if``: optional predicate over the REFRESHED table,
        re-checked after every conflict before retrying — raises
        :class:`CommitAborted` when true. This closes the
        zombie-vs-failover double-commit window for idempotent callers
        (e.g. the exactly-once sink re-checking its batch id): without
        it, a retry after refresh would happily commit a batch a
        concurrent driver just committed."""
        return self._commit_with_retry(files, summary or {}, "append",
                                       True, max_retries, abort_if)

    def replace_files(self, files, *, summary=None, max_retries: int = 10):
        """Commit a REPLACE snapshot: ``files`` become the table's whole
        live file set (previous manifests are NOT carried forward) —
        the commit shape of rewrite_data_files / compaction. Earlier
        snapshots keep referencing the old files, so time travel is
        intact until expire_snapshots drops them.

        Unlike appends, a replace must NOT blindly retry on conflict: a
        concurrent append's files are absent from the planned set, and
        re-committing it over the new base would silently drop them.
        So a conflict whose refreshed current snapshot differs from the
        plan base raises (the caller replans — Iceberg's own rewrite
        validation); only same-snapshot races (e.g. an expiry's pure
        metadata bump) retry."""
        base = self._meta.get("current-snapshot-id", -1)
        for attempt in range(max_retries):
            try:
                return self._try_append(files, summary or {}, "replace",
                                        False)
            except CommitConflict:
                self.refresh()
                if self._meta.get("current-snapshot-id", -1) != base:
                    raise CommitConflict(
                        "table data changed since the replace was "
                        "planned (concurrent append?) — replan the "
                        "rewrite instead of dropping the new files")
                if attempt == max_retries - 1:
                    raise

    def _commit_with_retry(self, files, summary, operation, carry_forward,
                           max_retries, abort_if=None):
        for attempt in range(max_retries):
            try:
                return self._try_append(files, summary, operation,
                                        carry_forward)
            except CommitConflict:
                if attempt == max_retries - 1:
                    raise
                self.refresh()
                if abort_if is not None and abort_if(self):
                    raise CommitAborted(
                        "commit abandoned after conflict: the abort "
                        "predicate is satisfied on the refreshed table "
                        "(a concurrent writer already committed this "
                        "work)")

    def _try_append(self, files, summary, operation="append",
                    carry_forward=True):
        base = self._meta
        seq = base["last-sequence-number"] + 1
        snap_id = seq  # monotonic; any unique long is spec-valid
        parent = base.get("current-snapshot-id", -1)
        pfields = self.partition_fields

        entry_schema = icespec.manifest_entry_schema(pfields)
        entries = []
        added_rows = 0
        summaries = {f["name"]: {"contains_null": False, "lo": None,
                                 "hi": None} for f in pfields}
        for fd in files:
            part = {f["name"]: fd.get("partition", {}).get(f["name"])
                    for f in pfields}
            for f in pfields:
                v = part[f["name"]]
                s = summaries[f["name"]]
                if v is None:
                    s["contains_null"] = True
                else:
                    s["lo"] = v if s["lo"] is None else min(s["lo"], v)
                    s["hi"] = v if s["hi"] is None else max(s["hi"], v)
            lb, ub = {}, {}
            for col, val in (fd.get("lower_bounds") or {}).items():
                lb[self.field_id(col)] = icespec.serialize_bound(
                    self.field_type(col), val)
            for col, val in (fd.get("upper_bounds") or {}).items():
                ub[self.field_id(col)] = icespec.serialize_bound(
                    self.field_type(col), val)
            entries.append({
                "status": 1,  # ADDED
                "snapshot_id": snap_id,
                "sequence_number": None,   # inherited: = manifest's seq
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": fd["path"],
                    "file_format": "PARQUET",
                    "partition": part,
                    "record_count": fd["record_count"],
                    "file_size_in_bytes": fd["file_size_in_bytes"],
                    "column_sizes": None,
                    "value_counts": None,
                    "null_value_counts": None,
                    "lower_bounds":
                        [{"key": k, "value": v} for k, v in lb.items()]
                        if lb else None,
                    "upper_bounds":
                        [{"key": k, "value": v} for k, v in ub.items()]
                        if ub else None,
                    "split_offsets": None,
                    "sort_order_id": None,
                },
            })
            added_rows += fd["record_count"]

        manifest_name = f"manifest-{snap_id}-{uuid.uuid4().hex}.avro"
        manifest_path = os.path.join(self.meta_dir, manifest_name)
        mlen = avro.write_container(
            manifest_path, entry_schema, entries,
            metadata={
                "schema": json.dumps(self.schema),
                "schema-id": str(self._meta["current-schema-id"]),
                "partition-spec": json.dumps(
                    [{"name": f["name"], "transform": f["transform"].spec_name,
                      "source-id": self.field_id(f["source"]),
                      "field-id": f["field-id"]} for f in pfields]),
                "partition-spec-id": str(self._meta["default-spec-id"]),
                "format-version": "2",
                "content": "data",
            })

        new_manifest = {
            "manifest_path": manifest_path,
            "manifest_length": mlen,
            "partition_spec_id": self._meta["default-spec-id"],
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": added_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [
                {"contains_null": summaries[f["name"]]["contains_null"],
                 "contains_nan": None,
                 "lower_bound":
                     icespec.serialize_bound(f["result_type"],
                                             summaries[f["name"]]["lo"])
                     if summaries[f["name"]]["lo"] is not None else None,
                 "upper_bound":
                     icespec.serialize_bound(f["result_type"],
                                             summaries[f["name"]]["hi"])
                     if summaries[f["name"]]["hi"] is not None else None}
                for f in pfields
            ] or None,
        }

        # append: the snapshot's manifest list = previous snapshot's +
        # the new one; replace: the new manifest stands alone
        prev = self.current_snapshot()
        prev_manifests = []
        if carry_forward and prev is not None:
            _, prev_manifests = avro.read_container(prev["manifest-list"])
        mlist_path = os.path.join(
            self.meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
        avro.write_container(
            mlist_path, icespec.MANIFEST_FILE_SCHEMA,
            prev_manifests + [new_manifest],
            metadata={"snapshot-id": str(snap_id),
                      "parent-snapshot-id": str(parent),
                      "sequence-number": str(seq),
                      "format-version": "2"})

        snap = {
            "snapshot-id": snap_id,
            "parent-snapshot-id": parent if parent != -1 else None,
            "sequence-number": seq,
            "timestamp-ms": _now_ms(),
            "manifest-list": mlist_path,
            "schema-id": self._meta["current-schema-id"],
            "summary": {"operation": operation,
                        "added-data-files": str(len(files)),
                        "added-records": str(added_rows),
                        **{k: str(v) for k, v in summary.items()}},
        }
        new_meta = dict(base)
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = snap["timestamp-ms"]
        new_meta["snapshots"] = base["snapshots"] + [snap]
        new_meta["current-snapshot-id"] = snap_id
        new_meta["refs"] = {"main": {"snapshot-id": snap_id,
                                     "type": "branch"}}
        new_meta["snapshot-log"] = base["snapshot-log"] + [
            {"timestamp-ms": snap["timestamp-ms"],
             "snapshot-id": snap_id}]
        new_meta["metadata-log"] = (base["metadata-log"] + [
            {"timestamp-ms": base["last-updated-ms"],
             "metadata-file": self._meta_path(self._version)}])[-10:]

        try:
            self._commit_metadata(new_meta)
        except CommitConflict:
            # the manifest + manifest-list written above reference a
            # snapshot that will never exist on this base — without this
            # cleanup every conflict retry (and every aborted replace)
            # permanently leaks two metadata/*.avro files that no GC
            # covers (expire_snapshots only walks committed snapshots,
            # remove_orphan_files only data/*.parquet)
            for p in (manifest_path, mlist_path):
                try:
                    os.unlink(p)
                except OSError:
                    pass
            raise
        return snap

    def _commit_metadata(self, new_meta) -> None:
        """Atomically publish ``new_meta`` as the next metadata version
        (the single commit point for appends, replaces, and expiry)."""
        new_meta["last-updated-ms"] = _now_ms()
        new_v = self._version + 1
        path = self._meta_path(new_v)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(new_meta, f, indent=1)
        try:
            os.link(tmp, path)  # atomic create-if-absent = the commit
        except FileExistsError:
            raise CommitConflict(f"v{new_v} already committed")
        finally:
            os.unlink(tmp)
        self._write_hint(self.meta_dir, new_v)
        self._meta, self._version = new_meta, new_v

    # -- scan planning ---------------------------------------------------------

    def plan_files(self, *, snapshot_id=None, partition_filter=None,
                   bounds_filter=None):
        """Plan a scan: the live data files of a snapshot, pruned.

        ``partition_filter``: callable(dict partition-name -> value) ->
        bool, applied at BOTH manifest level (via field_summary bounds:
        a manifest is skipped only if NO value in [lo, hi] can pass —
        evaluated conservatively via the endpoints for monotone
        predicates... callers pass per-field range predicates, see
        ``partition_range_filter``) and file level (exact values).

        ``bounds_filter``: dict column -> (min, max) — file skipped when
        its column bounds prove no overlap (Iceberg's min/max pruning).
        """
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            snap = next((s for s in self._meta["snapshots"]
                         if s["snapshot-id"] == snapshot_id), None)
            if snap is None:
                raise KeyError(
                    f"snapshot {snapshot_id} not in table (expired?)")
        if snap is None:
            return []
        _, manifests = avro.read_container(snap["manifest-list"])
        pfields = self.partition_fields
        out = []
        for m in manifests:
            if (partition_filter is not None and m.get("partitions")
                    and hasattr(partition_filter, "manifest_may_match")):
                los, his = {}, {}
                for f, s in zip(pfields, m["partitions"]):
                    if s["lower_bound"] is not None:
                        los[f["name"]] = icespec.deserialize_bound(
                            f["result_type"], s["lower_bound"])
                        his[f["name"]] = icespec.deserialize_bound(
                            f["result_type"], s["upper_bound"])
                if not partition_filter.manifest_may_match(los, his):
                    continue  # whole manifest pruned
            _, entries = avro.read_container(m["manifest_path"])
            for e in entries:
                if e["status"] == 2:  # DELETED
                    continue
                df_ = e["data_file"]
                part = df_["partition"]
                if partition_filter is not None \
                        and not partition_filter(part):
                    continue
                if bounds_filter and df_.get("lower_bounds"):
                    lb = {kv["key"]: kv["value"]
                          for kv in df_["lower_bounds"]}
                    ub = {kv["key"]: kv["value"]
                          for kv in (df_.get("upper_bounds") or [])}
                    skip = False
                    for col, (qlo, qhi) in bounds_filter.items():
                        fid = self.field_id(col)
                        typ = self.field_type(col)
                        if fid in lb and qhi is not None and \
                                icespec.deserialize_bound(typ, lb[fid]) > qhi:
                            skip = True
                        if fid in ub and qlo is not None and \
                                icespec.deserialize_bound(typ, ub[fid]) < qlo:
                            skip = True
                    if skip:
                        continue
                out.append({"path": df_["file_path"],
                            "record_count": df_["record_count"],
                            "file_size_in_bytes":
                                df_["file_size_in_bytes"],
                            "partition": part})
        return out

    def read(self, spark, *, snapshot_id=None, partition_filter=None,
             bounds_filter=None):
        """Scan -> Spark DataFrame (planned files only)."""
        files = self.plan_files(snapshot_id=snapshot_id,
                                partition_filter=partition_filter,
                                bounds_filter=bounds_filter)
        if not files:
            schema = iceberg_to_spark_schema(self.schema)
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*[f["path"] for f in files])

    def total_rows(self, snapshot_id=None) -> int:
        return sum(f["record_count"]
                   for f in self.plan_files(snapshot_id=snapshot_id))


class partition_range_filter:
    """Per-field range predicate usable at manifest AND file level.

    ``ranges``: dict partition-field-name -> (lo, hi) inclusive, either
    end None for unbounded. Non-listed fields are unconstrained.
    """

    def __init__(self, **ranges):
        self.ranges = ranges

    def __call__(self, part: dict) -> bool:
        for name, (lo, hi) in self.ranges.items():
            v = part.get(name)
            if v is None:
                return False
            if lo is not None and v < lo:
                return False
            if hi is not None and v > hi:
                return False
        return True

    def manifest_may_match(self, los: dict, his: dict) -> bool:
        for name, (lo, hi) in self.ranges.items():
            if name in los:
                if hi is not None and los[name] > hi:
                    return False
                if lo is not None and his[name] < lo:
                    return False
        return True


def iceberg_to_spark_schema(schema_json: dict):
    """Iceberg schema JSON -> Spark StructType (primitives + nesting)."""
    from pyspark.sql import types as T

    prim = {"boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "string": T.StringType(),
            "binary": T.BinaryType(), "date": T.DateType(),
            "timestamptz": T.TimestampType(),
            "timestamp": T.TimestampNTZType()}

    def conv(t):
        if isinstance(t, str):
            if t in prim:
                return prim[t]
            if t.startswith("decimal("):
                p, s = t[8:-1].split(",")
                return T.DecimalType(int(p), int(s))
            raise TypeError(t)
        if t["type"] == "struct":
            return T.StructType([
                T.StructField(f["name"], conv(f["type"]),
                              not f.get("required", False))
                for f in t["fields"]])
        if t["type"] == "list":
            return T.ArrayType(conv(t["element"]),
                               not t.get("element-required", False))
        if t["type"] == "map":
            return T.MapType(conv(t["key"]), conv(t["value"]),
                             not t.get("value-required", False))
        raise TypeError(t["type"])

    return conv({k: v for k, v in schema_json.items() if k != "schema-id"})
