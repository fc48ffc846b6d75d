"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for correctness-at-scale first: AQE on (runtime shuffle coalescing
and skew-join splitting stand in for manual tuning at 100 TB),
Arrow-batched Python UDF transport, and a shuffle-partition count sized
for the local harness (the 1000-executor deployment overrides
``spark.sql.shuffle.partitions`` / relies on AQE's coalescing).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors — the local-mode equivalent of
    ``spark-submit --py-files swag.zip`` (BASELINE north_rule launch shape).
    Idempotent per session."""
    if getattr(spark, "_swag_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    # Ship mode (guide §4/§6: per-task overhead): addPyFile'd zips make
    # every Python worker hold live zipimporters that
    # importlib.invalidate_caches() — run by pyspark once PER TASK —
    # re-reads in full, a fixed multi-ms tax on every task of every
    # Python-touching stage (sampled at ~10% of worker busy time on the
    # 32-task streaming triggers). When the workers can import the
    # package from the filesystem (local master, or a shared deploy of
    # the repo — the cluster analog is a preinstalled image/conda env,
    # the standard production practice), putting the REAL package dirs
    # on the workers' PYTHONPATH skips both zips and their per-task
    # re-scan. ``SWAG_SHIP_MODE=pyfiles`` restores --py-files shipping
    # for cluster runs without a shared filesystem.
    mode = os.environ.get("SWAG_SHIP_MODE", "auto")
    is_local = spark.sparkContext.master.startswith("local")
    if mode != "pyfiles" and (is_local or mode == "pythonpath"):
        try:
            from ..compat import ensure_protobuf

            ensure_protobuf()
        except ImportError:
            pass
        vdir = os.path.join(pkg_dir, "_vendor")
        env = spark.sparkContext.environment
        parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        # also resolve pyspark itself from its source DIRECTORY when one
        # exists next to the zips: a worker that never imports from
        # pyspark.zip never instantiates its zipimporter, and the
        # per-task invalidate_caches() re-scan of that zip (measured
        # 5.5 ms/task on this box) disappears with it
        spark_py = None
        try:
            import pyspark as _ps

            cand = os.path.dirname(os.path.dirname(os.path.abspath(_ps.__file__)))
            if os.path.isdir(os.path.join(cand, "pyspark")):
                spark_py = cand
        except ImportError:
            pass
        for d in (spark_py, root, vdir):
            if d and os.path.isdir(d) and d not in parts:
                parts.insert(0, d)
        env["PYTHONPATH"] = os.pathsep.join(parts)
        spark._swag_shipped = True
        return
    zpath = os.path.join(tempfile.mkdtemp(prefix="swag_pyfiles_"), "swag_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    # when google.protobuf comes from the vendored mini-runtime, ship it
    # as its own zip rooted at `google/` so Spark python workers (and
    # remote executors, where the driver's PYTHONPATH does not reach) can
    # import it top-level. ensure_protobuf() first: _ship_package also
    # runs on sessions NOT built by get_spark (the grading driver passes
    # its own), where nothing has made `google` importable driver-side yet
    try:
        from ..compat import ensure_protobuf

        ensure_protobuf()
        import google.protobuf as _gpb

        if getattr(_gpb, "SWAG_MINI_RUNTIME", False):
            vdir = os.path.join(pkg_dir, "_vendor")
            vzip = os.path.join(os.path.dirname(zpath), "swag_vendor_pb.zip")
            with zipfile.ZipFile(vzip, "w") as zf:
                for dirpath, _dirnames, filenames in os.walk(vdir):
                    for fn in filenames:
                        if fn.endswith(".py"):
                            full = os.path.join(dirpath, fn)
                            zf.write(full, os.path.relpath(full, vdir))
            spark.sparkContext.addPyFile(vzip)
            # transformWithState's PRE-INIT driver worker is spawned by the
            # JVM before any task runs and does NOT search addPyFile
            # includes; it DOES receive the PythonFunction's envVars, which
            # pyspark snapshots from sc.environment at UDF creation — so
            # the vendor dir must be on PYTHONPATH there (harmless for
            # every other worker; must happen before the stream is built)
            env = spark.sparkContext.environment
            pp = env.get("PYTHONPATH", "")
            if vdir not in pp.split(os.pathsep):
                env["PYTHONPATH"] = (
                    vdir + (os.pathsep + pp if pp else "")
                )
    except ImportError:
        pass
    spark._swag_shipped = True


def get_spark(app: str = "swag-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(32, cpus)
    # must precede JVM launch: sets PYTHONPATH (inherited by the gateway
    # and its Python workers) to the vendored protobuf mini-runtime when
    # no real wheel exists — transformWithStateInPandas needs it
    # worker-side (see compat.ensure_protobuf)
    from ..compat import ensure_protobuf

    try:
        ensure_protobuf()
    except ImportError:
        pass  # TWS path stays unavailable; everything else is unaffected
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: the JVM↔Python bridge amortizes per-batch
        # overhead; measured ~2× on the mapInPandas kernel path vs the
        # 65536 default (1M rows ≈ 40 MB/task at the events row width)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        .config("spark.sql.session.timeZone", "UTC")
        # input split size, parameterised (SWAG_MAX_PARTITION_BYTES): the
        # local corpus ships few-MB..130-MB single files whose row groups
        # are ~16-22 MB, so the 128 MB default packs a whole table into
        # 1-2 scan tasks; 16 MB splits one task per row group (measured
        # ~2x on the lineitem star/aggregate queries). A production
        # deployment on many-hundred-MB files overrides this upward
        # (512m-1g per the large-sequential-scan guidance) via the env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SWAG_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
