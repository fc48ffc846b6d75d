"""Launch-artifact test: jobs/streaming_job.py runs as its own process
(the spark-submit shape), drains available input exactly-once, and
RESUMES from the checkpoint in a second process without replaying."""

import glob
import os
import subprocess
import sys

import pytest

from conftest import brute_max_gap, brute_streak

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(src, out, ckpt, *extra):
    return subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now", *extra,
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
        timeout=420,
    )


@pytest.mark.slow
def test_streaming_job_resumes_from_checkpoint(spark, tmp_path):
    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(300, 10)
    spark.createDataFrame(pdf.iloc[:150]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "c0"))

    r1 = _run_job(src, out, ckpt)
    assert r1.returncode == 0, r1.stderr[-2000:]
    # data batch 0 + the watermark-advance tail batch 1 (the idle-GC
    # mode's no-data micro-batch; the sink commits zero-row batches)
    assert "committed batches: [0, 1]" in r1.stderr

    spark.createDataFrame(pdf.iloc[150:]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "c1"))
    # resume + the post-drain checkpoint state audit (span <= 2x duration
    # recomputed from the state files, streaming/state_inspect)
    r2 = _run_job(src, out, ckpt, "--audit-state")
    assert r2.returncode == 0, r2.stderr[-2000:]
    # batches 0/1 NOT recomputed; data batch 2 + tail batch 3 appended
    assert "committed batches: [0, 1, 2, 3]" in r2.stderr
    assert "state audit: OK (10 keys within 2 x 10 minutes)" in r2.stderr

    total = spark.read.parquet(*glob.glob(out + "/batch_id=*")).count()
    assert total == 300


@pytest.mark.slow
def test_streaming_job_multi_heterogeneous_value_exprs(spark, tmp_path):
    """The window-shared multi-aggregate mode through the LAUNCH ARTIFACT
    with per-monoid lifts (--multi-value-exprs): longest tool-call streak
    + max µs turn gap in ONE stateful operator, verified against an
    independent pandas recompute of the drained sink."""
    import numpy as np
    import pandas as pd

    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(300, 10)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "c0")
    )

    r = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now",
            "--multi-monoids", "maxrun,maxgap",
            "--multi-durations", "3 minutes",
            "--multi-value-exprs",
            "cast(role = 'tool' as bigint);"
            "unix_micros(cast(ts as timestamp))",
        ],
        capture_output=True, text=True, cwd=ROOT, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    got = (
        spark.read.parquet(out)
        .select("conv_id", "ts", "wmaxrun_0", "wmaxgap_0")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    dur = 180_000_000
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        bits = (g["role"].to_numpy() == "tool").astype(np.int64)
        for i in range(len(g)):
            lo = int(np.searchsorted(ts[: i + 1], ts[i] - dur, side="left"))
            best = brute_streak(bits[lo: i + 1])
            gap = brute_max_gap(ts[lo: i + 1])
            exp_rows.append((conv, g["ts"].iloc[i], best, gap))
    exp = (
        pd.DataFrame(exp_rows,
                     columns=["conv_id", "ts", "wmaxrun_0", "wmaxgap_0"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wmaxrun_0"].astype(int).tolist() == exp["wmaxrun_0"].tolist()
    assert got["wmaxgap_0"].astype(int).tolist() == exp["wmaxgap_0"].tolist()


@pytest.mark.slow
def test_streaming_job_exactly_once_survives_worker_crash(spark, tmp_path):
    """Chaos drill for the north rule's exactly-once claim: the launch
    artifact runs under a master WITH task retries (local[4,2]), and
    --fault-inject SIGKILLs one Python worker mid-task (atomic one-shot
    marker). The scheduler's retried task must leave the sink byte-equal
    to a clean run of the identical job — zero lost rows, zero
    duplicates. A third run under plain local[*] (maxFailures=1) checks
    the drill refuses rather than sham-passing without retries."""
    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = transcripts_pandas(400, 8)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(src, "c0")
    )
    marker = str(tmp_path / "crash_marker")

    def run(out, ckpt, fault, master):
        env = dict(os.environ)
        env["PYSPARK_SUBMIT_ARGS"] = f"--master {master} pyspark-shell"
        cmd = [
            sys.executable,
            os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", str(tmp_path / out),
            "--checkpoint", str(tmp_path / ckpt),
            "--available-now", "--audit",
        ]
        if fault:
            cmd += ["--fault-inject", marker]
        return subprocess.run(cmd, capture_output=True, text=True,
                              cwd=ROOT, timeout=420, env=env)

    # refuses without retries: the kill would only prove the job can die
    r0 = run("out0", "ckpt0", fault=True, master="local[4]")
    assert r0.returncode == 4, (r0.returncode, r0.stderr[-2000:])
    assert not os.path.exists(marker)

    r1 = run("out1", "ckpt1", fault=True, master="local[4,2]")
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert os.path.exists(marker), "fault stage never fired"
    # scheduler-level evidence the kill landed and was retried
    assert "Lost task" in r1.stderr, r1.stderr[-2000:]
    assert "committed batches: [0, 1]" in r1.stderr
    assert '"ok": true' in r1.stderr  # lineage audit over the sink

    r2 = run("out2", "ckpt2", fault=False, master="local[4,2]")
    assert r2.returncode == 0, r2.stderr[-2000:]

    cols = ["conv_id", "ts", "wagg"]
    got = (
        spark.read.parquet(str(tmp_path / "out1"))
        .select(*cols).toPandas()
        .sort_values(["conv_id", "ts"]).reset_index(drop=True)
    )
    clean = (
        spark.read.parquet(str(tmp_path / "out2"))
        .select(*cols).toPandas()
        .sort_values(["conv_id", "ts"]).reset_index(drop=True)
    )
    assert len(got) == len(pdf)  # every turn exactly once
    assert got.equals(clean)


@pytest.mark.slow
def test_streaming_job_exactly_once_survives_driver_crash_before_commit(
    spark, tmp_path
):
    """The other half of the chaos drill: kill the DRIVER in the sink's
    worst-case window (batch parquet written, commit marker NOT).
    The audit must call the half-written batch an orphan, and a relaunch
    from the same checkpoint must rewrite it idempotently — values exact
    vs a DuckDB range-window oracle, every turn exactly once."""
    import duckdb

    from sliding_window_aggregators_spark.sources import transcripts_pandas
    from sliding_window_aggregators_spark.streaming import audit_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(400, 8)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(src, "c0")
    )
    marker = str(tmp_path / "sink_crash_marker")

    def run(fault):
        cmd = [
            sys.executable, os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now", "--audit",
        ]
        if fault:
            cmd += ["--fault-inject-sink", marker]
        return subprocess.run(cmd, capture_output=True, text=True,
                              cwd=ROOT, timeout=420)

    r1 = run(fault=True)
    assert r1.returncode == 70, (r1.returncode, r1.stderr[-2000:])
    assert os.path.exists(marker)
    # the crash window is real: data on disk, marker absent, audit flags it
    assert glob.glob(os.path.join(out, "batch_id=0", "*.parquet"))
    assert not os.path.exists(os.path.join(out, "_commits", "_COMMIT_0"))
    crashed_audit = audit_sink(out)
    assert not crashed_audit["ok"]
    assert any("orphan" in p for p in crashed_audit["problems"])

    r2 = run(fault=False)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "committed batches: [0, 1]" in r2.stderr
    assert '"ok": true' in r2.stderr

    con = duckdb.connect()
    n, distinct = con.execute(
        f"select count(*), count(distinct (conv_id, ts)) "
        f"from read_parquet('{out}/batch_id=*/*.parquet')"
    ).fetchone()
    assert (n, distinct) == (len(pdf), len(pdf))
    (bad,) = con.execute(f"""
        with exp as (
          select conv_id, ts,
                 sum(length(text)) over (partition by conv_id order by ts
                   range between interval 10 minutes preceding
                   and current row) as exp_w
          from read_parquet('{src}/c0/*.parquet'))
        select count(*)
        from read_parquet('{out}/batch_id=*/*.parquet') got
        join exp using (conv_id, ts) where got.wagg <> exp.exp_w
    """).fetchone()
    assert bad == 0


@pytest.mark.slow
def test_streaming_job_exactly_once_survives_executor_jvm_loss(
    spark, tmp_path
):
    """Node-loss drill: under local-cluster[2,1,1024] (two REAL executor
    JVMs), --fault-inject-executor SIGKILLs one whole executor mid-task.
    The scheduler must reschedule onto the survivor, state must reload
    from the checkpoint, and the sink must stay exactly-once and
    value-exact. Under local[4,2] (no separate executor JVMs) the drill
    must refuse instead of killing the driver."""
    import duckdb

    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    pdf = transcripts_pandas(400, 8)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(src, "c0")
    )
    marker = str(tmp_path / "exec_crash_marker")

    def run(out_d, ckpt_d, master):
        env = dict(os.environ)
        env["PYSPARK_SUBMIT_ARGS"] = f"--master {master} pyspark-shell"
        return subprocess.run(
            [
                sys.executable,
                os.path.join(ROOT, "jobs", "streaming_job.py"),
                "--source", src, "--out", str(tmp_path / out_d),
                "--checkpoint", str(tmp_path / ckpt_d),
                "--available-now", "--audit",
                "--fault-inject-executor", marker,
            ],
            capture_output=True, text=True, cwd=ROOT, timeout=420, env=env,
        )

    r0 = run("out0", "ckpt0", "local[4,2]")
    assert r0.returncode == 4, (r0.returncode, r0.stderr[-2000:])
    assert not os.path.exists(marker)

    r1 = run("out", "ckpt", "local-cluster[2,1,1024]")
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert os.path.exists(marker), "executor-kill stage never fired"
    assert "ExecutorLostFailure" in r1.stderr, r1.stderr[-2000:]
    assert "committed batches: [0, 1]" in r1.stderr
    assert '"ok": true' in r1.stderr

    con = duckdb.connect()
    n, distinct = con.execute(
        f"select count(*), count(distinct (conv_id, ts)) "
        f"from read_parquet('{out}/batch_id=*/*.parquet')"
    ).fetchone()
    assert (n, distinct) == (len(pdf), len(pdf))
    (bad,) = con.execute(f"""
        with exp as (
          select conv_id, ts,
                 sum(length(text)) over (partition by conv_id order by ts
                   range between interval 10 minutes preceding
                   and current row) as exp_w
          from read_parquet('{src}/c0/*.parquet'))
        select count(*)
        from read_parquet('{out}/batch_id=*/*.parquet') got
        join exp using (conv_id, ts) where got.wagg <> exp.exp_w
    """).fetchone()
    assert bad == 0


@pytest.mark.slow
def test_streaming_job_tws_mode_survives_executor_loss(spark, tmp_path):
    """--tws runs the sliding aggregate under the PRODUCTION
    arbitrary-state API (transformWithStateInPandas + RocksDB state
    store, vendored-protobuf wire protocol) through the launch artifact,
    composed with the node-loss drill: one executor JVM SIGKILLed
    mid-stream under local-cluster, the RocksDB state must reload on the
    survivor and the sink stay exactly-once and value-exact."""
    import duckdb

    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    pdf = transcripts_pandas(400, 8)
    spark.createDataFrame(pdf).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(src, "c0")
    )
    marker = str(tmp_path / "marker")
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--master local-cluster[2,1,1024] pyspark-shell"
    )
    r = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint",
            str(tmp_path / "ckpt"), "--available-now", "--audit", "--tws",
            "--audit-state", "--fault-inject-executor", marker,
        ],
        capture_output=True, text=True, cwd=ROOT, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(marker)
    assert "ExecutorLostFailure" in r.stderr, r.stderr[-2000:]
    assert '"ok": true' in r.stderr
    # post-drain checkpoint retention audit over the TWS ValueState
    assert "state audit: OK (8 keys within 2 x 10 minutes)" in r.stderr

    con = duckdb.connect()
    n, distinct = con.execute(
        f"select count(*), count(distinct (conv_id, ts)) "
        f"from read_parquet('{out}/batch_id=*/*.parquet')"
    ).fetchone()
    assert (n, distinct) == (len(pdf), len(pdf))
    (bad,) = con.execute(f"""
        with exp as (
          select conv_id, ts,
                 sum(length(text)) over (partition by conv_id order by ts
                   range between interval 10 minutes preceding
                   and current row) as exp_w
          from read_parquet('{src}/c0/*.parquet'))
        select count(*)
        from read_parquet('{out}/batch_id=*/*.parquet') got
        join exp using (conv_id, ts) where got.wagg <> exp.exp_w
    """).fetchone()
    assert bad == 0


@pytest.mark.slow
def test_soak_runner_small(tmp_path):
    """CI-sized soak: 8 micro-batches through tools/soak_run.py
    (maxFilesPerTrigger=1 cadence) must report exactly-once, a zero
    oracle mismatch count, and state plateau verdicts all true."""
    import json

    out_json = str(tmp_path / "soak.json")
    r = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "tools", "soak_run.py"),
            "--turns", "16384", "--convs", "96", "--chunks", "8",
            "--cpus", "4", "--out", out_json,
        ],
        capture_output=True, text=True, cwd=ROOT, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    rep = json.load(open(out_json))
    # 8 data batches + the no-data watermark-advance batch the idle-GC
    # timers append to an availableNow drain
    assert rep["batches"] == 9
    assert rep["sink"]["exactly_once"] is True
    assert rep["sink"]["oracle_value_mismatches"] == 0
    assert rep["sink"]["lineage_audit_ok"] is True
    assert rep["verdicts"]["state_plateau_ok"] is True
    assert rep["verdicts"]["state_memory_plateau_ok"] is True


@pytest.mark.slow
def test_streaming_job_compact_flag(spark, tmp_path):
    """--compact KEEP_LAST on the launch artifact: the third run drains
    its batch, compacts the older ones into a lineage-preserving segment,
    and --audit (running after) verifies the compacted layout; rows stay
    exactly-once across segment + live batch dirs."""
    import json

    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(300, 10)
    for i, lo in enumerate(range(0, 300, 100)):
        spark.createDataFrame(pdf.iloc[lo:lo + 100]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"c{i}"))
        if i < 2:
            r = _run_job(src, out, ckpt)
            assert r.returncode == 0, r.stderr[-2000:]

    r3 = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now", "--compact", "1", "--audit",
        ],
        capture_output=True, text=True, cwd=ROOT, timeout=420,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    crep = json.loads(
        r3.stderr.split("compaction: ", 1)[1].splitlines()[0])
    # each availableNow drain = 1 data batch + 1 watermark-advance batch
    # (idle-GC timers), so three runs commit batches 0..5; keep_last=1
    # leaves batch 5 live and compacts 0-4
    assert crep["segment"] == [0, 4]
    arep = json.loads(
        r3.stderr.split("lineage audit: ", 1)[1].splitlines()[0])
    assert arep["ok"] and arep["segments"] == 1, arep

    assert os.path.isdir(os.path.join(out, "segment=0-4"))
    assert not os.path.isdir(os.path.join(out, "batch_id=0"))
    paths = glob.glob(out + "/segment=*") + glob.glob(out + "/batch_id=*")
    total = spark.read.parquet(*paths)
    assert total.count() == 300
    assert total.select("conv_id", "ts").distinct().count() == 300


@pytest.mark.slow
def test_streaming_job_partition_by_flag(spark, tmp_path):
    """--partition-by NAME:EXPR stamps the partition column and writes
    hive-partitioned batch dirs; --compact preserves the layout and
    --audit verifies it; the committed rows stay exactly-once."""
    import json

    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(200, 8)

    def run(extra):
        return subprocess.run(
            [
                sys.executable,
                os.path.join(ROOT, "jobs", "streaming_job.py"),
                "--source", src, "--out", out, "--checkpoint", ckpt,
                "--available-now",
                "--partition-by", "part_min:minute(ts)",
            ] + extra,
            capture_output=True, text=True, cwd=ROOT, timeout=420,
        )

    spark.createDataFrame(pdf.iloc[:100]).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(src, "c0"))
    r1 = run([])
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert glob.glob(out + "/batch_id=0/part_min=*/*.parquet")

    spark.createDataFrame(pdf.iloc[100:]).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(src, "c1"))
    r2 = run(["--compact", "0", "--audit"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    crep = json.loads(
        r2.stderr.split("compaction: ", 1)[1].splitlines()[0])
    # two drains = batches 0..3 (each run appends its watermark-advance
    # batch); keep_last=0 compacts them all
    assert crep["segment"] == [0, 3]
    arep = json.loads(
        r2.stderr.split("lineage audit: ", 1)[1].splitlines()[0])
    assert arep["ok"], arep

    seg_files = glob.glob(out + "/segment=0-3/part_min=*/*.parquet")
    assert seg_files  # the segment keeps the hive layout
    total = spark.read.parquet(out + "/segment=0-3")
    assert total.count() == 200
    assert "part_min" in total.columns
    assert total.select("conv_id", "ts").distinct().count() == 200
