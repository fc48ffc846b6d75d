"""Long-horizon soak of the launch artifact: drain a chunked transcript
source as MANY micro-batches (--max-files-per-trigger 1) and grade the
two failure modes a 10^12-turn deployment actually dies of:

- state leak: per-operator state rows / memory must plateau once the
  watermark starts evicting (a monotonic climb means expired windows
  are not clearing);
- latency drift: addBatch time in the last half must not trend above
  the first half (checkpoint or state-store degradation).

Then the boring-but-mandatory part: the drained sink is value-checked
row-for-row against a DuckDB range-window oracle over the same source
(count, distinct, exact window sums).

Writes one JSON artifact (--out) with per-batch series, the plateau /
drift verdicts, oracle results, and membw probes so a throttled host
window is visible in the record.

Usage:
    python tools/soak_run.py --turns 2097152 --chunks 64 \
        --out BENCH/soak_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def build_source(turns: int, convs: int, chunks: int) -> str:
    """Chunked parquet source (pyarrow, no Spark): contiguous ts slices
    so event time advances chunk to chunk and the watermark evicts."""
    path = os.path.join(
        tempfile.gettempdir(), f"swag_soak_src_{turns}_{convs}_{chunks}"
    )
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sliding_window_aggregators_spark.sources import transcripts_pandas

    pdf = transcripts_pandas(turns, convs)
    os.makedirs(path, exist_ok=True)
    per = turns // chunks
    for c in range(chunks):
        lo, hi = c * per, (c + 1) * per if c < chunks - 1 else turns
        cdir = os.path.join(path, f"c{c:03d}")
        os.makedirs(cdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(
                pdf.iloc[lo:hi], preserve_index=False
            ),
            os.path.join(cdir, "part-0.parquet"),
        )
    with open(done, "w") as fh:
        fh.write("ok")
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_097_152)
    ap.add_argument("--convs", type=int, default=4096)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--duration", default="10 minutes")
    ap.add_argument("--compact-every", type=int, default=None, metavar="K",
                    help="soak the sink's inline auto-compaction: the "
                         "query compacts itself every K committed "
                         "batches; verdicts add live-file-count "
                         "boundedness and the oracle reads through "
                         "segments")
    ap.add_argument("--iceberg", action="store_true",
                    help="drain into the jar-less Iceberg sink (one "
                         "snapshot per micro-batch, bucket[8] on "
                         "conv_id) and run post-drain maintenance "
                         "(rewrite REPLACE + expire keep_last=1); the "
                         "value oracle then reads the COMPACTED table's "
                         "live files")
    ap.add_argument("--tws", action="store_true",
                    help="soak the transformWithStateInPandas path "
                         "(RocksDB state store) instead of "
                         "applyInPandasWithState")
    ap.add_argument("--spark-conf", action="append", default=[],
                    metavar="K=V",
                    help="extra --conf for the job's session (repeatable) "
                         "— e.g. RocksDB changelog checkpointing for the "
                         "TWS snapshot-debt A/B")
    ap.add_argument("--out", default=os.path.join(HERE, "BENCH",
                                                  "soak_r5.json"))
    args = ap.parse_args()

    from bench_scaling_stream import membw_probes

    src = build_source(args.turns, args.convs, args.chunks)
    out = tempfile.mkdtemp(prefix="swag_soak_out_")
    ckpt = tempfile.mkdtemp(prefix="swag_soak_ckpt_")

    probes_before = membw_probes()
    env = dict(os.environ)
    confs = "".join(f" --conf {c}" for c in args.spark_conf)
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--master local[{args.cpus}]{confs} pyspark-shell"
    )
    t0 = time.perf_counter()
    r = subprocess.run(
        [
            sys.executable, os.path.join(HERE, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now", "--audit", "--audit-state",
            "--max-files-per-trigger", "1",
            "--duration", args.duration,
        ] + (["--tws"] if args.tws else [])
        + (["--sink-format", "iceberg",
            "--iceberg-partition", "conv_id:bucket[8]",
            "--iceberg-maintain", "1"] if args.iceberg else [])
        + (["--compact-every", str(args.compact_every)]
           if args.compact_every else []),
        capture_output=True, text=True, cwd=HERE, timeout=7200, env=env,
    )
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"soak job failed: exit {r.returncode}")
    probes_after = membw_probes()

    m = re.search(r"batch progress: (\[.*\])", r.stderr)
    batches = json.loads(m.group(1)) if m else []
    drain = re.search(r"drain seconds: ([0-9.]+)", r.stderr)
    audit_ok = '"ok": true' in r.stderr
    st_audit = re.search(r"state audit: OK \((\d+) keys", r.stderr)

    add_ms = [b["durationMs"].get("addBatch", 0) for b in batches
              if b.get("numInputRows")]
    rows_in = [b.get("numInputRows", 0) for b in batches]
    state_rows = [b.get("stateRows", 0) for b in batches]
    state_mem = [b.get("stateMemoryBytes", 0) for b in batches]

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else 0

    n = len(batches)
    # plateau: once warm (2nd quarter), later maxima must not exceed the
    # warm maximum by >10% — the leak detector
    warm_hi = max(state_rows[n // 4: n // 2] or [0])
    late_hi = max(state_rows[n // 2:] or [0])
    plateau_ok = n >= 8 and warm_hi > 0 and late_hi <= 1.10 * warm_hi
    # stateRows counts KEYS (flat by construction); the window contents
    # live inside each key's blob, so memory is the real leak signal
    mem_warm = max(state_mem[n // 4: n // 2] or [0])
    mem_late = max(state_mem[n // 2:] or [0])
    mem_ok = n >= 8 and mem_warm > 0 and mem_late <= 1.10 * mem_warm
    drift = (med(add_ms[n // 2:]) / med(add_ms[: n // 2])
             if med(add_ms[: n // 2]) else None)

    # value oracle over the full drained sink
    import duckdb

    con = duckdb.connect()
    # auto-compaction folds old batch dirs into segments mid-run: the
    # oracle must read BOTH layouts (duckdb accepts a glob list, but
    # errors on a glob with zero matches — include each only if present)
    if args.iceberg:
        # post-maintenance the table's live set IS data/ (rewrite +
        # expire removed every superseded file); assert that equivalence
        # from the metadata before trusting the glob
        sys.path.insert(0, HERE)
        from sliding_window_aggregators_spark.iceberg import IcebergTable

        tbl = IcebergTable(out)
        live = sorted(os.path.realpath(f["path"])
                      for f in tbl.plan_files())
        on_disk = sorted(
            os.path.realpath(os.path.join(r_, f_))
            for r_, _, fs in os.walk(os.path.join(out, "data"))
            for f_ in fs if f_.endswith(".parquet"))
        assert live == on_disk, (
            f"{len(live)} planned vs {len(on_disk)} on disk")
        sink_glob = f"['{out}/data/**/*.parquet']"
    else:
        globs = [
            f"'{out}/{kind}=*/*.parquet'"
            for kind in ("batch_id", "segment")
            if any(d.startswith(f"{kind}=") for d in os.listdir(out))
        ]
        sink_glob = "[" + ", ".join(globs) + "]"
    cnt, distinct = con.execute(
        f"select count(*), count(distinct (conv_id, ts)) "
        f"from read_parquet({sink_glob})"
    ).fetchone()
    (mism,) = con.execute(f"""
        with exp as (
          select conv_id, ts,
                 sum(length(text)) over (partition by conv_id order by ts
                   range between interval {args.duration} preceding
                   and current row) as exp_w
          from read_parquet('{src}/c*/*.parquet'))
        select count(*)
        from read_parquet({sink_glob}) got
        join exp using (conv_id, ts) where got.wagg <> exp.exp_w
    """).fetchone()
    live_batch_dirs = len(
        [d for d in os.listdir(out) if d.startswith("batch_id=")])
    segments = len(
        [d for d in os.listdir(out) if d.startswith("segment=")])
    iceberg_info = None
    if args.iceberg:
        mrep = re.search(r"iceberg maintenance: (\{.*\})", r.stderr)
        iceberg_info = {
            "snapshots_live": len(tbl.snapshots),
            "files_live": len(live),
            "maintenance": json.loads(mrep.group(1)) if mrep else None,
        }

    report = {
        "job": (
            f"soak{' (tws/RocksDB)' if args.tws else ''}"
            f"{' (iceberg sink)' if args.iceberg else ''}: "
            f"sliding sum {args.duration} over {args.turns} turns / "
            f"{args.convs} convs, {args.chunks} chunks drained at "
            f"maxFilesPerTrigger=1 on local[{args.cpus}]"
        ),
        "spark_confs": args.spark_conf,
        "batches": n,
        "wall_sec": round(wall, 1),
        "drain_sec": float(drain.group(1)) if drain else None,
        "turns_per_sec": round(args.turns / float(drain.group(1)))
        if drain else None,
        "rows_in_total": sum(rows_in),
        "sink": {
            "rows": cnt, "distinct": distinct,
            "exactly_once": cnt == distinct == args.turns,
            "oracle_value_mismatches": mism,
            "lineage_audit_ok": audit_ok,
            "live_batch_dirs": live_batch_dirs,
            "segments": segments,
            # boundedness: auto-compaction must keep the live batch-dir
            # count O(compact_every), independent of total batches
            "live_files_bounded": (
                live_batch_dirs <= args.compact_every + 1 and segments >= 1
                if args.compact_every else None
            ),
            "iceberg": iceberg_info,
        },
        "state_rows_series": state_rows,
        "state_memory_bytes_series": state_mem,
        "add_batch_ms_series": add_ms,
        "verdicts": {
            # post-drain retention bound recomputed from the checkpoint's
            # STATE FILES by the job itself (--audit-state; exit 5 would
            # have failed the soak): every key's span <= 2 x duration
            "checkpoint_state_audit_keys": int(st_audit.group(1))
            if st_audit else None,
            "checkpoint_state_audit_ok": bool(st_audit),
            "state_plateau_ok": plateau_ok,
            "state_rows_warm_max": warm_hi,
            "state_rows_late_max": late_hi,
            "state_memory_plateau_ok": mem_ok,
            "state_memory_warm_max": mem_warm,
            "state_memory_late_max": mem_late,
            "add_batch_drift_late_over_early": round(drift, 3)
            if drift else None,
        },
        "vm_context": {"before": probes_before, "after": probes_after},
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("batches", "wall_sec", "drain_sec", "turns_per_sec",
                       "sink", "verdicts")}, indent=2))


if __name__ == "__main__":
    main()
