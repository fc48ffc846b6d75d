"""Streaming-job two-cluster-size scaling study — the north rule's exact
launch shape: ``spark-submit --py-files <package.zip>
jobs/streaming_job.py`` at two parallelism levels on the same input.

The batch study (bench_scaling.py) measures the kernel plan; this one
measures the PRODUCTION artifact end-to-end: package zipped and shipped
via --py-files, the streaming job (readStream → watermark →
applyInPandasWithState ordered-state kernel → exactly-once sink)
draining the identical pre-generated transcript chunks with
``--available-now``, fresh checkpoint per level, fresh JVM per level.
Efficiency uses the job's own drain wall time (printed by the job,
excludes JVM/session boot so a constant boot cost cannot masquerade as
poor scaling).

Usage: python bench_scaling_stream.py [--turns 2097152] [--convs 4096]
Prints one JSON report; BENCH/BASELINE.md is updated by hand.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

GEN = r"""
import os, sys
sys.path.insert(0, {here!r})
from pyspark.sql import SparkSession, functions as F
from sliding_window_aggregators_spark.sources import transcripts_spark
spark = (SparkSession.builder.master("local[32]").appName("swag-stream-gen")
    .config("spark.ui.enabled","false").config("spark.ui.showConsoleProgress","false")
    .config("spark.driver.memory","16g").getOrCreate())
path = {path!r}
if not os.path.exists(os.path.join(path, "c0", "_SUCCESS")):
    df = transcripts_spark(spark, {turns}, n_convs={convs})
    # 8 arrival chunks so the stream source sees several files
    for c in range(8):
        (df.where(F.col("turn_idx") % 8 == c).coalesce(4)
           .write.mode("overwrite").parquet(os.path.join(path, f"c{{c}}")))
skew_path = os.path.join(path, "_skew.json")
if not os.path.exists(skew_path):
    # the state-partition histogram this input hashes into (F.hash IS the
    # Murmur3 of HashPartitioning): the per-key-serial constraint of ANY
    # per-key stateful engine makes the hottest partition a lower bound
    # on the high-parallelism level's wall clock — record it so measured
    # efficiency can be judged against the input's analytic ceiling.
    # A second histogram models the chunk-halo plan at the bench defaults
    # (top-40 hot keys, 96h spans; own rows only — the ~1% halo replicas
    # barely move the makespan): partitions under the composite
    # (key, chunk) hash, the layout --halo runs actually execute.
    import json
    nparts = 32
    src_df = spark.read.parquet(os.path.join(path, "*"))
    rows = (src_df
            .groupBy(F.pmod(F.hash("conv_id"), F.lit(nparts)).alias("p"))
            .count().collect())
    counts = sorted((r["count"] for r in rows), reverse=True)
    hot = [r["conv_id"] for r in
           src_df.groupBy("conv_id").count()
           .orderBy(F.desc("count"), "conv_id").limit(40).collect()]
    span_us = 96 * 3600 * 1000000
    ck = (F.when(F.col("conv_id").isin(hot),
                 F.floor(F.unix_micros("ts") / F.lit(span_us)))
          .otherwise(F.lit(-1)).cast("long"))
    rows_h = (src_df.withColumn("_ck", ck)
              .groupBy(F.pmod(F.hash("conv_id", "_ck"), F.lit(nparts))
                       .alias("p"))
              .count().collect())
    counts_h = sorted((r["count"] for r in rows_h), reverse=True)
    with open(skew_path, "w") as fh:
        json.dump({{"partitions": nparts, "total_rows": sum(counts),
                    "partition_rows_desc": counts,
                    "partition_rows_desc_halo_top40_96h": counts_h}}, fh)
spark.stop()
print("GEN_OK")
"""


ICB_GEN = r"""
import os, sys
sys.path.insert(0, {here!r})
from pyspark.sql import SparkSession
from sliding_window_aggregators_spark.iceberg import (
    IcebergTable, write_dataframe)
spark = (SparkSession.builder.master("local[16]").appName("swag-icb-gen")
    .config("spark.ui.enabled","false")
    .config("spark.ui.showConsoleProgress","false")
    .config("spark.driver.memory","16g").getOrCreate())
src, loc = {src!r}, {loc!r}
if not os.path.exists(os.path.join(loc, "metadata", "version-hint.text")):
    # one append snapshot per arrival chunk — the accumulated-by-appends
    # shape a real Iceberg transcripts table has; bucket[8] on conv_id is
    # the north star's (conv_id, hash-bucket) layout
    t = None
    for c in range(8):
        df = spark.read.parquet(os.path.join(src, f"c{{c}}"))
        if t is None:
            t = IcebergTable.create(
                loc, df.schema,
                partition_spec=[("conv_id", "bucket[8]")])
        write_dataframe(df, t, bounds_columns=("ts",),
                        summary={{"chunk": c}}, target_partitions=4)
spark.stop()
print("ICB_GEN_OK")
"""


def build_zip(dst: str) -> None:
    pkg = os.path.join(HERE, "sliding_window_aggregators_spark")
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, HERE))


def run_level(
    cpus: int, src: str, zip_path: str, turns: int, multi: bool = False,
    cluster: bool = False, halo: bool = False, panes: str | None = None,
    slide: str = "30 minutes", pre_combine: bool = False,
    iceberg: bool = False,
) -> dict:
    work = tempfile.mkdtemp(prefix=f"swag_stream_{cpus}_")
    # cluster mode: N REAL single-core executor JVMs (Spark's
    # local-cluster master) instead of N threads in one JVM. local[N]
    # shares one JVM / one GC / one Arrow bridge / one Python-worker
    # pool across all N slots — a shared-runtime artifact a real N→4N
    # executor scale-out does not have. local-cluster[N,1,mem] gives
    # every slot its own executor process (own heap, own bridge, own
    # python workers), which is the honest two-cluster-size emulation
    # the north rule's spark-submit criterion describes.
    master = f"local-cluster[{cpus},1,4096]" if cluster else f"local[{cpus}]"
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--py-files", zip_path,
        # 32 state partitions at EVERY level (not max(8, cpus)): with one
        # availableNow batch, a level running exactly one task wave lets
        # its slowest (Zipf-hot) partition set the wall clock, while a
        # lower level packs multiple waves tightly — unequal granularity
        # that under-reports the high level. Fixed fine granularity gives
        # both levels the same packing (4 waves of 8 vs 16 waves of 2)
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=1048576",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", ("spark.driver.memory=8g" if cluster
                   else "spark.driver.memory=24g"),
        *(
            [
                "--conf", "spark.executor.memory=3g",
                # benchmark hygiene for the multi-executor emulation:
                # don't trade parallelism for locality on a single box
                # (default 3s locality.wait serializes waves), and don't
                # start the query until every executor has registered
                # (else level-8's first batch runs on 2-3 executors and
                # under-reports the level)
                "--conf", "spark.locality.wait=0s",
                "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
                "--conf",
                "spark.scheduler.maxRegisteredResourcesWaitingTime=60s",
            ]
            if cluster
            else []
        ),
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        os.path.join(HERE, "jobs", "streaming_job.py"),
        "--source", src,
        "--out", os.path.join(work, "out"),
        "--checkpoint", os.path.join(work, "ckpt"),
        # the literal north-rule shape: Iceberg transcripts table in,
        # exactly-once Iceberg sink out (jar-less iceberg/ package)
        *(["--source-format", "iceberg", "--sink-format", "iceberg",
           "--iceberg-partition", "conv_id:bucket[8]"] if iceberg else []),
        "--monoid", "sum",
        # pane mode is the rollup shape: one (size, slide) window row per
        # slide at watermark closure, per-key state bounded by PANES
        # (size/slide + lag), not rows — the other end of the engine's
        # state/emission spectrum from the per-turn ordered-state job
        *(["--panes", panes, "--slide", slide] if panes
          else ["--duration", "10 minutes"]),
        # map-side pane pre-combine: the engine's answer to the pane
        # job's serial-atom ceiling — the hot key's rows fold into
        # per-(key, pane) partials upstream of the stateful shuffle, so
        # the Zipf-hot state partition's serial work is O(panes), not
        # O(rows), and the row-proportional work is map-parallel
        *(["--pre-combine"] if pre_combine else []),
        "--available-now",
        *(["--pin-executors"] if cluster else []),
        # hot-key chunk-halo: the engine's answer to the input's serial-
        # atom ceiling (see skew_model) — the 40 hottest conversations'
        # state spreads over 96h event-time chunks (halo cost 60min/96h
        # ≈ 1%), turning the Zipf head into balanced parallel groups
        *(["--hot-keys-top", "40", "--chunk-span", "96 hours"]
          if halo else []),
    ]
    if multi:
        # the protocol job shape (batch study parity): 5 monoids x 3
        # windows per turn through ONE window-shared stateful operator,
        # results folded by the combine sink (the reference's
        # silly_combine discipline — benchmarks fold query results, they
        # don't materialize a 16M x 17-column result table)
        cmd += [
            "--multi-monoids", "sum,geomean,mincount,relvar,max",
            "--multi-durations", "2 minutes,10 minutes,60 minutes",
            "--combine-sink",
        ]
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=HERE, timeout=3000)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"level {cpus} failed:\n{r.stderr[-4000:]}")
    # PythonRunner merges the job's stderr into spark-submit's stdout —
    # search both streams
    m = re.search(r"drain seconds: ([0-9.]+)", r.stdout + r.stderr)
    mb = re.search(r"batch progress: (\[.*?\])\s*$",
                   r.stdout + r.stderr, re.MULTILINE)
    # no marker → the boot-excluded drain time is unavailable; substitute
    # wall time but FLAG it so a scaling ratio over estimated drains is
    # never mistaken for the documented boot-excluded metric
    drain = float(m.group(1)) if m else wall
    if iceberg:
        # exact committed row count from the sink table's own metadata
        sys.path.insert(0, HERE)
        from sliding_window_aggregators_spark.iceberg import IcebergTable

        rows = IcebergTable(os.path.join(work, "out")).total_rows()
    else:
        import pyarrow.dataset as ds

        data = ds.dataset(os.path.join(work, "out"), format="parquet",
                          partitioning="hive")
        if multi and "rows" in data.schema.names:
            # combine sink: one folded row per batch carrying the
            # per-batch turn count — `rows` still reports turns
            rows = sum(data.to_table(columns=["rows"])["rows"].to_pylist())
        else:
            rows = data.count_rows()
    shutil.rmtree(work)
    out = {
        "cpus": cpus,
        "rows": rows,
        "drain_sec": round(drain, 3),
        "process_sec": round(wall, 3),
        "turns_per_sec": round(turns / drain, 1),
    }
    if m is None:
        out["drain_estimated"] = True  # full process wall incl. JVM boot
    if mb:
        try:
            out["batches"] = json.loads(mb.group(1))
        except ValueError:
            pass
    return out


def _lpt_makespan(atoms: list[int], n: int) -> int:
    """Longest-processing-time greedy makespan of `atoms` on `n` cores —
    what a perfect scheduler achieves on this partition histogram."""
    import heapq

    cores = [0] * n
    for a in sorted(atoms, reverse=True):
        heapq.heappush(cores, heapq.heappop(cores) + a)
    return max(cores)


def skew_model(src: str, lo: int = 2, hi: int = 8) -> dict | None:
    """The input's analytic scaling envelope. Per-key ordered state makes
    each of the 32 hash partitions an indivisible serial atom (true of ANY
    per-key stateful engine — the hottest conversation cannot be split
    without the halo decomposition); a perfect engine with a perfect
    scheduler on this input therefore shows
    eff_ideal(a→b) = (makespan_LPT(a)/makespan_LPT(b))/(b/a), not 1.0.
    Measured efficiency should be read against this, and the gap closed by
    engine work; the ceiling itself is closed only by hot-key chunking."""
    import json as _json

    p = os.path.join(src, "_skew.json")
    if not os.path.exists(p):
        return None
    d = _json.load(open(p))
    atoms = d["partition_rows_desc"]
    t2, t8 = _lpt_makespan(atoms, lo), _lpt_makespan(atoms, hi)
    out = {
        "state_partitions": d["partitions"],
        "top_partition_share": round(atoms[0] / d["total_rows"], 4),
        "ideal_eff_2_to_8": round((t2 / t8) / (hi / lo), 3),
    }
    halo_atoms = d.get("partition_rows_desc_halo_top40_96h")
    if halo_atoms:
        h2, h8 = _lpt_makespan(halo_atoms, lo), _lpt_makespan(halo_atoms, hi)
        out["halo_top_partition_share"] = round(
            halo_atoms[0] / d["total_rows"], 4
        )
        out["halo_ideal_eff_2_to_8"] = round((h2 / h8) / (hi / lo), 3)
    return out


def _bw(_):
    import numpy as np

    a = np.ones(50_000_000, dtype=np.uint8)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2:
        b = a.copy()
        a[0] = b[0]
        n += 1
    return n * 50 / (time.perf_counter() - t0)


def membw_probes() -> dict:
    """Host-throttle context (this sandbox's host varies 20 MB/s –
    29 GB/s): a run whose levels tie regardless of cpus was measured
    against the host's bandwidth cap, not the engine — record the window
    so the reader can tell (see BENCH/BASELINE.md variance table)."""
    out = {}
    for n in (1, 2, 4, 8, 16):
        with mp.Pool(n) as p:
            out[n] = sum(p.map(_bw, range(n)))
    # bw_hi/bw_lo is the bandwidth the box actually grants the high level
    # relative to the low level: a bandwidth-bound job's best possible
    # lo->hi throughput ratio (efficiency x4) — record it so measured
    # efficiency can be normalized against the physical envelope
    return {
        "membw_1proc_MBps": round(out[1]),
        "membw_2proc_MBps": round(out[2]),
        "membw_4proc_MBps": round(out[4]),
        "membw_8proc_MBps": round(out[8]),
        "membw_16proc_MBps": round(out[16]),
        "bw_ratio_8v2": round(out[8] / out[2], 2) if out[2] else None,
        "bw_ratio_16v4": round(out[16] / out[4], 2) if out[4] else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_097_152)
    ap.add_argument("--convs", type=int, default=4096)
    ap.add_argument("--multi", action="store_true",
                    help="run the protocol-shaped 5-monoid x 3-window "
                         "window-shared job instead of the single sum")
    ap.add_argument("--cluster", action="store_true",
                    help="N real single-core executor JVMs per level "
                         "(local-cluster[N,1,4096]) instead of N threads "
                         "in one JVM — the honest multi-executor N vs 4N "
                         "emulation")
    ap.add_argument("--halo", action="store_true",
                    help="hot-key chunk-halo decomposition (top-40 convs, "
                         "96h spans): lifts the input's serial-atom "
                         "scaling ceiling (see input_skew_model)")
    ap.add_argument("--panes", default=None, metavar="SIZE",
                    help="run the pane-sliced rollup job "
                         "(sliding_panes_stream) at this window size "
                         "instead of the per-turn sliding sum — per-slide "
                         "emission, O(panes) per-key state")
    ap.add_argument("--slide", default="30 minutes",
                    help="pane width / emission granularity for --panes")
    ap.add_argument("--pre-combine", action="store_true",
                    help="--panes only: map-side per-(key, pane) partial "
                         "aggregation before the stateful shuffle — lifts "
                         "the pane job's serial-atom skew ceiling (the "
                         "hot partition's serial work becomes O(panes), "
                         "not O(rows))")
    ap.add_argument("--iceberg", action="store_true",
                    help="the literal north-rule I/O shape: the source "
                         "chunks are appended into a jar-less Iceberg "
                         "table (one snapshot per arrival chunk, "
                         "bucket[8] on conv_id) and the job runs "
                         "--source-format/--sink-format iceberg — "
                         "Iceberg transcripts in, exactly-once Iceberg "
                         "snapshot-per-micro-batch out")
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8),
                    metavar=("N", "4N"),
                    help="the two parallelism levels to compare (default "
                         "2 8). Any N vs 4N pair satisfies the north "
                         "rule; 4 16 exploits windows where the box "
                         "grants 16 procs more aggregate bandwidth than "
                         "8 (bw_ratio_16v4 in the probes)")
    args = ap.parse_args()
    lo, hi = args.levels
    if hi != 4 * lo:
        ap.error(f"--levels must be N and 4N (got {lo} {hi})")
    if args.panes and (args.multi or args.halo):
        ap.error("--panes is its own single-monoid rollup shape; "
                 "--multi/--halo belong to the per-turn job")
    if args.pre_combine and not args.panes:
        ap.error("--pre-combine requires --panes (per-turn sliding "
                 "output is not decomposable map-side)")
    if args.iceberg and (args.multi or args.panes):
        ap.error("--iceberg runs the per-turn sliding job (--multi uses "
                 "the combine sink, --panes its own rollup sink); "
                 "compose it with --halo/--cluster/--levels")

    src = f"/tmp/swag_stream_src_{args.turns}_{args.convs}"
    r = subprocess.run(
        [sys.executable, "-c", GEN.format(here=HERE, path=src,
                                          turns=args.turns, convs=args.convs)],
        capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        raise RuntimeError(f"gen failed:\n{r.stderr[-3000:]}")

    if args.iceberg:
        icb = src + "_iceberg"
        r = subprocess.run(
            [sys.executable, "-c",
             ICB_GEN.format(here=HERE, src=src, loc=icb)],
            capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            raise RuntimeError(f"iceberg gen failed:\n{r.stderr[-3000:]}")
        src_for_job = icb
    else:
        src_for_job = src

    zip_path = os.path.join(tempfile.gettempdir(), "swag_spark_pkg.zip")
    build_zip(zip_path)

    probes = membw_probes()
    levels = {
        c: run_level(c, src_for_job, zip_path, args.turns,
                     multi=args.multi,
                     cluster=args.cluster, halo=args.halo,
                     panes=args.panes, slide=args.slide,
                     pre_combine=args.pre_combine, iceberg=args.iceberg)
        for c in (lo, hi)
    }
    eff = (
        levels[hi]["turns_per_sec"] / levels[lo]["turns_per_sec"]
    ) / 4
    if args.panes:
        shape = f"pane-sliced rollup sum ({args.panes} / {args.slide})"
        if args.pre_combine:
            shape += " + map-side pane pre-combine"
    elif args.multi:
        shape = "window-shared 5 monoids x 3 durations"
    else:
        shape = "sliding sum 10m"
    if args.iceberg:
        shape += " (Iceberg source table -> Iceberg exactly-once sink)"
    if args.halo:
        shape += " + hot-key chunk-halo (top-40, 96h spans)"
    report = {
        "job": (
            f"spark-submit --py-files streaming job: {shape} over "
            f"{args.turns} transcript turns, {args.convs} convs, 8 arrival "
            f"chunks, availableNow drain, exactly-once sink"
        ),
        "mode": ("local-cluster[N,1,4096] — N isolated single-core "
                 "executor JVMs" if args.cluster else "local[N]"),
        "cluster": args.cluster,
        "halo": args.halo,
        "iceberg": args.iceberg,
        "panes": args.panes,
        "pre_combine": args.pre_combine,
        "levels": levels,
        "level_pair": [lo, hi],
        "scaling_efficiency_2_to_8": round(eff, 3),
        "vm_context": probes,
    }
    sk = skew_model(src, lo, hi)
    if sk:
        ideal = (
            sk.get("halo_ideal_eff_2_to_8")
            if args.halo
            else sk["ideal_eff_2_to_8"]
        )
        if args.pre_combine:
            # pre-combine dissolves the serial atoms the histogram
            # models: the hot key's row-proportional work folds
            # map-side (partitioned by FILE, not key) and its stateful
            # work is O(live panes) — the per-key envelope no longer
            # binds, so measured_over_ideal is reported against 1.0
            ideal = 1.0
            sk["note"] = (
                "pre_combine active: the per-key serial-atom envelope "
                "(ideal_eff_2_to_8, kept for contrast) does not bind — "
                "row-proportional work is map-side file-parallel; "
                "measured_over_ideal uses 1.0"
            )
        if args.halo:
            sk["note"] = (
                "hot-key chunk-halo active: measured_over_ideal uses the "
                "chunked histogram's envelope (ideal_eff_2_to_8 is the "
                "unchunked plan's ceiling, kept for contrast)"
            )
        if ideal:
            sk["measured_over_ideal"] = round(eff / ideal, 3)
        report["input_skew_model"] = sk
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
