"""Same-host micro A/B: time a handful of small sf0.1 queries on the
repo checkout at sys.argv[1], with CPU+membw probes around each leg.

Methodology (memory rule: same-host A/Bs only): run interleaved legs
A-B-A where A = this repo's HEAD and B = a `git worktree add` of the
commit under comparison, e.g.

    python tools/micro_ab.py /root/repo
    python tools/micro_ab.py /tmp/r4tree
    python tools/micro_ab.py /root/repo

Each leg prints one JSON line: pre/post probes + per-query times
(3 reps, min first). If the legs spread more among themselves than
A-vs-B differs, the difference is the host window, not the code —
exactly how the round-5 query-suite inflation was adjudicated
(BENCH/BASELINE.md, "bench grids re-measured" section)."""
import json, os, sys, time

repo = sys.argv[1]
sys.path.insert(0, repo)
os.chdir(repo)

def cpu_mops():
    t0 = time.perf_counter(); s = 0
    for i in range(20_000_000): s += i
    return round(20 / (time.perf_counter() - t0), 1)

import numpy as np
def membw():
    a = np.ones(50_000_000, dtype=np.uint8)
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < 1.5:
        b = a.copy(); a[0] = b[0]; n += 1
    return round(n * 50 / (time.perf_counter() - t0), 1)

pre = {"cpu_Mops": cpu_mops(), "membw_MBps": membw()}
import __spark_entry__ as e
from sliding_window_aggregators_spark.sources import get_spark
spark = get_spark(app="micro-ab", cpus=32)
qs = e.queries()
sf = "/root/testdata/sf0.1"
qs["user_stats"](spark, sf).count()          # warm-up
qs["kernel_sum_w100"](spark, sf).count()
NAMES = ["region_revenue", "pricing_summary", "weekly_retention",
         "hll_users_by_type", "stratified_sample", "pii_scan"]
times = {}
for rep in range(3):
    for n in NAMES:
        t0 = time.perf_counter()
        qs[n](spark, sf).count()
        times.setdefault(n, []).append(round(time.perf_counter() - t0, 3))
post = {"cpu_Mops": cpu_mops(), "membw_MBps": membw()}
print(json.dumps({"repo": repo, "pre": pre, "post": post,
                  "times": {k: [min(v)] + v for k, v in times.items()}}))
spark.stop()
