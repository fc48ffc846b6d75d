"""Extra (non-frozen) benchmarks for the optimization round: time
individual declared queries in isolation, optionally with the noop sink
(guide §1.4) and optionally verifying against the DuckDB oracle first.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--noop] [--verify] name ...

Prints one JSON line {"sf": ..., "times": {name: [s, ...]}, "membw": ...}.
`bench.py` stays the frozen driver-facing benchmark; numbers cited in
OPTIMIZATION_r06.md come from here for per-query A/Bs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    from bench import _vm_membw

    membw = _vm_membw()

    import __spark_entry__ as entry
    from sliding_window_aggregators_spark.sources import get_spark

    spark = get_spark(app="swag-bench-extra")
    qs = entry.queries()
    # session warm-up, mirroring bench.py
    qs["user_stats"](spark, args.sf).count()
    spark.catalog.clearCache()

    if args.verify:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from check_oracles import compare, duck_con

        con = duck_con(args.sf)
        oracles = entry.oracle_sql()
        for name in args.names:
            if name not in oracles:
                continue
            ok = compare(name, qs[name](spark, args.sf), con, oracles[name])
            spark.catalog.clearCache()
            if not ok:
                sys.exit(1)

    times: dict[str, list[float]] = {}
    for name in args.names:
        times[name] = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
            print(f"# {name}: {dt:.3f}s", file=sys.stderr)
            spark.catalog.clearCache()
    print(json.dumps({"sf": args.sf, "times": times, "membw": membw}))
    spark.stop()


if __name__ == "__main__":
    main()
