"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir> <suffix> [name ...]
e.g.   python tools/dump_plans.py plans/r06 before dedup_simhash_pairs

Streaming-replay queries (ooo_stream_sum_1h, conv_timeout_30m) execute a
full stream inside the query function; for those we capture the plan of
the *returned* (committed-readback) DataFrame, which is what explain can
show — the streaming micro-batch plan is pinned separately via the
StreamingQueryProgress notes in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SWAG_PLAN_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from sliding_window_aggregators_spark.sources import get_spark

    spark = get_spark(app="swag-plan-dump")
    qs = entry.queries()
    if not names:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            txt = f"explain failed: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
