"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir; compare row count, column names, and order-insensitive
values (exact for ints/strings, bit-exact for doubles unless the query
rounds)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(pdf):
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name, sdf, con, sql, rtol=0.0):
    import numpy as np
    import pandas as pd

    a = normalize(sdf.toPandas())
    b = normalize(con.sql(sql).df())
    problems = []
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
    elif len(a) != len(b):
        problems.append(f"rows {len(a)} vs {len(b)}")
    else:
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float).to_numpy()
                bv = bv.astype(float).to_numpy()
                nan_ok = np.isnan(av) == np.isnan(bv)
                m = ~np.isnan(av) & ~np.isnan(bv)
                if rtol:
                    ok = np.allclose(av[m], bv[m], rtol=rtol)
                else:
                    ok = np.array_equal(av[m], bv[m])
                if not (ok and nan_ok.all()):
                    bad = np.nonzero(av[m] != bv[m])[0][:3] if m.any() else []
                    problems.append(
                        f"col {c}: {(~nan_ok).sum()} nan-mismatch, sample diffs "
                        + str([(av[m][i], bv[m][i]) for i in bad])
                    )
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    neq = (av.astype(str) != bv.astype(str))
                    idx = neq[neq].index[:3]
                    problems.append(
                        f"col {c}: {neq.sum()} diffs e.g. "
                        + str([(av[i], bv[i]) for i in idx])
                    )
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name}: {len(a)} rows" + ("" if not problems else f"  {problems}"))
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    import __spark_entry__ as entrymod
    from sliding_window_aggregators_spark.sources import get_spark

    spark = get_spark(cpus=8)
    con = duck_con(sf_dir)
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            n = fn(spark, sf_dir).count()
            print(f"ROWS-ONLY {name}: {n} rows")
            continue
        try:
            if not compare(name, fn(spark, sf_dir), con, os_[name]):
                fails.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            fails.append(name)
        finally:
            # queries persist/cache intermediates for intra-query reuse;
            # drop them between queries so one long session doesn't
            # accumulate every query's blocks in executor storage
            spark.catalog.clearCache()
    print("FAILURES:", fails or "none")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
