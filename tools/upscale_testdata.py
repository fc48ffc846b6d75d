"""Upscale a test-data directory by an integer factor for local perf
measurement (the driver generates its own large-SF data; this tool only
exists so optimization A/Bs can run at a comparable size).

Each copy c in [0, factor) shifts every primary/foreign key by
c * stride(table) so join fan-out per key matches the small input, and
perturbs document text / embedding values deterministically so that
near-duplicate structure is preserved (copies become near-dups of the
original rather than exact dups, which would collapse distinct-value
dedup work).

Usage: python tools/upscale_testdata.py SRC_DIR DST_DIR FACTOR
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> stride source table (max+1 of that table's own key space)
SHIFT = {
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "customer": {"c_custkey": "customer"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    "nation": {},
    "region": {},
}

KEY_OF = {
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    strides: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for t in SHIFT:
        tables[t] = pq.read_table(os.path.join(src, t + ".parquet"))
        if t in KEY_OF:
            strides[t] = int(pc.max(tables[t][KEY_OF[t]]).as_py()) + 1
    strides["events_user"] = int(pc.max(tables["events"]["user_id"]).as_py()) + 1

    for t, shifts in SHIFT.items():
        base = tables[t]
        if not shifts:  # fixed-size dimension tables
            pq.write_table(base, os.path.join(dst, t + ".parquet"))
            continue
        copies = []
        for c in range(factor):
            tb = base
            for col, stref in shifts.items():
                idx = tb.schema.get_field_index(col)
                shifted = pc.add(tb[col], pa.scalar(c * strides[stref], pa.int64()))
                tb = tb.set_column(idx, col, shifted.cast(tb.schema.field(col).type))
            if t == "documents" and c > 0:
                txt = tb["text"].to_pylist()
                ids = tb["doc_id"].to_pylist()
                txt = [s + f" zq{c}x{i % 97}" for s, i in zip(txt, ids)]
                tb = tb.set_column(
                    tb.schema.get_field_index("text"), "text", pa.array(txt, pa.string())
                )
                tb = tb.set_column(
                    tb.schema.get_field_index("n_chars"),
                    "n_chars",
                    pa.array([len(s) for s in txt], pa.int64()),
                )
            if t == "embeddings" and c > 0:
                emb = tb["embedding"].combine_chunks()
                if isinstance(emb, pa.ChunkedArray):
                    emb = emb.chunk(0)
                vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
                jitter = c * 1e-4 * ((np.arange(len(vals)) % 13) - 6)
                new = pa.ListArray.from_arrays(
                    emb.offsets, pa.array((vals + jitter).astype(np.float32), pa.float32())
                )
                tb = tb.set_column(
                    tb.schema.get_field_index("embedding"), "embedding", new
                )
            copies.append(tb)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, t + ".parquet"), row_group_size=1 << 20)
        print(t, out.num_rows, flush=True)
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
