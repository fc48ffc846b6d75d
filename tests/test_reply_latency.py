"""Reply-latency rollup — the north_rule's full pipeline composed
end-to-end: stream-stream interval join → first-reply min-by → tumbling
windowed aggregate, THREE chained stateful operators in ONE streaming
query. Verified two ways:

- the batch twin (plus exact discrete p50/p90 order statistics) against
  a DuckDB value-hash oracle over the same transcripts rows — integer
  microsecond latencies and integer order-statistic indices, so every
  comparison is exact;
- the streaming query (2-chunk replay + a both-sides watermark-flush
  sentinel) against the batch twin, full equality on the shared columns.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sliding_window_aggregators_spark.sources import transcripts_pandas
from sliding_window_aggregators_spark.streaming import (
    reply_latency_batch,
    reply_latency_stream,
    write_stream_exactly_once,
)

HORIZON = "60 seconds"
WINDOW = "2 minutes"
WIN_US = 120_000_000

ORACLE_REPLY_LATENCY = f"""
WITH users AS (
  SELECT conv_id, turn_idx, ts FROM transcripts WHERE role = 'user'
), replies AS (
  SELECT conv_id, turn_idx, ts FROM transcripts
  WHERE role IN ('assistant', 'tool')
), fr AS (
  SELECT u_ts, r_ts FROM (
    SELECT u.ts AS u_ts, r.ts AS r_ts,
           row_number() OVER (
             PARTITION BY u.conv_id, u.turn_idx
             ORDER BY r.ts, r.turn_idx
           ) AS rn
    FROM users u
    JOIN replies r
      ON r.conv_id = u.conv_id
     AND r.ts >= u.ts
     AND r.ts <= u.ts + INTERVAL 60 SECOND
  ) WHERE rn = 1
), lat AS (
  SELECT make_timestamp((epoch_us(u_ts) // {WIN_US}) * {WIN_US}) AS win_start,
         epoch_us(r_ts) - epoch_us(u_ts) AS lat_us
  FROM fr
), ranked AS (
  SELECT win_start, lat_us,
         row_number() OVER (PARTITION BY win_start ORDER BY lat_us) AS rn,
         count(*) OVER (PARTITION BY win_start) AS n
  FROM lat
)
SELECT win_start,
       count(*) AS answered,
       sum(lat_us) AS sum_lat_us,
       max(lat_us) AS max_lat_us,
       max(CASE WHEN rn = (n - 1) // 2 + 1 THEN lat_us END) AS p50_lat_us,
       max(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN lat_us END) AS p90_lat_us
FROM ranked
GROUP BY win_start
"""


def test_reply_latency_batch_vs_duckdb_value_hash(spark):
    import duckdb

    from tools.check_oracles import compare

    pdf = transcripts_pandas(600, 20)
    con = duckdb.connect()
    con.register("transcripts", pdf)
    got = reply_latency_batch(
        spark.createDataFrame(pdf), horizon=HORIZON, window=WINDOW
    )
    assert compare("reply_latency", got, con, ORACLE_REPLY_LATENCY)
    # the window must actually be populated across multiple buckets and
    # carry real spread (a degenerate all-one-window pass proves nothing)
    out = got.toPandas()
    assert len(out) >= 3 and (out["answered"] > 1).any()
    assert (out["p90_lat_us"] >= out["p50_lat_us"]).all()
    assert (out["max_lat_us"] >= out["p90_lat_us"]).all()


def test_reply_latency_stream_matches_batch(spark, tmp_path):
    """Three chained stateful operators in one streaming query: replayed
    as two micro-batch chunks plus a watermark-flush sentinel pair (an
    assistant turn BEFORE a user turn, so both join inputs advance their
    watermark but the pair itself joins nothing), then compared with the
    batch twin — full equality on the shared columns."""
    from test_streaming import _read_stream, _write_chunk

    src = tmp_path / "src"
    src.mkdir()
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    pdf = transcripts_pandas(600, 20)
    far = pdf["ts"].max() + pd.Timedelta(days=1)
    sentinel = pd.DataFrame(
        {
            "conv_id": ["zz_sentinel", "zz_sentinel"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            # assistant precedes user → r_ts >= u_ts never holds for the
            # pair, and the unanswered user turn emits nothing
            "role": ["assistant", "user"],
            "text": ["x", "x"],
            "tool": pd.array([None, None], dtype="string"),
            "ts": [far, far + pd.Timedelta(seconds=10)],
        }
    )
    _write_chunk(spark, str(src), pdf.iloc[:300], "c0")
    _write_chunk(spark, str(src), pdf.iloc[300:], "c1")
    _write_chunk(spark, str(src), sentinel, "c2")

    stream = reply_latency_stream(
        _read_stream(spark, str(src)),
        horizon=HORIZON,
        watermark="2 minutes",
        window=WINDOW,
    )
    q, sink = write_stream_exactly_once(stream, out_dir, ckpt)
    q.awaitTermination(180)

    got = (
        sink.read_committed(spark)
        .toPandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    exp = (
        reply_latency_batch(
            spark.createDataFrame(pdf), horizon=HORIZON, window=WINDOW
        )
        .select("win_start", "answered", "sum_lat_us", "max_lat_us")
        .toPandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(exp) >= 3
    for c in ["win_start", "answered", "sum_lat_us", "max_lat_us"]:
        assert got[c].tolist() == exp[c].tolist(), c


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
