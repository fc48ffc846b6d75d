"""The measurement supervisor's sustained stream gate (tools/window_supervisor.py).

Twelve gated streaming pairs showed the host's failure mode is window
DECAY: an instantaneous probe passes the gate but the bandwidth grant
does not hold across the ~4-minute pair. ``--stream-sustain N`` fires
only after N consecutive probes pass. Driven here with scripted probes
and a stubbed pair launch — pure control-flow logic, no Spark.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import types

import pytest


def _load_ws():
    spec = importlib.util.spec_from_file_location(
        "ws_under_test", "tools/window_supervisor.py"
    )
    ws = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ws)
    return ws


GOOD = {"bw1": 3000, "bw2": 6000, "bw8": 24000, "bw16": 40000, "ratio_8v2": 4.0}
# fails the gate three ways: bw8 < 8000, bw2 < 2500, ratio < 3.3
BAD = {"bw1": 500, "bw2": 900, "bw8": 2000, "bw16": 5000, "ratio_8v2": 2.2}
# the starved-bw2 artifact: huge ratio but collapsed 2-proc stream —
# must NOT fire (the bw2 floor exists exactly for this window shape)
STARVED = {"bw1": 700, "bw2": 400, "bw8": 9000, "bw16": 11000, "ratio_8v2": 22.5}


def _run(ws, seq, log, fired, max_wait=35, extra=()):
    it = iter(seq)
    ws.probe = lambda: next(it)
    ws.time.sleep = lambda s: None
    t = [0.0]

    def fake_time():
        t[0] += 10.0
        return t[0]

    ws.time.time = fake_time

    def fake_run(cmd, **kw):
        fired.append(cmd)
        return types.SimpleNamespace(
            returncode=0,
            # non-JSON stdout: fire_stream's parse fails -> eff None, and
            # crucially nothing is appended to BENCH/stream_scaling_runs.jsonl
            stdout="stubbed pair",
            stderr="",
        )

    ws.subprocess.run = fake_run
    argv = sys.argv
    sys.argv = [
        "ws", "--interval", "1", "--max-wait-s", str(max_wait),
        "--max-runs-per-gate", "1",
        "--grid-min-bw1", "9999999",
        "--batch-min-bw2", "9999999", "--batch-min-bw16", "9999999",
        "--stream-min-bw8", "8000", "--stream-min-bw2", "2500",
        "--stream-min-ratio", "3.3",
        "--stream-sustain", "3", "--sustain-gap-s", "1",
        "--log", str(log),
        *extra,
    ]
    try:
        ws.main()
    finally:
        sys.argv = argv
    return [json.loads(l) for l in open(log)]


def test_sustain_fail_logs_trail_and_does_not_fire(tmp_path):
    ws = _load_ws()
    fired: list = []
    recs = _run(ws, [GOOD, BAD, BAD, BAD], tmp_path / "a.jsonl", fired)
    kinds = [r["gate"] for r in recs]
    assert "stream-sustain-fail" in kinds
    assert "stream" not in kinds and not fired
    fail = next(r for r in recs if r["gate"] == "stream-sustain-fail")
    # the trail shows exactly which confirm broke the window
    assert [c["bw8"] for c in fail["confirms"]] == [24000, 2000]
    assert recs[-1]["runs"]["stream"] == 0


def test_sustained_window_fires_once_with_confirm_trail(tmp_path):
    ws = _load_ws()
    fired: list = []
    recs = _run(
        ws,
        [GOOD, dict(GOOD, bw8=20000), dict(GOOD, bw8=22000), BAD, BAD],
        tmp_path / "b.jsonl",
        fired,
    )
    fires = [r for r in recs if r["gate"] == "stream"]
    assert len(fires) == 1 and len(fired) == 1
    assert any("bench_scaling_stream" in str(c) for c in fired[0])
    trail = fires[0]["probe"]["confirms"]
    assert [c["bw8"] for c in trail] == [24000, 20000, 22000]
    # the fire probe is the LAST confirm (freshest window picture)
    assert fires[0]["probe"]["bw8"] == 22000
    assert recs[-1]["runs"]["stream"] == 1


def test_starved_bw2_spike_never_starts_a_sustain_sequence(tmp_path):
    ws = _load_ws()
    fired: list = []
    recs = _run(ws, [STARVED, STARVED, STARVED], tmp_path / "c.jsonl", fired)
    kinds = [r["gate"] for r in recs]
    assert kinds.count(None) >= 2 and not fired
    assert "stream-sustain-fail" not in kinds  # floor blocks at probe 1


# a window where only the 4->16 pair's grant scales: 8v2 ratio too low,
# 16v4 well over threshold with healthy floors
ALT = {"bw1": 2500, "bw2": 6000, "bw4": 7000, "bw8": 12000, "bw16": 30000,
       "ratio_8v2": 2.0, "ratio_16v4": 4.29}


def test_alt_levels_gate_fires_4_16_pair(tmp_path):
    """--stream-alt-levels: a window whose 16v4 grant clears the ratio
    (and floors) while 8v2 does not fires the pair with --levels 4 16;
    without the flag the same window never fires."""
    ws = _load_ws()
    fired: list = []
    recs = _run(
        ws, [ALT, ALT, ALT, BAD, BAD], tmp_path / "d.jsonl", fired,
        extra=["--stream-alt-levels"],
    )
    fires = [r for r in recs if r["gate"] == "stream"]
    assert len(fires) == 1 and len(fired) == 1
    cmd = [str(c) for c in fired[0]]
    i = cmd.index("--levels")
    assert cmd[i + 1:i + 3] == ["4", "16"]
    assert fires[0]["probe"]["pair"] == [4, 16]

    ws2 = _load_ws()
    fired2: list = []
    recs2 = _run(ws2, [ALT, ALT, ALT], tmp_path / "e.jsonl", fired2)
    assert not fired2
    assert all(r["gate"] != "stream" for r in recs2)
