"""Executor CPU-affinity helper (sources/affinity.py) — the single-box
multi-executor emulation used by the two-cluster-size scaling studies.

The pin itself is exercised end-to-end by bench_scaling*.py --cluster
(local-cluster masters are too heavy for the unit suite); here we pin
the pure logic: descendant discovery from a ps snapshot, and the no-op
guarantees that make pin_executors safe to call unconditionally.
"""

from __future__ import annotations

import subprocess

from sliding_window_aggregators_spark.sources import affinity


def test_descendants_walks_transitive_children(monkeypatch):
    snapshot = (
        "  PID  PPID\n"
        "  100     1\n"
        "  200   100\n"
        "  201   100\n"
        "  300   200\n"
        "  400     1\n"
    )

    def fake_run(cmd, **kw):
        class R:
            stdout = snapshot
        return R()

    monkeypatch.setattr(affinity.subprocess, "run", fake_run)
    got = affinity._descendants([100])
    assert sorted(got) == [100, 200, 201, 300]  # 400 is unrelated


def test_descendants_survives_ps_failure(monkeypatch):
    def boom(cmd, **kw):
        raise OSError("no ps")

    monkeypatch.setattr(affinity.subprocess, "run", boom)
    assert affinity._descendants([42]) == [42]


def test_pin_executors_noop_without_taskset(monkeypatch):
    monkeypatch.setattr(affinity.shutil, "which", lambda _: None)
    # spark arg must not even be touched when taskset is absent
    assert affinity.pin_executors(object()) == 0


def test_pin_executors_noop_on_local_master(spark):
    # local[N] has no CoarseGrainedExecutorBackend processes — nothing is
    # pinned, nothing raises, and concurrent unrelated processes are
    # never matched (the driver-port filter)
    assert affinity.pin_executors(spark) == 0


def test_pin_executors_matches_only_this_apps_port(monkeypatch):
    calls = []
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        if cmd[:2] == ["ps", "-eo"] and cmd[2] == "pid,args":
            class R:
                stdout = (
                    "  PID ARGS\n"
                    "  500 java CoarseGrainedExecutorBackend --driver-url "
                    "spark://CoarseGrainedScheduler@host:7777 --executor-id 0\n"
                    "  600 java CoarseGrainedExecutorBackend --driver-url "
                    "spark://CoarseGrainedScheduler@host:9999 --executor-id 0\n"
                )
            return R()
        if cmd[0] == "taskset":
            calls.append(cmd)

            class R:
                stdout = ""
            return R()
        return real_run(cmd, **kw)

    class FakeConf:
        def get(self, key):
            assert key == "spark.driver.port"
            return "7777"

    class FakeSC:
        def getConf(self):
            return FakeConf()

    class FakeSpark:
        sparkContext = FakeSC()

    monkeypatch.setattr(affinity.subprocess, "run", fake_run)
    monkeypatch.setattr(
        affinity, "_descendants", lambda roots: list(roots)
    )
    assert affinity.pin_executors(FakeSpark()) == 1
    # pid 600 (a DIFFERENT app's executor, port 9999) was never pinned
    assert [c for c in calls if c[-1] == "600"] == []
    assert [c for c in calls if c[-1] == "500"]
