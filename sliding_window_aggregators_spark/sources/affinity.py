"""Per-executor CPU affinity for single-box multi-executor emulation.

``local-cluster[N,1,mem]`` gives every task slot its own executor JVM —
but nothing stops a 1-slot executor from borrowing idle host cores for
its GC, parquet-scan, netty, and forked Python-worker threads. At low
parallelism levels that borrowing inflates measured throughput (a
"2-executor" level really consumes 4-6 cores), which deflates the
N -> 4N scaling efficiency a two-cluster-size study reports. A real
cluster node cannot borrow cores from nodes it doesn't have.

``pin_executors`` closes the hole: it pins each executor JVM — and every
already-forked descendant (pyspark daemon + workers), while future forks
inherit the mask — to ONE distinct host core, so an N-executor level
consumes exactly N cores of executor work. The driver stays unpinned,
matching the separate driver node of a real cluster.

Linux-only (``taskset``); silently no-ops where unavailable, so callers
can invoke it unconditionally.
"""

from __future__ import annotations

import os
import shutil
import subprocess

__all__ = ["pin_executors"]


def _descendants(roots: list[int]) -> list[int]:
    """Root pids + all transitive children, from one ``ps`` snapshot."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,ppid"], capture_output=True, text=True,
            timeout=30,
        ).stdout
    except Exception:
        return roots
    children: dict[int, list[int]] = {}
    for ln in out.splitlines()[1:]:
        parts = ln.split()
        if len(parts) >= 2 and parts[0].isdigit() and parts[1].isdigit():
            children.setdefault(int(parts[1]), []).append(int(parts[0]))
    seen: list[int] = []
    stack = list(roots)
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.append(pid)
        stack.extend(children.get(pid, []))
    return seen


def pin_executors(spark, cores_per_executor: int = 1) -> int:
    """Pin this app's executor JVMs to distinct host cores (1 core per
    executor by default). Executors are matched by the driver RPC port in
    their launch command, so concurrent Spark apps on the box are never
    touched. Returns the number of executors pinned (0 = nothing to pin:
    local[N] master, no taskset, or executors not yet registered — call
    after an action has forced executor registration)."""
    if shutil.which("taskset") is None:
        return 0
    try:
        port = spark.sparkContext.getConf().get("spark.driver.port")
    except Exception:
        return 0
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True,
            timeout=30,
        ).stdout
    except Exception:
        return 0
    execs = []
    for ln in out.splitlines():
        if "CoarseGrainedExecutorBackend" in ln and f":{port}" in ln:
            pid = ln.split(None, 1)[0]
            if pid.isdigit():
                execs.append(int(pid))
    execs.sort()
    ncpu = os.cpu_count() or 1
    for i, root in enumerate(execs):
        lo = (i * cores_per_executor) % ncpu
        hi = lo + cores_per_executor - 1
        mask = str(lo) if cores_per_executor == 1 else f"{lo}-{hi}"
        for pid in _descendants([root]):
            # -a = every thread of the process; forked children inherit
            subprocess.run(
                ["taskset", "-a", "-cp", mask, str(pid)],
                capture_output=True,
            )
    return len(execs)
