"""Env-gated poor-man's sampling profiler for executor Python workers
(no py-spy in the sandbox). When ``SWAG_STACK_SAMPLER`` is set, the
first call to :func:`ensure_sampler` in a worker process starts a
daemon thread that samples the MAIN thread's stack every 2 ms and
appends collapsed stacks to ``/tmp/swag_stacks_<pid>.txt`` once a
second. Zero cost when the env var is unset (the normal case —
bench/driver runs never set it)."""

from __future__ import annotations

import os
import sys
import threading
import time

_started = False


def ensure_sampler() -> None:
    global _started
    if _started or not os.environ.get("SWAG_STACK_SAMPLER"):
        return
    _started = True
    main_id = threading.main_thread().ident
    counts: dict[str, int] = {}

    def run() -> None:
        last_flush = time.time()
        while True:
            time.sleep(0.002)
            frames = sys._current_frames()
            f = frames.get(main_id)
            stack = []
            depth = 0
            while f is not None and depth < 40:
                co = f.f_code
                stack.append(f"{os.path.basename(co.co_filename)}:{co.co_name}:{f.f_lineno}")
                f = f.f_back
                depth += 1
            key = ";".join(reversed(stack))
            counts[key] = counts.get(key, 0) + 1
            if time.time() - last_flush > 1.0:
                try:
                    with open(f"/tmp/swag_stacks_{os.getpid()}.txt", "w") as fh:
                        for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
                            fh.write(f"{v} {k}\n")
                except OSError:
                    pass
                last_flush = time.time()

    threading.Thread(target=run, daemon=True).start()
