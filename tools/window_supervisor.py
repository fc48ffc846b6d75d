"""One probe loop, three measurement gates.

Running three independent probe-gated watchers (grid / batch scaling /
stream scaling) makes their own probes collide: a 16-proc bandwidth
probe running under another watcher's probe reads low, so every watcher
under-reports the window and healthy windows get missed. This
supervisor replaces them: a SINGLE combined probe (1/2/8/16-proc membw)
every --interval seconds, evaluated against all three gates at once.
When gates match, runs fire cheapest-first (grid ~3 min single-core,
then batch scaling ~15 min, then stream scaling ~20 min), serialized so
a measurement never runs under another measurement's load; the probe is
re-taken between runs because the window may have shifted.

Gates (matching the individual watchers they replace):
- grid:   bw1 >= --grid-min-bw1            (r3's window level)
- batch:  bw1 >= --batch-min-bw1 and bw16 >= --batch-min-bw16
- stream: bw8 >= --stream-min-bw8 and bw8/bw2 >= --stream-min-ratio
          (the per-stream-cap regime where aggregate bandwidth scales
          with procs — the only single-box emulation of per-executor
          bandwidth)

Each gate stops firing after its run meets its target (grid: one
healthy completed run; scaling pairs: 2->8 efficiency >= 0.8) or after
--max-runs-per-gate attempts.

Usage:
    python tools/window_supervisor.py --log /tmp/supervisor.jsonl
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _bw(_):
    import numpy as np

    a = np.ones(50_000_000, dtype=np.uint8)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2:
        b = a.copy()
        a[0] = b[0]
        n += 1
    return n * 50 / (time.perf_counter() - t0)


def probe() -> dict:
    out = {}
    for procs, key in [(1, "bw1"), (2, "bw2"), (4, "bw4"), (8, "bw8"),
                       (16, "bw16")]:
        with mp.Pool(procs) as p:
            out[key] = round(sum(p.map(_bw, range(procs))))
    out["ratio_8v2"] = round(out["bw8"] / out["bw2"], 2) if out["bw2"] else 0.0
    out["ratio_16v4"] = (
        round(out["bw16"] / out["bw4"], 2) if out["bw4"] else 0.0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=240.0)
    ap.add_argument("--max-wait-s", type=float, default=18000.0)
    ap.add_argument("--max-runs-per-gate", type=int, default=3)
    ap.add_argument("--grid-min-bw1", type=float, default=3800.0)
    # the 2->8 pair is bandwidth-bound at the 2- and 8-proc grants, not
    # the 1-proc one: this host's windows often cap single-stream while
    # granting healthy aggregate bandwidth (bw16 8-13 GB/s with bw1 at
    # 0.3-0.6 GB/s) — exactly the per-executor-bandwidth regime a real
    # cluster has, so gate the pair on bw2 + bw16
    ap.add_argument("--batch-min-bw2", type=float, default=2500.0)
    ap.add_argument("--batch-min-bw16", type=float, default=8000.0)
    ap.add_argument("--stream-min-bw8", type=float, default=2000.0)
    ap.add_argument("--stream-min-ratio", type=float, default=2.0)
    # a collapsed 2-proc stream (bw2 → ~0.4 GB/s) makes ratio_8v2 spike
    # spuriously — such windows starve the pair's level-2 leg instead of
    # evidencing a real grant; require a healthy bw2 floor too
    ap.add_argument("--stream-min-bw2", type=float, default=0.0)
    # twelve gated pairs showed the remaining failure mode is DECAY: an
    # instantaneous probe satisfies the gate but the grant doesn't hold
    # across the ~4-minute pair. Require the gate to hold across N
    # consecutive probes spaced --sustain-gap-s apart before firing —
    # only a window that has already held ~the pair's level-2 leg
    # duration gets to spend a run attempt
    ap.add_argument("--stream-sustain", type=int, default=1)
    ap.add_argument("--sustain-gap-s", type=float, default=60.0)
    ap.add_argument("--stream-cluster", action="store_true",
                    help="fire the stream pair in local-cluster mode "
                         "(N isolated executor JVMs per level)")
    ap.add_argument("--batch-cluster", action="store_true",
                    help="fire the batch pair in local-cluster mode "
                         "(N isolated executor JVMs per level)")
    ap.add_argument("--stream-halo", action="store_true",
                    help="fire the stream pair with hot-key chunk-halo "
                         "(the engine's skew answer)")
    ap.add_argument("--stream-panes", default=None, metavar="SIZE",
                    help="fire the stream pair in the pane-sliced rollup "
                         "shape (sliding_panes_stream at this window "
                         "size) instead of the per-turn multi job")
    ap.add_argument("--stream-slide", default="30 minutes",
                    help="slide for --stream-panes")
    ap.add_argument("--stream-pre-combine", action="store_true",
                    help="fire --stream-panes with map-side pane "
                         "pre-combine (the pane shape's skew-ceiling "
                         "lift)")
    ap.add_argument("--stream-turns", type=int, default=16777216)
    ap.add_argument("--stream-convs", type=int, default=16384)
    ap.add_argument("--stream-alt-levels", action="store_true",
                    help="also gate the (4, 16) N-vs-4N pair: fire "
                         "bench_scaling_stream --levels 4 16 when "
                         "bw16/bw4 clears --stream-min-ratio (with bw16 "
                         "over the bw8 floor and bw4 over the bw2 "
                         "floor); when both pairs gate, the one with "
                         "the larger grant ratio fires")
    ap.add_argument("--batch-halo", action="store_true",
                    help="fire the batch pair on the chunked-halo layout")
    ap.add_argument("--target", type=float, default=0.8)
    ap.add_argument("--log", default="/tmp/window_supervisor.jsonl")
    args = ap.parse_args()

    done = {"grid": False, "batch": False, "stream": False}
    runs = {"grid": 0, "batch": 0, "stream": 0}

    def log(rec):
        rec["t"] = round(time.time() - t0)
        with open(args.log, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    def fire_grid(p):
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "grid_watch.py"),
             "--min-bw", "0", "--max-wait-s", "1",
             "--out", "/tmp/grid_confirm_r5.json"],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        ok = r.returncode == 0 and os.path.exists("/tmp/grid_confirm_r5.json")
        after = None
        if ok:
            rep = json.load(open("/tmp/grid_confirm_r5.json"))
            after = rep.get("vm_membw_MBps_after")
            # a window that shifted mid-run is not a confirmation
            ok = after is not None and after >= args.grid_min_bw1 * 0.8
        log({"gate": "grid", "probe": p, "ok": ok, "bw_after": after})
        return ok

    def fire_batch(p):
        # the supervisor IS the gate — disarm the internal one entirely
        # so the healthy window isn't burned waiting on a second gate
        env = dict(os.environ,
                   SWAG_SCALE_MIN_BW1="0",
                   SWAG_SCALE_MIN_BWN="0",
                   SWAG_SCALE_GATE_ATTEMPTS="1")
        cmd = [sys.executable, os.path.join(HERE, "bench_scaling.py")]
        if args.batch_cluster:
            cmd.append("--cluster")
        if args.batch_halo:
            cmd.append("--halo")
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                           env=env)
        eff = None
        try:
            txt = r.stdout
            eff = json.loads(txt[txt.index("{"):txt.rindex("}") + 1])[
                "scaling_efficiency_2_to_8"]
        except Exception:
            pass
        log({"gate": "batch", "probe": p, "eff_2_8": eff,
             "err": r.stderr[-500:] if r.returncode != 0 else None})
        return eff is not None and eff >= args.target

    def fire_stream(p, pair=(2, 8)):
        cmd = [sys.executable, os.path.join(HERE, "bench_scaling_stream.py"),
               "--turns", str(args.stream_turns),
               "--convs", str(args.stream_convs),
               "--levels", str(pair[0]), str(pair[1])]
        if args.stream_panes:
            # the rollup shape is its own single-monoid mode (the
            # harness rejects --panes with --multi/--halo)
            cmd += ["--panes", args.stream_panes,
                    "--slide", args.stream_slide]
            if args.stream_pre_combine:
                cmd.append("--pre-combine")
        else:
            cmd.append("--multi")
            if args.stream_halo:
                cmd.append("--halo")
        if args.stream_cluster:
            cmd.append("--cluster")
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
        eff = None
        try:
            rep = json.loads(r.stdout)
            rep["gate_probe"] = p
            for path in ("/tmp/stream_watch_r5c.jsonl",
                         os.path.join(HERE, "BENCH",
                                      "stream_scaling_runs.jsonl")):
                with open(path, "a") as fh:
                    fh.write(json.dumps(rep) + "\n")
            eff = rep["scaling_efficiency_2_to_8"]
        except Exception:
            pass
        log({"gate": "stream", "probe": p, "eff_2_8": eff,
             "err": r.stderr[-500:] if r.returncode != 0 else None})
        return eff is not None and eff >= args.target

    t0 = time.time()
    while (time.time() - t0) < args.max_wait_s and not all(done.values()):
        p = probe()
        matches = []
        if not done["grid"] and runs["grid"] < args.max_runs_per_gate \
                and p["bw1"] >= args.grid_min_bw1:
            matches.append(("grid", fire_grid))
        if not done["batch"] and runs["batch"] < args.max_runs_per_gate \
                and p["bw2"] >= args.batch_min_bw2 and p["bw16"] >= args.batch_min_bw16:
            matches.append(("batch", fire_batch))
        def _stream_ok(pr, pair=(2, 8)):
            if pair == (4, 16):
                # scripted/legacy probes may lack the 4/16 keys
                return (pr.get("bw16", 0) >= args.stream_min_bw8
                        and pr.get("bw4", 0) >= args.stream_min_bw2
                        and pr.get("ratio_16v4", 0.0)
                        >= args.stream_min_ratio)
            return (pr["bw8"] >= args.stream_min_bw8
                    and pr["bw2"] >= args.stream_min_bw2
                    and pr["ratio_8v2"] >= args.stream_min_ratio)

        pairs = [(2, 8)] + ([(4, 16)] if args.stream_alt_levels else [])
        gated = [pp for pp in pairs if _stream_ok(p, pp)]
        if not done["stream"] and runs["stream"] < args.max_runs_per_gate \
                and gated:
            def _ratio(pp):
                return (p["ratio_8v2"] if pp == (2, 8)
                        else p.get("ratio_16v4", 0.0))

            pair = max(gated, key=_ratio)
            held = True
            confirms = [p]
            for _ in range(args.stream_sustain - 1):
                time.sleep(args.sustain_gap_s)
                pc = probe()
                confirms.append(pc)
                if not _stream_ok(pc, pair):
                    held = False
                    break
            if held:
                p = {"confirms": confirms, "pair": list(pair),
                     **confirms[-1]}
                matches.append((
                    "stream",
                    lambda pr, _pair=pair: fire_stream(pr, _pair),
                ))
            else:
                log({"gate": "stream-sustain-fail", "confirms": confirms})
                time.sleep(args.interval)
                continue
        if not matches:
            log({"gate": None, "probe": p})
            time.sleep(args.interval)
            continue
        for name, fn in matches:
            runs[name] += 1
            if fn(p):
                done[name] = True
            # window may have shifted during the run — re-probe before
            # firing the next matched gate
            if matches.index((name, fn)) < len(matches) - 1:
                p = probe()
        time.sleep(30)
    log({"gate": "exit", "done": done, "runs": runs})


if __name__ == "__main__":
    main()
