"""Quiet-window scaling-trial collector.

The sandbox's background load arrives in multi-minute bursts (loadavg
0→13→0); a full two-level bench rarely fits inside one quiet window,
so single trials land on a noisy machine and the min-of-trials
headline under-reports the engine. This collector WAITS for a quiet
window (1-min loadavg below a threshold) before firing each
single-level worker run, appending every run's JSON to an evidence
file. Curate BENCH/BASELINE.md from the min per level across runs
(the protocol BENCH/BASELINE.md already documents).

Usage:
  python tools/bench_quiet_collector.py [rounds] [n_rows] [partitions]
Env: SCALING_DATA_DIR (reuse datagen), QUIET_LOAD (default 1.5),
     EVIDENCE (default /tmp/scaling_evidence.jsonl),
     QUIET_LEVELS (default "16:3,4:2" — "cores:trials" pairs per round),
     SCALING_JOBS (job whose *_build_sec the cumulative line tracks)
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import make_snapshot, run_level  # noqa: E402


def wait_quiet(threshold: float, timeout_s: float = 900) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load1 = os.getloadavg()[0]
        if load1 < threshold:
            return load1
        time.sleep(20)
    return os.getloadavg()[0]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    partitions = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    threshold = float(os.environ.get("QUIET_LOAD", "1.5"))
    evidence = os.environ.get("EVIDENCE", "/tmp/scaling_evidence.jsonl")
    os.environ.setdefault("SCALING_JOBS", "scaling")

    levels = [
        (int(c), int(t))
        for c, t in (
            pair.split(":")
            for pair in os.environ.get("QUIET_LEVELS", "16:3,4:2").split(",")
        )
    ]
    job = os.environ["SCALING_JOBS"].split(",")[0]
    zpath, worker = make_snapshot()
    best = {c: None for c, _ in levels}
    for rnd in range(rounds):
        for cores, trials in levels:
            os.environ["SCALING_TRIALS"] = str(trials)
            load = wait_quiet(threshold)
            t0 = time.time()
            try:
                res = run_level(cores, n_rows, partitions, zpath, worker)
            except Exception as e:  # noisy failure: record and move on
                res = {"error": str(e)[:500], "cores": cores}
            res["_load_at_start"] = round(load, 2)
            res["_load_at_end"] = round(os.getloadavg()[0], 2)
            res["_round"] = rnd
            with open(evidence, "a") as fh:
                fh.write(json.dumps(res) + "\n")
            sec = res.get(f"{job}_build_sec")
            if sec and (best[cores] is None or sec < best[cores]):
                best[cores] = sec
            print(
                f"round {rnd} cores={cores}: best_sec={res.get(f'{job}_build_sec')} "
                f"trials={res.get(f'{job}_trials_sec')} load {load:.1f}->"
                f"{res['_load_at_end']} ({time.time()-t0:.0f}s)",
                flush=True,
            )
            lo, hi = min(best), max(best)
            if best[lo] and best[hi]:
                eff = (best[lo] / best[hi]) / (hi // lo)
                print(f"  cumulative: best@{lo}={best[lo]} best@{hi}={best[hi]} "
                      f"efficiency={eff:.3f}", flush=True)
    shutil.rmtree(os.path.dirname(zpath), ignore_errors=True)


if __name__ == "__main__":
    main()
