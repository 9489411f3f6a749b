"""Same-window interleaved A/B of the counting build across two
library trees (the project's measurement doctrine: the host swings
~3.5x between multi-hour epochs, so only interleaved ratios or
cross-hour minima are honest).

    python tools/ab_interleaved.py <treeA> <treeB> [pairs]

Each pair runs treeA then treeB (ABBA order alternates per pair to
cancel linear drift) as fresh subprocesses via ab_worker_counting.py.
Reports per-side min/median and the min-ratio. Appends one JSON line
to BENCH/ab_counting.jsonl per invocation.
"""

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "ab_worker_counting.py")


def run_one(tree: str) -> float:
    env = dict(os.environ, DABLOOMS_TREE=tree)
    out = subprocess.run(
        [sys.executable, WORKER], env=env, capture_output=True, text=True,
        timeout=600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["sec"]


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    a_times, b_times = [], []
    t_start = time.time()
    for i in range(pairs):
        order = [(tree_a, a_times), (tree_b, b_times)]
        if i % 2:
            order.reverse()
        for tree, bucket in order:
            sec = run_one(tree)
            bucket.append(sec)
            print(f"pair {i}: {os.path.basename(tree)} {sec:.3f}s", flush=True)
    rec = {
        "job": "counting_build_lineitem_sf0.1",
        "tree_a": tree_a,
        "tree_b": tree_b,
        "pairs": pairs,
        "a": a_times,
        "b": b_times,
        "a_min": min(a_times),
        "b_min": min(b_times),
        "a_median": statistics.median(a_times),
        "b_median": statistics.median(b_times),
        "min_ratio_b_over_a": round(min(b_times) / min(a_times), 4),
        "wall_sec": round(time.time() - t_start, 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "8"),
    }
    os.makedirs(os.path.join(HERE, "..", "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "..", "BENCH", "ab_counting.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
