"""Same-window interleaved A/B of the FULL bench suite across two
library trees (measurement doctrine: the host swings ~3.5x between
multi-hour epochs, so only interleaved ratios are honest — never
compare bench runs from different windows).

    python tools/ab_bench_suite.py <treeA> <treeB> [pairs]

Each pair runs treeA's bench.py then treeB's (ABBA order alternates
per pair to cancel linear drift) as fresh subprocesses with
BENCH_TRIALS from $AB_BENCH_TRIALS (default 2). Reports per-query and
total min per side + min-ratio B/A; appends one JSON line to
BENCH/ab_suite.jsonl.
"""

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(tree: str) -> dict:
    env = dict(
        os.environ,
        BENCH_TRIALS=os.environ.get("AB_BENCH_TRIALS", "2"),
        BENCH_EXTRA_BUILD_TRIALS=os.environ.get("AB_BENCH_EXTRA", "0"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=tree,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    a_runs, b_runs = [], []
    t_start = time.time()
    for i in range(pairs):
        order = [(tree_a, a_runs, "A"), (tree_b, b_runs, "B")]
        if i % 2:
            order.reverse()
        for tree, bucket, tag in order:
            r = run_one(tree)
            bucket.append(r)
            print(
                f"pair {i} {tag}: total={r['value']} "
                + json.dumps(r["queries"]),
                flush=True,
            )
    qnames = list(a_runs[0]["queries"])

    def mins(runs):
        return {q: min(r["queries"][q] for r in runs) for q in qnames}

    a_min, b_min = mins(a_runs), mins(b_runs)
    rec = {
        "job": "bench_suite",
        "tree_a": tree_a,
        "tree_b": tree_b,
        "pairs": pairs,
        "ts": time.time(),
        "a_total_min": min(r["value"] for r in a_runs),
        "b_total_min": min(r["value"] for r in b_runs),
        "a_total_median": statistics.median(r["value"] for r in a_runs),
        "b_total_median": statistics.median(r["value"] for r in b_runs),
        "a_query_min": a_min,
        "b_query_min": b_min,
        "query_min_ratio_b_over_a": {
            q: round(b_min[q] / a_min[q], 3) for q in qnames
        },
        "total_min_ratio_b_over_a": round(
            sum(b_min.values()) / sum(a_min.values()), 4
        ),
        "wall_sec": round(time.time() - t_start, 1),
    }
    os.makedirs(os.path.join(HERE, "..", "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "..", "BENCH", "ab_suite.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
