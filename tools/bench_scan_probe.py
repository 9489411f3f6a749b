"""Control probe: parquet text scan+decode ALONE at two parallelism
levels — isolates the input path from the sketch engine. If the scan
itself tops out below 4x between N and 4N cores on this shared-DRAM
box, that is the ceiling for ANY full-text job here, engine included
(companion to the numpy-multiprocessing murmur probe in
BENCH/BASELINE.md).

Usage: python tools/bench_scan_probe.py <data_dir> [levels=4,16] [trials=3]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time, json
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cores, data_dir, trials = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master(f"local[{cores}]")
         .appName(f"scan-probe-{cores}")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
wp = spark.read.parquet(data_dir)
wp.count()  # warm page cache / JIT
best = None
ts = []
for _ in range(trials):
    t0 = time.perf_counter()
    total = wp.select(F.sum(F.octet_length("text"))).first()[0]
    dt = time.perf_counter() - t0
    ts.append(round(dt, 3))
    best = min(best, dt) if best else dt
print("SCAN_RESULT " + json.dumps(
    {"cores": cores, "bytes": int(total), "best_sec": round(best, 3),
     "trials_sec": ts, "mb_per_sec": round(total / best / 1e6, 1)}))
spark.stop()
"""


def main():
    data_dir = sys.argv[1]
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "4,16").split(",")]
    trials = sys.argv[3] if len(sys.argv) > 3 else "3"
    import shutil
    import tempfile

    wpath = os.path.join(tempfile.mkdtemp(prefix="scanprobe-"), "scan_worker.py")
    with open(wpath, "w") as fh:
        fh.write(WORKER)
    spark_submit = shutil.which("spark-submit")
    results = {}
    for c in levels:
        cmd = (
            [spark_submit, "--master", f"local[{c}]", "--driver-memory", "16g",
             wpath, str(c), data_dir, trials]
            if spark_submit
            else [sys.executable, wpath, str(c), data_dir, trials]
        )
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("SCAN_RESULT "):
                results[c] = json.loads(line[len("SCAN_RESULT "):])
                print(f"local[{c}]: {results[c]}", flush=True)
    if len(results) == 2:
        a, b = levels
        sp = results[b]["best_sec"] and results[a]["best_sec"] / results[b]["best_sec"]
        print(f"scan speedup {a}->{b}: {sp:.2f}x  efficiency {(sp / (b / a)):.3f}")


if __name__ == "__main__":
    main()
