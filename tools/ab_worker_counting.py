"""Subprocess worker for the interleaved counting-build A/B.

Loads dablooms_spark from $DABLOOMS_TREE (a git worktree), runs
bench.py's q_bloom_build_lineitem job (same session configs, same
warmup) AB_INNER_TRIALS times, prints one JSON line with the min.
The tree under test supplies ONLY the library; the harness (this
file, the session config, the job) is shared, so the measured
difference is the library diff and nothing else.
"""

import json
import os
import sys
import time

TREE = os.environ["DABLOOMS_TREE"]
sys.path.insert(0, TREE)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    inner = int(os.environ.get("AB_INNER_TRIALS", "2"))

    # mirror bench.make_spark exactly (both sides share this file)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-counting-build")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dablooms_spark.operators import build_counting_bloom
    from dablooms_spark.sources import load_table, table_row_count

    lineitem = load_table(spark, sf_dir, "lineitem")

    # warm: python worker pool + parquet footer, as in bench.py
    warm = spark.range(0, cpus * 200, 1, cpus * 2).select(
        F.col("id").cast("string").alias("k")
    )
    build_counting_bloom(warm, "k", capacity=100, error_rate=0.05)
    lineitem.limit(10_000).count()

    best = float("inf")
    rows = 0
    for _ in range(inner):
        t0 = time.perf_counter()
        keyed = lineitem.select(
            F.concat_ws(":", "l_orderkey", "l_linenumber").alias("k")
        )
        n = table_row_count(sf_dir, "lineitem") or lineitem.count()
        filt = build_counting_bloom(keyed, "k", capacity=n, error_rate=0.01)
        best = min(best, time.perf_counter() - t0)
        rows = filt.count
    spark.stop()
    print(json.dumps({"tree": TREE, "sec": round(best, 3), "rows": rows}))


if __name__ == "__main__":
    main()
