"""Scaling-evidence worker: one parallelism level per process.

Run via spark-submit (see tools/bench_scaling.py). Builds the same
sketch build+merge job over an identical deterministic input at
local[N]; prints one JSON line with timings. The input partition count
is fixed (64) so only executor parallelism varies between levels —
the sandbox stand-in for N vs 4N executors on a real cluster.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    cores = int(sys.argv[1])
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    partitions = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dablooms_spark.operators import build_counting_bloom, build_scaling_bloom
    from dablooms_spark.sources import synth_webpages

    # The production workload hashes the full extracted TEXT bytes per
    # page (input_hint's byte-identical-text invariant), not just the
    # short url — ~1.3 KB of murmur per row. Benching the same shape
    # keeps the job compute-dominated, as it is on a real cluster.
    # Input comes from PARQUET (like production): written once outside
    # the timed region, scanned per trial (parallel decode, page-cache
    # served) — a single-JVM in-memory cache serializes on the block
    # manager and understates scan parallelism.
    import shutil
    import tempfile

    # Deterministic input: cacheable across runs/levels (synth_webpages
    # is seed-fixed, so the parquet bytes are a pure function of
    # (n_rows, partitions)); SCALING_DATA_DIR lets repeated quiet-window
    # runs skip the ~3-minute datagen and re-scan the same files.
    cache_root = os.environ.get("SCALING_DATA_DIR")
    if cache_root:
        data_dir = os.path.join(cache_root, f"webpages-{n_rows}-{partitions}")
        cleanup_data = False
    else:
        data_dir = tempfile.mkdtemp() + "/webpages"
        cleanup_data = True
    if not os.path.exists(os.path.join(data_dir, "_SUCCESS")):
        synth_webpages(spark, n_rows=n_rows, partitions=partitions).select(
            "text", "row_id"
        ).write.mode("overwrite").parquet(data_dir)
    wp = spark.read.parquet(data_dir)
    total = wp.count()

    # Warm the Python worker pool (imports of numpy/pyspark/our kernels
    # happen once per worker); a long-running cluster job amortizes
    # this — the throughput metric should not count pool spin-up.
    warm = spark.range(0, partitions * 100, 1, partitions).select(
        F.col("id").cast("string").alias("url")
    )
    build_counting_bloom(warm, "url", 1000, 0.05)

    # Steady-state measurement: first iterations pay JVM JIT + Arrow
    # + Python-pool ramp that a long-running production job amortizes;
    # report the best of N trials (all trials recorded).
    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    jobs = set(
        os.environ.get("SCALING_JOBS", "counting,scaling,sharded,hash").split(",")
    )
    t_counting, t_scaling, t_sharded = [], [], []
    from dablooms_spark.operators.bloom_build import (
        merge_blobs_df,
        restore_scaling_bloom_layers,
        scaling_bloom_fixed_partials,
        scaling_bloom_partials,
        scaling_layers_df,
    )

    ckpt_root = tempfile.mkdtemp()
    for trial in range(trials):
        if "counting" in jobs:
            t0 = time.perf_counter()
            cb = build_counting_bloom(wp, "text", capacity=n_rows, error_rate=0.01)
            t_counting.append(time.perf_counter() - t0)
            assert cb.count == total
        if "sharded" in jobs:
            # the flagship 100 TB topology (key-hash shards x fixed
            # id-boundary layers): same one-map-stage + piece-only
            # exchange shape as the fixed build, plus the shard
            # dimension the cogroup probe needs at
            # bigger-than-broadcast filter sizes
            from dablooms_spark.operators.sharded_scaling import (
                build_sharded_scaling_layers,
            )

            sh_dir = f"{ckpt_root}/sharded-{trial}"
            # dense row ids' layer count is known exactly from the row
            # count -> uniform eps schedule (SCALING_POLY=1 reverts to
            # the open-ended polynomial for A/B)
            sh_layers = (
                None if os.environ.get("SCALING_POLY")
                else (n_rows - 1) // ((200_000 - 1) * 16) + 1
            )
            t0 = time.perf_counter()
            build_sharded_scaling_layers(
                wp, "text", "row_id", capacity=200_000, error_rate=0.01,
                num_shards=16, expected_layers=sh_layers,
            ).write.mode("overwrite").parquet(sh_dir)
            t_sharded.append(time.perf_counter() - t0)
            n_check = spark.read.parquet(sh_dir).agg(F.sum("n")).first()[0]
            assert n_check == total, (n_check, total)
        if "scaling" not in jobs:
            continue

        # scaling filter: build -> merge -> durable checkpoint, all
        # distributed (the filter is the product; at real scale it is
        # GBs and never visits the driver). The artifact is the
        # filter's canonical LAYER-ROW form (scaling_layers_df):
        # id-disjoint shard layers never collide, so the merge is a
        # parallel per-layer groupBy and the write spreads one task
        # per layer — no single task ever funnels the whole filter
        # (set SCALING_ONE_BLOB=1 to bench the old single-row artifact)
        # Default: fixed id-boundary build (row_id is a dense insertion
        # sequence — the reference's id model): hash + route in ONE
        # map stage over the scan, then a blob-only piece shuffle into
        # layer rows — no row shuffle, no sort, no min/max pass.
        # SCALING_RANGE=1 benches the arrival-order state machine
        # (range shuffle + sort); SCALING_ONE_BLOB=1 adds the legacy
        # single-row artifact on top of it.
        out_dir = f"{ckpt_root}/scaling-{trial}"
        t0 = time.perf_counter()
        if os.environ.get("SCALING_RANGE") or os.environ.get("SCALING_ONE_BLOB"):
            partials = scaling_bloom_partials(
                wp, "text", "row_id", capacity=200_000, error_rate=0.01,
                num_shards=partitions,
            )
            if os.environ.get("SCALING_ONE_BLOB"):
                merged = merge_blobs_df(partials, num_blobs=partitions)
            else:
                merged = scaling_layers_df(partials)
        else:
            fx_layers = (
                None if os.environ.get("SCALING_POLY")
                else (n_rows - 1) // (200_000 - 1) + 1
            )
            merged = scaling_bloom_fixed_partials(
                wp, "text", "row_id", capacity=200_000, error_rate=0.01,
                expected_layers=fx_layers,
            )
        merged.write.mode("overwrite").parquet(out_dir)
        t_scaling.append(time.perf_counter() - t0)
        n_check = spark.read.parquet(out_dir).agg(F.sum("n")).first()[0]
        assert n_check == total, (n_check, total)
    # correctness spot-check outside timing: restored filter is whole
    if "scaling" in jobs:
        if os.environ.get("SCALING_ONE_BLOB"):
            from dablooms_spark.core.serde import loads

            sb = loads(bytes(spark.read.parquet(out_dir).first().blob))
        else:
            sb = restore_scaling_bloom_layers(spark, out_dir)
        assert sb.count == total

    # itemized stage costs (diagnostic, not a headline number): where
    # does the scaling build spend time — per-shard partials (kernel +
    # 16B/row shuffle) vs blob merge + artifact write (the serial-ish
    # tail that caps Amdahl scaling)?
    item = {}
    if ("scaling" in jobs and os.environ.get("SCALING_ITEMIZE")
            and not (os.environ.get("SCALING_RANGE")
                     or os.environ.get("SCALING_ONE_BLOB"))):
        # fixed-boundary path: split the DEFAULT scaling job into its
        # two stages — layer-piece build+merge (persist forces the map
        # stage and the blob-only exchange) vs the parquet artifact
        # write (file fan-out + driver-side commit), to locate the
        # 2→8 gap the paired runs show vs the counting build
        item_dir = f"{ckpt_root}/scaling-itemized"
        fx_layers = (
            None if os.environ.get("SCALING_POLY")
            else (n_rows - 1) // (200_000 - 1) + 1
        )
        t0 = time.perf_counter()
        fixed = scaling_bloom_fixed_partials(
            wp, "text", "row_id", capacity=200_000, error_rate=0.01,
            expected_layers=fx_layers,
        ).persist()
        fixed.count()
        item["scaling_fixed_build_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fixed.write.mode("overwrite").parquet(item_dir)
        item["scaling_artifact_write_sec"] = round(
            time.perf_counter() - t0, 3
        )
        fixed.unpersist()
    if ("scaling" in jobs and os.environ.get("SCALING_ITEMIZE")
            and (os.environ.get("SCALING_RANGE") or os.environ.get("SCALING_ONE_BLOB"))):
        item_dir = f"{ckpt_root}/scaling-itemized"
        t0 = time.perf_counter()
        partials = scaling_bloom_partials(
            wp, "text", "row_id", capacity=200_000, error_rate=0.01,
            num_shards=partitions,
        ).persist()
        partials.count()
        item["scaling_partials_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        if os.environ.get("SCALING_ONE_BLOB"):
            merge_blobs_df(partials, num_blobs=partitions).write.mode(
                "overwrite"
            ).parquet(item_dir)
        else:
            scaling_layers_df(partials).write.mode("overwrite").parquet(item_dir)
        item["scaling_merge_write_sec"] = round(time.perf_counter() - t0, 3)
        partials.unpersist()
    shutil.rmtree(ckpt_root, ignore_errors=True)
    if cleanup_data:
        shutil.rmtree(os.path.dirname(data_dir), ignore_errors=True)

    # compute-isolated metric: murmur the text of freshly generated
    # rows (JVM-side codegen datagen, no input scan/cache) — shows the
    # kernel's core-scaling without the shared-memory-bus input path
    from dablooms_spark.functions.arrow_utils import arrow_byte_view
    from dablooms_spark.functions.murmur import dablooms_hash_words_buffer
    import pyarrow as pa

    def hash_only(batches):
        n = 0
        for batch in batches:
            buf, offs, lens = arrow_byte_view(batch.column(0))
            h1, _h2 = dablooms_hash_words_buffer(buf, offs, lens)
            n += len(h1)
        yield pa.RecordBatch.from_pydict({"n": [n]}, schema=pa.schema([("n", pa.int64())]))

    t_hash = []
    gen = synth_webpages(spark, n_rows=n_rows, partitions=partitions).select("text")
    for _ in range(trials if "hash" in jobs else 0):
        t0 = time.perf_counter()
        hashed_n = gen.mapInArrow(hash_only, schema="n long").agg(
            F.sum("n")
        ).first()[0]
        t_hash.append(time.perf_counter() - t0)
        assert hashed_n == total

    out = {"cores": cores, "rows": total}
    out.update(item)
    for name, ts in (("hash_kernel", t_hash), ("counting_build", t_counting),
                     ("scaling_build", t_scaling), ("sharded_build", t_sharded)):
        if ts:
            key = name.replace("_build", "").replace("_kernel", "_kernel")
            out[f"{name}_sec"] = round(min(ts), 3)
            out[f"{key if name=='hash_kernel' else name.split('_')[0]}_docs_per_sec"] = round(total / min(ts), 1)
            out[f"{name.split('_')[0]}_trials_sec"] = [round(t, 3) for t in ts]
    spark.stop()
    print("SCALING_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
