"""Table sources.

Primary input shape is an Iceberg table of Common-Crawl-style web
pages (url, warc_ts, html, text, lang). No Iceberg jars ship in this
sandbox, so reads fall back to plain Parquet over the same layout —
the scan-side behaviors that matter at 100 TB (column pruning so the
wide `html BINARY` column is never read, predicate pushdown on lang /
time) are identical for both formats and asserted in tests via the
physical plan's ReadSchema/PushedFilters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "webpages" and not os.path.exists(path):
        return synth_webpages(spark)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet FOOTER metadata — zero data scan.

    Replaces driver-side `df.count()` actions used only for sizing
    (split points, bloom capacity hints): at 100 TB a count() is a
    full job over the table, while the footer num_rows is a handful of
    metadata reads (what a real catalog/Iceberg snapshot would serve
    for free as table stats). Returns None when the path is not plain
    local parquet (caller falls back to count())."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        return None
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            return total
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def synth_webpages(
    spark: SparkSession,
    n_rows: int = 100_000,
    n_hosts: int = 1_000,
    zipf_s: float = 1.2,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Common-Crawl-style corpus (FIXTURES.md §1).

    Generated JVM-side from `spark.range` — no Python loop, no driver
    materialization — so it scales to bench sizes. Host skew is
    Zipf-ish via an inverse-CDF over xxhash64(row) randomness: the top
    host draws a double-digit percent of rows, exercising the salted
    repartition path. Text is a deterministic token sequence keyed by
    row id; the byte-identical-text invariant holds because `text` is
    produced once and hashed as stored.
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    df = spark.range(0, n_rows, 1, partitions)
    u = (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % 1_000_000) / 1_000_000.0
    # inverse-CDF of a Zipf-like law over host ranks
    host_rank = F.least(
        F.floor(F.pow(F.lit(float(n_hosts)), F.pow(u, F.lit(zipf_s)))) - 1,
        F.lit(n_hosts - 1),
    ).cast("int")
    host_rank = F.greatest(host_rank, F.lit(0))
    # 50-300 pseudo-tokens from a 30k synthetic vocabulary, seeded per row
    n_tok = (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % 251 + 50).cast("int")
    tok_seed = F.xxhash64(F.col("id"), F.lit(seed + 2))
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.concat(
                F.lit("tok"),
                (F.abs(F.xxhash64(tok_seed, i)) % 30_000).cast("string"),
            ),
        ),
    )
    step = (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 3))) % 121).cast("long")
    return df.select(
        F.concat(
            F.lit("https://host-"),
            host_rank.cast("string"),
            F.lit(".example.com/p/"),
            F.md5(F.col("id").cast("string")),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("id") * 0.5 + step)
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8"
        ).alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("en"), F.lit("en"),
                    F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 4))) % 10 + 1).cast("int"),
        ).alias("lang"),
        F.col("id").alias("row_id"),
    )
