"""Iceberg-layout web-page table: write/read + partition pruning.

The target input (BASELINE.json#input_hint) is an Iceberg table
webpages(url, warc_ts, html, text, lang). No Iceberg runtime jars
ship in this sandbox, so the default is an Iceberg-STYLE layout —
hive-partitioned parquet on (lang, day(warc_ts)) — which exercises
the same scan-side behaviors Catalyst gives Iceberg tables: partition
pruning on lang/time, column pruning past the wide html BINARY, and
pushdown. Set use_iceberg=True on a cluster with the Iceberg catalog
configured and the same API targets `writeTo(table)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ("lang", "day")


def write_webpages(
    df: DataFrame,
    path_or_table: str,
    mode: str = "overwrite",
    use_iceberg: bool = False,
) -> None:
    """Persist a webpages DataFrame in the engine's canonical layout:
    partitioned by (lang, day(warc_ts)) — the partition spec an
    Iceberg DDL would declare as PARTITIONED BY (lang, days(warc_ts)).
    """
    out = df.withColumn("day", F.date_trunc("day", "warc_ts").cast("date"))
    if use_iceberg:
        writer = out.writeTo(path_or_table).partitionedBy("lang", "day")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    out.write.mode(mode).partitionBy(*PARTITION_COLS).parquet(path_or_table)


def read_webpages(
    spark: SparkSession,
    path_or_table: str,
    langs: list[str] | None = None,
    use_iceberg: bool = False,
) -> DataFrame:
    """Scan the webpages table; a lang filter applied here prunes whole
    partitions (asserted in tests via the physical plan)."""
    df = (
        spark.read.table(path_or_table)
        if use_iceberg
        else spark.read.parquet(path_or_table)
    )
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist hash-bucketed (and bucket-sorted) by `key` — the
    co-located-join layout: two tables bucketed the same way join with
    NO Exchange on either side (asserted in tests), which at 100 TB is
    the difference between a metadata-aligned merge join and shuffling
    both tables. The Iceberg equivalent is a `bucket(N, key)`
    partition transform; Spark's session catalog records the same
    bucket spec for its own scans.

    The pre-write repartition on the bucket hash gives ONE file per
    bucket: with multiple files per bucket Spark drops the sort
    metadata at read time (outputOrdering only survives single-file
    buckets), silently re-sorting every merge join — and a T-task
    write would mint up to T·buckets small files."""
    w = (
        df.repartition(buckets, F.col(key))
        .write.mode(mode)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
