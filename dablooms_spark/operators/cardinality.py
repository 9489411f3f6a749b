"""Cardinality recovered from counting-bloom counter state — no rescan.

dablooms answers "how many keys are live?" from a header count that
`counting_bloom_add`/`remove` maintain (src/dablooms.c ≈L202/≈220).
At cluster scale the more useful form reads the number back from the
COUNTER BYTES themselves, because the counter-sum identity

    sum(counters) == nfuncs · (adds − removes)

holds exactly under any counter-sum merge order and any partitioning
(while no counter ever clips — see CountingBloom.added_count), so the
count of a distributed filter needs no bookkeeping channel beside the
blobs that already flow. A second estimator, Swamidass–Baldi
bit-density (J. Chem. Inf. Model. 2007), reads only zero/nonzero and
therefore survives saturation, at estimator precision.

Scale shape: blobs stay on executors — each row decodes once and
reduces to four scalars (mapInPandas), then a scalar agg folds the
rows. Nothing filter-sized ever reaches the driver, so the same
query runs against one blob, 64 shard blobs, or a 10^5-row sharded
scaling-layer artifact unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.functions.murmur import DABLOOMS_SEED

_STATS_SCHEMA = (
    "adds long, exact boolean, counter_sum long, nonzero long, "
    "nfuncs int, density_est double"
)


def blob_counter_stats(
    blobs_df: DataFrame, blob_col: str = "blob", seed: int = DABLOOMS_SEED
) -> DataFrame:
    """Per-blob counter statistics, executor-side.

    One output row per input blob row: (adds, exact, counter_sum,
    nonzero, nfuncs, density_est). Works on any counting-bloom blob
    column — single-filter artifacts, sharded (shard, blob) rows, or
    scaling layer rows (each layer blob is a CountingBloom)."""

    def stats(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {k: [] for k in (
                "adds", "exact", "counter_sum", "nonzero", "nfuncs",
                "density_est",
            )}
            for blob in pdf[blob_col]:
                cb = CountingBloom.from_bytes(bytes(blob), seed=seed)
                n, ok = cb.added_count()
                out["adds"].append(n)
                out["exact"].append(ok)
                out["counter_sum"].append(cb.counter_sum())
                out["nonzero"].append(int((cb.counters != 0).sum()))
                out["nfuncs"].append(cb.geometry.nfuncs)
                out["density_est"].append(cb.density_estimate())
            yield pd.DataFrame(out)

    return blobs_df.select(blob_col).mapInPandas(stats, _STATS_SCHEMA)


def counter_cardinality(
    blobs_df: DataFrame, blob_col: str = "blob", seed: int = DABLOOMS_SEED
) -> DataFrame:
    """One-row DataFrame(n_adds long, exact boolean): live-add count of
    a filter held as blob rows, from the counters alone.

    Valid whenever the blob rows partition the key space (sharded
    filters: keys hash-route to exactly one shard; scaling layer rows:
    ids route to exactly one layer) — per-row counts then simply add.
    Do NOT feed unmerged per-partition PARTIALS of one filter: a key's
    increments would be spread across rows, and although the sum still
    adds up while nothing clips, per-row exactness flags lose their
    meaning; merge partials first (the builders already do)."""
    stats = blob_counter_stats(blobs_df, blob_col, seed)
    # coalesce: zero blob rows = an empty filter = exactly 0 live adds
    return stats.agg(
        F.coalesce(F.sum("adds"), F.lit(0)).cast("long").alias("n_adds"),
        F.coalesce(
            F.min(F.col("exact").cast("int")).cast("boolean"), F.lit(True)
        ).alias("exact"),
    )


def density_cardinality(
    blobs_df: DataFrame, blob_col: str = "blob", seed: int = DABLOOMS_SEED
) -> DataFrame:
    """One-row DataFrame(n_est double): Swamidass–Baldi bit-density
    estimate summed over key-space-partitioning blob rows. Saturation-
    proof (reads only zero/nonzero) but estimator-precision — use
    counter_cardinality when counters are known unclipped."""
    stats = blob_counter_stats(blobs_df, blob_col, seed)
    return stats.agg(
        F.coalesce(F.sum("density_est"), F.lit(0.0)).alias("n_est")
    )
