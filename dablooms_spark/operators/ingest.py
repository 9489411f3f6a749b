"""Incremental batch ingest: the reference library's home workflow.

bitly's production use of dablooms is "have we seen this key before?"
across successive ingests — restore yesterday's filter, split today's
batch into seen/new, add the new keys, persist for tomorrow. This
module packages that loop as one resumable operator over the
checkpoint protocol (sources/checkpoint.py, mirroring
scaling_bloom_flush's write-ahead commit order, src/dablooms.c ≈L552):

    new_rows, seq = incremental_ingest(batch, "url", path, "crawl", ...)

Scale shape per batch (none of these steps collect rows):
  * restore      — read ONE merged blob row from the last commit
                   (the artifact is kept merged, so restore is O(filter
                   size), not O(history))
  * split        — broadcast-blob probe; bloom misses are DEFINITE
                   new keys (no false negatives); with exact_seen_df
                   the ε-sized hit set is verified by a real anti join,
                   making the split exact
  * add + commit — per-partition partial blobs over the batch, unioned
                   with the prior blob, counter-sum merged cluster-side
                   to one row, committed under the next seqnum with
                   parent lineage

Counter-sum merge associativity makes the committed filter
bit-identical to a single build over the concatenation of every batch
ingested so far (property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.serde import loads
from dablooms_spark.functions.murmur import DABLOOMS_SEED
from dablooms_spark.operators.bloom_build import counting_bloom_partials, merge_blobs_df
from dablooms_spark.operators.bloom_probe import bloom_anti_join
from dablooms_spark.sources.checkpoint import CheckpointManager


def restore_filter(
    spark: SparkSession,
    checkpoint_path: str,
    run_id: str | None = None,
    seed: int = DABLOOMS_SEED,
):
    """(filter, manifest) from the latest commit, or (None, None) on a
    fresh path. The ingest artifact is always one merged blob row, so
    this reads O(filter size) bytes regardless of ingest history."""
    mgr = CheckpointManager(checkpoint_path)
    manifest = mgr.latest(run_id)
    if manifest is None:
        return None, None
    df = mgr.load_blobs(spark, manifest)
    if "shard" in df.columns and "first_id" in df.columns:
        # sharded scaling layers are per-shard filters meant to stay a
        # DataFrame — assembling them into one filter would interleave
        # unrelated shards' layers and compound FP across shards
        raise ValueError(
            "checkpoint holds SHARDED scaling layers; load them with "
            "CheckpointManager.load_blobs and probe with "
            "sharded_scaling_probe"
        )
    if "first_id" in df.columns:
        # scaling ingest artifact: layer rows reassemble positionally
        from dablooms_spark.operators.bloom_build import assemble_scaling_bloom

        rows = df.collect()
        return (assemble_scaling_bloom(rows, seed) if rows else None), manifest
    rows = df.select("blob").collect()
    if not rows:
        return None, manifest
    filt = loads(bytes(rows[0].blob), seed=seed)
    for r in rows[1:]:
        filt = filt.merge(loads(bytes(r.blob), seed=seed))
    return filt, manifest


def incremental_ingest(
    batch_df: DataFrame,
    key_col: str,
    checkpoint_path: str,
    run_id: str,
    capacity: int,
    error_rate: float,
    seed: int = DABLOOMS_SEED,
    exact_seen_df: DataFrame | None = None,
    exact_key: str | None = None,
    batch_tag: str | None = None,
) -> tuple[DataFrame, int]:
    """One ingest round. Returns (new_rows, committed_seqnum).

    new_rows are the batch rows whose key was NOT present in any
    previously ingested batch: exact when exact_seen_df (the prior
    keys, e.g. the upstream table filtered to earlier partitions) is
    given; otherwise within the filter's false-positive bound (a few
    genuinely-new rows may be misclassified seen — never the reverse).

    The returned DataFrame is lazy; the filter update is committed
    eagerly (blob algebra only — the batch is scanned once for
    partials, new_rows evaluate on the caller's schedule).
    """
    spark = batch_df.sparkSession
    prior, manifest = restore_filter(spark, checkpoint_path, run_id, seed)

    if prior is None:
        new_rows = batch_df
    else:
        if not isinstance(prior, CountingBloom):
            raise TypeError(
                "incremental_ingest checkpoints counting blooms; found "
                f"{type(prior).__name__} at {checkpoint_path}"
            )
        new_rows = bloom_anti_join(
            batch_df, key_col, prior,
            exact_df=exact_seen_df, exact_key=exact_key, seed=seed,
        )

    # update side: batch partials ∪ prior blob → one merged row
    partials = counting_bloom_partials(batch_df, key_col, capacity, error_rate, seed)
    # size the merge tree without a count() action (merge_blobs_df
    # would otherwise materialize the partials stage twice): partials
    # emit at most one blob per input partition, plus the prior row
    n_blobs = batch_df.rdd.getNumPartitions() + 1
    if prior is not None:
        g = prior.geometry
        if (g.capacity, g.error_rate) != (capacity, error_rate):
            raise ValueError(
                "geometry drift: checkpoint was built with "
                f"capacity={g.capacity}, error_rate={g.error_rate}"
            )
        prior_row = spark.createDataFrame(
            [(int(-1), bytearray(prior.to_bytes()), int(prior.count))],
            "shard long, blob binary, n long",
        )
        partials = partials.unionByName(prior_row)
    merged = merge_blobs_df(partials, seed=seed, num_blobs=n_blobs)

    mgr = CheckpointManager(checkpoint_path)
    seq = mgr.commit(
        merged,
        run_id,
        stage="ingest",
        lineage={
            "parent_seqnum": manifest["seqnum"] if manifest else None,
            "batch_tag": batch_tag,
            "key_col": key_col,
            "capacity": capacity,
            "error_rate": error_rate,
        },
    )
    return new_rows, seq


def incremental_ingest_scaling(
    batch_df: DataFrame,
    key_col: str,
    id_col: str,
    checkpoint_path: str,
    run_id: str,
    capacity: int,
    error_rate: float,
    seed: int = DABLOOMS_SEED,
    exact_seen_df: DataFrame | None = None,
    exact_key: str | None = None,
    batch_tag: str | None = None,
) -> tuple[DataFrame, int]:
    """The scaling-filter ingest loop: dablooms' unbounded-stream
    model across successive batches. Each batch carries fresh unique
    ids (the reference's monotone insertion sequence continuing across
    days); fixed id-value boundaries mean a new batch's layers are
    id-disjoint from the checkpoint's, so the filter update is a
    UNION of layer rows plus one parallel collide-merge
    (merge_layer_rows) — the artifact grows by appending layers
    exactly like scaling_bloom_add growing at capacity, and the commit
    stays one task per layer at any history length.

    Returns (new_rows, committed_seqnum) with the same split
    semantics/guarantees as incremental_ingest. The split probes a
    driver-assembled copy of the prior filter (broadcast probe); for
    filters beyond broadcast size, build with
    build_sharded_scaling_layers and split with sharded_scaling_probe
    instead."""
    from dablooms_spark.operators.bloom_build import (
        assemble_scaling_bloom,
        merge_layer_rows,
        scaling_bloom_fixed_partials,
    )

    spark = batch_df.sparkSession
    mgr = CheckpointManager(checkpoint_path)
    manifest = mgr.latest(run_id)

    prior_layers = None
    if manifest is not None:
        lin = manifest.get("lineage", {})
        if lin and (lin.get("capacity"), lin.get("error_rate")) != (
            capacity, error_rate,
        ):
            raise ValueError(
                "geometry drift: checkpoint was built with "
                f"capacity={lin.get('capacity')}, "
                f"error_rate={lin.get('error_rate')}"
            )
        prior_layers = mgr.load_blobs(spark, manifest)
        if "first_id" not in prior_layers.columns:
            raise TypeError(
                "incremental_ingest_scaling checkpoints layer rows; "
                f"found a counting-bloom artifact at {checkpoint_path} "
                "(use incremental_ingest for that run)"
            )
        prior = assemble_scaling_bloom(prior_layers.collect(), seed)
        new_rows = bloom_anti_join(
            batch_df, key_col, prior,
            exact_df=exact_seen_df, exact_key=exact_key, seed=seed,
        )
    else:
        new_rows = batch_df

    batch_layers = scaling_bloom_fixed_partials(
        batch_df, key_col, id_col, capacity, error_rate, seed
    )
    all_layers = (
        batch_layers
        if prior_layers is None
        else batch_layers.unionByName(prior_layers)
    )
    merged = merge_layer_rows(all_layers, seed)
    seq = mgr.commit(
        merged,
        run_id,
        stage="ingest-scaling",
        lineage={
            "parent_seqnum": manifest["seqnum"] if manifest else None,
            "batch_tag": batch_tag,
            "key_col": key_col,
            "id_col": id_col,
            "capacity": capacity,
            "error_rate": error_rate,
        },
    )
    return new_rows, seq
