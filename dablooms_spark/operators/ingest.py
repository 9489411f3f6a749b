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
    if len(rows) > 1 and "shard" in df.columns:
        # The ingest artifact is by contract ONE merged blob row. A
        # multi-row (shard, blob, n) artifact here is either a sharded
        # COUNTING filter (operators/sharded.py — per-shard blobs each
        # sized capacity/num_shards that together hold every key;
        # merging them into one small filter saturates it, observed FP
        # → 1, with no error raised because all shards share a
        # geometry) or uncommitted partials. Refuse both, mirroring
        # the sharded-scaling branch above.
        raise ValueError(
            "checkpoint holds multiple (shard, blob) rows — a sharded "
            "counting filter or un-merged partials, not an ingest "
            "artifact; for sharded filters load with "
            "CheckpointManager.load_blobs and probe with "
            "sharded_bloom_probe (merging per-shard blobs into one "
            "filter would saturate it); for partials run merge_blobs_df "
            "first"
        )
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


def _artifact_bytes(blob_dir: str, layers_df: DataFrame) -> int:
    """Size of a committed artifact. The checkpoint protocol is
    local-FS based (CheckpointManager uses os.* throughout), so file
    sizes are O(1) metadata; a non-local path falls back to one
    octet_length scan of the blob column — O(filter size) read, the
    same order as the restore it sizes."""
    import os

    if os.path.isdir(blob_dir):
        total = 0
        for root, _dirs, files in os.walk(blob_dir):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
        return total
    row = layers_df.agg(F.sum(F.octet_length("blob")).alias("b")).first()
    return int(row["b"] or 0)


def _anti_from_flag(
    probed: DataFrame,
    key_col: str,
    flag_col: str,
    exact_seen_df: DataFrame | None,
    exact_key: str | None,
) -> DataFrame:
    """bloom_anti_join's split semantics from a probed flag column:
    misses are definite new keys (no false negatives); with an exact
    seen-set the ε-sized hit set is verified by a real anti join."""
    misses = probed.filter(~F.col(flag_col)).drop(flag_col)
    if exact_seen_df is None:
        return misses
    ek = exact_key or key_col
    dim = exact_seen_df.select(F.col(ek).alias("__ek")).distinct()
    candidates = probed.filter(F.col(flag_col)).drop(flag_col)
    return misses.unionByName(
        candidates.join(dim, on=F.col(key_col) == F.col("__ek"), how="left_anti")
    )


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
    broadcast_blob_budget: int = 64 << 20,
    split_salt: int | None = None,
    expected_layers: int | None = None,
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
    semantics/guarantees as incremental_ingest. The split
    auto-routes on artifact size: up to broadcast_blob_budget the
    prior filter is assembled once on the driver and broadcast-probed
    (cheapest — one blob ships to every executor); beyond the budget
    NO driver assembly happens — the layer rows stay a DataFrame and
    the batch splits through the salt-replicated cogroup probe
    (sharded_scaling_probe with the layer rows as one logical shard),
    so driver memory never bounds ingest. split_salt controls the
    cogroup fan-out (default max(8, defaultParallelism)); each probe
    task holds the full layer set, so for filters beyond EXECUTOR
    memory build sharded from the start with
    build_sharded_scaling_layers."""
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
        if _artifact_bytes(manifest["blob_dir"], prior_layers) <= broadcast_blob_budget:
            prior = assemble_scaling_bloom(prior_layers.collect(), seed)
            new_rows = bloom_anti_join(
                batch_df, key_col, prior,
                exact_df=exact_seen_df, exact_key=exact_key, seed=seed,
            )
        else:
            # beyond broadcast size: the prior filter never visits the
            # driver — probe the layer rows as ONE logical shard
            # through the salt-replicated cogroup (probe rows fan out
            # across `salt` tasks; the layer side replicates to each).
            # Identical split semantics: bloom misses are definite new
            # keys; with exact_seen_df the ε-sized hit set is verified
            # by a real anti join (mirrors bloom_anti_join).
            from dablooms_spark.operators.sharded_scaling import (
                sharded_scaling_probe,
            )

            salt = split_salt or max(8, spark.sparkContext.defaultParallelism)
            one_shard = prior_layers.withColumn("shard", F.lit(0).cast("long"))
            probed = sharded_scaling_probe(
                batch_df, key_col, one_shard, num_shards=1, salt=salt,
                seed=seed, out_col="__seen",
            )
            new_rows = _anti_from_flag(
                probed, key_col, "__seen", exact_seen_df, exact_key
            )
    else:
        new_rows = batch_df

    # expected_layers: the TOTAL layer count of the whole id stream
    # (ids route to global windows id//(capacity-1), so the hint spans
    # the stream, not the batch). Pass the SAME value on every batch:
    # a changed hint gives colliding id windows two (first_id, eps)
    # rows — probes stay correct (every blob is consulted) but the
    # compound FP budget splits across both rows.
    batch_layers = scaling_bloom_fixed_partials(
        batch_df, key_col, id_col, capacity, error_rate, seed,
        expected_layers=expected_layers,
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


def incremental_ingest_sharded_scaling(
    batch_df: DataFrame,
    key_col: str,
    id_col: str,
    checkpoint_path: str,
    run_id: str,
    capacity: int,
    error_rate: float,
    num_shards: int = 16,
    seed: int = DABLOOMS_SEED,
    exact_seen_df: DataFrame | None = None,
    exact_key: str | None = None,
    batch_tag: str | None = None,
    salt: int = 8,
    expected_layers: int | None = None,
) -> tuple[DataFrame, int]:
    """The ingest loop at the fully SHARDED topology — the
    beyond-EXECUTOR-memory end state. incremental_ingest_scaling's
    distributed split still replicates the whole layer set to every
    probe task; here the filter stays sharded end to end:

      * restore  — the checkpoint artifact IS the sharded layer-row
                   DataFrame (never assembled anywhere);
      * split    — sharded_scaling_probe: each cogroup task holds ONE
                   shard's layers (≈ filter_size / num_shards), so
                   task memory is bounded by shard sizing, not filter
                   size; same split guarantees as incremental_ingest;
      * add      — the batch builds its own sharded layer rows (one
                   map stage + piece-only exchange), unioned with the
                   prior rows and collide-merged per (shard, first_id)
                   (merge_sharded_layer_rows — counter-sum, so the
                   committed artifact is bit-identical to a one-shot
                   sharded build over all batches so far);
      * commit   — atomic manifest under the next seqnum with parent
                   lineage; one write task per (shard, layer) row.

    num_shards must match the prior artifact's (validated via the
    stamped num_shards column; drift raises rather than mis-routing).
    """
    from dablooms_spark.operators.sharded_scaling import (
        _ensure_num_shards,
        build_sharded_scaling_layers,
        merge_sharded_layer_rows,
        sharded_scaling_probe,
    )

    spark = batch_df.sparkSession
    mgr = CheckpointManager(checkpoint_path)
    manifest = mgr.latest(run_id)

    prior_layers = None
    if manifest is not None:
        lin = manifest.get("lineage", {})
        drift = [
            (k, lin.get(k), v)
            for k, v in (
                ("capacity", capacity),
                ("error_rate", error_rate),
                ("num_shards", num_shards),
            )
            if lin and lin.get(k) != v
        ]
        if drift:
            raise ValueError(
                "geometry drift vs checkpoint lineage: "
                + ", ".join(f"{k}={was} (called with {now})" for k, was, now in drift)
            )
        prior_layers = mgr.load_blobs(spark, manifest)
        if "shard" not in prior_layers.columns or "first_id" not in prior_layers.columns:
            raise TypeError(
                "incremental_ingest_sharded_scaling checkpoints SHARDED "
                f"layer rows; found a different artifact at {checkpoint_path}"
            )
        # pre-r4 sharded artifacts lack the stamped num_shards column;
        # stamp the caller's value in (the probe path already tolerates
        # such artifacts the same way) so the union and merge below —
        # whose schemas require the column — accept them too
        prior_layers = _ensure_num_shards(prior_layers, num_shards)
        probed = sharded_scaling_probe(
            batch_df, key_col, prior_layers, num_shards=num_shards,
            salt=salt, seed=seed, out_col="__seen",
        )
        new_rows = _anti_from_flag(
            probed, key_col, "__seen", exact_seen_df, exact_key
        )
    else:
        new_rows = batch_df

    # expected_layers must be the SAME on every batch, but the failure
    # mode here is STRICTER than incremental_ingest_scaling's: sharded
    # rows colliding on (shard, first_id) are counter-SUMMED by
    # merge_sharded_layer_rows, which requires identical layer_eps —
    # a changed hint fails loudly at the merge (eps-schedule drift)
    # rather than splitting the FP budget across duplicate rows
    batch_layers = build_sharded_scaling_layers(
        batch_df, key_col, id_col, capacity, error_rate,
        num_shards=num_shards, seed=seed, expected_layers=expected_layers,
    )
    all_layers = (
        batch_layers
        if prior_layers is None
        else batch_layers.unionByName(prior_layers)
    )
    merged = merge_sharded_layer_rows(all_layers, seed)
    seq = mgr.commit(
        merged,
        run_id,
        stage="ingest-sharded-scaling",
        lineage={
            "parent_seqnum": manifest["seqnum"] if manifest else None,
            "batch_tag": batch_tag,
            "key_col": key_col,
            "id_col": id_col,
            "capacity": capacity,
            "error_rate": error_rate,
            "num_shards": num_shards,
        },
    )
    return new_rows, seq
