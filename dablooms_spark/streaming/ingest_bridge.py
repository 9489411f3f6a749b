"""foreachBatch bridge: a stream feeds the BATCH sharded-scaling
checkpoint artifact.

streaming/incremental.py keeps the filter in Structured Streaming
GROUP STATE — right for filters that fit the state-store budget.
This bridge targets the other regime: the filter lives in the
parquet checkpoint artifact (sharded layer rows, never assembled on
one node), exactly the format every batch operator probes, removes
from, and resumes — so a stream-fed filter is interchangeable with a
batch-built one, and its size is bounded by the artifact layout, not
by the state store. Each micro-batch runs
incremental_ingest_sharded_scaling: restore ← prior manifest,
bloom-split via the per-shard cogroup probe, counter-sum
collide-merge, atomic manifest commit (dablooms scaling_bloom_add +
_flush semantics, src/dablooms.c:≈487,≈552, at the sharded layout).

Exactly-once artifact across restarts: Spark replays an incompletely
processed micro-batch with the SAME batch_id after a failure; each
commit stamps `batch_tag="stream-<batch_id>"` into its manifest
lineage, and the bridge skips any batch whose tag already appears in
the run's manifest chain — the artifact commit is the transaction
marker, so a replayed batch cannot counter-sum its keys twice.

new_rows delivery on a crash-replayed batch is AT-MOST-ONCE: the
artifact commit happens inside the ingest call, before the caller's
sink consumes new_rows; a crash in between loses that batch's
first-seen output while the artifact (and therefore every LATER
batch's dedup verdicts) stays correct. Sinks needing stronger output
guarantees should write idempotently keyed by batch_id (standard
foreachBatch practice).

Without exact_seen_df the split is bloom-only: new_rows may lose an
ε-bounded fraction of genuinely-new keys to false positives (never
the reverse); the artifact itself is unaffected (the batch's keys are
all added regardless).
"""

from __future__ import annotations

from typing import Callable

from dablooms_spark.functions.murmur import DABLOOMS_SEED
from dablooms_spark.sources.checkpoint import CheckpointManager


def committed_batch_tags(mgr: CheckpointManager, run_id: str) -> set:
    """Every lineage.batch_tag already committed for run_id — the
    replay guard's read side (one small JSON per manifest; the chain
    is as long as the number of micro-batches ingested)."""
    tags = set()
    for s in mgr.seqnums():
        m = mgr.manifest(s)
        if m.get("run_id") == run_id:
            t = (m.get("lineage") or {}).get("batch_tag")
            if t is not None:
                tags.add(t)
    return tags


def streaming_sharded_ingest(
    stream_df,
    key_col: str,
    id_col: str,
    checkpoint_path: str,
    run_id: str,
    capacity: int,
    error_rate: float,
    num_shards: int = 16,
    seed: int = DABLOOMS_SEED,
    salt: int = 8,
    expected_layers: int | None = None,
    on_new_rows: Callable | None = None,
    exact_seen_provider: Callable | None = None,
):
    """Returns a DataStreamWriter (attach .trigger/.option and
    .start() with a STREAMING checkpointLocation — that one tracks
    source offsets; `checkpoint_path` here is the FILTER artifact's
    home, a separate concern).

    on_new_rows(batch_new_rows_df, batch_id) receives each
    micro-batch's first-seen rows (see module docstring for the
    replay caveat); default materializes them to drive the split.

    exact_seen_provider(batch_id) -> (exact_seen_df, exact_key) |
    None supplies the exact confirm set for the bloom-split (same
    contract as incremental_ingest's exact_seen_df): with it the
    split is deterministic (bloom prunes, exact verifies); without
    it, bloom-only (ε-bounded new-row loss, module docstring)."""
    from dablooms_spark.operators.ingest import (
        incremental_ingest_sharded_scaling,
    )

    def process(batch_df, batch_id: int) -> None:
        tag = f"stream-{batch_id}"
        mgr = CheckpointManager(checkpoint_path)
        if tag in committed_batch_tags(mgr, run_id):
            return  # replayed batch: the artifact already holds it
        exact_df, exact_key = None, None
        if exact_seen_provider is not None:
            es = exact_seen_provider(batch_id)
            if es is not None:
                exact_df, exact_key = es
        new_rows, _seq = incremental_ingest_sharded_scaling(
            batch_df, key_col, id_col, checkpoint_path, run_id,
            capacity, error_rate, num_shards=num_shards, seed=seed,
            batch_tag=tag, salt=salt, expected_layers=expected_layers,
            exact_seen_df=exact_df, exact_key=exact_key,
        )
        if on_new_rows is not None:
            on_new_rows(new_rows, batch_id)
        else:
            new_rows.count()

    return stream_df.writeStream.foreachBatch(process)
