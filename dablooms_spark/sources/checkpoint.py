"""Sketch checkpoint / restore with manifests, lineage and metrics.

Spark equivalent of the reference's persistence + crash-consistency
protocol (scaling_bloom_flush src/dablooms.c:≈552: msync the counters,
THEN advance disk_seqnum; mem_seqnum==0 marks a torn write;
new_*_from_file reopens ≈L322/≈437):

- blobs are written first, to an immutable per-seqnum parquet
  directory (one row per shard: shard, blob, n);
- the manifest JSON is written last, via temp-file + atomic rename —
  the manifest IS the commit marker (write-ahead order preserved: a
  crash in between leaves orphan blobs that restore ignores, exactly
  like a dirty mem_seqnum).
- each manifest carries run lineage (what was built, from which
  input, by what config) and per-partition metrics (rows per shard),
  the north_rule's "resumable from checkpoint with per-partition
  lineage + metrics".

Resume: sketch merges are associative, so `restore_sketch(...).merge(
build(new_rows))` equals a fresh build over the union — tested.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from dablooms_spark.core.serde import loads
from dablooms_spark.functions.murmur import DABLOOMS_SEED


class CheckpointManager:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(path, "blobs"), exist_ok=True)

    # ---- write side ------------------------------------------------------

    def _next_seqnum(self) -> int:
        return max(self.seqnums(), default=0) + 1

    def seqnums(self) -> list[int]:
        mdir = os.path.join(self.path, "manifest")
        out = []
        for f in os.listdir(mdir):
            if f.endswith(".json"):
                try:
                    out.append(int(f[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def commit(
        self,
        blob_df: DataFrame,
        run_id: str,
        stage: str,
        lineage: dict | None = None,
        metrics: dict | None = None,
    ) -> int:
        """Write blobs, then atomically publish the manifest.

        Accepts both the (shard, blob, n) partial/merged form and the
        scaling filter's LAYER-ROW form from scaling_layers_df /
        scaling_bloom_fixed_partials (keyed by first_id) — the
        at-scale artifact whose write parallelizes per layer."""
        seqnum = self._next_seqnum()
        blob_dir = os.path.join(self.path, "blobs", f"seq={seqnum}")
        blob_df.write.mode("errorifexists").parquet(blob_dir)

        spark = blob_df.sparkSession
        key_col = "shard" if "shard" in blob_df.columns else "first_id"
        per_part = [
            {"shard": r[key_col], "rows": r["n"]}
            for r in spark.read.parquet(blob_dir).select(key_col, "n").collect()
        ]
        manifest = {
            "seqnum": seqnum,
            "run_id": run_id,
            "stage": stage,
            "created_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "blob_dir": blob_dir,
            "num_partitions": len(per_part),
            "total_rows": int(sum(p["rows"] for p in per_part)),
            "partitions": per_part,
            "lineage": lineage or {},
            "metrics": metrics or {},
        }
        final = os.path.join(self.path, "manifest", f"{seqnum:012d}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, final)  # atomic commit marker
        return seqnum

    # ---- read side -------------------------------------------------------

    def manifest(self, seqnum: int) -> dict:
        with open(os.path.join(self.path, "manifest", f"{seqnum:012d}.json")) as fh:
            return json.load(fh)

    def latest(self, run_id: str | None = None) -> dict | None:
        for s in reversed(self.seqnums()):
            m = self.manifest(s)
            if run_id is None or m["run_id"] == run_id:
                return m
        return None

    def load_blobs(self, spark: SparkSession, manifest: dict) -> DataFrame:
        return spark.read.parquet(manifest["blob_dir"])

    def restore_sketch(
        self, spark: SparkSession, manifest: dict | None = None, seed: int = DABLOOMS_SEED
    ):
        """Merged driver-side sketch from the latest (or given) commit."""
        if manifest is None:
            manifest = self.latest()
        if manifest is None:
            return None
        df = self.load_blobs(spark, manifest)
        if "shard" in df.columns and "first_id" in df.columns:
            # sharded scaling layers: per-shard filters that are MEANT
            # to stay a DataFrame (probe via sharded_scaling_probe) —
            # assembling them into one ScalingBloom would interleave
            # unrelated shards' layers
            raise ValueError(
                "checkpoint holds SHARDED scaling layers; use "
                "load_blobs() and probe with sharded_scaling_probe "
                "instead of materializing one driver-side filter"
            )
        if "first_id" in df.columns:
            # layer-row artifact: per-layer geometries differ by design,
            # so reassembly is positional, not a blob merge
            from dablooms_spark.operators.bloom_build import assemble_scaling_bloom

            rows = df.collect()
            return assemble_scaling_bloom(rows, seed) if rows else None
        rows = df.select("blob").collect()
        if not rows:
            return None
        sk = loads(rows[0].blob, seed=seed)
        for r in rows[1:]:
            sk = sk.merge(loads(r.blob, seed=seed))
        return sk


def checkpoint_sketch(
    sketch,
    spark: SparkSession,
    path: str,
    run_id: str,
    stage: str = "final",
    lineage: dict | None = None,
    metrics: dict | None = None,
) -> int:
    """Convenience: persist a single driver-side sketch object."""
    mgr = CheckpointManager(path)
    df = spark.createDataFrame(
        [(0, bytearray(sketch.to_bytes()), getattr(sketch, "count", 0))],
        "shard long, blob binary, n long",
    )
    return mgr.commit(df, run_id, stage, lineage=lineage, metrics=metrics)
