"""spark-submit entry point: the filter lifecycle as CLI subcommands.

The north rule's deployment model is `spark-submit --py-files` on a
multi-executor cluster; this module is the production driver script
for it — every subcommand operates on the fully SHARDED artifact
(layer rows, never assembled on the driver), so the same commands run
unchanged from local[2] smoke tests to a 1000-executor cluster:

    zip -r dablooms.zip dablooms_spark
    spark-submit --py-files dablooms.zip dablooms_spark/jobs.py \
        build --input s3://corpus/pages --key-col url --id-col row_id \
        --capacity 100000000 --error-rate 0.001 --num-shards 1024 \
        --checkpoint s3://state/urls --run-id prod

Subcommands (each prints ONE JSON result line on stdout):

  build      one-shot sharded scaling build -> checkpoint seqnum 1
  ingest     incremental batch into an existing checkpoint (resume;
             crash-replayed batch tags are skipped, not double-added)
  probe      membership verdicts for an input's keys against the
             latest artifact (full report or --semi / --anti join)
  remove     counter-decrement an input's keys (reference
             counting_bloom_remove semantics), commit a new seqnum
  fp-report  observed false-positive rate vs the configured bound
             over a caller-supplied disjoint key set (chk_results,
             test_dablooms.c:≈255, as an operations command)

Also runnable without spark-submit as
`python -m dablooms_spark <subcommand> ...` (getOrCreate picks up
whatever master the environment provides; defaults to local[*]).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spark(app: str) -> SparkSession:
    return SparkSession.builder.appName(f"dablooms-{app}").getOrCreate()


def _read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _keys(df: DataFrame, key_col: str) -> DataFrame:
    return df.withColumn(key_col, F.col(key_col).cast("string"))


def _artifact(spark: SparkSession, checkpoint: str, run_id: str | None):
    from dablooms_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(checkpoint)
    manifest = mgr.latest(run_id)
    if manifest is None:
        raise SystemExit(f"no committed manifest under {checkpoint}")
    layers = mgr.load_blobs(spark, manifest)
    if "shard" not in layers.columns or "first_id" not in layers.columns:
        raise SystemExit(
            "checkpoint does not hold a sharded scaling artifact; "
            "the jobs CLI operates on the sharded topology only"
        )
    return mgr, manifest, layers


def _stamped(layers: DataFrame) -> dict:
    head = layers.select("capacity", "sb_eps", "num_shards").first()
    return {
        "capacity": int(head["capacity"]),
        "error_rate": float(head["sb_eps"]),
        "num_shards": int(head["num_shards"]),
    }


def _infer_expected_layers(layers: DataFrame, error_rate: float) -> int | None:
    """Recover the build's ε schedule from the stamped layer_eps rows:
    one shared value e ⇒ uniform schedule with L = ε·0.5/e (validated
    against fixed_layer_eps before use); several values ⇒ polynomial
    (or a uniform build that overflowed its hint — pass
    --expected-layers explicitly in that case)."""
    from dablooms_spark.operators.bloom_build import fixed_layer_eps

    eps = [r["layer_eps"] for r in layers.select("layer_eps").distinct().collect()]
    if len(eps) != 1:
        return None
    L = round(error_rate * 0.5 / eps[0])
    if L >= 1 and abs(fixed_layer_eps(0, error_rate, L) - eps[0]) < 1e-15:
        return L
    return None


def cmd_build(args: argparse.Namespace) -> dict:
    from dablooms_spark.operators.sharded_scaling import (
        build_sharded_scaling_layers,
    )
    from dablooms_spark.sources.checkpoint import CheckpointManager

    spark = _spark("build")
    if CheckpointManager(args.checkpoint).latest() is not None:
        raise SystemExit(
            f"{args.checkpoint} already holds committed seqnums — "
            "one-shot `build` would shadow them; use `ingest` to "
            "continue that artifact, or point at a fresh path"
        )
    df = _keys(_read(spark, args.input), args.key_col)
    expected = args.expected_layers
    if expected == "auto":
        max_id = df.agg(F.max(args.id_col)).collect()[0][0]
        expected = (
            int(max_id) // ((args.capacity - 1) * args.num_shards) + 1
        )
    elif expected == "none":
        expected = None
    else:
        expected = int(expected)
    layers = build_sharded_scaling_layers(
        df, args.key_col, args.id_col, args.capacity, args.error_rate,
        num_shards=args.num_shards, expected_layers=expected,
    )
    mgr = CheckpointManager(args.checkpoint)
    seqnum = mgr.commit(
        layers,
        run_id=args.run_id,
        stage="build",
        lineage={
            "input": args.input,
            "key_col": args.key_col,
            "id_col": args.id_col,
            "capacity": args.capacity,
            "error_rate": args.error_rate,
            "num_shards": args.num_shards,
            "expected_layers": expected,
        },
    )
    n_layers = mgr.load_blobs(spark, mgr.latest(args.run_id)).count()
    return {
        "cmd": "build",
        "seqnum": seqnum,
        "layer_rows": n_layers,
        "expected_layers": expected,
    }


def cmd_ingest(args: argparse.Namespace) -> dict:
    from dablooms_spark.operators.ingest import (
        incremental_ingest_sharded_scaling,
    )

    spark = _spark("ingest")
    if args.batch_tag is not None:
        # crash-replay guard (same protocol as the streaming bridge):
        # re-running the last committed batch tag is a no-op, not a
        # second counter-sum of its keys
        from dablooms_spark.sources.checkpoint import CheckpointManager

        latest = CheckpointManager(args.checkpoint).latest(args.run_id)
        if latest and latest.get("lineage", {}).get("batch_tag") == args.batch_tag:
            return {
                "cmd": "ingest",
                "seqnum": latest["seqnum"],
                "replayed": True,
            }
    df = _keys(_read(spark, args.input), args.key_col)
    expected = (
        None if args.expected_layers in ("none", "auto")
        else int(args.expected_layers)
    )
    new_rows, seqnum = incremental_ingest_sharded_scaling(
        df, args.key_col, args.id_col, args.checkpoint, args.run_id,
        args.capacity, args.error_rate, num_shards=args.num_shards,
        batch_tag=args.batch_tag, expected_layers=expected,
    )
    out = {"cmd": "ingest", "seqnum": seqnum}
    if args.new_rows_out:
        new_rows.write.mode("errorifexists").parquet(args.new_rows_out)
        out["new_rows_out"] = args.new_rows_out
        out["new_rows"] = spark.read.parquet(args.new_rows_out).count()
    return out


def cmd_probe(args: argparse.Namespace) -> dict:
    from dablooms_spark.operators.sharded_scaling import (
        sharded_scaling_probe,
        sharded_scaling_semi_join,
    )

    spark = _spark("probe")
    _, manifest, layers = _artifact(spark, args.checkpoint, args.run_id)
    stamped = _stamped(layers)
    df = _keys(_read(spark, args.input), args.key_col)
    if args.mode == "report":
        result = sharded_scaling_probe(
            df, args.key_col, layers, num_shards=stamped["num_shards"]
        )
    else:
        hits = sharded_scaling_semi_join(
            df, args.key_col, layers, num_shards=stamped["num_shards"]
        )
        if args.mode == "semi":
            result = hits
        else:  # anti: bloom-misses are DEFINITE negatives
            result = df.join(hits.select(args.key_col), args.key_col, "left_anti")
    result.write.mode("errorifexists").parquet(args.output)
    return {
        "cmd": "probe",
        "mode": args.mode,
        "seqnum": manifest["seqnum"],
        "rows": spark.read.parquet(args.output).count(),
        "output": args.output,
    }


def cmd_remove(args: argparse.Namespace) -> dict:
    from dablooms_spark.operators.sharded_scaling import (
        sharded_scaling_remove,
    )

    spark = _spark("remove")
    mgr, manifest, layers = _artifact(spark, args.checkpoint, args.run_id)
    stamped = _stamped(layers)
    expected = (
        _infer_expected_layers(layers, stamped["error_rate"])
        if args.expected_layers == "infer"
        else (None if args.expected_layers == "none" else int(args.expected_layers))
    )
    df = _keys(_read(spark, args.input), args.key_col)
    new_layers = sharded_scaling_remove(
        layers, df, args.key_col, args.id_col,
        stamped["capacity"], stamped["error_rate"],
        num_shards=stamped["num_shards"], expected_layers=expected,
    )
    seqnum = mgr.commit(
        new_layers,
        run_id=args.run_id or manifest["run_id"],
        stage="remove",
        lineage={
            "parent_seqnum": manifest["seqnum"],
            "deletions": args.input,
            "expected_layers": expected,
        },
    )
    return {"cmd": "remove", "seqnum": seqnum, "parent": manifest["seqnum"]}


def cmd_fp_report(args: argparse.Namespace) -> dict:
    from dablooms_spark.operators.metrics import observed_fp_rate_sharded

    spark = _spark("fp-report")
    _, manifest, layers = _artifact(spark, args.checkpoint, args.run_id)
    neg = _keys(_read(spark, args.input), args.key_col)
    row = observed_fp_rate_sharded(neg, args.key_col, layers).first()
    return {
        "cmd": "fp-report",
        "seqnum": manifest["seqnum"],
        "probes": row["probes"],
        "false_positives": row["false_positives"],
        "fp_rate": row["fp_rate"],
        "configured_bound": row["configured_bound"],
        "within_bound": bool(row["within_bound"]),
    }


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dablooms_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, geometry: bool):
        sp.add_argument("--input", required=True, help="parquet path")
        sp.add_argument("--key-col", required=True)
        sp.add_argument("--checkpoint", required=True)
        # writers need a concrete run id; readers default to "latest
        # commit of any run" (None)
        sp.add_argument("--run-id", default="cli" if geometry else None)
        if geometry:
            sp.add_argument("--id-col", required=True)
            sp.add_argument("--capacity", type=int, required=True)
            sp.add_argument("--error-rate", type=float, required=True)
            sp.add_argument("--num-shards", type=int, default=16)

    b = sub.add_parser("build", help="one-shot sharded scaling build")
    common(b, geometry=True)
    b.add_argument(
        "--expected-layers", default="auto",
        help="'auto' (from max id — batch builds know their span), "
        "'none' (open-ended polynomial schedule), or an integer. "
        "Pin ONE value for the life of a checkpoint.",
    )
    b.set_defaults(run=cmd_build)

    i = sub.add_parser("ingest", help="incremental batch into checkpoint")
    common(i, geometry=True)
    i.add_argument("--batch-tag", default=None, help="replay guard id")
    i.add_argument("--new-rows-out", default=None)
    i.add_argument(
        "--expected-layers", default="none",
        help="integer pinned at build time, or 'none'. NOT 'auto': an "
        "auto hint recomputed per batch drifts the ε schedule and the "
        "collide-merge refuses mixed-schedule layers.",
    )
    i.set_defaults(run=cmd_ingest)

    pr = sub.add_parser("probe", help="membership verdicts vs artifact")
    common(pr, geometry=False)
    pr.add_argument("--output", required=True)
    pr.add_argument(
        "--mode", choices=["report", "semi", "anti"], default="report",
        help="report: all rows + is_member; semi: bloom hits only; "
        "anti: definite negatives only",
    )
    pr.set_defaults(run=cmd_probe)

    rm = sub.add_parser("remove", help="counter-decrement keys")
    common(rm, geometry=False)
    rm.add_argument("--id-col", required=True)
    rm.add_argument(
        "--expected-layers", default="infer",
        help="'infer' (recover the uniform schedule from stamped "
        "layer_eps), 'none', or the integer pinned at build time",
    )
    rm.set_defaults(run=cmd_remove)

    fp = sub.add_parser(
        "fp-report", help="observed FP rate over disjoint keys"
    )
    common(fp, geometry=False)
    fp.set_defaults(run=cmd_fp_report)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    result = args.run(args)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
