"""The spark-submit CLI (dablooms_spark/jobs.py): filter lifecycle
build -> probe -> ingest(replay) -> remove -> fp-report, driven
through main() exactly as a spark-submit driver would, against
checkpoint artifacts on disk."""

import json

import pytest
from pyspark.sql import functions as F

from dablooms_spark.jobs import main


def _run(capsys, argv) -> dict:
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_lifecycle(spark, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    batch1 = str(tmp_path / "batch1")
    batch2 = str(tmp_path / "batch2")
    # ids stay inside ONE (capacity-1)*num_shards = 3996 id window at
    # ~75% per-shard load: no overflow past the pinned layer hint, and
    # the FP reports probe the designed operating point
    spark.range(0, 2_400).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    ).write.parquet(batch1)
    spark.range(2_400, 3_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    ).write.parquet(batch2)

    geo = [
        "--key-col", "key", "--id-col", "id", "--capacity", "1000",
        "--error-rate", "0.02", "--num-shards", "4",
        "--checkpoint", ckpt,
    ]
    out = _run(capsys, ["build", "--input", batch1, *geo])
    assert out["seqnum"] == 1 and out["layer_rows"] >= 4
    # auto hint: 2399 // ((1000-1)*4) + 1 = 1
    assert out["expected_layers"] == 1

    # probe: built keys all hit; disjoint keys in anti mode are the
    # definite negatives (no false negatives => anti loses only FPs)
    probe_out = str(tmp_path / "hits")
    out = _run(capsys, [
        "probe", "--input", batch1, "--key-col", "key",
        "--checkpoint", ckpt, "--output", probe_out, "--mode", "semi",
    ])
    assert out["rows"] == 2_400
    anti_out = str(tmp_path / "anti")
    out = _run(capsys, [
        "probe", "--input", batch2, "--key-col", "key",
        "--checkpoint", ckpt, "--output", anti_out, "--mode", "anti",
    ])
    assert out["rows"] <= 600
    anti_keys = {r["key"] for r in spark.read.parquet(anti_out).collect()}
    assert not anti_keys & {f"k{i}" for i in range(2_400)}

    # ingest batch2 under a tag; the artifact must match the pinned
    # schedule (expected-layers from the build)
    new_out = str(tmp_path / "new1")
    out = _run(capsys, [
        "ingest", "--input", batch2, *geo,
        "--expected-layers", "1", "--batch-tag", "day2",
        "--new-rows-out", new_out,
    ])
    assert out["seqnum"] == 2 and out["new_rows"] == 600
    # crash-replay of the same tag: no third seqnum, keys not re-added
    out = _run(capsys, [
        "ingest", "--input", batch2, *geo,
        "--expected-layers", "1", "--batch-tag", "day2",
    ])
    assert out["seqnum"] == 2

    # remove batch2's keys; schedule is inferred from stamped layer_eps
    out = _run(capsys, [
        "remove", "--input", batch2, "--key-col", "key", "--id-col", "id",
        "--checkpoint", ckpt,
    ])
    assert out["seqnum"] == 3 and out["parent"] == 2
    report = str(tmp_path / "after_rm")
    out = _run(capsys, [
        "probe", "--input", batch2, "--key-col", "key",
        "--checkpoint", ckpt, "--output", report, "--mode", "report",
    ])
    removed = spark.read.parquet(report)
    # correct negative answers after remove (reference remove semantics;
    # surviving "members" are ordinary FPs, bounded well under 3x eps)
    assert removed.filter(F.col("is_member")).count() <= 600 * 0.02 * 3
    # batch1 keys survive the decrement untouched
    out = _run(capsys, [
        "probe", "--input", batch1, "--key-col", "key",
        "--checkpoint", ckpt, "--output", str(tmp_path / "b1"), "--mode", "semi",
    ])
    assert out["rows"] == 2_400

    # fp-report over provably-disjoint keys reads bound from the artifact
    neg = str(tmp_path / "neg")
    spark.range(50_000).select(
        F.concat(F.lit("zz"), F.col("id")).alias("key")
    ).write.parquet(neg)
    out = _run(capsys, [
        "fp-report", "--input", neg, "--key-col", "key",
        "--checkpoint", ckpt,
    ])
    assert out["probes"] == 50_000
    assert out["configured_bound"] == 0.02
    assert out["within_bound"]


def test_cli_errors(spark, tmp_path, capsys):
    empty = str(tmp_path / "nope")
    inp = str(tmp_path / "in")
    spark.range(5).select(
        F.col("id").cast("string").alias("key")
    ).write.parquet(inp)
    with pytest.raises(SystemExit):
        main([
            "fp-report", "--input", inp, "--key-col", "key",
            "--checkpoint", empty,
        ])
