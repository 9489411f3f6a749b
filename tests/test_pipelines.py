"""End-to-end corpus preparation pipeline."""

from pyspark.sql import functions as F

from dablooms_spark.pipelines import prepare_training_corpus


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    rows = [
        # healthy docs (distinct tails)
        *[(i, base + f"unique tail number {i} with extra words") for i in range(20)],
        # byte-identical copies of doc 0
        (100, base + "unique tail number 0 with extra words"),
        (101, base + "unique tail number 0 with extra words"),
        # near-duplicate of doc 1 (one word changed)
        (102, base + "unique tail number 1 with extra wordz"),
        # junk: too short
        (103, "tiny doc"),
        # junk: degenerate repetition
        (104, "spam " * 60),
        # contaminated: copies the benchmark prompt wholesale
        (105, base + "benchmark question what is two plus two exactly"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prepare_training_corpus(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(0, "benchmark question what is two plus two exactly")],
        ["doc_id", "text"],
    )
    res = prepare_training_corpus(
        docs,
        min_tokens=20,
        near_dup_threshold=0.9,
        benchmark=bench,
        contamination_min_hits=1,
        split_weights={"train": 0.9, "test": 0.1},
    )
    ids = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    # junk gone
    assert 103 not in ids and 104 not in ids
    # exact dupes collapsed to the min id
    assert 0 in ids and 100 not in ids and 101 not in ids
    # near-dup of doc 1 collapsed
    assert 1 in ids and 102 not in ids
    # contaminated doc removed
    assert 105 not in ids
    # healthy docs survive
    assert {i for i in range(20)} <= ids
    # split column present and total
    splits = {r["split"] for r in res.df.select("split").collect()}
    assert splits <= {"train", "test"}
    # stats trace every stage monotonically
    s = res.stats
    assert s["input"] == 26
    assert (
        s["input"] >= s["quality"] >= s["exact_dedup"]
        >= s["near_dedup"] >= s["decontaminated"]
    )
    assert s["decontaminated"] == res.df.count() == 20


def test_prepare_training_corpus_lazy_mode(spark):
    docs = _corpus(spark)
    res = prepare_training_corpus(docs, count_stages=False)
    assert res.stats == {}
    assert res.df.count() > 0


def test_prepare_training_corpus_keep_best_and_cap(spark):
    # doc 102 is the near-dup of doc 1 with one word changed; pad it
    # by ONE extra token so keep-best retains 102 (min-id mode would
    # keep 1) while the pair stays above the Jaccard threshold
    docs = _corpus(spark).withColumn(
        "text",
        F.when(
            F.col("doc_id") == 102,
            F.concat(F.col("text"), F.lit(" zzzz")),
        ).otherwise(F.col("text")),
    ).withColumn("grp", (F.col("doc_id") % 2).cast("string"))
    res = prepare_training_corpus(
        docs,
        min_tokens=20,
        # healthy docs pair at J=0.68, the padded near-dup at 0.87 —
        # 0.8 cleanly separates them
        near_dup_threshold=0.8,
        keep_best_score_col="n_tokens",
        cap_group_col="grp",
        cap_n=5,
    )
    ids = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    # the longest copy wins its near-dup cluster
    assert 102 in ids and 1 not in ids
    # quota respected per group
    per_grp = {
        r["grp"]: r["n"]
        for r in res.df.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 5 for n in per_grp.values())
    assert res.stats["capped"] == res.df.count() <= 10


def test_prepare_training_corpus_weighted_mixing(spark):
    """mix_k subsamples the survivors to a document budget via the
    deterministic A-Res draw: exact size, subset of the unmixed
    result, reproducible, and all original+quality columns survive."""
    docs = _corpus(spark)
    full = prepare_training_corpus(docs, count_stages=False)
    n_full = full.df.count()
    assert n_full > 8
    res = prepare_training_corpus(docs, mix_k=8)
    ids = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    assert res.stats["mixed"] == len(ids) == 8
    assert ids <= {r["doc_id"] for r in full.df.select("doc_id").collect()}
    assert "n_tokens" in res.df.columns and "text" in res.df.columns
    again = prepare_training_corpus(docs, mix_k=8, count_stages=False)
    assert {r["doc_id"] for r in again.df.select("doc_id").collect()} == ids
    other = prepare_training_corpus(docs, mix_k=8, mix_salt="v2",
                                    count_stages=False)
    other_ids = {r["doc_id"] for r in other.df.select("doc_id").collect()}
    assert len(other_ids) == 8
