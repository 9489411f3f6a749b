"""Curation operators: per-group quota cap, cluster representative
selection, vocabulary top-k."""

import pyspark.sql.functions as F
import pytest

from dablooms_spark.operators.curation import (
    cap_per_group,
    keep_best_in_clusters,
    vocab_top_k,
)


def _docs(spark):
    rows = [
        # (doc_id, source, n_chars, text)
        (0, "a", 100, "x y x"),
        (1, "a", 300, "x z"),
        (2, "a", 300, "y"),
        (3, "a", 50, "x"),
        (4, "b", 10, "z z z"),
        (5, "b", 20, "w"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long, text string")


def test_cap_per_group_exact_top_n(spark):
    kept = cap_per_group(
        _docs(spark),
        "source",
        2,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        id_col="doc_id",
    )
    got = sorted(r.doc_id for r in kept.collect())
    # source a: top-2 by (n_chars desc, doc_id asc) = docs 1, 2;
    # source b: both survive (group smaller than the cap)
    assert got == [1, 2, 4, 5]


def test_cap_per_group_two_phase_matches_one_phase(spark):
    # the salted pre-cap must never change the survivor set
    docs = _docs(spark)
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    two = cap_per_group(docs, "source", 1, order, id_col="doc_id", salt_buckets=4)
    one = cap_per_group(docs, "source", 1, order, salt_buckets=0)
    assert sorted(r.doc_id for r in two.collect()) == sorted(
        r.doc_id for r in one.collect()
    )


def test_cap_per_group_requires_id_when_salted(spark):
    with pytest.raises(ValueError, match="id_col"):
        cap_per_group(_docs(spark), "source", 1, [F.col("doc_id")])
    with pytest.raises(ValueError, match=">= 1"):
        cap_per_group(_docs(spark), "source", 0, [F.col("doc_id")], id_col="doc_id")


def test_keep_best_picks_highest_score_then_min_id(spark):
    docs = _docs(spark)
    # one cluster {0,1,2} (chain), docs 3-5 isolated
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    out = keep_best_in_clusters(docs, pairs, "doc_id", "n_chars")
    rows = {r.node: (r.label, r.keep) for r in out.collect()}
    assert rows[0] == (0, False)
    # 1 and 2 tie on n_chars=300 -> min id 1 wins
    assert rows[1] == (0, True)
    assert rows[2] == (0, False)
    # isolated docs are their own cluster, always kept
    assert rows[3] == (3, True) and rows[4] == (4, True) and rows[5] == (5, True)


def test_vocab_top_k_order_and_cut(spark):
    out = vocab_top_k(_docs(spark), "text", k=3).collect()
    # counts: x=4, z=4, y=2, w=1 -> ties break term-asc
    assert [(r.term, r.n) for r in out] == [("x", 4), ("z", 4), ("y", 2)]
    with pytest.raises(ValueError, match=">= 1"):
        vocab_top_k(_docs(spark), "text", k=0)


def test_vocab_top_k_plan_is_take_ordered(spark):
    plan = vocab_top_k(_docs(spark), "text", k=3)._jdf.queryExecution().executedPlan().toString()
    # per-partition top-k merged on the driver — never a global sort
    assert "TakeOrderedAndProject" in plan


def test_pack_sequences_chunking_rule(spark):
    from dablooms_spark.operators.curation import pack_sequences

    rows = [(i, 60) for i in range(10)]  # uniform 60-token docs
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", "n_tok", budget=100, num_shards=2)
    got = {r.doc_id: (r.pack_shard, r.pack_bin) for r in out.collect()}
    # shard 0 holds ids 0,2,4,6,8 in order; exclusive cumsums
    # 0,60,120,180,240 -> bins 0,0,1,1,2
    assert [got[i] for i in (0, 2, 4, 6, 8)] == [
        (0, 0), (0, 0), (0, 1), (0, 1), (0, 2)
    ]
    assert [got[i][1] for i in (1, 3, 5, 7, 9)] == [0, 0, 1, 1, 2]
    # oversized doc occupies its bin alone but is never dropped
    big = spark.createDataFrame([(0, 500), (2, 60)], "doc_id long, n_tok long")
    b = {r.doc_id: r.pack_bin for r in
         pack_sequences(big, "doc_id", "n_tok", budget=100, num_shards=2).collect()}
    assert b[0] == 0 and b[2] == 5
    # determinism under repartitioning
    again = pack_sequences(df.repartition(5), "doc_id", "n_tok", 100, num_shards=2)
    assert {r.doc_id: (r.pack_shard, r.pack_bin) for r in again.collect()} == got
    import pytest as _pt
    with _pt.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "n_tok", 0)


def test_inverted_index_cap_and_true_df(spark):
    from dablooms_spark.operators.curation import inverted_index

    rows = [
        (0, "x y"),
        (1, "x y x"),   # duplicate token inside a doc counts once
        (2, "x z"),
        (3, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term: (r.n_docs, r.postings) for r in
           inverted_index(df, "text", "doc_id", max_postings=2).collect()}
    # true document frequency survives the cap; smallest ids win
    assert got["x"] == (4, [0, 1])
    assert got["y"] == (2, [0, 1])
    assert got["z"] == (1, [2])
    import pytest as _pt
    with _pt.raises(ValueError, match="max_postings"):
        inverted_index(df, "text", "doc_id", max_postings=0)


def test_cap_per_group_plan_two_exchanges(spark):
    """The two-phase cap costs exactly two hash exchanges — phase 1 on
    (group, salt), phase 2 on group — with the second moving only the
    bounded survivors. A third exchange (or a lost salt phase) is a
    plan regression."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, "g", 1) for i in range(10)], "doc_id long, source string, n long"
    )
    plan = (
        cap_per_group(
            df, "source", 2, [F.col("n").desc(), F.col("doc_id").asc()],
            id_col="doc_id",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
