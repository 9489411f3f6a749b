"""Corpus-curation operators: per-group quota caps, cluster
representative selection, and vocabulary extraction.

Three stages every web-scale training-data pipeline runs after the
dedup/quality passes (none exist in the reference — dablooms stops at
membership — but they are the consumers its filters feed):

* `cap_per_group` — keep at most `n` documents per group (the classic
  "max N pages per registered domain" crawl-balancing rule).
  Deterministic: survivors are a pure function of the data, never of
  partitioning or run order.
* `keep_best_in_clusters` — after near-dup clustering, retain the
  highest-quality document of each cluster instead of the arbitrary
  min-id one (`graph.dedup_clusters` keeps min-id; real pipelines
  keep the longest / highest-scoring copy).
* `vocab_top_k` — global term frequencies, top k — the vocabulary /
  tokenizer-training precursor and a cheap corpus-drift monitor.

Scale notes (the 100 TB story):

`cap_per_group` is the skew trap: one hot domain can hold 10^9 of
10^12 rows, and a single `row_number() OVER (PARTITION BY group)`
sends all of them to one task. The two-phase form bounds that: phase 1
ranks within (group, salt) — SALT_BUCKETS-way split of every hot group,
each keeping at most n rows — so phase 2's exact per-group rank sees
at most n * SALT_BUCKETS rows per group regardless of input skew. Both
phases are window row_numbers (shuffle + in-partition sort), but the
second shuffle moves only the bounded survivors. The salt is derived
from row CONTENT (xxhash64 of the id column), never from
monotonically_increasing_id(): nondeterministic salts feeding a
shuffle break exactly-once under task retry/speculation.

`vocab_top_k` is explode -> partial-aggregated count (map-side combine
absorbs the Zipf head: "the" collapses to one partial row per task
before the shuffle) -> TakeOrderedAndProject (per-partition top-k, k
rows per task to the driver — never a global sort of the vocabulary).

`keep_best_in_clusters` adds one max_by aggregation and one join on
the cluster label over `graph.connected_components`' output; cluster
count is unbounded so the join stays sort-merge (no broadcast
assumption).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dablooms_spark.operators.graph import connected_components
from dablooms_spark.operators.textops import tokens

#: default hot-group split factor for the two-phase cap — 16 bounds
#: phase-2 input to 16n rows per group while keeping phase-1 groups
#: ~1/16 of the hottest domain
DEFAULT_CAP_SALT_BUCKETS = 16


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_by: list[Column],
    id_col: str | None = None,
    salt_buckets: int = DEFAULT_CAP_SALT_BUCKETS,
) -> DataFrame:
    """Keep at most `n` rows per `group_col` value, chosen by
    `order_by` rank (pass fully-specified descending/ascending
    Columns; include a unique tiebreaker so the survivor set is a
    total-order function of the data — e.g.
    `[F.col("n_chars").desc(), F.col("doc_id").asc()]`).

    `id_col` seeds the deterministic phase-1 salt; defaults to
    `group_col` only when salting is disabled — with salting ON it is
    required, because salting by the group value alone would put every
    row of a hot group in ONE salt bucket (no split at all).

    salt_buckets=0 skips phase 1 (small/even groups: one window, one
    shuffle)."""
    if n < 1:
        raise ValueError(f"cap n must be >= 1, got {n}")
    if salt_buckets > 0:
        if id_col is None:
            raise ValueError(
                "cap_per_group with salt_buckets > 0 needs id_col: the "
                "phase-1 salt must vary WITHIN a group (salting by the "
                "group value would leave hot groups unsplit); pass the "
                "row id column, or salt_buckets=0 for the one-phase form"
            )
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order_by)
        df = (
            df.withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= n)
            .drop("__r1")
        )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= n)
        .drop("__r2")
    )


def keep_best_in_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, label, keep): near-dup cluster assignment where `keep`
    marks the highest-`score_col` document of each cluster (ties
    break to the smallest id, so the representative is unique and
    deterministic). Docs absent from `pairs` are their own cluster
    and always kept. The companion to `graph.dedup_clusters`, which
    keeps the min-id copy regardless of quality."""
    labels = connected_components(pairs, id_a, id_b, max_iters)
    base = docs.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(score_col).alias("__score"),
    )
    scored = base.join(labels, "node", "left").withColumn(
        "label", F.coalesce("label", F.col("node"))
    )
    # representative: max (score, -node) — max score, then min id
    best = scored.groupBy("label").agg(
        F.max_by(
            "node", F.struct(F.col("__score"), (-F.col("node")).alias("__neg"))
        ).alias("__best")
    )
    return (
        scored.join(best, "label")
        .select(
            "node",
            "label",
            (F.col("node") == F.col("__best")).alias("keep"),
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
) -> DataFrame:
    """(term, n_docs, postings): per-term document frequency and a
    sorted posting list capped at `max_postings` ids (smallest ids
    win — deterministic). The retrieval-side companion to
    vocab_top_k: term lookup tables, training-data lineage ("which
    docs contain this string"), and contamination forensics all read
    this shape.

    Skew is the design problem: a stopword's posting list is the
    corpus. collect_list per term would funnel "the"'s 10^11 ids into
    one task; instead the explode feeds cap_per_group's two-phase
    rank — every term's survivors are bounded at max_postings BEFORE
    the final per-term gather, so the widest task holds max_postings
    ids regardless of document frequency. n_docs is the TRUE document
    frequency (counted pre-cap, map-side combined), so the cap never
    distorts the statistics, only truncates the list."""
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    posts = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    counts = posts.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    capped = cap_per_group(
        posts, "term", max_postings, [F.col("doc_id").asc()], id_col="doc_id"
    )
    lists = capped.groupBy("term").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings")
    )
    return counts.join(lists, "term")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    num_shards: int = 256,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training bin
    (sequence packing): adds `pack_shard` (= id % num_shards) and
    `pack_bin` — within a shard, documents are taken in id order and
    a document starts a new bin when the tokens before it fill the
    current one (bin = floor(exclusive-cumsum / budget)). Documents
    are never split; a document longer than `budget` occupies its
    bin alone (the bin overflows rather than losing bytes —
    truncate upstream if hard caps matter).

    Strictly-sequential greedy packing cannot scale (it is one global
    running state); sharding by id makes each shard an independent
    window (one shuffle, num_shards-way parallel) and the id-order
    rule keeps the assignment a pure function of the data — the same
    doc lands in the same (shard, bin) on every run and cluster size,
    so a resumed training job reads identical sequences. Per-shard
    fill waste is bounded by one document's tokens per bin."""
    if budget < 1:
        raise ValueError(f"pack budget must be >= 1, got {budget}")
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    idc = F.col(id_col).cast("long")
    shard = F.pmod(idc, F.lit(num_shards))
    w = (
        Window.partitionBy(shard)
        .orderBy(idc)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(n_tokens_col).cast("long")).over(w), F.lit(0)
    )
    return df.withColumn("pack_shard", shard).withColumn(
        "pack_bin", F.floor(cum_before / F.lit(budget))
    )


def vocab_top_k(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """(term, n): the k most frequent whitespace tokens corpus-wide,
    ordered by count desc then term asc (deterministic at the cut).
    Map-side partial counts absorb the Zipf head before the shuffle;
    the final top-k is TakeOrderedAndProject (per-partition heads,
    never a full vocabulary sort)."""
    if k < 1:
        raise ValueError(f"vocab_top_k k must be >= 1, got {k}")
    return (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(k)
    )
