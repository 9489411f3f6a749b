"""One-call corpus preparation: the stages this library exists for,
composed in their canonical order.

    result = prepare_training_corpus(spark_df_of_documents)
    result.df            # cleaned, deduped, decontaminated + split
    result.stats         # rows surviving each stage

Order matters and is the standard one for LLM training corpora:

  1. quality gates FIRST (cheap map-only Catalyst: token counts,
     stopword density, Gopher repetition scores) — shed junk before
     anything that shuffles;
  2. exact dedup (hash groupBy) — collapse byte-identical copies so
     near-dup never pays for them;
  3. MinHash-LSH near-dup → connected components → keep cluster
     representatives;
  4. decontamination against a benchmark set (if given) — AFTER dedup
     so each surviving representative is checked once;
  5. per-group quota cap (if cap_group_col is given) — the "max N
     pages per domain" balancing rule, applied after dedup so the
     quota counts unique documents, skew-safe two-phase rank;
  5½. weighted mixing (if mix_k is given) — subsample the survivors
     to a document budget with inclusion probability proportional to
     a weight column (token count, quality score), deterministic
     A-Res bottom-k so re-runs draw the same corpus;
  6. deterministic split LAST, on the surviving rows, so train/test
     proportions refer to the corpus actually trained on.

Near-dup representative choice: by default each cluster keeps its
min-id copy (`dedup_clusters`); pass keep_best_score_col (any column
present after quality scoring, e.g. "n_tokens") to keep the
highest-scoring copy instead (`keep_best_in_clusters`).

Every stage is an operator documented elsewhere in this package;
this module only composes them and keeps honest per-stage counts
(each stage boundary is a real action — at 100 TB run it for the
audit trail, or pass count_stages=False to fuse the whole pipeline
into one lazy plan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dablooms_spark.operators.curation import cap_per_group, keep_best_in_clusters
from dablooms_spark.operators.dedup import exact_dedup, minhash_lsh_dedup
from dablooms_spark.operators.graph import dedup_clusters
from dablooms_spark.operators.sampling import (
    decontaminate,
    deterministic_split,
    weighted_sample,
)
from dablooms_spark.operators.textops import (
    with_quality_score,
    with_repetition_scores,
)


@dataclass
class CorpusResult:
    df: DataFrame
    stats: dict[str, int] = field(default_factory=dict)


def prepare_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_dup_token_frac: float = 0.9,
    max_top_bigram_frac: float = 0.5,
    near_dup_threshold: float = 0.85,
    benchmark: DataFrame | None = None,
    bench_id_col: str | None = None,
    contamination_min_hits: int = 3,
    keep_best_score_col: str | None = None,
    cap_group_col: str | None = None,
    cap_n: int = 1000,
    mix_k: int | None = None,
    mix_weight_col: str = "n_tokens",
    mix_salt: str = "",
    split_weights: dict[str, float] | None = None,
    count_stages: bool = True,
) -> CorpusResult:
    """Quality-gate, dedup, (optionally) decontaminate and split a
    document corpus. Returns the prepared DataFrame (original columns
    + quality features + `split` when weights are given) and per-stage
    surviving row counts.

    With count_stages=True each counted stage is persisted (and its
    predecessor released) so the audit counts cost one extra pass
    total, not a re-execution of the whole upstream pipeline per
    stage; the final stage stays cached for the caller. Pass
    count_stages=False for one fused lazy plan and no caching."""
    stats: dict[str, int] = {}
    prev_cached: list[DataFrame] = []

    def checkpoint(name: str, df: DataFrame) -> DataFrame:
        if count_stages:
            df = df.persist()
            stats[name] = df.count()
            while prev_cached:
                prev_cached.pop().unpersist()
            prev_cached.append(df)
        return df

    if count_stages:
        stats["input"] = docs.count()

    # 1. quality gates — map-only, pushes work to the scan
    scored = with_repetition_scores(
        with_quality_score(docs, text_col), text_col
    )
    kept = scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    kept = checkpoint("quality", kept)

    # 2. exact dedup: keep the min-id row per distinct text
    canonical = exact_dedup(kept, text_col, id_col).select(id_col)
    kept = kept.join(canonical, id_col, "left_semi")
    kept = checkpoint("exact_dedup", kept)

    # 3. near-dup: LSH pairs -> components -> representatives
    pairs = minhash_lsh_dedup(
        kept.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        threshold=near_dup_threshold,
        materialize=False,
    )
    if keep_best_score_col is not None:
        clusters = keep_best_in_clusters(
            kept, pairs, id_col=id_col, score_col=keep_best_score_col
        )
    else:
        clusters = dedup_clusters(pairs)
    drop = clusters.filter(~F.col("keep")).select(
        F.col("node").alias("__drop_id")
    )
    kept = kept.join(
        drop, on=F.col(id_col) == F.col("__drop_id"), how="left_anti"
    )
    kept = checkpoint("near_dedup", kept)

    # 4. decontamination (exact shingle-string audit)
    if benchmark is not None:
        kept = decontaminate(
            kept, benchmark, text_col=text_col, id_col=id_col,
            bench_id_col=bench_id_col, min_hits=contamination_min_hits,
        )
        kept = checkpoint("decontaminated", kept)

    # 5. per-group quota cap: highest-quality docs win the quota
    if cap_group_col is not None:
        kept = cap_per_group(
            kept,
            cap_group_col,
            cap_n,
            [F.col("n_tokens").desc(), F.col(id_col).asc()],
            id_col=id_col,
        )
        kept = checkpoint("capped", kept)

    # 5.5 weighted mixing: subsample to a document budget with
    # inclusion probability proportional to mix_weight_col (A-Res,
    # deterministic in (salt, id, weight) — see operators/sampling.py)
    if mix_k is not None:
        chosen = weighted_sample(
            kept, id_col, mix_weight_col, mix_k, salt=mix_salt
        ).select(id_col)
        kept = kept.join(chosen, id_col, "left_semi")
        kept = checkpoint("mixed", kept)

    # 6. deterministic split on the survivors
    if split_weights:
        kept = deterministic_split(kept, id_col, split_weights)

    return CorpusResult(df=kept, stats=stats)
