"""End-to-end web-corpus pipeline integration test — the engine's
actual job, composed: ingest → quality/lang gates → near-dup removal →
membership filter build → incremental ingest of a second crawl batch
with definite-new-key routing → checkpoint → restore.
"""

import pytest
from pyspark.sql import functions as F

from dablooms_spark.operators import (
    bloom_anti_join,
    bloom_probe_column,
    build_scaling_bloom,
    exact_dedup,
    minhash_lsh_dedup,
    with_lang_id,
    with_quality_score,
)
from dablooms_spark.sources import synth_webpages
from dablooms_spark.sources.checkpoint import CheckpointManager, checkpoint_sketch


def test_full_corpus_pipeline(spark, tmp_path_factory):
    wp = synth_webpages(spark, n_rows=15_000, partitions=8)

    # 1. quality + language gates (pure Catalyst; pushdown-friendly)
    gated = with_quality_score(wp).filter(
        (F.col("n_tokens") >= 60) & (F.col("lang") == "en")
    )
    n_gated = gated.count()
    assert 0 < n_gated < 15_000

    # 2. near-duplicate removal: drop the higher-id side of verified pairs
    docs = gated.select(F.col("row_id").alias("doc_id"), "text", "url", "warc_ts")
    pairs = minhash_lsh_dedup(docs, threshold=0.85)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = docs.join(drop, "doc_id", "left_anti")
    assert kept.count() <= n_gated

    # 3. membership filter over the curated corpus (id-routed layers)
    filt = build_scaling_bloom(
        kept, "url", "doc_id", capacity=3_000, error_rate=0.02, num_shards=8
    )
    assert filt.count == kept.count()
    fn = bloom_probe_column(kept, "url", filt).filter("NOT is_member").count()
    assert fn == 0

    # 4. second crawl batch: half re-crawls, half new pages. The filter
    #    routes definite-new urls without touching the corpus (bloom
    #    anti join without verification = guaranteed-true negatives).
    recrawl = kept.limit(500).select("url")
    fresh = spark.range(1_000_000, 1_001_000).select(
        F.concat(F.lit("https://new.example.com/"), F.col("id")).alias("url")
    )
    second_batch = recrawl.union(fresh)
    definite_new = bloom_anti_join(second_batch, "url", filt)
    # no known url may pass (no false negatives ⇒ every recrawl is caught)
    leaked = definite_new.join(kept.select("url"), "url", "left_semi").count()
    assert leaked == 0
    # nearly all genuinely-new urls pass (only ε are false-positive-dropped)
    assert definite_new.count() >= 1000 * (1 - 0.02 * 3)

    # 5. checkpoint the curated filter; restore equals original
    path = str(tmp_path_factory.mktemp("pipe_ckpt"))
    checkpoint_sketch(
        filt, spark, path, run_id="crawl-1",
        lineage={"stage": "curated", "gates": "quality+lang+dedup"},
        metrics={"docs": kept.count()},
    )
    restored = CheckpointManager(path).restore_sketch(spark)
    assert restored.to_bytes() == filt.to_bytes()
