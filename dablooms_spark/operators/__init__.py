from dablooms_spark.operators.bloom_build import (
    build_counting_bloom,
    build_scaling_bloom,
    counting_bloom_partials,
    scaling_bloom_partials,
    scaling_bloom_fixed_partials,
    merge_blobs_df,
    scaling_layers_df,
    restore_scaling_bloom_layers,
)
from dablooms_spark.operators.bloom_probe import (
    bloom_probe_column,
    bloom_semi_join,
    bloom_anti_join,
    auto_semi_join,
    auto_anti_join,
)
from dablooms_spark.operators.bloom_remove import bloom_remove, bloom_remove_distributed
from dablooms_spark.operators.udafs import (
    sketch_udaf,
    merge_sketch_udaf,
    agg_sketch_by,
    register_sketch_udafs,
)
from dablooms_spark.operators.graph import connected_components, dedup_clusters
from dablooms_spark.operators.sharded import (
    build_sharded_counting_bloom,
    sharded_bloom_probe,
    sharded_bloom_remove,
    sharded_semi_join,
)
from dablooms_spark.operators.sharded_scaling import (
    build_sharded_scaling_layers,
    sharded_scaling_probe,
    sharded_scaling_remove,
    sharded_scaling_semi_join,
)
from dablooms_spark.operators.sketch_agg import (
    sketch_agg,
    grouped_sketch_agg,
    sketch_rollup,
    rollup_distinct,
    approx_distinct_by,
    quantiles_by,
    frequent_keys,
)
from dablooms_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash_dedup,
    simhash_fingerprints,
    ngram_jaccard_pairs,
)
from dablooms_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    ivf_topk,
    embedding_neardup_pairs,
)
from dablooms_spark.operators.textops import (
    with_token_count,
    with_quality_score,
    with_lang_id,
    with_fingerprint,
    with_repetition_scores,
    shingle_hashes,
)
from dablooms_spark.operators.ingest import (
    incremental_ingest,
    incremental_ingest_scaling,
    restore_filter,
)
from dablooms_spark.operators.urlops import (
    canonicalize_url,
    host_counts,
    url_host,
    url_registered_domain,
    with_url_parts,
)
from dablooms_spark.operators.multimodal import (
    with_media_meta,
    decode_media,
    sample_frames,
)
from dablooms_spark.operators.skew import (
    salted_repartition,
    salted_group_counts,
    with_salt,
)

__all__ = [
    "build_counting_bloom",
    "build_scaling_bloom",
    "counting_bloom_partials",
    "scaling_bloom_partials",
    "merge_blobs_df",
    "scaling_bloom_fixed_partials",
    "scaling_layers_df",
    "restore_scaling_bloom_layers",
    "bloom_probe_column",
    "bloom_semi_join",
    "bloom_anti_join",
    "auto_semi_join",
    "auto_anti_join",
    "sketch_udaf",
    "merge_sketch_udaf",
    "agg_sketch_by",
    "register_sketch_udafs",
    "connected_components",
    "dedup_clusters",
    "build_sharded_counting_bloom",
    "sharded_bloom_probe",
    "sharded_bloom_remove",
    "sharded_semi_join",
    "build_sharded_scaling_layers",
    "sharded_scaling_probe",
    "sharded_scaling_remove",
    "sharded_scaling_semi_join",
    "bloom_remove",
    "bloom_remove_distributed",
    "sketch_agg",
    "grouped_sketch_agg",
    "sketch_rollup",
    "rollup_distinct",
    "approx_distinct_by",
    "quantiles_by",
    "frequent_keys",
    "exact_dedup",
    "minhash_lsh_dedup",
    "minhash_signatures",
    "simhash_dedup",
    "simhash_fingerprints",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_neardup_pairs",
    "with_token_count",
    "with_quality_score",
    "with_lang_id",
    "with_fingerprint",
    "with_repetition_scores",
    "shingle_hashes",
    "incremental_ingest",
    "incremental_ingest_scaling",
    "restore_filter",
    "canonicalize_url",
    "host_counts",
    "url_host",
    "url_registered_domain",
    "with_url_parts",
    "with_media_meta",
    "decode_media",
    "sample_frames",
    "salted_repartition",
    "salted_group_counts",
    "with_salt",
]
