"""Deterministic splitting, sampling, and decontamination for
training corpora.

Operations every large-scale training-data pipeline needs in
front of the sketch/dedup stages:

* `deterministic_split` — key-hash train/val/test assignment. Unlike
  `DataFrame.randomSplit` (seed + partition-order dependent, so a
  re-run or repartition reshuffles examples across splits), the split
  here is a pure function of the KEY: stable under re-runs, joins,
  repartitioning, cluster size, and incremental arrivals — a document
  can never migrate from test into train between pipeline versions.
  Pure Catalyst (xxhash64 → pmod → CASE), map-only.

* `contamination_pairs` / `decontaminate` — n-gram-overlap check of a
  corpus against a benchmark/eval set (the training-data leak scan).
  Both sides shingle with the SAME JVM-side xxhash64 k-gram pipeline
  the MinHash dedup uses (textops.shingle_hashes), explode to
  (shingle, id) and join on shingle hash — a contaminated doc is one
  sharing ≥ min_hits shingles with any benchmark doc. The benchmark
  side is tiny (thousands of eval prompts vs billions of docs), so
  Catalyst broadcasts it; the corpus side stays a map + broadcast-join
  with no corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dablooms_spark.operators.textops import shingle_hashes, shingle_strings

SPLIT_SEED = 0x5B17


def split_bucket(
    key: str | Column, num_buckets: int = 100, seed: int = SPLIT_SEED
) -> Column:
    """Stable [0, num_buckets) bucket for a key — the primitive under
    percentage sampling (`split_bucket("url") < 5` == a stable 5%
    sample). NULL keys bucket to NULL (xxhash64 would otherwise
    collapse every NULL into one constant bucket, silently including
    or excluding them as a block)."""
    c = F.col(key) if isinstance(key, str) else key
    c = c.cast("string")
    b = F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(num_buckets))
    return F.when(c.isNotNull(), b)


def _hex_cut(frac: float, digits: int = 13) -> str:
    """Lowercase hex threshold t such that a uniform md5 prefix
    compares < t with probability ≈ frac. Clamped to `digits` chars:
    a cumulative fraction that rounds to 1.0 must not mint a
    14-character cut (it would compare greater than EVERY 13-char
    prefix and spill rows into later splits)."""
    v = min(int(round(frac * (16 ** digits))), 16 ** digits - 1)
    return format(max(v, 0), "x").rjust(digits, "0")


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    out: str = "split",
    salt: str = "",
) -> DataFrame:
    """Adds a split-name column assigned by key hash, proportional to
    `weights` (e.g. {"train": 0.98, "val": 0.01, "test": 0.01}).

    The assignment compares a 13-hex-digit md5 prefix of
    (salt || key) against cumulative-weight thresholds. md5 prefixes
    deliberately, not xxhash: the split definition is then PORTABLE —
    any engine or language with md5 reproduces the exact same wall, so
    downstream eval tooling outside Spark can re-derive membership.
    Assignment order is the ITERATION ORDER of `weights`; pass the
    same ordering across runs. Duplicate keys always land in the same
    split (the property that matters: every version of a document
    stays on one side of the train/test wall). `salt` rotates the
    wall for a fresh experiment without touching the keys.

    NULL keys get a NULL split (they have no identity to assign by) —
    filter or impute them upstream rather than letting them skew one
    split."""
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    c = F.col(key_col).cast("string")
    prefix = F.substring(F.md5(F.concat(F.lit(salt), c)), 1, 13)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = F.lit(_hex_cut(acc))
        expr = (
            F.when(prefix < cut, F.lit(name))
            if expr is None
            else expr.when(prefix < cut, F.lit(name))
        )
    last = F.lit(names[-1])
    out_col = last if expr is None else expr.otherwise(last)
    out_col = F.when(c.isNotNull(), out_col)
    return df.withColumn(out, out_col)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly `n_per_stratum` rows per stratum (fewer only when the
    stratum is smaller) — "take 10k documents per language" — chosen
    by md5(salt || key) rank so the sample is a pure function of the
    data: stable under re-runs, repartitioning, and cluster size, and
    PORTABLE (any engine with md5 re-derives membership, the same
    property deterministic_split leans on). `salt` rotates the sample
    without touching the keys.

    Built on the skew-safe two-phase rank of `curation.cap_per_group`:
    a hot stratum never funnels into a single task. NULL keys have no
    identity to rank by and are excluded (mirrors
    deterministic_split's NULL policy)."""
    from dablooms_spark.operators.curation import cap_per_group

    c = F.col(key_col).cast("string")
    rank = F.md5(F.concat(F.lit(salt), c))
    return cap_per_group(
        df.filter(c.isNotNull()),
        strata_col,
        n_per_stratum,
        [rank.asc(), c.asc()],
        id_col=key_col,
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str | None = None,
    k: int = 5,
    min_hits: int = 1,
    hashed: bool = False,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, n_shared) — corpus docs sharing ≥ min_hits
    token k-gram shingles with a benchmark doc. The benchmark side is
    broadcast; the corpus side never shuffles rows.

    broadcast_bench=False leaves the join strategy to Catalyst/AQE
    (shuffle-hash for a benchmark too big to broadcast) — the mode
    bloom_decontaminate's confirm stage uses, where the corpus side
    has already been bloom-pruned to candidates.

    hashed=False (default) joins shingle STRINGS — collision-free, so
    n_shared is exactly the distinct-shingle overlap. hashed=True
    joins 32-bit shingle hashes instead: ~8× less data movement for
    huge corpora, at the cost of rare hash-collision overcounts
    (odds ≈ |corpus shingles|·|bench shingles| / 2^32) — fine for a
    screening pass, use the default for the audit that drops data."""
    bid = bench_id_col or id_col
    sh_col = shingle_hashes if hashed else shingle_strings
    c = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(sh_col(text_col, k=k)).alias("sh"),
    )
    b = benchmark.select(
        F.col(bid).alias("bench_id"),
        F.explode(sh_col(text_col, k=k)).alias("sh"),
    ).distinct()
    b_side = F.broadcast(b) if broadcast_bench else b
    return (
        c.join(b_side, "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str | None = None,
    k: int = 5,
    min_hits: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Corpus minus contaminated docs (LEFT ANTI on the contamination
    set) — the decontamination pass itself."""
    bad = contamination_pairs(
        corpus, benchmark, text_col, id_col, bench_id_col, k, min_hits, hashed
    ).select("doc_id").distinct()
    return corpus.join(
        bad.withColumnRenamed("doc_id", "__bad_id"),
        on=F.col(id_col) == F.col("__bad_id"),
        how="left_anti",
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str | None = None,
    k: int = 5,
    min_hits: int = 1,
    num_shards: int = 64,
    error_rate: float = 1e-3,
    capacity: int | None = None,
    seed: int | None = None,
) -> DataFrame:
    """`decontaminate` for eval sets too big to broadcast: the bench
    shingle set becomes a SHARDED counting-bloom filter-as-DataFrame
    (operators/sharded.py — blob-only shuffles, never assembled on
    the driver), corpus shingles probe it via the cogroup topology,
    and only docs with ≥1 bloom-hit shingle — no false negatives, so
    bloom-clean docs are PROVABLY clean — pay for the exact
    shingle-join confirm (contamination_pairs with
    broadcast_bench=False, so the confirm join is shuffle-sized by
    the ε+true-hit candidate set, not the full corpus). The result is
    EXACTLY `decontaminate(corpus, benchmark, ...)`: bloom FPs are
    washed out by the confirm stage; only the cost model differs.

    At 100 TB with a 100 GB eval set neither side fits a broadcast
    and an all-shingle shuffle join moves the whole corpus; this
    topology moves (a) bench shingles once into ~capacity/shards
    blobs, (b) corpus shingle hashes through the cogroup probe, and
    (c) the candidate sliver through the exact join.

    `capacity` defaults to one approx_count_distinct pass over the
    bench shingles (×1.2 headroom); pass it explicitly to skip that
    action when the eval-set size is known.
    """
    from dablooms_spark.functions.murmur import DABLOOMS_SEED
    from dablooms_spark.operators.sharded import (
        build_sharded_counting_bloom,
        sharded_bloom_probe,
    )

    seed = DABLOOMS_SEED if seed is None else seed
    bench_sh = benchmark.select(
        F.explode(shingle_strings(text_col, k=k)).alias("sh")
    )
    if capacity is None:
        approx = bench_sh.agg(
            F.approx_count_distinct("sh", 0.02).alias("n")
        ).collect()[0]["n"]
        capacity = max(int(approx * 1.2), num_shards)
    blobs = build_sharded_counting_bloom(
        bench_sh.distinct(), "sh", capacity, error_rate, num_shards, seed=seed
    )

    corpus_sh = corpus.select(
        F.col(id_col).alias("__cand_id"),
        F.explode(shingle_strings(text_col, k=k)).alias("sh"),
    )
    probed = sharded_bloom_probe(
        corpus_sh, "sh", blobs, num_shards, seed=seed, out_col="__hit"
    )
    cand_ids = probed.filter(F.col("__hit")).select("__cand_id").distinct()
    candidates = corpus.join(
        cand_ids, on=F.col(id_col) == F.col("__cand_id"), how="left_semi"
    )
    bad = contamination_pairs(
        candidates,
        benchmark,
        text_col,
        id_col,
        bench_id_col,
        k,
        min_hits,
        hashed=False,
        broadcast_bench=False,
    ).select("doc_id").distinct()
    return corpus.join(
        bad.withColumnRenamed("doc_id", "__bad_id"),
        on=F.col(id_col) == F.col("__bad_id"),
        how="left_anti",
    )


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    k: int,
    salt: str = "",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic uniform sample: the k keys with the smallest
    md5(salt || key) — a bottom-k (KMV-style) summary, so it is
    MERGEABLE: bottom-k of a union == bottom-k of the concatenated
    per-part bottom-ks, which is exactly how Spark executes the plan
    (TakeOrderedAndProject: per-partition top-k heaps, driver merge of
    k·P candidate rows — no shuffle, no full sort). Re-runs, input
    repartitioning, and incremental arrivals all reproduce or extend
    the same sample; vary `salt` for an independent draw.

    Returns (key_col, h, *extra_cols) ordered by (h, key). Distinct
    keys collide on h with ~2^-64 probability; the key itself breaks
    residual ties, so the selected set is total-order deterministic.
    """
    kc = F.col(key_col).cast("string")
    h = F.md5(F.concat(F.lit(salt), kc)).alias("h")
    cols = [F.col(key_col), h] + [F.col(c) for c in (extra_cols or [])]
    return df.select(*cols).orderBy("h", key_col).limit(int(k))


_U52_DENOM = float(1 << 52)  # 13 hex digits of md5 → uniform in (0,1)


def ares_priority(key_col: str, weight_col: str, salt: str = "") -> Column:
    """The Efraimidis–Spirakis A-Res priority r = u^(1/w) as a pure
    Catalyst expression, with u a DETERMINISTIC md5-derived uniform:
    u = (v + 0.5) / 2^52 where v is the first 13 hex digits of
    md5(salt || key) read as an integer (v < 2^52, so the double is
    exact and any engine's md5 re-derives the same u — the oracle
    recomputes it in SQL). Taking the k LARGEST r samples k keys
    without replacement with inclusion probability proportional to
    weight (Efraimidis & Spirakis, IPL 2006, public algorithm)."""
    kc = F.col(key_col).cast("string")
    v = F.conv(F.substring(F.md5(F.concat(F.lit(salt), kc)), 1, 13), 16, 10)
    u = (v.cast("double") + F.lit(0.5)) / F.lit(_U52_DENOM)
    w = F.col(weight_col).cast("double")
    return F.pow(u, F.lit(1.0) / w)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the k keys
    with the LARGEST A-Res priority u^(1/w) (see `ares_priority`) —
    the data-mixing primitive (sample documents proportional to
    quality score, token count, or source temperature weight) as a
    pure function of (salt, key, weight). Like `bottomk_sample` it is
    a mergeable top-k summary and executes as TakeOrderedAndProject:
    per-partition heaps, k·P candidate rows to the driver, NO shuffle
    and no full sort — re-runs, repartitioning, and incremental
    arrivals reproduce or extend the same sample, and raising one
    key's weight can only improve that key's own rank (its priority
    rises, every other priority is untouched). Vary `salt` for an
    independent draw.

    Rows with weight <= 0 or NULL are excluded (u^(1/w) for w<=0 is
    not a valid draw). Returns (key_col, weight_col, *extra_cols)
    ordered by (priority DESC, key); the float priority itself is not
    emitted so results hash portably across engines.
    """
    pr = ares_priority(key_col, weight_col, salt).alias("__pr")
    cols = [F.col(key_col), F.col(weight_col)] + [
        F.col(c) for c in (extra_cols or [])
    ]
    kept = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col).cast("double") > 0)
    )
    return (
        kept.select(*cols, pr)
        .orderBy(F.col("__pr").desc(), key_col)
        .limit(int(k))
        .drop("__pr")
    )
