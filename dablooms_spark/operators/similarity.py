"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. Queries (small) broadcast as a
  numpy matrix; corpus partitions compute batched matmuls and emit
  only their local top-k per query, so the shuffle carries k rows per
  (query, partition) instead of the full corpus — the same partial/
  final shape as the sketch aggregations. Exact, oracle-matchable.
- lsh_topk: random-hyperplane LSH — corpus bucketed by sign-bit codes
  (JVM join on bucket), exact cosine re-rank within buckets.
  Approximate recall, scale path for corpora too big to matmul.
- embedding_neardup_pairs: corpus self near-duplicate detection via
  LSH buckets + exact cosine verification.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _to_matrix(col: pa.Array, dtype=np.float32) -> np.ndarray:
    """(n, d) matrix from an Arrow list<float> column —
    zero-copy flatten + reshape (fixed dimensionality assumed)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype)
    d = len(flat) // n
    return flat.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, sim) with
    deterministic tie-break (higher sim first, then lower neighbor id).
    """
    qid = query_id_col or id_col
    spark = corpus.sparkSession
    qrows = queries.select(F.col(qid).alias("qid"), F.col(vec_col)).collect()
    q_ids = np.array([r.qid for r in qrows], dtype=np.int64)
    # float64 throughout so the similarity matches a double-precision
    # SQL oracle (float32 matmul differs in the 6th decimal)
    q_mat = _normalize(np.array([r[vec_col] for r in qrows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        q_ids_, q_mat_ = bc.value
        best_sim = None  # (nq, k) running top-k across batches
        best_ids = None
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_to_matrix(batch.column(1), np.float64))
            if m.shape[0] == 0:
                continue
            sims = q_mat_ @ m.T  # (nq, nb)
            cat_ids = np.broadcast_to(ids, (len(q_ids_), len(ids)))
            if best_sim is not None:
                sims = np.concatenate([best_sim, sims], axis=1)
                cat_ids = np.concatenate([best_ids, cat_ids], axis=1)
            kk = min(k, sims.shape[1])
            # prune with the SAME ordering the final rank uses —
            # (round(sim,6) desc, id asc) — so a candidate tied at 6
            # decimals with a lower id is never dropped locally. Two
            # stable argsorts == row-wise lexsort by that composite key.
            rows = np.arange(sims.shape[0])[:, None]
            o1 = np.argsort(cat_ids, axis=1, kind="stable")
            o2 = np.argsort(-np.round(sims[rows, o1], 6), axis=1, kind="stable")
            sel = o1[rows, o2][:, :kk]
            best_sim = sims[rows, sel]
            best_ids = cat_ids[rows, sel]
        if best_sim is not None:
            nq, kk = best_sim.shape
            yield pa.RecordBatch.from_pydict(
                {
                    "qid": np.repeat(q_ids_, kk),
                    "neighbor_id": best_ids.ravel().astype(np.int64),
                    "sim": best_sim.ravel().astype(np.float64),
                },
                schema=pa.schema(
                    [
                        ("qid", pa.int64()),
                        ("neighbor_id", pa.int64()),
                        ("sim", pa.float64()),
                    ]
                ),
            )

    partials = corpus.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        local_topk, schema="qid long, neighbor_id long, sim double"
    )
    # rank on the ROUNDED similarity so near-equal floats tie-break on
    # neighbor id identically in any engine computing the same math
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("sim", 6)), F.asc("neighbor_id")
    )
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "neighbor_id",
            F.round("sim", 6).alias("sim"),
        )
    )


def _hyperplane_code_udf(dim: int, nbits: int, seed: int):
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, nbits)).astype(np.float32)
    weights = (1 << np.arange(nbits, dtype=np.int64))

    @pandas_udf("long")
    def code(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            col = pa.array(series)
            m = _to_matrix(col)
            if m.shape[0] == 0:
                yield pd.Series([], dtype="int64")
                continue
            bits = (m @ planes) > 0
            yield pd.Series(bits @ weights)

    return code


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucketed candidates, exact cosine
    re-rank inside buckets. Recall < 1 by design (rows-only check)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    code = _hyperplane_code_udf(dim, nbits, seed)
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    ).withColumn("bucket", code("cvec"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("bucket", code("qvec"))
    joined = q.join(c, "bucket")
    dot = F.aggregate(
        F.zip_with("qvec", "cvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qn = F.sqrt(F.aggregate("qvec", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("cvec", F.lit(0.0), lambda a, x: a + x * x))
    sim = (dot / (qn * cn)).alias("sim")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        joined.select("query_id", F.col("cid").alias("neighbor_id"), sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _fold_cell_stats(stats: DataFrame, dim: int) -> DataFrame:
    """Per-cell executor-side reduction of Lloyd partial stats
    (shard, cell, s, cnt) → one (cell, s, cnt) row per nonempty cell.
    One groupBy(cell) Exchange; inside each group the partial vectors
    are accumulated sequentially in ascending-shard order — the same
    float op order as the legacy driver fold (np.sum's pairwise
    reduction would NOT be bit-identical)."""

    def fold_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("shard", kind="mergesort")
        acc = np.zeros(dim, np.float64)
        for s in pdf["s"]:
            acc += np.asarray(s, np.float64)
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "s": [acc],
                "cnt": [int(pdf["cnt"].sum())],
            }
        )

    return stats.groupBy("cell").applyInPandas(
        fold_cell, schema="cell long, s array<double>, cnt long"
    )


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    iters: int = 2,
    seed: int = 42,
    reduce: str = "executor",
) -> np.ndarray:
    """Distributed Lloyd iterations for IVF centroids, deterministic.

    Init is k-means++-style farthest-point selection over an 8×C
    hash-ordered candidate sample (greedy max-min cosine distance,
    fully deterministic — no RNG): a spread-out init covers the space
    far better than the first C hash draws, which can land several
    centroids in one dense region. Each Lloyd iteration is one corpus
    scan emitting per-PARTITION partial (cell, sum_vec, count) stats
    (map-side combine — the shuffle-free shape).

    reduce="executor" (default): partials are folded per cell by a
    groupBy(cell) stage BEFORE the collect, in sorted shard order with
    a sequential accumulator, so driver traffic is O(C·d) — one row
    per nonempty cell — regardless of partition count P. At 100 TB
    (P ~ 10^5 tasks) the alternative collect is O(C·P·d) rows of
    driver traffic per iteration; the fold's shuffle moves the same
    O(C·P·d) bytes but across executors, where it belongs.
    reduce="driver" keeps that collect-then-fold path (sorted
    (cell, shard) order) as the zero-shuffle small-P variant. Both
    accumulate each cell's partials in ascending-shard sequential
    float64 order, so the centroids are BIT-IDENTICAL across modes.
    Empty cells keep their previous centroid.
    """
    if reduce not in ("executor", "driver"):
        raise ValueError(f"reduce must be 'executor' or 'driver', got {reduce!r}")
    spark = corpus.sparkSession
    sample = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(num_centroids * 8)
        .collect()
    )
    cand = _normalize(np.array([r[vec_col] for r in sample], dtype=np.float64))
    if len(cand) <= num_centroids:
        cent = cand
    else:
        chosen = [0]  # smallest-hash candidate seeds the chain
        sims = cand @ cand[0]  # max similarity to any chosen centroid
        for _ in range(num_centroids - 1):
            nxt = int(np.argmin(sims))  # farthest from the chosen set
            chosen.append(nxt)
            sims = np.maximum(sims, cand @ cand[nxt])
        cent = cand[np.array(chosen)]
    C, dim = cent.shape
    vecs = corpus.select(vec_col)

    for _ in range(max(0, iters)):
        bc_c = spark.sparkContext.broadcast(cent)

        def partial_stats(
            batches: Iterator[pa.RecordBatch],
        ) -> Iterator[pa.RecordBatch]:
            from pyspark import TaskContext

            c = bc_c.value
            sums = np.zeros((C, dim), np.float64)
            counts = np.zeros(C, np.int64)
            for batch in batches:
                m = _normalize(_to_matrix(batch.column(0), np.float64))
                if m.shape[0] == 0:
                    continue
                a = np.argmax(m @ c.T, axis=1)
                np.add.at(sums, a, m)
                counts += np.bincount(a, minlength=C)
            shard = TaskContext.get().partitionId() if TaskContext.get() else 0
            nz = np.nonzero(counts)[0]
            if len(nz):
                yield pa.RecordBatch.from_pydict(
                    {
                        "shard": np.full(len(nz), shard, np.int64),
                        "cell": nz.astype(np.int64),
                        "s": list(sums[nz]),
                        "cnt": counts[nz],
                    },
                    schema=pa.schema(
                        [
                            ("shard", pa.int64()),
                            ("cell", pa.int64()),
                            ("s", pa.list_(pa.float64())),
                            ("cnt", pa.int64()),
                        ]
                    ),
                )

        stats = vecs.mapInArrow(
            partial_stats, schema="shard long, cell long, s array<double>, cnt long"
        )
        sums = np.zeros((C, dim), np.float64)
        counts = np.zeros(C, np.int64)
        if reduce == "executor":
            folded = _fold_cell_stats(stats, dim)
            for r in folded.collect():  # one row per nonempty cell
                sums[r.cell] = np.asarray(r.s, np.float64)
                counts[r.cell] = r.cnt
        else:
            for r in sorted(stats.collect(), key=lambda r: (r.cell, r.shard)):
                sums[r.cell] += np.asarray(r.s, np.float64)
                counts[r.cell] += r.cnt
        nz = counts > 0
        new_cent = cent.copy()
        new_cent[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(new_cent)
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_iters: int = 2,
    replicas: int = 1,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    centroid (inverted lists); a query searches only its `nprobe`
    nearest centroids' lists with exact cosine re-ranking.

    Centroids are k-means-trained (train_iters distributed Lloyd
    passes over a deterministic hash-sample init — see
    train_ivf_centroids); train_iters=0 recovers the one-scan
    hash-sample approximation. At scale the corpus would be
    bucketed/written by centroid id so a query's probe is a
    partition-pruned read; here the assignment is a JVM-joinable
    column. Approximate recall (rows-only check).

    replicas: index each corpus vector in its `replicas` nearest cells
    (multi-assignment). Vectors near a cell boundary are the classic
    IVF recall leak — a query probing the neighboring cell misses
    them; R=2 recovers most boundary losses for R× index size (the
    standard storage-for-recall IVF trade, tunable per corpus).
    """
    spark = corpus.sparkSession
    cent = train_ivf_centroids(
        corpus, vec_col, id_col, num_centroids, iters=train_iters, seed=seed
    )
    bc = spark.sparkContext.broadcast(cent)

    def assign_udf(n_take: int):
        @pandas_udf("array<long>")
        def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            c = bc.value
            for series in it:
                m = _to_matrix(pa.array(series), np.float64)
                if m.shape[0] == 0:
                    yield pd.Series([], dtype=object)
                    continue
                sims = _normalize(m) @ c.T  # (n, C)
                take = min(n_take, sims.shape[1])
                top = np.argpartition(-sims, take - 1, axis=1)[:, :take]
                yield pd.Series(list(top.astype(np.int64)))

        return assign

    c_assigned = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    ).withColumn("cell", F.explode(assign_udf(max(1, replicas))(F.col("cvec"))))
    q_assigned = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("cell", F.explode(assign_udf(nprobe)(F.col("qvec"))))

    joined = q_assigned.join(c_assigned, "cell")
    dot = F.aggregate(
        F.zip_with("qvec", "cvec", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    qn = F.sqrt(F.aggregate("qvec", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("cvec", F.lit(0.0), lambda a, x: a + x * x))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        joined.select(
            "query_id",
            F.col("cid").alias("neighbor_id"),
            (dot / (qn * cn)).alias("sim"),
        )
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    min_sim: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 8,
    seed: int = 42,
    hot_cap: int = 1000,
) -> DataFrame:
    """Near-duplicate (id_a < id_b, sim >= min_sim) pairs within LSH
    buckets, exact cosine verified JVM-side. Buckets above hot_cap
    (identical boilerplate embeddings repeated millions of times emit
    B²/2 pairs otherwise) collapse to star pairs against the min-id
    representative — same capping as the text-dedup LSH."""
    from dablooms_spark.operators.dedup import _banded_candidate_pairs

    dim = len(corpus.select(vec_col).first()[0])
    code = _hyperplane_code_udf(dim, nbits, seed)
    band_rows = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__v")
    ).withColumn("band_key", code("__v"))
    pairs = _banded_candidate_pairs(band_rows, id_col, hot_cap, payload="__v")
    dot = F.aggregate(
        F.zip_with("__v_a", "__v_b", lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    na = F.sqrt(F.aggregate("__v_a", F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate("__v_b", F.lit(0.0), lambda a, x: a + x * x))
    return (
        pairs.withColumn("sim", F.round(dot / (na * nb), 6))
        .filter(F.col("sim") >= min_sim)
        .select("id_a", "id_b", "sim")
        .distinct()
    )
