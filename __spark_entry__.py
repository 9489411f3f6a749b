"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on /root/testdata/sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (same column
                names/aliases on both sides; omitted only for
                genuinely non-SQL-expressible sketch estimates, which
                get rows-only checks plus in-pytest tolerance tests).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dablooms_spark.operators import (  # noqa: E402
    bloom_anti_join,
    bloom_probe_column,
    bloom_semi_join,
    build_counting_bloom,
    build_scaling_bloom,
)
from dablooms_spark.sources import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bloom-accelerated exact semi join at sf0.001.

    Build a counting bloom over the keys of active customers, use it
    as a runtime filter on orders, exact-verify survivors — result is
    exactly LEFT SEMI JOIN, with the big side pruned before any
    shuffle (the pattern that matters at 100 TB)."""
    sf_dir = "/root/testdata/sf0.001"
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    dim = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").cast("string").alias("ckey")
    )
    filt = build_counting_bloom(dim, "ckey", capacity=2000, error_rate=0.01)
    probe = orders.withColumn("okey", F.col("o_custkey").cast("string"))
    return bloom_semi_join(probe, "okey", filt, exact_df=dim, exact_key="ckey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact semi join via bloom runtime filter + verification pass."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    dim = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").cast("string").alias("ckey")
    )
    filt = build_counting_bloom(dim, "ckey", capacity=5000, error_rate=0.01)
    probe = orders.withColumn("okey", F.col("o_custkey").cast("string"))
    return bloom_semi_join(probe, "okey", filt, exact_df=dim, exact_key="ckey").select(
        "o_orderkey", "o_custkey"
    )


def _q_bloom_anti_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact anti join: lineitems whose part is NOT in the small-size
    part dimension — bloom short-circuits definite negatives, exact
    anti join runs only on candidates."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dim = part.filter(F.col("p_size") <= 20).select(
        F.col("p_partkey").cast("string").alias("pkey")
    )
    filt = build_counting_bloom(dim, "pkey", capacity=20000, error_rate=0.01)
    probe = lineitem.withColumn("lkey", F.col("l_partkey").cast("string"))
    return bloom_anti_join(probe, "lkey", filt, exact_df=dim, exact_key="pkey").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )


def _q_scaling_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaling-filter membership with exact verification: which events
    keys from the second half of the stream were already seen in the
    first half. Bloom answers are verified exactly so the result is
    deterministic (the filter only prunes)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "key", F.concat_ws(":", "user_id", "event_type")
    )
    n = events.count()
    first_half = events.filter(F.col("event_id") < n // 2)
    second_half = events.filter(F.col("event_id") >= n // 2)
    filt = build_scaling_bloom(
        first_half, "key", "event_id", capacity=1000, error_rate=0.02, num_shards=8
    )
    dim = first_half.select(F.col("key").alias("seen_key")).distinct()
    return (
        bloom_semi_join(second_half, "key", filt, exact_df=dim, exact_key="seen_key")
        .select("event_id", "user_id", "event_type")
    )


def _q_frequent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters via pigeonhole candidates + CMS prune +
    exact recount (operators.sketch_agg.frequent_keys)."""
    from dablooms_spark.operators.sketch_agg import frequent_keys

    events = load_table(spark, sf_dir, "events")
    return frequent_keys(events, "user_id", min_count=30)


def _q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped distinct (grounds the HLL estimate query below)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.col("event_type").cast("string").alias("event_type")).agg(
        F.countDistinct("user_id").alias("distinct_users")
    )


def _q_hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate per group — approximate, rows-only driver check;
    accuracy vs exact is asserted in pytest within the published bound."""
    from dablooms_spark.operators.sketch_agg import approx_distinct_by

    events = load_table(spark, sf_dir, "events")
    return approx_distinct_by(events, "event_type", "user_id", p=14)


def _q_value_quantiles_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest per-group quantiles — approximate, rows-only check."""
    from dablooms_spark.operators.sketch_agg import quantiles_by

    events = load_table(spark, sf_dir, "events")
    return quantiles_by(
        events, "event_type", "value", [0.25, 0.5, 0.75, 0.99], kind="tdigest"
    )


def _q_value_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL per-group quantiles — approximate, rows-only check."""
    from dablooms_spark.operators.sketch_agg import quantiles_by

    events = load_table(spark, sf_dir, "events")
    return quantiles_by(events, "event_type", "value", [0.5, 0.9], kind="kll", k=200)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_semi_join_orders": _q_bloom_semi_join_orders,
        "bloom_anti_join_lineitem": _q_bloom_anti_join_lineitem,
        "scaling_bloom_membership": _q_scaling_bloom_membership,
        "frequent_users_events": _q_frequent_users,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "hll_distinct_by_type": _q_hll_distinct_by_type,
        "value_quantiles_tdigest": _q_value_quantiles_tdigest,
        "value_quantiles_kll": _q_value_quantiles_kll,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bloom_semi_join_orders": """
            SELECT o_orderkey, o_custkey
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_acctbal > 0
            )
        """,
        "bloom_anti_join_lineitem": """
            SELECT l_orderkey, l_linenumber, l_partkey
            FROM lineitem
            WHERE l_partkey NOT IN (
                SELECT p_partkey FROM part WHERE p_size <= 20
            )
        """,
        "scaling_bloom_membership": """
            WITH n AS (SELECT count(*) AS c FROM events),
            firsth AS (
                SELECT DISTINCT user_id || ':' || event_type AS seen_key
                FROM events, n WHERE event_id < n.c // 2
            )
            SELECT event_id, user_id, event_type
            FROM events, n
            WHERE event_id >= n.c // 2
              AND (user_id || ':' || event_type) IN (SELECT seen_key FROM firsth)
        """,
        "frequent_users_events": """
            SELECT CAST(user_id AS VARCHAR) AS user_id, count(*) AS cnt
            FROM events
            GROUP BY user_id
            HAVING count(*) >= 30
        """,
        "distinct_users_by_type": """
            SELECT CAST(event_type AS VARCHAR) AS event_type,
                   count(DISTINCT user_id) AS distinct_users
            FROM events
            GROUP BY event_type
        """,
        # hll_distinct_by_type / value_quantiles_* are approximate by
        # design → rows-only driver checks; pytest asserts accuracy
        # within each sketch's published error bound.
    }
