"""Relational demonstration queries — the surrounding-query surface the
sketch UDAFs ride on (SURVEY.md §2.7: projection/filter/join/agg are
Catalyst built-ins; we show pushdown, broadcast joins and grouped aggs
work around our operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.sources.tables import load


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter (pushed down) -> grouped agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicitly broadcast dimensions (nation/customer
    are small dims; lineitem-scale fact side never shuffles for the
    join at 100 TB — only for the final agg)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q04_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via window (rank by account balance)."""
    from pyspark.sql import Window as W

    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        customer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "rnk",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


def q05_bloom_semijoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-sketch semijoin: orders of customers in 3 nations. The
    fact side is pre-filtered by a Bloom blob of the selected customer
    keys BEFORE any shuffle (no false negatives -> result provably
    equals the plain join, which is what the oracle checks); at 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the ~selectivity fraction that joins."""
    from tdigest_spark.operators.sketch_join import bloom_semijoin

    # project BEFORE the bloom probe: mapInPandas is opaque to Catalyst,
    # so column pruning must happen ahead of it (PLANS.md §5)
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer")
    picked = customer.where(F.col("c_nationkey") < 3).select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = bloom_semijoin(orders, picked, "o_custkey")
    return joined.groupBy("c_nationkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_top_customers_per_nation": q04_top_customers_per_nation,
    "q05_bloom_semijoin_revenue": q05_bloom_semijoin_revenue,
}

ORACLES = {
    "q05_bloom_semijoin_revenue": """
        SELECT c_nationkey, round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey < 3
        GROUP BY c_nationkey
    """,
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q03_revenue_by_nation": """
        SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q04_top_customers_per_nation": """
        SELECT n_name, rnk, c_custkey, round(c_acctbal, 2) AS acctbal
        FROM (
          SELECT c_custkey, c_nationkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
          FROM customer
        )
        JOIN nation ON c_nationkey = n_nationkey
        WHERE rnk <= 3
    """,
}
