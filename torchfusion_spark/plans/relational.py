"""Relational parity sweep — SURVEY §2-B/§2-C operator families, each
witnessed by a named query with a DuckDB oracle.

Builders use the DataFrame API (the engine's native surface); oracles are
DuckDB SQL over the same parquet views. Money/quantity aggregates go
through DECIMAL(12,2) so partial-aggregation order cannot perturb the
result (Spark sums decimals exactly, as does DuckDB) and are cast to
DOUBLE at the end on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from torchfusion_spark.plans.registry import bcast_dim, query

D = "decimal(12,2)"


def dec(c: str | Column) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(D)


def dsum(expr: Column, alias: str) -> Column:
    """Exact (decimal) sum surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


# --------------------------------------------------------------------------
# TPC-H-shaped analytics (adapted to the driver schema)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan→filter→partial/final hash agg→sort (SURVEY §2-C agg)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'MACHINERY'
      AND o_orderdate < TIMESTAMP '1999-03-15'
      AND l_shipdate > TIMESTAMP '1999-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join (dims broadcastable)→agg→TopK",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1999-03-15").cast("timestamp")
    c = spark.table("customer").filter(F.col("c_mktsegment") == "MACHINERY")
    o = spark.table("orders").filter(F.col("o_orderdate") < cutoff)
    l = spark.table("lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast_dim(spark, c, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS decorrelated to left-semi join",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = spark.table("lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join; dims broadcast, fact shuffles once",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = spark.table("lineitem")
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast_dim(spark, c, "customer"), o.o_custkey == c.c_custkey)
        .join(
            bcast_dim(spark, s, "supplier"),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q6_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan+filter+single agg; all predicates push to parquet",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(dec("l_extendedprice") * dec("l_discount"), "revenue"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: join→agg→TopK with passthrough dims",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    n = spark.table("nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast_dim(spark, c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14 shape: fact-dim join + conditional aggregation",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = spark.table("part")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0).cast(D))
    return (
        l.join(bcast_dim(spark, p, "part"), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc_price).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: agg-HAVING subquery feeding a semi-filter join",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan (round 4): the textbook form scans lineitem twice (the
    HAVING subquery + the outer re-aggregation), but every outer group
    key is a function of the order key, so the HAVING aggregate ALREADY
    IS the output ``sum_qty`` — aggregate lineitem once per order,
    filter, and join the survivors to orders/customer. One lineitem scan
    and ONE big shuffle (the per-order agg, map-side combined); the
    HAVING filter collapses the agg output to a sliver, which AQE then
    broadcasts into the orders join (no forced hint — at 100 TB the
    survivor count grows with sf and AQE re-plans to shuffle when it
    must). Measured 5.0s → ~2× faster at sf1; identical results (oracle
    unchanged — DuckDB still runs the textbook two-scan form)."""
    l = spark.table("lineitem")
    per_order = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qsum"))
        .filter(F.col("qsum") > 150)
    )
    o = spark.table("orders")
    c = spark.table("customer")
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(bcast_dim(spark, c, "customer"), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("qsum").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    doc="TPC-H Q19 shape: join with complex OR-of-AND residual predicate",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    p = spark.table("part")
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return (
        l.join(bcast_dim(spark, p, "part"), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# Join type family
# --------------------------------------------------------------------------


@query(
    "join_inner",
    """
    SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_name
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, r = spark.table("nation"), spark.table("region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_name", "r_name")
        .orderBy("n_name")
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="left outer join preserving unmatched customers (count=0)",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = spark.table("customer"), spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    """
    SELECT n_nationkey, s_suppkey
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    ORDER BY n_nationkey NULLS LAST, s_suppkey NULLS LAST
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, s = spark.table("nation"), spark.table("supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "full_outer")
        .select("n_nationkey", "s_suppkey")
        .orderBy(F.col("n_nationkey").asc_nulls_last(), F.col("s_suppkey").asc_nulls_last())
    )


@query(
    "join_semi",
    """
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    o = spark.table("orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey").orderBy("c_custkey")
    )


@query(
    "join_anti",
    """
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = spark.table("customer"), spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey").orderBy("c_custkey")
    )


@query(
    "join_cross",
    """
    SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
    ORDER BY r1, r2
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = spark.table("region")
    a, b = r.alias("a"), r.alias("b")
    return (
        a.crossJoin(b)
        .select(F.col("a.r_name").alias("r1"), F.col("b.r_name").alias("r2"))
        .orderBy("r1", "r2")
    )


@query(
    "join_theta",
    """
    SELECT s_suppkey, COUNT(*) AS n_richer
    FROM supplier JOIN customer ON c_acctbal > s_acctbal
    GROUP BY s_suppkey ORDER BY s_suppkey
    """,
    doc="non-equi (theta) join → broadcast nested loop",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, c = spark.table("supplier"), spark.table("customer")
    # stats-gated: supplier grows with scale factor and AQE never demotes
    # an explicit hint — an unconditional broadcast here would ship the
    # whole table to every executor at fact scale (registry policy)
    return (
        c.join(bcast_dim(spark, s, "supplier"), c.c_acctbal > s.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------


@query(
    "agg_distinct_count",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_discount), 6) AS sd_disc,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(AVG(CAST(l_tax AS DECIMAL(12,2))), 6) AS avg_tax
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="statistical aggregates; rounded since merge order perturbs low bits",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.avg(dec("l_tax")), 6).cast("double").alias("avg_tax"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_minmax_first",
    """
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_minmax_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_string_agg",
    """
    SELECT r_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey ORDER BY r_regionkey
    """,
    doc="ordered string aggregation (array_agg/string_agg family)",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, r = spark.table("nation"), spark.table("region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
        .orderBy("r_regionkey")
    )


@query(
    "agg_bool",
    """
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1000) AS all_over_1k,
           BOOL_OR(o_totalprice > 400000) AS any_over_400k
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    doc="ROLLUP + grouping() (SURVEY §2-C grouping sets family)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last(), F.col("l_linestatus").asc_nulls_last())
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(), F.col("o_orderpriority").asc_nulls_last()
        )
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
        """
    )


@query(
    "agg_median",
    """
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 4) AS med_price,
           ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="exact median / continuous quantile",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_extendedprice"), 4).alias("med_price"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Window family
# --------------------------------------------------------------------------


@query(
    "win_ranking",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
           NTILE(4)      OVER w AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC, l_orderkey, l_linenumber)
    QUALIFY rn <= 5
    ORDER BY l_returnflag, rn
    """,
    doc="ranking window functions + top-N per group",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    wu = W.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    wt = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.row_number().over(wu).alias("rn"),
            F.rank().over(wt).alias("rnk"),
            F.dense_rank().over(wt).alias("drnk"),
            F.ntile(4).over(wu).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("l_returnflag", "rn")
    )


@query(
    "win_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           CAST(LAG(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        spark.table("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    doc="ROWS frame running total (unique ORDER keys → deterministic)",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spark.table("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey)  OVER w AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        spark.table("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_range_frame",
    """
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           COUNT(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
    FROM orders ORDER BY o_orderkey
    """,
    doc="RANGE frame (value-based window); deterministic under ties by definition",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.orderBy("o_totalprice").rangeBetween(-1000, W.currentRow)
    return (
        spark.table("orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.count(F.lit(1)).over(w).alias("n_within_1k"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "setop_union_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).orderBy("nationkey")


@query(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "setop_except",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = spark.table("nation").select(F.col("n_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract IS SQL EXCEPT (distinct, absent-if-present-at-all);
    # exceptAll(s.distinct()).distinct() only coincides when the left
    # side is unique — repointing at a non-unique relation would keep
    # rows the oracle excludes
    return n.subtract(s).orderBy("nationkey")


@query(
    "setop_intersect_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ORDER BY k
    """,
    doc="INTERSECT ALL (bag semantics)",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b).orderBy("k")


@query(
    "setop_except_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ORDER BY k
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b).orderBy("k")


# --------------------------------------------------------------------------
# Subqueries / CTEs / sort-limit-offset
# --------------------------------------------------------------------------


@query(
    "subq_scalar",
    """
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
    ORDER BY c_custkey
    """,
    doc="uncorrelated scalar subquery (avg computed via exact decimal sum)",
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "subq_correlated_scalar",
    """
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c_custkey
    """,
    doc="correlated scalar subquery (decorrelated to join by Catalyst)",
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        """
    )


@query(
    "subq_in",
    """
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > 350000
    ORDER BY o_orderkey
    """,
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > 350000
        ORDER BY o_orderkey
        """
    )


@query(
    "subq_not_in",
    """
    SELECT p_partkey FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    ORDER BY p_partkey
    """,
)
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT p_partkey FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        ORDER BY p_partkey
        """
    )


@query(
    "cte_chained",
    """
    WITH seg AS (
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), spend AS (
        SELECT c_mktsegment, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders JOIN seg ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey
    )
    SELECT c_mktsegment, COUNT(*) AS n_cust, CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS segment_total
    FROM spend GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="chained CTEs (WITH) + two-level aggregation",
)
def cte_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH seg AS (
            SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ), spend AS (
            SELECT c_mktsegment, o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
            FROM orders JOIN seg ON o_custkey = c_custkey
            GROUP BY c_mktsegment, o_custkey
        )
        SELECT c_mktsegment, COUNT(*) AS n_cust, CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS segment_total
        FROM spend GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@query(
    "sort_limit_offset",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 10
    """,
    doc="multi-key sort + LIMIT/OFFSET (TopK fusion)",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(25)
    )


@query(
    "sort_nulls_ordering",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE CAST(o_totalprice AS DOUBLE) END AS maybe_price
    FROM orders
    ORDER BY maybe_price DESC NULLS FIRST, o_orderkey
    LIMIT 50
    """,
    doc="NULLS FIRST/LAST ordering semantics",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.table("orders")
    maybe = (
        F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice").cast("double"))
        .alias("maybe_price")
    )
    return (
        o.select("o_orderkey", maybe)
        .orderBy(F.col("maybe_price").desc_nulls_first(), "o_orderkey")
        .limit(50)
    )


@query(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="pivot (oracle expressed as conditional counts)",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "values_inline_table",
    """
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag) ORDER BY id
    """,
    doc="inline VALUES relation",
)
def values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS t(id, tag) ORDER BY id")
