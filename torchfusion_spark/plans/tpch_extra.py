"""The remaining TPC-H-shaped queries (Q8/9/11/13/15/16/17/20/22).

Completes the decision-support sweep started in ``relational.py`` /
``relational2.py`` so every classic TPC-H plan shape is witnessed:
nested-aggregate market share, multi-join profit rollup, HAVING against a
global scalar subquery, outer-join distribution, view-over-aggregate max,
NOT-IN with grouped distinct counts, correlated-average filters, grouped
IN-subqueries, and anti-join customer analysis.

Schema adaptations (driver testdata is a slim TPC-H: no partsupp, no
c_phone/o_comment/l_commitdate): the part-supplier link is
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``; supply cost is
proxied by ``p_retailprice``; country codes come from ``c_nationkey``;
q13's comment filter becomes an order-priority filter. Plan shapes —
the thing these queries witness — are unchanged.

Both dialects run the identical ANSI string (Catalyst and DuckDB each
plan it natively), so the gate checks engine semantics, not
transcription. Money aggregates follow the DECIMAL(12,2)-exact →
DOUBLE-at-the-end discipline; EXTRACT/COUNT outputs are cast to
BIGINT explicitly (DuckDB HUGEINT/Spark INT drift otherwise).

Scale notes: every join here is either fact-to-dim (broadcastable —
part/supplier/nation/region/customer all tiny relative to lineitem) or
fact-to-derived-aggregate where the aggregate shrinks the fact first;
correlated subqueries decorrelate into aggregate joins under Catalyst
(plan-shape assertions in tests/test_utility_sql.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torchfusion_spark.plans.registry import bcast_dim, fits_broadcast, query


def _both(name: str, sql: str, doc: str):
    """Register ``sql`` as both the Spark plan and the DuckDB oracle."""

    @query(name, sql, doc=doc)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        return spark.sql(_sql)

    return run


_both(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(ROUND(CAST(SUM(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY')
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: 8-way join, nation market share as a ratio of "
    "conditional to total aggregate per year",
)

_both(
    "q9_product_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1)) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%ring%')
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (supply cost proxied by p_retailprice/10 — no "
    "partsupp in the driver schema): profit rollup by nation and year "
    "over a 5-way join with a LIKE part filter",
)

_both(
    "q11_important_stock",
    """
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7'
        GROUP BY l_partkey)
    WHERE value > (
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 0.001
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7')
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (part-supplier value via lineitem — no partsupp): "
    "grouped aggregate filtered against a global scalar-subquery fraction",
)

@query(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (comment filter adapted to order priority): "
    "outer-join count distribution — Spark plan pre-aggregates orders "
    "so the fact reduces map-side before the outer join",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan (round 4): the textbook form outer-joins the full
    orders fact into customer and THEN counts — the fact crosses the
    exchange at row grain. Counting per o_custkey first reduces orders
    map-side (partial count before the shuffle) to customer cardinality;
    the outer join then moves two customer-sized relations and the
    no-orders case becomes COALESCE(cnt, 0). No forced broadcast — at
    gate sf AQE broadcasts the count side; at 100 TB (counts are
    customer-cardinality) it re-plans to a co-partitioned join. Same
    result as COUNT(o_orderkey) since o_orderkey is never null. Oracle
    unchanged."""
    from pyspark.sql import functions as F

    cnt = (
        spark.table("orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        spark.table("customer")
        .join(cnt, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )

_both(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: revenue view referenced twice (join + scalar max) "
    "— the classic view-over-aggregate top-1 pattern",
)

_both(
    "q16_parts_supplier",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 2, 3, 4, 5, 11, 14, 19)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (complaint filter adapted to negative acctbal): "
    "NOT-IN anti-join + grouped COUNT DISTINCT over the derived "
    "part-supplier relation",
)

@query(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                      / 7.0, 6) AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated average subquery on the fact table — "
    "Spark plan rewrites it to a window average (single fact shuffle)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan (round 4): Catalyst decorrelates the textbook form into
    an aggregate joined back to the fact — TWO lineitem passes and a
    SortMergeJoin once the per-part aggregate outgrows the broadcast
    threshold (observed at sf1). The correlated average is exactly a
    window over the part key: broadcast-join the (tiny, filtered) part
    dim, AVG OVER (PARTITION BY l_partkey), filter, one global sum. The
    join keeps every lineitem row of each qualifying part, so the window
    mean equals the subquery mean; ONE shuffle of the projected fact,
    no self-join at any scale. Oracle unchanged (DuckDB runs the
    textbook correlated form)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    p = spark.table("part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    joined = (
        spark.table("lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(bcast_dim(spark, p.select("p_partkey"), "part"), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0, 6
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )

@query(
    "q20_potential_promotion",
    """
    SELECT s_name, s_suppkey
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape (availability threshold adapted to shipped "
    "quantity — no partsupp): IN-subquery over a grouped HAVING "
    "aggregate, collapsed to distinct supplier keys on the Spark side",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan (round 4): the IN-subquery decorrelates to a left-semi
    join of (tiny) supplier against the fact-sized (suppkey, partkey)
    HAVING aggregate — a SortMergeJoin, because a left-semi cannot
    broadcast its preserved side. But IN only needs the DISTINCT
    supplier keys, bounded by supplier cardinality, not the fact — and
    once the key set is distinct, INNER join ≡ semi join, which frees
    the planner to broadcast EITHER side: statically it broadcasts the
    supplier dim; at a scale where both sides are huge it degrades to a
    co-partitioned join on the key. Part filter broadcast; one fact
    shuffle for the HAVING aggregate; no SMJ at any audited scale.
    Oracle unchanged."""
    from pyspark.sql import functions as F

    qual = (
        spark.table("lineitem")
        .join(
            bcast_dim(
                spark,
                spark.table("part").filter(F.col("p_name").like("small%")).select("p_partkey"),
                "part",
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    sup = (
        spark.table("supplier")
        .join(
            F.broadcast(spark.table("nation").filter(F.col("n_name") == "NATION_9")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "s_suppkey")
    )
    # stats-gated hint (bcast_dim): sup is dim-sized by construction, but
    # as a JOIN result its static size estimate is the product of its
    # inputs, which would push it past the broadcast threshold toward SMJ
    # — gate on the base supplier table's own file-size stats instead
    sup = bcast_dim(spark, sup, "supplier")
    return (
        qual.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )

_both(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (
        SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_nationkey % 10 IN (1, 3, 5, 7)
          AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT'))
    GROUP BY cntrycode ORDER BY cntrycode
    """,
    doc="TPC-H Q22 shape (country code from c_nationkey — no c_phone; "
    "anti-join on urgent orders so the slim testdata yields rows): "
    "global-average scalar subquery + NOT EXISTS anti-join on orders",
)
