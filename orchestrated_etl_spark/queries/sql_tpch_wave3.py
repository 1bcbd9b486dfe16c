"""Third TPC-H wave: Q5/Q6/Q7/Q8/Q9/Q13/Q15/Q21/Q22 shapes adapted to the
driver's synthetic schema.

Gap-list coverage (the reference has no query language — SURVEY §3): these
shapes exercise the remaining Catalyst rewrites the earlier SQL families
(Q1/Q3/Q4/Q17 and Q10/Q14/Q18/Q19) didn't touch:

- Q5: a 6-table join chain with a NON-join equality (c_nationkey =
  s_nationkey) folded into the join graph — join-reorder + two broadcast
  dims + one fact shuffle.
- Q6: pure scan-filter-agg — the pushed-filter baseline every other plan
  is judged against (PushedFilters on l_shipdate should appear).
- Q7: a join producing BOTH sides' nations with a symmetric disjunctive
  pair filter — tests that the disjunction doesn't break the equi-join.
- Q8: market-share — conditional-sum ratio over a 7-table join, the
  one-pass formulation of "share of X within group".
- Q9: profit by (nation, year) over a LIKE-filtered part dim — LIKE
  pushdown plus a medium-cardinality group-by.
- Q13: outer-join + double aggregation (count per customer, then
  histogram of counts) — the classic "aggregate of an aggregate".
- Q15: CTE reused twice (per-supplier revenue vs its max) — tests CTE
  dedup/reuse rather than recompute.
- Q21: EXISTS + NOT EXISTS self-joins on the fact table at the same key —
  Catalyst turns both into semi/anti joins sharing one shuffle key.
- Q22: scalar aggregate subquery feeding a filter + anti-join against the
  fact — the "qualified but inactive" pattern.

Schema deltas vs real TPC-H (driver data has no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone/o_comment):
- Q9 profit omits ps_supplycost (no partsupp table).
- Q21's "kept waiting" predicate becomes l_returnflag = 'R' (no
  receipt/commit dates) — same EXISTS/NOT-EXISTS plan shape.
- Q22's "no orders in 7 years" becomes "no orders since 1999-01-01"
  (every synthetic customer has at least one order overall), and the
  country-code group becomes the nation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orchestrated_etl_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rev():
    # Built lazily: a module-level Column would need an active SparkContext
    # at import time, which tooling (QUERIES.md generation) doesn't have.
    # DECIMAL product of 2-decimal factors (scale 4, exact): sums of it are
    # order-independent, so compared doubles are engine-identical with no
    # round() needed.
    return F.col("l_extendedprice").cast("decimal(14,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(4,2)")


# ---------------------------------------------------------------------------
# Q5 shape — local supplier volume
# ---------------------------------------------------------------------------


def _q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from 1996 orders where the supplier and the customer sit in
    the same ASIA nation. nation+region and supplier/customer dims
    broadcast; lineitem->orders is the only big shuffle; the
    c_nationkey = s_nationkey equality is a post-join filter Catalyst
    keeps next to the join so mismatched rows die before the aggregate."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    )
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


register(
    "sql_q5_local_supplier_volume",
    _q5_local_supplier_volume,
    """
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
    GROUP BY 1
    ORDER BY revenue DESC, nation
    """,
)


# ---------------------------------------------------------------------------
# Q6 shape — forecast revenue change (scan-filter-agg baseline)
# ---------------------------------------------------------------------------


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + global aggregate on lineitem: the shipdate range and
    quantity bound reach the parquet scan as PushedFilters, the discount
    band prunes row-groups via min/max stats, and the whole plan is one
    WholeStageCodegen span with a single-row result — the cheapest
    possible shape at 100 TB (no shuffle at all beyond the final 1-row
    exchange)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


register(
    "sql_q6_forecast_revenue",
    _q6_forecast_revenue,
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations
# ---------------------------------------------------------------------------


def _q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between NATION_1 and NATION_2 in both directions,
    by ship year. Both nation dims broadcast under distinct aliases; the
    symmetric pair predicate is a residual filter on the joined row, not
    a join-condition disjunction, so the two big joins stay plain hash
    joins."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(
    "sql_q7_volume_shipping",
    _q7_volume_shipping,
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)


# ---------------------------------------------------------------------------
# Q8 shape — national market share (conditional-sum ratio over 7 tables)
# ---------------------------------------------------------------------------


def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of ECONOMY-part revenue sold into ASIA, by order
    year. The share is a conditional sum over one joined pass — never a
    second scan of lineitem. Customer nation restricts to the ASIA
    region (broadcast chain nation->region); the supplier nation only
    feeds the CASE, so it joins by key without filtering."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # no .otherwise(0.0): a double ELSE would coerce the whole CASE to
    # double and lose the exact-decimal accumulation; sum skips NULLs.
    nation_rev = F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()))
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (nation_rev.cast("double") / F.sum(_rev()).cast("double")).alias(
                "mkt_share"
            ),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


register(
    "sql_q8_market_share",
    _q8_market_share,
    """
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                         THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                              * CAST(1 - l.l_discount AS DECIMAL(4,2))
                         END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                            * CAST(1 - l.l_discount AS DECIMAL(4,2)))
                        AS DOUBLE)
               AS mkt_share,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN region r ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
    GROUP BY 1
    ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Q9 shape — product-type profit by nation and year
# ---------------------------------------------------------------------------


def _q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from parts whose name contains 'red', by supplier nation
    and order year. (Real Q9 subtracts ps_supplycost; the synthetic
    schema has no partsupp, so profit degrades to discounted revenue —
    the join/group shape is unchanged.) The LIKE filter prunes the part
    dim BEFORE broadcast, so the fact-side hash probe only carries
    matching partkeys."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(_rev()).cast("double").alias("sum_profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


register(
    "sql_q9_product_profit",
    _q9_product_profit,
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS sum_profit,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution (aggregate of an aggregate)
# ---------------------------------------------------------------------------


def _q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer, keeping zero-order customers via
    a left outer join. (The o_comment NOT LIKE filter of real Q13 becomes
    an o_orderpriority filter — same outer-join-with-filtered-right
    shape.) Two aggregations: the first shuffles on custkey, the second
    on the tiny count domain — AQE collapses the second into a handful
    of partitions."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    "sql_q13_order_count_distribution",
    _q13_order_count_distribution,
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


# ---------------------------------------------------------------------------
# Q15 shape — top supplier(s) by quarterly revenue (CTE reused twice)
# ---------------------------------------------------------------------------


def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose 1996Q1 revenue equals the maximum. The revenue CTE
    is referenced twice (rows + its max); expressing it once lets Spark
    reuse the exchange instead of recomputing the aggregate. Revenue is
    rounded to 2dp BEFORE the max-equality so the comparison is exact
    across engines."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(
            supplier, F.col("supplier_no") == F.col("s_suppkey")
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


register(
    "sql_q15_top_supplier",
    _q15_top_supplier,
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                        * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM revenue r
    JOIN supplier s ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY suppkey
    """,
)


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


def _q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for a returned line in a
    multi-supplier order. (Real Q21's receipt>commit lateness predicate
    maps to l_returnflag = 'R' — the synthetic schema has no receipt or
    commit dates; the EXISTS/NOT-EXISTS plan shape is identical.) Both
    the EXISTS (another supplier touched the order) and the NOT EXISTS
    (no other supplier's line was returned) become semi/anti joins on
    l_orderkey, sharing the shuffle key with the outer scan, so the
    fact table shuffles once per branch and never nested-loops."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supplier = _t(spark, sf_dir, "supplier")
    l1 = lineitem.where(F.col("l_returnflag") == "R")
    other = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_returned = lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r2_orderkey"),
        F.col("l_suppkey").alias("r2_suppkey"),
    )
    return (
        l1.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            other,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_returned,
            (F.col("r2_orderkey") == F.col("l_orderkey"))
            & (F.col("r2_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "name")
        .limit(20)
    )


register(
    "sql_q21_waiting_supplier",
    _q21_waiting_supplier,
    """
    SELECT s.s_name AS name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY 1
    ORDER BY numwait DESC, name
    LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# Q22 shape — global sales opportunity (scalar subquery + anti-join)
# ---------------------------------------------------------------------------


def _q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy-but-inactive customers per nation: account balance above
    the mean positive balance, and no order since 1999-01-01. Issued as
    SQL text so the uncorrelated average plans as a true ScalarSubquery
    (evaluated once, its 1-row result injected into the filter) rather
    than a nested-loop join; the NOT EXISTS decorrelates to an anti-join
    against a date-filtered orders projection — at 100 TB the orders side
    prunes to the recent partitions before the anti-join."""
    for t in ("customer", "orders", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q22")
    return spark.sql(
        """
        SELECT n.n_name AS nation, count(*) AS numcust,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                   AS totacctbal
        FROM customer_q22 c
        JOIN nation_q22 n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (
            SELECT avg(c_acctbal) FROM customer_q22 WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders_q22 o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01'
        )
        GROUP BY 1
        ORDER BY nation
        """
    )


# ---------------------------------------------------------------------------
# Q12 shape — shipping classes and order priority
# ---------------------------------------------------------------------------


def _q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted to the synthetic schema (no l_shipmode/l_commitdate/
    l_receiptdate — TPC-H Q12's late-shipment predicate and mode column
    don't exist): l_returnflag stands in as the shipping class and the
    date window runs on l_shipdate. The plan shape Q12 exercises is
    intact — one fact-fact equi-join (orders⋈lineitem on orderkey, the
    only non-broadcast join in the TPC-H set) feeding disjunctive
    conditional counts per class. The orderkey join carries the shuffle;
    the shipdate range predicate pushes into the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


register(
    "sql_q12_shipmode_priority",
    _q12_shipmode_priority,
    """
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)


register(
    "sql_q22_sales_opportunity",
    _q22_sales_opportunity,
    """
    SELECT n.n_name AS nation, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
    )
    GROUP BY 1
    ORDER BY nation
    """,
)
