"""Full TPC-H-style decision-support suite, adapted to the driver schema.

The reference has zero joins/aggregations (SURVEY.md §2.4 — `server.py`
is pure key-value CQL), so the analytical surface comes from the north
star. This module completes the TPC-H-shaped coverage begun in
``analytics.py``/``analytics_ext.py`` (q1/q3/q4/q5/q6/q10/q12) with the
remaining query shapes: multi-nation volume joins, market share, profit
attribution, outer-join distributions, conditional-aggregate ratios,
view-over-aggregate top-1, distinct-supplier counts, correlated
below-avg filters, large-volume HAVING, OR-of-conjunctions pushdown,
exists/not-exists chains, and anti-join + scalar-subquery opportunity.

Adaptations (driver testdata lacks partsupp, l_commitdate/receiptdate,
c_phone, p_container/p_mfgr — see TESTDATA.md):

- q9: cost basis is ``p_retailprice * l_quantity * 0.6`` instead of
  ``ps_supplycost`` (no partsupp table).
- q16: distinct suppliers counted from lineitem shipments, not partsupp.
- q21: "kept waiting" reformulated with return flags: the sole supplier
  with a returned ('R') line on a multi-supplier order.
- q22: country code is the last digit of ``c_name`` (no c_phone).

Scale notes (100 TB discipline): ``F.broadcast`` hints ONLY on tables
whose size is bounded by the schema, not the data volume — nation (25
rows), region (5), and single-row scalar aggregates. SF-scaled tables
(part/customer/supplier grow linearly with the corpus: billions of rows
at 100 TB) and fact-derived aggregates carry NO hint — AQE sees their
true post-filter size at runtime and broadcasts exactly when they fit,
so the same plan text is correct at every scale. Fact-fact joins
shuffle once on the join key; top-1 / top-N uses TakeOrderedAndProject
(sort+limit), never a full global sort of the fact; conditional ratios
are single-pass ``sum(when(...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cassandrastack_spark.queries import register
from cassandrastack_spark.sources.io import read_table as _t


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(YEAR(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                 AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bilateral trade volume by year. Both nation dims "
        "broadcast; the OR-pair predicate is applied post-join on the "
        "broadcast columns so the fact scan shuffles only on orderkey.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                     / SUM(volume), 4) AS mkt_share
        FROM (
            SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8: market share of NATION_2 suppliers in ASIA-customer "
        "ECONOMY-part sales — conditional-sum ratio in one aggregation "
        "pass (no second scan, no self-join).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit attribution (adapted: retailprice cost basis)
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle="""
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(YEAR(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_type IN ('ECONOMY', 'PROMO')
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (adapted — no partsupp in testdata, cost basis is "
        "0.6*p_retailprice): profit by supplier nation and order year. "
        "Part/supplier/nation broadcast; one fact-fact shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").isin("ECONOMY", "PROMO"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join)
# ---------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey,
                   CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: two-level aggregation over a left outer join — "
        "customers with zero qualifying orders must appear (count=0), "
        "which an inner join would silently drop.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue ratio
# ---------------------------------------------------------------------------

@register(
    "q14_promo_revenue",
    oracle="""
        SELECT ROUND(
                 100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                        / SUM(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
    doc="TPC-H Q14: percentage of revenue from PROMO parts in one month "
        "— broadcast part join, conditional-sum ratio, single row out.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-02-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                     AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: view-over-aggregate + max-subquery. The per-supplier "
        "revenue aggregate feeds both the max scalar (broadcast, 1 row) "
        "and the final join; exchange reuse typically collapses the two "
        "subtrees into one computation (not guaranteed across plan "
        "shapes — persist() the view if a profile shows it doubled).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part attribute (adapted: via lineitem)
# ---------------------------------------------------------------------------

@register(
    "q16_parts_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (adapted — supplier relationships come from lineitem "
        "shipments, no partsupp): distinct-supplier count per part "
        "attribute triple with NOT-predicates and an IN-list.",
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated below-avg filter)
# ---------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    oracle="""
        SELECT ROUND(SUM(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#3'
          AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
    """,
    doc="TPC-H Q17: lineitems below half the part's average quantity. "
        "Decorrelated to a per-part avg aggregate joined back — the agg "
        "runs over only the Brand#3 partkeys via a semi-join pushdown.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = _t(spark, sf_dir, "lineitem")
    # Correlated subquery scope: AVG over ALL lineitems of the partkey
    # (not just Brand#3 rows) — but only partkeys that can match matter,
    # so prune the agg input with a semi-join first (AQE broadcasts the
    # key side when the post-filter size fits; no static hint, since
    # Brand#3 partkeys scale with SF).
    brand_keys = p.select("p_partkey")
    avgs = (
        li.join(brand_keys, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avgs, li.l_partkey == F.col("k"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over fact agg)
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume_customer",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 140)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18: orders whose total quantity exceeds 140 — HAVING "
        "aggregate as a semi-join filter, then re-aggregate with the "
        "customer dim broadcast; top-100 via sort+limit.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 140)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (OR-of-conjunctions pushdown)
# ---------------------------------------------------------------------------

@register(
    "q19_discounted_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 45
               AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 (adapted — no p_container): disjunction of "
        "brand/size/quantity conjunctions. The part-only disjuncts are "
        "pushable to the broadcast side; the mixed predicate evaluates "
        "post-join inside codegen.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 45)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q21 — sole returned-supplier on multi-supplier orders (exists/not-exists)
# ---------------------------------------------------------------------------

@register(
    "q21_sole_returned_supplier",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21 (adapted — no receipt/commit dates; 'kept waiting' "
        "becomes 'sole supplier with a returned line'): the exists / "
        "not-exists pair is computed as ONE per-order aggregate over "
        "lineitem (distinct suppliers + distinct returned suppliers) "
        "instead of two correlated self-joins — one shuffle, not three.",
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    # Per-order supplier stats replace both correlated subqueries:
    #   EXISTS other-supplier      <=> n_suppliers >= 2
    #   NOT EXISTS other-returned  <=> the only returned supplier is l1's
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_ret_suppliers"),
            F.max(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("ret_supp"),
        )
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_ret_suppliers") == 1))
        .select("l_orderkey", "ret_supp")
    )
    # Each qualifying l1 ROW counts (SQL COUNT(*) semantics) — no distinct.
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("f_orderkey"), F.col("l_suppkey").alias("f_suppkey")
    )
    return (
        l1.join(
            per_order,
            (F.col("f_orderkey") == per_order.l_orderkey)
            & (F.col("f_suppkey") == per_order.ret_supp),
        )
        .join(o, F.col("f_orderkey") == o.o_orderkey)
        .join(s, F.col("f_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + scalar subquery)
# ---------------------------------------------------------------------------

@register(
    "q22_sales_opportunity",
    oracle="""
        SELECT cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM (
            SELECT SUBSTR(c_name, 18, 1) AS cntrycode, c_acctbal
            FROM customer
            WHERE SUBSTR(c_name, 18, 1) IN ('1', '3', '5', '7', '9')
              AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                               WHERE c_acctbal > 0
                                 AND SUBSTR(c_name, 18, 1)
                                     IN ('1', '3', '5', '7', '9'))
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '1999-01-01')
        ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
    doc="TPC-H Q22 (adapted — country code is the last c_name digit, no "
        "c_phone; 'no orders ever' relaxed to 'none since 1999' so the "
        "result is non-empty at every SF): above-average-balance dormant "
        "customers. Scalar avg broadcast as a 1-row cross join; anti "
        "join against recent orders' custkeys.",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 18, 1)
    ).filter(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q2-shape — best supplier per part in a region (window min-by, adapted)
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
        SELECT p_partkey, p_brand, s_name, n_name,
               ROUND(min_price, 2) AS min_price
        FROM (
            SELECT p_partkey, p_brand, s_name, n_name,
                   MIN(l_extendedprice / l_quantity)
                     OVER (PARTITION BY p_partkey) AS regional_min,
                   l_extendedprice / l_quantity AS min_price,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_partkey
                       ORDER BY l_extendedprice / l_quantity, s_suppkey
                   ) AS rn
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND p_size = 15
        ) ranked
        WHERE rn = 1
        ORDER BY p_partkey
    """,
    doc="TPC-H Q2 (adapted — unit price from lineitem, no partsupp): "
        "cheapest EUROPE supplier per size-15 part. The correlated "
        "min-subquery becomes one window pass (row_number over partkey "
        "ordered by unit price) — no re-join of the agg back to the fact.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    w = Window.partitionBy("p_partkey").orderBy(unit.asc(), F.col("s_suppkey").asc())
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_brand", "s_name", "n_name",
            F.round(unit, 2).alias("min_price"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q11-shape — high-value shipped inventory per nation (adapted)
# ---------------------------------------------------------------------------

@register(
    "q11_important_volume",
    oracle="""
        WITH nation_part AS (
            SELECT n_name, l_partkey,
                   SUM(l_extendedprice * l_quantity) AS value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY n_name, l_partkey)
        SELECT n_name, l_partkey, ROUND(value, 2) AS value
        FROM nation_part
        WHERE value > (SELECT 3 * AVG(value) FROM nation_part)
        ORDER BY value DESC, n_name, l_partkey
    """,
    doc="TPC-H Q11 (adapted — shipped volume instead of partsupp stock): "
        "nation/part volumes above 3x the average group volume (an "
        "avg-relative threshold stays non-empty at every SF, unlike "
        "TPC-H's fixed fraction). The scalar threshold re-aggregates "
        "the SAME grouped subtree (self-referencing CTE); exchange "
        "reuse typically computes it once (not guaranteed across plan "
        "shapes — persist() the CTE if a profile shows it doubled).",
)
def q11_important_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    nation_part = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    threshold = nation_part.agg((3 * F.avg("value")).alias("thr"))
    return (
        nation_part.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select("n_name", "l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.desc("value"), "n_name", "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q20-shape — suppliers with heavy shipments of a part type (semi-join chain)
# ---------------------------------------------------------------------------

@register(
    "q20_heavy_shippers",
    oracle="""
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_type = 'SMALL'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 400)
        ORDER BY s_name
    """,
    doc="TPC-H Q20 (adapted — shipment volume instead of partsupp "
        "availability): suppliers who shipped >400 units of SMALL parts "
        "in 1996. HAVING-aggregate feeding a broadcast semi-join.",
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 400)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
