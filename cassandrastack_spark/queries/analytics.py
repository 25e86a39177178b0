"""Analytical query catalog over the star schema (SURVEY.md §2.4 surface).

The reference itself has no joins/aggs/windows (SURVEY.md §2.4 — verified
zero instances in ``server.py``); this module supplies the analytical
surface the north star requires, every query a declarative DataFrame plan
(Catalyst does pushdown/pruning/join-selection) with a DuckDB oracle.

Reference-parity analogues are marked: R1 (single-partition ordered scan,
``server.py:98,185``), R3 (projection scan, ``server.py:217``), R4 (point
lookup, ``server.py:250``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cassandrastack_spark.operators.asof import asof_join
from cassandrastack_spark.operators.windows import (
    range_join_pairs,
    sessionize,
    top_n_per_group,
)
from cassandrastack_spark.queries import register
from cassandrastack_spark.sources.io import read_table as _t


# ---------------------------------------------------------------------------
# Scans: point lookup / projection / partition scan  (R1, R3, R4 analogues)
# ---------------------------------------------------------------------------

@register(
    "point_lookup",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               ROUND(o_totalprice, 2) AS total, o_orderpriority
        FROM orders WHERE o_orderkey = 42
    """,
    doc="R4 analogue (server.py:250): primary-key point lookup; pushdown "
        "prunes the scan to row groups whose min/max contain the key.",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"), "o_orderpriority",
        )
    )


@register(
    "projection_scan",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer WHERE c_acctbal > 1000
    """,
    doc="R3 analogue (server.py:217): column-pruned scan with a row "
        "predicate; ReadSchema carries only 4 of 5 columns.",
)
def projection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 1000)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "partition_scan_ordered",
    oracle="""
        SELECT event_id, ts, event_type, ROUND(value, 2) AS value
        FROM events WHERE user_id = 7
        ORDER BY ts DESC, event_id DESC
    """,
    doc="R1 analogue (server.py:98 + clustering order server.py:185): all "
        "rows of one partition key, newest-first.",
)
def partition_scan_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .select(
            "event_id", "ts", "event_type", F.round("value", 2).alias("value")
        )
        .orderBy(F.desc("ts"), F.desc("event_id"))
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
               ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
               ROUND(AVG(l_discount), 4)                                        AS avg_disc,
               CAST(COUNT(*) AS BIGINT)                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary — the flagship aggregate: full fact scan, "
        "map-side partial agg, tiny shuffle (|flag|x|status| groups).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
               CAST(COUNT(*) AS BIGINT)                    AS n_customers,
               ROUND(SUM(c_acctbal), 2)                    AS total_bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="GROUP BY with exact distinct aggregation (expand+two-phase agg in "
        "Spark; approx_count_distinct is the 100TB-scale alternative).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "rollup_acctbal",
    oracle="""
        SELECT r_name, n_name,
               CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers,
               ROUND(SUM(s_acctbal), 2)         AS total_bal
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN supplier ON s_nationkey = n_nationkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    doc="ROLLUP grouping-set aggregation over a broadcast-joined dim chain.",
)
def rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    joined = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@register(
    "cube_orders",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE over two dims — all 4 grouping sets in one pass.",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01'
          AND l_shipdate  > TIMESTAMP '1999-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3: facts shuffle on orderkey; customer is SF-scaled so "
        "its join is left to AQE (auto-broadcast at small SF, shuffle "
        "at 100 TB); agg, global top-10 (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5: six-way join; bounded dims (nation/region) broadcast, "
        "SF-scaled customer/supplier left to AQE, facts shuffle once on "
        "orderkey; Catalyst CBO orders the join tree.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "anti_join_no_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        ORDER BY c_custkey
    """,
    doc="Left-anti join: customers with no order since 2000 (hash anti "
        "join; the filter is pushed below the join build side).",
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "semi_join_open_orders",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey
    """,
    doc="Left-semi join: customers with at least one open order.",
)
def semi_join_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "correlated_above_avg",
    oracle="""
        SELECT o_orderkey, o_custkey FROM orders o
        WHERE o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice)
                                    FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
    """,
    doc="Correlated scalar subquery (decorrelated to an agg+join by "
        "Catalyst; written as the explicit join it decorrelates to).",
)
def correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    avgs = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        o.join(avgs, o.o_custkey == avgs.k)
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )


@register(
    "asof_join_latest_order",
    oracle="""
        SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    doc="As-of join (operators/asof.py): newest order at-or-before each "
        "event, per user — one shuffle via the union-sort trick, vs "
        "DuckDB's native ASOF JOIN as oracle.",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join(
        e, o,
        left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        payload_cols=["o_orderdate"],
    )
    return (
        out.select(
            "event_id", "user_id", F.col("o_orderdate").alias("last_order_date")
        ).orderBy("event_id")
    )


@register(
    "window_dist_functions",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ntile(4) OVER w AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
    """,
    doc="Distribution window functions (ntile / percent_rank / "
        "cume_dist) per market segment — one shuffle on the segment "
        "key, in-partition sort, single window pass; unique "
        "(c_acctbal, c_custkey) order keeps ranks deterministic "
        "across engines.",
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "asof_join_next_order",
    oracle="""
        SELECT e.event_id, e.user_id,
               CASE WHEN o.o_orderdate IS NOT NULL
                     AND CAST(o.o_orderdate AS TIMESTAMP)
                         <= e.ts + INTERVAL 7 DAY
                    THEN o.o_orderdate END AS next_order_date
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        ORDER BY e.event_id
    """,
    doc="Forward as-of join with tolerance (operators/asof.py "
        "direction='forward', tolerance=7 days): the oldest order "
        "at-or-after each event per user, nulled when further than a "
        "week out — pandas merge_asof(tolerance) semantics as the same "
        "one-shuffle union-sort plan, vs DuckDB native ASOF + post "
        "tolerance filter as oracle.",
)
def asof_join_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join(
        e, o,
        left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        payload_cols=["o_orderdate"],
        direction="forward",
        tolerance=7 * 86400,
    )
    return (
        out.select(
            "event_id", "user_id", F.col("o_orderdate").alias("next_order_date")
        ).orderBy("event_id")
    )


@register(
    "range_join_event_pairs",
    oracle="""
        SELECT a.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 300000000
        GROUP BY a.user_id
        ORDER BY a.user_id
    """,
    doc="Self range-join (operators/windows.py): event pairs within 5 "
        "minutes per user; equi-join on key + range filter, AQE-skew-safe.",
)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    pairs = range_join_pairs(e, "user_id", "ts", "event_id", 300)
    return (
        pairs.groupBy(F.col("k").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Windows / top-k / sessions
# ---------------------------------------------------------------------------

@register(
    "topn_per_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS INT) AS rn
            FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    doc="Per-group top-N (latest 3 orders per customer) — the analytical "
        "analogue of the reference's clustering-ordered read (server.py:185).",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    return (
        top_n_per_group(
            o, ["o_custkey"], [F.desc("o_orderdate"), F.desc("o_orderkey")], 3
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_running_sum",
    oracle="""
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value
        FROM events
        ORDER BY event_id
    """,
    doc="Running per-key sum — ordered prefix aggregation in one window.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id", "user_id",
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        ).orderBy("event_id")
    )


@register(
    "window_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg
        FROM events
        ORDER BY event_id
    """,
    doc="Moving average over a bounded row frame.",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        e.select(
            "event_id", "user_id",
            F.round(F.avg("value").over(w), 4).alias("moving_avg"),
        ).orderBy("event_id")
    )


@register(
    "top_k_global",
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 15
    """,
    doc="Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject "
        "(per-partition heaps + driver merge — no full sort, no big shuffle).",
)
def top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "sessionize_events",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, event_id,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
            FROM flagged)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    doc="Batch sessionization (operators/windows.py): 30-min inactivity "
        "gap; lag + cumulative sum, integer-microsecond gap comparison.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", 1800, "event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Set operations / scalar functions / JSON / time bucketing
# ---------------------------------------------------------------------------

@register(
    "set_operations",
    oracle="""
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders)
        UNION
        (SELECT c_custkey FROM customer WHERE c_acctbal > 4500
         EXCEPT
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        ORDER BY c_custkey
    """,
    doc="UNION / INTERSECT / EXCEPT composition (distinct set semantics).",
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    rich = c.filter(F.col("c_acctbal") > 4500).select("c_custkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return (
        building.intersect(with_orders)
        .union(rich.subtract(machinery))
        .distinct()
        .orderBy("c_custkey")
    )


@register(
    "scalar_functions",
    oracle="""
        SELECT o_orderkey,
               UPPER(o_orderstatus)                          AS status_u,
               SUBSTR(o_orderpriority, 1, 1)                 AS prio_code,
               CAST(YEAR(o_orderdate) AS INT)                AS order_year,
               CAST(MONTH(o_orderdate) AS INT)               AS order_month,
               ROUND(o_totalprice * 1.19, 2)                 AS gross,
               CAST(LENGTH(o_orderpriority) AS INT)          AS prio_len,
               CONCAT(o_orderstatus, '-', o_orderpriority)   AS status_prio
        FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
    doc="Scalar string/date/math function surface (SURVEY.md §2.4: the "
        "reference calls only now(); this is the engine's function layer).",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return (
        o.select(
            "o_orderkey",
            F.upper("o_orderstatus").alias("status_u"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.round(F.col("o_totalprice") * 1.19, 2).alias("gross"),
            F.length("o_orderpriority").cast("int").alias("prio_len"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        ).orderBy("o_orderkey")
    )


@register(
    "json_extract_props",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type ORDER BY event_type
    """,
    doc="JSON extraction from a string column (get_json_object — JVM-side, "
        "no UDF) feeding an aggregate.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@register(
    "tumbling_window_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 2)     AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY hour_start, event_type
    """,
    doc="Tumbling-window aggregate (batch form; streaming form in "
        "cassandrastack_spark.streaming uses the same grouping via window()).",
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "stats_regression_lineitem",
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
               ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq,
               ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
               ROUND(var_samp(l_quantity), 6) AS var_qty,
               ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
               ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Statistical aggregate surface: correlation, sample covariance/"
        "variance, and OLS regression (slope/intercept/R²) of price on "
        "quantity per return flag — all single-pass partial-agg'd "
        "moments (Catalyst computes the co-moment sums map-side; one "
        "shuffle of 6 doubles per group regardless of table size). "
        "Definitions shared exactly with the oracle engine "
        "(corr/covar_samp/var_samp/regr_* are standard-fixed; skewness/"
        "kurtosis are deliberately excluded — Spark uses population "
        "forms where DuckDB bias-corrects, so they cannot hash-match).",
)
def stats_regression_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(p, q), 6).alias("corr_pq"),
            F.round(F.covar_samp(p, q), 4).alias("covar_pq"),
            F.round(F.stddev_samp(p), 4).alias("sd_price"),
            F.round(F.var_samp(q), 6).alias("var_qty"),
            F.round(F.regr_slope(p, q), 6).alias("slope"),
            F.round(F.regr_intercept(p, q), 4).alias("intercept"),
            F.round(F.regr_r2(p, q), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "full_outer_nation_accounts",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS nk,
                   ROUND(SUM(c_acctbal), 2) AS cust_bal,
                   CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM customer GROUP BY c_nationkey),
        s AS (
            SELECT s_nationkey AS nk,
                   ROUND(SUM(s_acctbal), 2) AS supp_bal,
                   CAST(COUNT(*) AS BIGINT) AS n_supp
            FROM supplier GROUP BY s_nationkey)
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(cust_bal, 0) AS cust_bal,
               COALESCE(n_cust, 0) AS n_cust,
               COALESCE(supp_bal, 0) AS supp_bal,
               COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        ORDER BY nationkey
    """,
    doc="Full-outer join surface: per-nation customer vs supplier "
        "account balances, nations missing on either side preserved "
        "with zero-filled measures. Aggregate-then-join: the outer join "
        "runs on nation-count-sized inputs (25 rows at any SF), never "
        "on the raw tables — the 100 TB shape for side-by-side rollups.",
)
def full_outer_nation_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("cust_bal"),
            F.count("*").alias("n_cust"),
        )
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("supp_bal"),
            F.count("*").alias("n_supp"),
        )
    )
    return (
        c.alias("c")
        .join(s.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer")
        .select(
            F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
            F.coalesce("cust_bal", F.lit(0)).alias("cust_bal"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("supp_bal", F.lit(0)).alias("supp_bal"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )
