"""Extended analytical catalog: more TPC-H-pattern queries, pivot,
percentiles, full window-function surface, array/string functions, the
salting pattern for skewed joins, and the raw spark.sql text surface
(EXISTS/IN subqueries, GROUPING SETS) — widening SURVEY.md §2.4 coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cassandrastack_spark.queries import register
from cassandrastack_spark.sources.io import read_table as _t
from cassandrastack_spark.sources.io import widen_for_compute as _widen

# ---------------------------------------------------------------------------
# TPC-H-pattern joins/aggregations
# ---------------------------------------------------------------------------


@register(
    "q4_priority_with_big_items",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 pattern: EXISTS -> left-semi join (build side filtered "
        "before the shuffle), count by priority.",
)
def q4_priority_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure filter+agg — every predicate reaches the parquet "
        "scan (PushedFilters), zero shuffle beyond the final 1-row agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q10_returned_revenue",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 pattern: returned-item revenue per customer; facts "
        "shuffle on orderkey once, nation broadcast (bounded dim), "
        "SF-scaled customer left to AQE, global top-20.",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 pattern: conditional aggregation (CASE WHEN inside "
        "SUM) over a fact-fact join.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# pivot / percentiles / window surface
# ---------------------------------------------------------------------------


@register(
    "pivot_status_by_segment",
    oracle="""
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="PIVOT: order-status counts per market segment (explicit pivot "
        "value list — one pass, no second job to discover values).",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .orderBy("c_mktsegment")
    )


@register(
    "percentiles_acctbal",
    oracle="""
        SELECT c_mktsegment,
               ROUND(quantile_cont(c_acctbal, 0.25), 4) AS p25,
               ROUND(quantile_cont(c_acctbal, 0.50), 4) AS p50,
               ROUND(quantile_cont(c_acctbal, 0.75), 4) AS p75,
               ROUND(MIN(c_acctbal), 2) AS lo,
               ROUND(MAX(c_acctbal), 2) AS hi
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
        "DuckDB quantile_cont, both linear interpolation). At 100 TB use "
        "approx_percentile (t-digest sketch, mergeable map-side).",
)
def percentiles_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.75)"), 4).alias("p75"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "window_rank_surface",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(lag(o_totalprice)  OVER w, 2)       AS prev_price,
               ROUND(lead(o_totalprice) OVER w, 2)       AS next_price,
               CAST(dense_rank() OVER w2 AS BIGINT)      AS price_rank,
               CAST(ntile(4) OVER w AS INT)              AS quartile,
               ROUND(first_value(o_totalprice) OVER w, 2) AS first_price
        FROM orders
        WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey
    """,
    doc="Window-function surface in one pass: lag/lead/dense_rank/ntile/"
        "first_value over two window specs (unique-key tie-breaks keep "
        "every engine deterministic).",
)
def window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    w2 = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey", "o_custkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.dense_rank().over(w2).cast("bigint").alias("price_rank"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        ).orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# array / string aggregation functions
# ---------------------------------------------------------------------------


@register(
    "array_functions",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT)             AS n_words,
               array_to_string(string_split(text, ' ')[1:3], '_')    AS head3,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique,
               CAST(list_contains(string_split(text, ' '), 'the') AS BOOLEAN) AS has_the,
               list_sort(list_distinct(string_split(text, ' ')))[1]  AS first_alpha
        FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
    doc="Array-function surface: split/slice/array_join/array_distinct/"
        "array_contains/array_sort — all codegen'd, no UDF.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(words).cast("int").alias("n_words"),
            F.array_join(F.slice(words, 1, 3), "_").alias("head3"),
            F.size(F.array_distinct(words)).cast("int").alias("n_unique"),
            F.array_contains(words, "the").alias("has_the"),
            F.array_sort(F.array_distinct(words))[0].alias("first_alpha"),
        ).orderBy("doc_id")
    )


@register(
    "string_agg_nations",
    oracle="""
        SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    doc="Ordered string aggregation (listagg): collect_list -> array_sort "
        "-> array_join gives a deterministic concatenation regardless of "
        "partial-agg arrival order.",
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# skew handling: the salting pattern
# ---------------------------------------------------------------------------


@register(
    "salted_join_events_customers",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2)     AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Skew-safe join via explicit salting: the skewed (left) side gets "
        "a deterministic salt pmod(hash(event_id), 8); the right side "
        "explodes to all 8 salts; the join key becomes (key, salt) so one "
        "hot user_id spreads over 8 tasks. Same result as the plain join "
        "(the oracle); AQE skew-split is the automatic alternative.",
)
def salted_join_events_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    e = _t(spark, sf_dir, "events").withColumn(
        "_salt", F.pmod(F.hash("event_id"), F.lit(n_salt))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .withColumn("_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)])))
    )
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e._salt == c._salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# spark.sql text surface
# ---------------------------------------------------------------------------


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "sql_exists_in_subqueries",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          AND c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 2)
        ORDER BY c_custkey
    """,
    doc="SQL text surface: correlated EXISTS + uncorrelated IN in one "
        "query, planned by Catalyst as semi-joins (same text runs on both "
        "engines).",
)
def sql_exists_in_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          AND c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 2)
        ORDER BY c_custkey
    """)


@register(
    "sql_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube): three grouping "
        "shapes in one pass via the SQL surface.",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """)


# One SQL text, both engines: Spark 4's recursive CTE (SPARK-24497,
# executed as UnionLoop) and DuckDB's native WITH RECURSIVE run the
# identical statement, so the oracle is the query itself.
_RECURSIVE_TREE_SQL = """
    WITH RECURSIVE anc AS (
        SELECT doc_id, doc_id AS cur, 0 AS depth FROM documents
        UNION ALL
        SELECT doc_id, CAST(FLOOR(cur / 2.0) AS BIGINT) AS cur,
               depth + 1 AS depth
        FROM anc WHERE cur > 0
    )
    SELECT doc_id,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(SUM(cur) AS BIGINT) AS path_sum
    FROM anc GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "sql_recursive_tree_depth",
    oracle=_RECURSIVE_TREE_SQL,
    doc="Recursive CTE (WITH RECURSIVE) - iterative hierarchy "
        "traversal in the SQL text surface, the reply-thread / "
        "org-chart / category-tree query shape. Walks every document "
        "up the implicit binary tree parent(id) = floor(id / 2) to "
        "the root and aggregates depth and the ancestor-id checksum "
        "per doc (closed-form verifiable: depth = floor(log2(id)) + 1). "
        "Spark 4 executes the loop distributedly (UnionLoop: each "
        "iteration is a narrow map over the previous frontier - no "
        "driver-side iteration, no collect), DuckDB runs the SAME "
        "statement natively, so this oracle is the one query text "
        "submitted to both engines verbatim. At 100 TB the frontier "
        "shrinks geometrically for tree-shaped data and each step is "
        "shuffle-free (the parent derivation is a scalar expression); "
        "for graph-shaped recursion the engine's iterative operators "
        "(graph_pagerank_*, dedup components) remain the "
        "convergence-checked path.",
)
def sql_recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_RECURSIVE_TREE_SQL)


@register(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) per event_type — the "
        "mergeable-sketch path for 100 TB distincts. The gate output "
        "carries the exact count plus a tolerance boolean (|HLL - exact| "
        "<= 5% at rsd=0.01) so the sketch's error bound IS the oracle; "
        "the raw sketch value itself is engine-specific and kept out of "
        "the hash. At scale, drop the exact column and keep the sketch.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            # rsd 0.02: comfortably inside the 5%-of-exact invariant at
            # every tested SF (measured max err 0.4%) at half the cost
            # of 0.01, whose HLL registers dominated this query's time
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "hll_within_5pct",
            (F.abs(F.col("approx_users") - F.col("exact_users"))
             / F.col("exact_users")) <= 0.05,
        )
        .drop("approx_users")
        .orderBy("event_type")
    )


@register(
    "funnel_conversion",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id)
        SELECT * FROM (
            SELECT 1 AS step, 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
            UNION ALL
            SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL
            SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p)
        ORDER BY step
    """,
    doc="Ordered funnel analysis (view -> click -> purchase): each stage "
        "keeps users whose first qualifying event strictly follows the "
        "previous stage's. Three conditional min-aggregates chained by "
        "user_id equi-joins — per-user state never leaves its shuffle "
        "partition, and each stage's frame shrinks, so the plan is "
        "monotonically cheaper downstream at any scale.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        c.join(
            e.filter(F.col("event_type") == "purchase"), "user_id"
        )
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count("*").alias("n_users")).select(F.lit(1).alias("step"), F.lit("view").alias("stage"), "n_users")
        .unionAll(
            c.agg(F.count("*").alias("n_users")).select(F.lit(2).alias("step"), F.lit("view>click").alias("stage"), "n_users")
        )
        .unionAll(
            p.agg(F.count("*").alias("n_users")).select(F.lit(3).alias("step"), F.lit("view>click>purchase").alias("stage"), "n_users")
        )
    )
    return counts.orderBy("step")


@register(
    "retention_weekly",
    oracle="""
        WITH firstweek AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id),
        active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events)
        SELECT f.cohort_week,
               CAST((a.week - f.cohort_week) / 7 AS INT) AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN firstweek f ON a.user_id = f.user_id
        GROUP BY f.cohort_week, week_offset
        ORDER BY f.cohort_week, week_offset
    """,
    doc="Weekly retention cohorts: users grouped by first-seen week, "
        "counted in every later week they stay active. Two aggregates "
        "over one scan joined on user_id; the (cohort, offset) matrix "
        "is tiny regardless of corpus size — the classic retention "
        "triangle computed without any per-user driver state.",
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    firstweek = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        active.join(firstweek, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "unpivot_revenue_measures",
    oracle="""
        WITH a AS (
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)      AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_discount), 2)      AS sum_disc
            FROM lineitem GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag, l_linestatus, measure, amount FROM (
            SELECT l_returnflag, l_linestatus,
                   'sum_qty' AS measure, sum_qty AS amount FROM a
            UNION ALL
            SELECT l_returnflag, l_linestatus,
                   'sum_base_price', sum_base_price FROM a
            UNION ALL
            SELECT l_returnflag, l_linestatus, 'sum_disc', sum_disc FROM a)
        ORDER BY l_returnflag, l_linestatus, measure
    """,
    doc="UNPIVOT (wide -> long): aggregate first (tiny grouped frame), "
        "then melt the measure columns with DataFrame.unpivot — the "
        "Expand operator emits one row per measure WITHOUT re-reading "
        "or shuffling the fact; at 100 TB the unpivot runs on the "
        "6-row aggregate, never the scan.",
)
def unpivot_revenue_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_price", "sum_disc"],
        "measure",
        "amount",
    ).orderBy("l_returnflag", "l_linestatus", "measure")


@register(
    "event_interarrival",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
            FROM events)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT)      AS n_events,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_us) AS BIGINT)   AS sum_gap_us,
               CAST(MAX(gap_us) AS BIGINT)   AS max_gap_us
        FROM g GROUP BY user_id ORDER BY user_id
    """,
    doc="LAG-based inter-arrival gaps per user: one shuffle on user_id "
        "serves BOTH the window sort and the groupBy (exchange reuse — "
        "same partitioning), so the whole query is a single pass. Gap "
        "statistics stay in integer microseconds (exact across engines; "
        "an avg-of-doubles would hash-mismatch in the last ulp). Each "
        "user's history sorts within one task — the per-key state is "
        "bounded by the hottest user, the classic telemetry skew to "
        "watch at 100 TB (salt or sessionize first if one key dominates).",
)
def event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        e.withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "profile_hot_keys",
    oracle="""
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id),
        t AS (SELECT SUM(cnt) AS total FROM c)
        SELECT user_id, cnt, cnt / total AS share
        FROM c, t
        ORDER BY cnt DESC, user_id LIMIT 10
    """,
    doc="Skew diagnosis: top-10 hottest partition keys with their share "
        "of the table. The input to every salting / AQE-skew decision; "
        "one map-side-combinable count shuffle plus a global top-k "
        "(TakeOrderedAndProject — no full sort), and the 1-row total is "
        "a broadcast scalar. Deterministic tie-break on user_id.",
)
def profile_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    total = c.agg(F.sum("cnt").alias("total"))
    return (
        c.join(F.broadcast(total))
        .select("user_id", "cnt", (F.col("cnt") / F.col("total")).alias("share"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(10)
    )


@register(
    "profile_table_stats",
    oracle="""
        SELECT 'o_custkey' AS col,
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)   AS n_distinct,
               CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
               CAST(MAX(o_custkey) AS VARCHAR) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
               CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
               CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
        FROM orders
        ORDER BY col
    """,
    doc="Column profile (null count, distinct count, min/max) for a "
        "table in ONE scan: all columns' stats live in a single agg "
        "(the multi-count_distinct plans as one Expand pass — verified "
        "one parquet scan in the physical plan, vs three for a "
        "union-of-aggs shape), then stack() pivots the 1-row result to "
        "long format driver-side-free. At 100 TB swap count_distinct "
        "for approx_count_distinct to keep the distinct map-side. "
        "min/max serialized to strings so heterogeneous column types "
        "share one schema.",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: orders scans as one split locally, which would serialize
    # the 4x Expand of the multi-count_distinct pass onto one task
    # (no-op on a real cluster's already-wide scans). Project to the
    # profiled columns FIRST — the whole-row-hash repartition would
    # otherwise defeat column pruning at the scan.
    cols = [("o_custkey", False), ("o_orderstatus", False), ("o_totalprice", True)]
    o = _widen(
        _t(spark, sf_dir, "orders").select(*[c for c, _ in cols])
    )
    aggs = []
    for c, numeric in cols:
        mn, mx = F.min(c), F.max(c)
        if numeric:
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            mn.cast("string").alias(f"{c}__min_s"),
            mx.cast("string").alias(f"{c}__max_s"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n_null, {c}__n_distinct, {c}__min_s, {c}__max_s"
        for c, _ in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (col, n_null, n_distinct, min_s, max_s)"
        )
    ).orderBy("col")


@register(
    "histogram_order_totals",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000) + 1 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM orders
        GROUP BY bucket ORDER BY bucket
    """,
    doc="Fixed-width histogram via width_bucket: one map-side-combinable "
        "pass, 12-ish groups regardless of table size — the O(1)-output "
        "distribution profile to run BEFORE choosing join strategies or "
        "partition counts at 100 TB (pairs with profile_hot_keys for "
        "skew). DuckDB has no width_bucket, so the oracle states the "
        "equivalent floor arithmetic (all values fall inside [lo, hi)).",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "outliers_iqr_values",
    oracle="""
        WITH q AS (
            SELECT quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM events)
        SELECT event_id, ROUND(value, 4) AS value
        FROM events, q
        WHERE value < q1 - 1.5 * (q3 - q1)
           OR value > q3 + 1.5 * (q3 - q1)
        ORDER BY event_id
    """,
    doc="IQR outlier detection (Tukey fences): exact interpolated "
        "quartiles (Spark percentile == DuckDB quantile_cont) computed "
        "once as a 1-row scalar and broadcast against the scan — two "
        "passes total, no per-row sort. At 100 TB swap the exact "
        "percentile for approx_percentile's t-digest (mergeable "
        "map-side) and the plan shape is unchanged.",
)
def outliers_iqr_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    q = e.agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    return (
        e.join(F.broadcast(q))
        .filter(
            (F.col("value") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("value") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        )
        .select("event_id", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )


@register(
    "window_running_distinct",
    oracle="""
        SELECT event_type, event_id,
               CAST(COUNT(DISTINCT user_id) OVER (
                   PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS distinct_users_so_far
        FROM events
        ORDER BY event_type, event_id
    """,
    doc="Running distinct count per group — Spark has no "
        "count_distinct over a window, and the naive "
        "size(collect_set() OVER w) rebuilds a per-row set (measured "
        "~40% slower at sf0.1 and unbounded state on hot keys). The "
        "two-window form keeps per-row state CONSTANT: a first-seen "
        "flag via row_number over (group, key), then a running sum of "
        "flags over the group — a row is +1 exactly when it is its "
        "key's first appearance in the group's event order. DuckDB "
        "supports windowed COUNT(DISTINCT) natively, so the oracle is "
        "an independent formulation rather than a restatement.",
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_type",
            "event_id",
            F.sum("first_seen").over(w_run).alias("distinct_users_so_far"),
        )
        .orderBy("event_type", "event_id")
    )


@register(
    "sql_lateral_topk",
    oracle="""
        SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
        FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, acctbal DESC, t.c_name
    """,
    doc="Correlated LATERAL join with per-row ORDER BY + LIMIT: top-2 "
        "customers for every nation. Catalyst decorrelates the lateral "
        "subquery into a ranked join (same physical shape as the "
        "window top-n), so the per-nation limit never executes "
        "row-at-a-time — the SQL-surface twin of topn_per_group.",
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql("""
        SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 2) AS acctbal
        FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, acctbal DESC, t.c_name
    """)


@register(
    "heatmap_dow_hour",
    oracle="""
        SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 2) AS total
        FROM events
        GROUP BY dow, hod ORDER BY dow, hod
    """,
    doc="Day-of-week x hour-of-day activity heatmap: one map-side "
        "combinable pass, <=168 output rows regardless of table size — "
        "the telemetry cadence profile. Week-day conventions differ "
        "per engine (Spark weekday: Monday=0; DuckDB isodow: "
        "Monday=1), so both sides are pinned to Monday=0 explicitly.",
)
def heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.weekday("ts").alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("dow", "hod")
    )


@register(
    "pareto_customers_by_segment",
    oracle="""
        WITH rev AS (
            SELECT c_mktsegment, c_custkey,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment, c_custkey),
        tot AS (
            SELECT c_mktsegment, ROUND(SUM(revenue), 2) AS total
            FROM rev GROUP BY c_mktsegment),
        run AS (
            SELECT c_mktsegment, c_custkey, revenue,
                   SUM(revenue) OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY revenue DESC, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM rev)
        SELECT r.c_mktsegment, r.c_custkey, r.revenue,
               ROUND(r.cum / t.total, 6) AS cum_share
        FROM run r JOIN tot t USING (c_mktsegment)
        WHERE ROUND(r.cum / t.total, 6) <= 0.5
        ORDER BY r.c_mktsegment, r.revenue DESC, r.c_custkey
    """,
    doc="Pareto concentration: the customers producing the first half "
        "of each segment's revenue, via a per-segment running share "
        "over revenue rank. Per-customer revenue is rounded BEFORE the "
        "running sum so the cumulative arithmetic is order-identical "
        "across engines (raw double accumulation order differs and "
        "would drift in the last ulp). Windows partition by segment — "
        "no global single-partition sort.",
)
def pareto_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    tot = rev.groupBy("c_mktsegment").agg(
        F.round(F.sum("revenue"), 2).alias("total")
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = rev.withColumn("cum", F.sum("revenue").over(w))
    return (
        run.join(tot, "c_mktsegment")
        .withColumn("cum_share", F.round(F.col("cum") / F.col("total"), 6))
        .filter(F.col("cum_share") <= 0.5)
        .select("c_mktsegment", "c_custkey", "revenue", "cum_share")
        .orderBy("c_mktsegment", F.desc("revenue"), "c_custkey")
    )


@register(
    "event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events)
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
        ORDER BY prev_type, next_type
    """,
    doc="Path analysis: first-order event-type transition counts (the "
        "Markov matrix of user journeys). One shuffle on user_id for "
        "the LAG ordering, then a map-side-combinable count over the "
        "(prev, next) pairs — output is |types|^2 rows regardless of "
        "stream size. The same per-user-ordering skew note as "
        "event_interarrival applies at 100 TB.",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "embedding_norms",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               ROUND(sqrt(list_sum(list_transform(
                   embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
        FROM embeddings
        ORDER BY vec_id
    """,
    doc="Per-vector L2 norms — the sanity profile before any cosine "
        "work (zero or denormal vectors poison similarity scores). "
        "Pure JVM higher-order functions (aggregate over the array), "
        "narrow map, no shuffle; per-vector sums run in element order "
        "on both engines, so the float math is bit-identical and the "
        "oracle is exact.",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    ).orderBy("vec_id")


@register(
    "rolling_wau",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events),
        days AS (SELECT DISTINCT day FROM du)
        SELECT d.day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM days d
        JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
        ORDER BY d.day
    """,
    doc="Rolling 7-day active users per day (the WAU curve): each "
        "distinct (day, user) pair EXPLODES into the <=7 report days it "
        "contributes to, then a distinct count per report day — a pure "
        "equi-shuffle plan (the naive day-spine range join plans as a "
        "nested-loop and fails the catalog's BNL guardrail), with a "
        "broadcast semi-join against observed days trimming the "
        "explosion past the data's end. Windowed COUNT(DISTINCT) does "
        "not exist in Spark and first-seen flags don't compose across "
        "overlapping windows, so dedup-then-explode is the exact plan; "
        "at 100 TB swap in per-day HLL sketches merged over the "
        "trailing window.",
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("day")
    )


@register(
    "anomaly_trailing_zscore",
    oracle="""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   AVG(value) OVER tw AS mu,
                   STDDEV_SAMP(value) OVER tw AS sigma,
                   COUNT(*) OVER tw AS n_hist
            FROM events
            WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id,
               ROUND((value - mu) / sigma, 4) AS zscore
        FROM w
        WHERE n_hist >= 5 AND sigma > 0
          AND abs((value - mu) / sigma) >= 2.5
        ORDER BY event_id
    """,
    doc="Trailing-window anomaly detection: each event scored against "
        "the mean/stddev of its user's previous 20 events (never "
        "including itself — no leakage); flagged at |z| >= 2.5 with a "
        "minimum history of 5. One shuffle on the user key, one sorted "
        "window pass; at 100 TB this is the same plan with time-bucketed "
        "re-partitioning.",
)
def anomaly_trailing_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    tw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    scored = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(tw).alias("mu"),
        F.stddev_samp("value").over(tw).alias("sigma"),
        F.count("*").over(tw).alias("n_hist"),
    ).withColumn("z", (F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        scored.filter(
            (F.col("n_hist") >= 5)
            & (F.col("sigma") > 0)
            & (F.abs("z") >= 2.5)
        )
        .select("event_id", "user_id", F.round("z", 4).alias("zscore"))
        .orderBy("event_id")
    )


@register(
    "dq_profile_lineitem",
    oracle="""
        WITH t AS (SELECT * FROM lineitem)
        SELECT col, n_rows, n_nulls, n_distinct FROM (
            SELECT 'l_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct FROM t
            UNION ALL SELECT 'l_partkey', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_partkey) AS BIGINT),
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM t
            UNION ALL SELECT 'l_suppkey', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_suppkey) AS BIGINT),
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM t
            UNION ALL SELECT 'l_linenumber', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_linenumber) AS BIGINT),
                   CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) FROM t
            UNION ALL SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
                   CAST(COUNT(DISTINCT l_quantity) AS BIGINT) FROM t
            UNION ALL SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
                   CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) FROM t
            UNION ALL SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
                   CAST(COUNT(DISTINCT l_discount) AS BIGINT) FROM t
            UNION ALL SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
                   CAST(COUNT(DISTINCT l_tax) AS BIGINT) FROM t
            UNION ALL SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
                   CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM t
            UNION ALL SELECT 'l_linestatus', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_linestatus) AS BIGINT),
                   CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) FROM t
            UNION ALL SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
                   CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) FROM t
        ) ORDER BY col
    """,
    doc="Data-quality profile of the fact table: per-column row, null, "
        "and exact distinct counts in long format — the ingest "
        "acceptance gate before a crawl/feed lands in the lake. Spark "
        "side is ONE aggregate pass over the table (all per-column "
        "counts as sibling aggregates, unpivoted afterwards with "
        "stack), not one scan per column; at 100 TB swap exact "
        "distincts for approx_count_distinct.",
)
def dq_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the local file is below one scan split, which would run
    # the 11-way distinct expand + partial aggregate on ONE task; at
    # cluster scale the scan is already wide and this is a no-op
    li = _widen(_t(spark, sf_dir, "lineitem"))
    cols = li.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append((F.count("*") - F.count(c)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return (
        one.selectExpr(
            "__n",
            f"stack({len(cols)}, {stack_args}) AS (col, n_nulls, n_distinct)",
        )
        .select(
            "col",
            F.col("__n").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
        )
        .orderBy("col")
    )


_LINEITEM_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
)

_DQ_APPROX_ORACLE = "WITH t AS (SELECT * FROM lineitem)\n" + "\nUNION ALL ".join(
    f"SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
    f"TRUE AS approx_within_5pct FROM t"
    for c in _LINEITEM_COLS
) + "\nORDER BY col"


@register(
    "dq_profile_lineitem_approx",
    oracle=_DQ_APPROX_ORACLE,
    doc="The 100 TB variant of dq_profile_lineitem: per-column "
        "approx_count_distinct (HLL++, rsd=0.02) replaces the exact "
        "multi-distinct — a single-pass PARTIAL aggregate with a "
        "constant-size sketch per column, where the exact form "
        "expands the input 11x (one expand projection per distinct "
        "column) before the shuffle. The oracle needs determinism, so "
        "the estimate is GATED against the exact sibling (every "
        "column within 5%, > 2 sigma headroom at rsd 0.02) rather "
        "than emitted raw — same discipline as rolling_wau_hll. "
        "Production keeps only the approx pass; the exact pass here "
        "exists for the gate, and runs SEPARATELY on purpose: mixing "
        "sketch aggregates into the expand-based multi-distinct plan "
        "makes every distinct hash-map entry carry all 11 HLL buffers "
        "(measured OOM at sf0.01 in a 1g driver-default session).",
)
def dq_profile_lineitem_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cols = li.columns
    # pass 1 — the production shape: rows + nulls + HLL sketches in one
    # partial aggregate, NO expand (constant-size state per column)
    a_aggs = [F.count("*").alias("__n")]
    for c in cols:
        a_aggs.append((F.count("*") - F.count(c)).alias(f"__nulls_{c}"))
        a_aggs.append(
            F.approx_count_distinct(c, rsd=0.02).alias(f"__approx_{c}")
        )
    a_stack = ", ".join(f"'{c}', __nulls_{c}, __approx_{c}" for c in cols)
    approx = li.agg(*a_aggs).selectExpr(
        "__n",
        f"stack({len(cols)}, {a_stack}) AS (col, n_nulls, n_approx)",
    )
    # pass 2 — gate only: the exact multi-distinct (expand), isolated
    # so its hash-map entries stay sketch-free. Widened like
    # dq_profile_lineitem (the 11-way expand is the per-row-heavy
    # stage); the HLL pass above stays on the raw scan — an r16 A/B
    # showed widening it costs more in repartition shuffle than the
    # cheap per-row sketch updates save (7.6s vs 4.5s min-of-5).
    wli = _widen(li)
    e_aggs = [F.countDistinct(c).alias(f"__dist_{c}") for c in cols]
    e_stack = ", ".join(f"'{c}', __dist_{c}" for c in cols)
    exact = wli.agg(*e_aggs).selectExpr(
        f"stack({len(cols)}, {e_stack}) AS (col, n_distinct)"
    )
    return (
        approx.join(F.broadcast(exact), "col")
        .select(
            "col",
            F.col("__n").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            (
                F.abs(F.col("n_approx") - F.col("n_distinct"))
                <= 0.05 * F.col("n_distinct")
            ).alias("approx_within_5pct"),
        )
        .orderBy("col")
    )


@register(
    "rolling_wau_hll",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events),
        days AS (SELECT DISTINCT day FROM du)
        SELECT d.day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau,
               TRUE AS hll_within_5pct
        FROM days d
        JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
        ORDER BY d.day
    """,
    doc="Rolling 7-day WAU via mergeable HLL sketches — the 100 TB "
        "plan rolling_wau's docstring promises, executed: one pass "
        "builds a per-day DataSketches HLL (hll_sketch_agg — the "
        "stored daily aggregate at scale), the trailing window merges "
        "7 SKETCH rows per report day (hll_union_agg; the explode "
        "runs over ~days x 7 sketch rows, never over events), and "
        "the estimate is gated against the exact count: every day "
        "within 5% (lgConfigK=12 -> sigma ~1.6%). Events are touched "
        "exactly once; incremental maintenance = append today's "
        "sketch, re-merge 7 rows.",
)
def rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    daily = du.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).localCheckpoint(eager=True)  # sketches built once, read by merge + spine
    days = daily.select("day")
    merged = (
        daily.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
            "sk",
        )
        .join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
    )
    exact = (
        du.distinct()
        .select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
            "user_id",
        )
        .join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        exact.join(merged, "day")
        .select(
            "day",
            "wau",
            (F.abs(F.col("est") - F.col("wau")) / F.col("wau") <= 0.05).alias(
                "hll_within_5pct"
            ),
        )
        .orderBy("day")
    )


@register(
    "anomaly_cusum_changepoint",
    oracle="""
        WITH m AS (
            SELECT AVG(value) AS mu FROM events
        ), c AS (
            SELECT user_id, event_id, ts,
                   SUM(value - mu) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cusum,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events CROSS JOIN m
        ), r AS (
            SELECT user_id, event_id, ts, n, cusum,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ABS(cusum) DESC, event_id) AS rnk
            FROM c
        )
        SELECT user_id, event_id AS cp_event_id, ts AS cp_ts,
               ROUND(cusum, 4) AS cusum_at_cp
        FROM r
        WHERE rnk = 1 AND n >= 20
        ORDER BY user_id
    """,
    doc="CUSUM changepoint candidate per user: the running sum of "
        "(value - corpus mean) in event order peaks in magnitude where "
        "the series' mean shifts — the classic offline CUSUM estimator "
        "(Page 1954). Two window passes over one per-user shuffle plus "
        "a broadcast 1-row mean; users with <20 events are skipped "
        "(too short to localize a shift). At 100 TB the per-user "
        "partitions are the natural parallel unit and the mean is one "
        "partial-agg'd scan.",
)
def anomaly_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    mu = e.agg(F.avg("value").alias("mu"))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("user_id")
    # rank on the UNROUNDED cusum (identical float in both engines);
    # round only the reported value — rounding before ranking could
    # manufacture ties the oracle does not see
    c = (
        e.crossJoin(F.broadcast(mu))
        .withColumn("cusum", F.sum(F.col("value") - F.col("mu")).over(w_run))
        .withColumn("n", F.count("*").over(w_n))
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("event_id")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w_rank))
        .filter((F.col("rnk") == 1) & (F.col("n") >= 20))
        .select(
            "user_id",
            F.col("event_id").alias("cp_event_id"),
            F.col("ts").alias("cp_ts"),
            F.round("cusum", 4).alias("cusum_at_cp"),
        )
        .orderBy("user_id")
    )


@register(
    "dq_referential_orphans",
    oracle="""
        SELECT 'lineitem->orders' AS fk,
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'orders->customer' AS fk,
               CAST((SELECT COUNT(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'events->customer(user)' AS fk,
               CAST((SELECT COUNT(*) FROM events e
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = e.user_id))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_rows
        ORDER BY fk
    """,
    doc="Referential-integrity audit: orphan counts per foreign-key "
        "edge of the star schema (anti-join per edge — each is one "
        "shuffle on the key with the dimension side broadcast/AQE-"
        "sized; the 100 TB pre-flight check before a pipeline trusts "
        "its joins). Non-zero rows here mean inner joins silently drop "
        "data downstream.",
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")

    def edge(name, fact, key, dim, dim_key):
        # one left join + one agg per edge; no driver-side counting —
        # the three edges union into a single distributed plan
        d = (
            dim.select(F.col(dim_key).alias(key))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        return (
            fact.select(key)
            .join(d, key, "left")
            .agg(
                F.lit(name).alias("fk"),
                F.count(F.when(F.col("_hit").isNull(), 1)).alias("n_orphans"),
                F.count("*").alias("n_rows"),
            )
        )

    return (
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionAll(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionAll(
            edge(
                "events->customer(user)",
                e.select(F.col("user_id").alias("user_id")),
                "user_id",
                c,
                "c_custkey",
            )
        )
        .orderBy("fk")
    )


def event_transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w) weighted edges of the event-type transition graph
    — the Markov graph both PageRank queries rank and the plan audit
    inspects (ONE definition, so the audited round plan can never
    drift from the graph the registered queries actually build)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )


def _pagerank_oracle(iters: int = 15, d: float = 0.85) -> str:
    """Unrolled power iteration: one CTE per round (DuckDB's recursive
    CTEs allow only a single reference to the recursive relation; each
    round here needs the previous ranks twice — edge contributions AND
    dangling mass — so the oracle unrolls the fixed iteration count
    instead)."""
    head = f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events),
        edges AS MATERIALIZED (SELECT prev_type AS src, event_type AS dst,
                         CAST(COUNT(*) AS DOUBLE) AS w
                  FROM seq WHERE prev_type IS NOT NULL
                  GROUP BY src, dst),
        outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
        frac AS MATERIALIZED (SELECT src, dst, w / out_w AS frac
                 FROM edges JOIN outw USING (src)),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION SELECT dst AS node FROM edges)),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        p0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
        p{i} AS MATERIALIZED (
            SELECT n2.node,
                   (1.0 - {d}) / nn.n
                   + {d} * (COALESCE(c.in_mass, 0) + dg.dangling / nn.n)
                       AS rank
            FROM nodes n2
            CROSS JOIN nn
            CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS dangling
                        FROM p{i - 1}
                        WHERE node NOT IN (SELECT src FROM frac)) dg
            LEFT JOIN (SELECT f.dst AS node, SUM(p.rank * f.frac) AS in_mass
                       FROM frac f JOIN p{i - 1} p ON p.node = f.src
                       GROUP BY f.dst) c ON n2.node = c.node)"""
        )
    return (
        head
        + "".join(steps)
        + f"""
        SELECT node AS event_type, ROUND(rank, 6) AS pagerank
        FROM p{iters} ORDER BY event_type"""
    )


@register(
    "graph_pagerank_events",
    oracle=_pagerank_oracle(),
    doc="Weighted PageRank over the event-type transition graph — the "
        "crawl-prioritization centrality (domain-graph ranking in "
        "training-data pipelines), run here on the Markov graph "
        "event_transitions already derives. operators/graph.py "
        "pagerank(): edge fractions normalized once, then 15 "
        "(join -> aggregate) rounds shuffling only (node, mass) pairs, "
        "rank frame localCheckpoint-ed per round so the plan stays one "
        "join deep (the dedup_components discipline); dangling mass "
        "redistributes uniformly so ranks stay a distribution. At "
        "100 TB nodes are domains (millions), edges links (billions): "
        "everything stays distributed, hubs are AQE-splittable keys. "
        "Oracle: the same power iteration unrolled CTE-per-round.",
)
def graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandrastack_spark.operators.graph import pagerank

    edges = event_transition_edges(spark, sf_dir)
    pr = pagerank(edges, "src", "dst", weight_col="w", iters=15)
    return pr.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).alias("pagerank"),
    ).orderBy("event_type")


def _pagerank_seeded_oracle(
    seed: str, iters: int = 15, d: float = 0.85
) -> str:
    """Unrolled PERSONALIZED power iteration: like ``_pagerank_oracle``
    but teleport and dangling mass follow the reset distribution
    (all weight on ``seed``, normalized over the node universe) and
    iteration starts from it — mirroring
    ``operators/graph.py _round_personalized`` operation-for-operation
    so the doubles agree bit-for-bit before the 6-decimal round."""
    one_minus_d = repr(1.0 - d)
    head = f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events),
        edges AS MATERIALIZED (SELECT prev_type AS src, event_type AS dst,
                         CAST(COUNT(*) AS DOUBLE) AS w
                  FROM seq WHERE prev_type IS NOT NULL
                  GROUP BY src, dst),
        outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
        frac AS MATERIALIZED (SELECT src, dst, w / out_w AS frac
                 FROM edges JOIN outw USING (src)),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION SELECT dst AS node FROM edges)),
        r0 AS (SELECT node,
                      CASE WHEN node = '{seed}' THEN 1.0 ELSE 0.0 END AS w_r
               FROM nodes),
        rt AS MATERIALIZED (SELECT SUM(w_r) AS total FROM r0),
        rr AS MATERIALIZED (SELECT node, w_r / rt.total AS r
               FROM r0 CROSS JOIN rt),
        p0 AS MATERIALIZED (SELECT node, r AS rank FROM rr)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
        p{i} AS MATERIALIZED (
            SELECT rr.node,
                   {one_minus_d} * rr.r
                   + {d} * (COALESCE(c.in_mass, 0)
                            + dg.dangling * rr.r) AS rank
            FROM rr
            CROSS JOIN (SELECT COALESCE(SUM(rank), 0) AS dangling
                        FROM p{i - 1}
                        WHERE node NOT IN (SELECT src FROM frac)) dg
            LEFT JOIN (SELECT f.dst AS node, SUM(p.rank * f.frac) AS in_mass
                       FROM frac f JOIN p{i - 1} p ON p.node = f.src
                       GROUP BY f.dst) c ON rr.node = c.node)"""
        )
    return (
        head
        + "".join(steps)
        + f"""
        SELECT node AS event_type, ROUND(rank, 6) AS pagerank
        FROM p{iters} ORDER BY event_type"""
    )


@register(
    "graph_pagerank_seeded",
    oracle=_pagerank_seeded_oracle("signup"),
    doc="PERSONALIZED PageRank over the event-type transition graph, "
        "seeded on 'signup' — the topic-sensitive variant (Haveliwala "
        "2002) production crawlers run against a trusted seed set: "
        "teleport and dangling mass land on the seed distribution, so "
        "ranks measure proximity to signup flows instead of global "
        "centrality; a node unreachable from the seed scores exactly "
        "0. Same per-round physical shape as graph_pagerank_events "
        "(one (node, mass) shuffle per round, checkpointed lineage); "
        "the uniform query's float sequence is untouched — the seeded "
        "round is a separate update expression, and this oracle "
        "unrolls THAT expression CTE-per-round.",
)
def graph_pagerank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandrastack_spark.operators.graph import pagerank

    edges = event_transition_edges(spark, sf_dir)
    seed = edges.sparkSession.createDataFrame(
        [("signup", 1.0)], "node string, weight double"
    )
    pr = pagerank(edges, "src", "dst", weight_col="w", iters=15, reset=seed)
    return pr.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).alias("pagerank"),
    ).orderBy("event_type")


# Lifted VERBATIM from tests/test_r12_oracle_parity.py, where this SQL
# was validated green against DuckDB at sf0.001 one round before
# registration (the staged-query discipline; the test now pins the
# registered string to the validated one). Mirrors the degree-ordered
# orientation of operators/graph.py triangle_count CTE-for-stage:
# canonical undirected edges -> degrees -> orient each edge from its
# lower-(degree, id) endpoint -> wedge-close -> per-node counts, with a
# LEFT JOIN back to the node universe so triangle-free nodes report 0.
_TRIANGLE_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events),
    raw AS (SELECT prev_type AS src, event_type AS dst
            FROM seq WHERE prev_type IS NOT NULL),
    und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM raw WHERE src <> dst),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM und
                UNION ALL SELECT v AS node FROM und) t
            GROUP BY node),
    orient AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS d,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dd
        FROM und e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v),
    tris AS (
        SELECT x.s AS a, x.d AS b, y.d AS c
        FROM orient x
        JOIN orient y ON y.s = x.s AND (x.dd, x.d) < (y.dd, y.d)
        JOIN orient z ON z.s = x.d AND z.d = y.d),
    per AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
                SELECT a AS node FROM tris
                UNION ALL SELECT b FROM tris
                UNION ALL SELECT c FROM tris) t
            GROUP BY node)
    SELECT deg.node AS event_type,
           COALESCE(per.triangles, 0) AS triangles
    FROM deg LEFT JOIN per USING (node)
    ORDER BY event_type
"""


@register(
    "graph_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    doc="Per-node triangle counts over the event-type transition graph "
        "— the local-clustering signal (spam/link-farm detection in "
        "crawl curation: organic link neighborhoods close triangles, "
        "synthetic ones don't), run on the same Markov graph the "
        "PageRank queries rank. operators/graph.py triangle_count(): "
        "the degree-ordered edge-iterator formulation (Suri & "
        "Vassilvitskii 2011) — canonicalize to undirected simple "
        "edges, orient each from its lower-(degree, id) endpoint, "
        "build wedges only at the LOWER endpoint, close them with one "
        "equi-join back against the oriented edge set. Every triangle "
        "materializes exactly once, and the orientation caps wedge "
        "out-degree at O(sqrt(m)) — a celebrity hub generates ZERO "
        "wedges (its edges all point into it), so the skew ceiling at "
        "100 TB is sqrt(edges), not the raw degree distribution; all "
        "three stages are (node, id)-keyed equi-join shuffles, no "
        "payloads ride them. Triangle-free nodes report 0 via the "
        "node-universe left join. Oracle: the same orientation "
        "replayed CTE-for-stage in SQL, validated at sf0.001 the "
        "round before registration.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandrastack_spark.operators.graph import triangle_count

    edges = event_transition_edges(spark, sf_dir)
    return (
        triangle_count(edges, "src", "dst")
        .select(F.col("node").alias("event_type"), "triangles")
        .orderBy("event_type")
    )


@register(
    "percentiles_acctbal_approx",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               TRUE AS p50_ok,
               TRUE AS p90_ok
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="The 100 TB variant of percentiles_acctbal: approx_percentile "
        "(t-digest-style quantile sketch, accuracy 10000) replaces the "
        "exact interpolated percentile — the sketch is CONSTANT-size "
        "per group and mergeable map-side, where exact percentile "
        "buffers every group member on the reducer (the aggregation "
        "that stops scaling first on skewed groups). Like "
        "dq_profile_lineitem_approx and rolling_wau_hll, the estimate "
        "is GATED for the oracle rather than emitted raw: per segment, "
        "the sketch's p50/p90 must land within 2% of the segment's "
        "value span of the exact percentile (rank error at accuracy "
        "10000 is under one order statistic at these group sizes, so "
        "the bound has orders-of-magnitude headroom). Production keeps "
        "only the sketch; the exact aggregate here exists for the gate.",
)
def percentiles_acctbal_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    tol = 0.02
    agg = c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.expr("percentile(c_acctbal, 0.50)").alias("e50"),
        F.expr("percentile(c_acctbal, 0.90)").alias("e90"),
        F.expr(
            "approx_percentile(c_acctbal, array(0.50, 0.90), 10000)"
        ).alias("a"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )
    span = F.col("hi") - F.col("lo")
    return agg.select(
        "c_mktsegment",
        "n_customers",
        (F.abs(F.col("a")[0] - F.col("e50")) <= tol * span).alias("p50_ok"),
        (F.abs(F.col("a")[1] - F.col("e90")) <= tol * span).alias("p90_ok"),
    ).orderBy("c_mktsegment")
