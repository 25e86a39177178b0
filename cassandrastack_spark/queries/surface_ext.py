"""Second surface-extension catalog: hypertable rollups, date/null/map
scalar functions, window frames, lateral explode, union-all, and the
multimodal feature-extraction path — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cassandrastack_spark.llm.multimodal import extract_features
from cassandrastack_spark.operators.rollup_ts import rollup_ladder
from cassandrastack_spark.queries import register
from cassandrastack_spark.sources.io import read_table as _t


@register(
    "hypertable_rollup_daily",
    oracle="""
        SELECT make_timestamp(epoch_us(ts) // 86400000000 * 86400000000)
                   AS bucket_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 2)     AS sum_v,
               ROUND(MIN(value), 4)     AS min_v,
               ROUND(MAX(value), 4)     AS max_v
        FROM events
        GROUP BY 1, 2
        ORDER BY bucket_start, event_type
    """,
    doc="Hypertable continuous-aggregate ladder (operators/rollup_ts.py):"
        " events -> 1min -> 1h -> 1day, each level re-aggregated from the"
        " next-finer one. The oracle aggregates RAW events directly at"
        " daily resolution, proving re-aggregation exactness of the"
        " decomposable (count/sum/min/max) carriers.",
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = rollup_ladder(e, "ts", ["event_type"], "value")["1 day"]
    return (
        daily.select(
            "bucket_start", "event_type", "n",
            F.round("sum_v", 2).alias("sum_v"),
            F.round("min_v", 4).alias("min_v"),
            F.round("max_v", 4).alias("max_v"),
        ).orderBy("bucket_start", "event_type")
    )


@register(
    "gapfill_locf_hourly",
    oracle="""
        WITH sparse AS (
            SELECT * FROM events WHERE user_id < 5),
        hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_raw,
                   ROUND(MAX(value), 4)     AS vmax
            FROM sparse GROUP BY 1, 2),
        bounds AS (
            SELECT event_type,
                   date_trunc('hour', MIN(ts)) AS t0,
                   date_trunc('hour', MAX(ts)) AS t1
            FROM sparse GROUP BY 1),
        spine AS (
            SELECT event_type, u.hour
            FROM bounds, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS u(hour))
        SELECT s.event_type, s.hour,
               COALESCE(h.n_raw, 0) AS n,
               last_value(h.vmax IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vmax_locf
        FROM spine s LEFT JOIN hourly h USING (event_type, hour)
        ORDER BY s.event_type, s.hour
    """,
    doc="Time-series gap-fill + LOCF (the hypertable `time_bucket_gapfill`"
        " / `locf` pair): per-key hourly date spine generated with"
        " sequence+explode FROM THE KEYS' OWN bounds rows — spine"
        " generation is distributed per key, never a driver loop — then"
        " left-join zero-fill for counts and last-observation-carried-"
        "forward for the hourly max via a per-key ordered window"
        " (parallel across keys; no global sort; max is FP-order-"
        "independent, so the oracle compares exactly). Sparse input (user_id < 5) so"
        " gaps genuinely occur at gate scale.",
)
def gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (
        e.groupBy(F.col("event_type"), hour.alias("hour"))
        .agg(
            F.count("*").alias("n_raw"),
            F.round(F.max("value"), 4).alias("vmax"),
        )
    )
    bounds = e.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_raw", F.lit(0)).cast("long").alias("n"),
            F.last("vmax", ignorenulls=True).over(w).alias("vmax_locf"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "date_null_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                   AS days_since_95,
               o_orderdate + INTERVAL 3 MONTH                   AS plus_3m,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
               CAST(dayofweek(o_orderdate) + 1 AS INT)          AS dow,
               -- DuckDB dayofweek is 0=Sunday; Spark is 1=Sunday
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')     AS status_or_open,
               CAST(GREATEST(o_totalprice, 100000.0) AS DOUBLE) AS floored_price
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
    """,
    doc="Date arithmetic + null-handling scalar surface: datediff,"
        " interval add, quarter truncation, day-of-week, coalesce/nullif,"
        " greatest.",
)
def date_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return (
        o.select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
                .cast("bigint").alias("days_since_95"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
            F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN"))
                .alias("status_or_open"),
            F.greatest("o_totalprice", F.lit(100000.0)).alias("floored_price"),
        ).orderBy("o_orderkey")
    )


@register(
    "window_range_frames",
    oracle="""
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 2)
                   AS sum_last_10min,
               ROUND(cume_dist() OVER (
                   PARTITION BY user_id ORDER BY value, event_id), 6)
                   AS value_cume,
               ROUND(percent_rank() OVER (
                   PARTITION BY user_id ORDER BY value, event_id), 6)
                   AS value_prank
        FROM events ORDER BY event_id
    """,
    doc="RANGE window frame (time-based: sum of the trailing 10 minutes"
        " per user) + cume_dist / percent_rank — the value-based frame"
        " surface beyond ROWS.",
)
def window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    w_rank = Window.partitionBy("user_id").orderBy(F.asc("value"), F.asc("event_id"))
    return (
        e.select(
            "event_id", "user_id",
            F.round(F.sum("value").over(w_range), 2).alias("sum_last_10min"),
            F.round(F.cume_dist().over(w_rank), 6).alias("value_cume"),
            F.round(F.percent_rank().over(w_rank), 6).alias("value_prank"),
        ).orderBy("event_id")
    )


@register(
    "lateral_explode_tokens",
    oracle="""
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE doc_id < 100)
        GROUP BY token
        HAVING COUNT(*) >= 20
        ORDER BY n_docs DESC, token
    """,
    doc="Lateral explode (posexplode family): document-frequency of"
        " tokens via explode + distinct + HAVING.",
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 20)
        .orderBy(F.desc("n_docs"), F.asc("token"))
    )


@register(
    "union_all_with_source",
    oracle="""
        SELECT 'customer' AS side, CAST(c_custkey AS BIGINT) AS k FROM customer
            WHERE c_acctbal > 9000
        UNION ALL
        SELECT 'supplier' AS side, CAST(s_suppkey AS BIGINT) AS k FROM supplier
            WHERE s_acctbal > 9000
        ORDER BY side, k
    """,
    doc="UNION ALL (bag semantics — no dedup shuffle, unlike UNION) with"
        " a source-tag column.",
)
def union_all_with_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.lit("customer").alias("side"), F.col("c_custkey").cast("bigint").alias("k"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.lit("supplier").alias("side"), F.col("s_suppkey").cast("bigint").alias("k"))
    )
    return c.unionAll(s).orderBy("side", "k")


@register(
    "map_functions",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)  AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               MIN(json_extract_string(props, '$.k'))  AS min_k_str
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Map/JSON column surface: from_json into map<string,string>,"
        " element_at lookups feeding aggregates (JVM-side json path).",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    k = F.element_at(m, "k")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k.cast("int")).alias("sum_k"),
            F.min(k).alias("min_k_str"),
        )
        .orderBy("event_type")
    )


@register(
    "mm_feature_extract",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               lower(sha256(text))                     AS sha256,
               CAST(512 AS INT)                        AS feat_dim
        FROM documents WHERE doc_id < 200 ORDER BY media_id
    """,
    doc="Multimodal decode path end-to-end: documents re-cast as binary"
        " 'image' payloads run through the Arrow-batched mapInPandas"
        " feature extractor (llm/multimodal.py); the oracle recomputes"
        " the portable outputs (byte length, sha256, type-determined"
        " feat_dim) in SQL. The decode itself is the documented stub.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/png").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "sha256", "feat_dim").orderBy("media_id")


@register(
    "mm_resize_images",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(32 AS INT) AS width,
               CAST(32 AS INT) AS height,
               CAST(32 * 32 * 3 AS INT) AS n_out_bytes,
               lower(substr(sha256(text), 1, 16)) AS head_hex
        FROM documents WHERE doc_id < 100 ORDER BY media_id
    """,
    doc="Multimodal resize path: image payloads through the Arrow-"
        "batched resize op (llm/multimodal.py resize_images — stubbed "
        "pixels, real plumbing). Output bitmap is sized like real RGB "
        "(w*h*3) and its head bytes are the payload digest, so the "
        "oracle verifies byte sizing AND content deterministically.",
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandrastack_spark.llm.multimodal import resize_images

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = resize_images(media, width=32, height=32)
    return out.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").cast("int").alias("n_out_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("head_hex"),
    ).orderBy("media_id")


@register(
    "mm_frame_sample",
    oracle="""
        SELECT media_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * 1000 AS BIGINT) AS ts_ms,
               lower(substr(sha256(text || CAST(i AS VARCHAR)), 1, 16))
                   AS head_hex
        FROM (
          SELECT doc_id AS media_id, text,
                 unnest(generate_series(
                     0, greatest(octet_length(encode(text)) // 1024, 1) - 1
                 )) AS i
          FROM documents WHERE doc_id < 100
        )
        ORDER BY media_id, frame_idx
    """,
    doc="Multimodal frame sampling: video payloads through the flatMap-"
        "shaped mapInPandas (one output row per frame; frame count "
        "derives from payload size, 1 KiB ~ 1 frame in the stub). The "
        "oracle regenerates every (frame_idx, ts_ms, digest-head) in "
        "SQL — row multiplication and per-frame content both checked.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandrastack_spark.llm.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = sample_frames(media, every_ms=1000)
    return out.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("head_hex"),
    ).orderBy("media_id", "frame_idx")


@register(
    "gapfill_interpolate_hourly",
    oracle="""
        WITH sparse AS (
            SELECT * FROM events WHERE user_id < 5),
        hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   ROUND(MAX(value), 4) AS vmax
            FROM sparse GROUP BY 1, 2),
        bounds AS (
            SELECT event_type,
                   date_trunc('hour', MIN(ts)) AS t0,
                   date_trunc('hour', MAX(ts)) AS t1
            FROM sparse GROUP BY 1),
        spine AS (
            SELECT event_type, u.hour
            FROM bounds, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS u(hour)),
        joined AS (
            SELECT s.event_type, s.hour, h.vmax,
                   last_value(h.vmax IGNORE NULLS) OVER w_prev AS pv,
                   last_value(CASE WHEN h.vmax IS NOT NULL THEN s.hour END
                              IGNORE NULLS) OVER w_prev AS pt,
                   first_value(h.vmax IGNORE NULLS) OVER w_next AS nv,
                   first_value(CASE WHEN h.vmax IS NOT NULL THEN s.hour END
                               IGNORE NULLS) OVER w_next AS nt
            FROM spine s LEFT JOIN hourly h USING (event_type, hour)
            WINDOW w_prev AS (PARTITION BY s.event_type ORDER BY s.hour
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w_next AS (PARTITION BY s.event_type ORDER BY s.hour
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_type, hour, vmax,
               CAST(CASE
                   WHEN vmax IS NOT NULL THEN CAST(round(vmax * 10000) AS BIGINT)
                   WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        CAST(round((CAST(round(pv * 10000) AS BIGINT)
                                    * (epoch(nt) - epoch(pt))
                                    + (CAST(round(nv * 10000) AS BIGINT)
                                       - CAST(round(pv * 10000) AS BIGINT))
                                      * (epoch(hour) - epoch(pt)))
                                   / (epoch(nt) - epoch(pt))) AS BIGINT)
                   END AS BIGINT) AS v_interp_e4
        FROM joined
        ORDER BY event_type, hour
    """,
    doc="Time-series gap-fill + LINEAR INTERPOLATION (the hypertable "
        "`interpolate` sibling of gapfill_locf_hourly): missing hours "
        "take the straight line between the bracketing observations, "
        "weighted by epoch-second distance; leading/trailing gaps stay "
        "null (no extrapolation). Two per-key ordered windows (prev "
        "non-null carried forward, next non-null carried backward) — "
        "parallel across keys, no global sort. Output is scaled-integer "
        "(v_interp_e4 = ten-thousandths): interpolation runs in exact "
        "integer arithmetic with one IEEE-exact int/int division, so "
        "both engines produce bit-identical values — float-space "
        "interpolation of 4-decimal inputs lands on rounding boundaries "
        "(midpoints) where 1-ulp association differences split the "
        "rounded output.",
)
def gapfill_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy(F.col("event_type"), hour.alias("hour")).agg(
        F.round(F.max("value"), 4).alias("vmax")
    )
    bounds = e.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("hour"),
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("vmax").isNotNull(), F.col("hour"))
    joined = (
        spine.join(hourly, ["event_type", "hour"], "left")
        .withColumn("pv", F.last("vmax", ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(obs_hour, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("vmax", ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(obs_hour, ignorenulls=True).over(w_next))
    )
    # Exact integer-space interpolation: values scale to ten-thousandth
    # BIGINTs, the weighted numerator is exact integer arithmetic, and
    # the single int/int division is IEEE-exact-rounded — so both
    # engines produce BIT-IDENTICAL doubles before the final round.
    # (Float-space interpolation of 4-decimal inputs lands ON rounding
    # boundaries constantly — e.g. midpoint of .1234 and .1236 — and
    # 1-ulp association differences then split the rounded output.)
    pv4 = F.round(F.col("pv") * 10000).cast("long")
    nv4 = F.round(F.col("nv") * 10000).cast("long")
    num = F.unix_timestamp("hour") - F.unix_timestamp("pt")
    den = F.unix_timestamp("nt") - F.unix_timestamp("pt")
    return (
        joined.select(
            "event_type",
            "hour",
            "vmax",
            F.when(
                F.col("vmax").isNotNull(),
                F.round(F.col("vmax") * 10000).cast("long"),
            )
            .otherwise(
                F.when(
                    F.col("pv").isNotNull() & F.col("nv").isNotNull(),
                    F.round((pv4 * den + (nv4 - pv4) * num) / den).cast("long"),
                )
            )
            .alias("v_interp_e4"),
        )
        .orderBy("event_type", "hour")
    )
