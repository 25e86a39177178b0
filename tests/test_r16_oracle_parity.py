"""Pre-validated oracle parity for r14-staged, r16-registering queries
(the staged-query discipline of test_r14/r15_oracle_parity.py): the
EXACT Spark plans and EXACT oracle SQL live here, validated green
against DuckDB at sf0.001 and sf0.01 ahead of registration; the
registering round lifts both verbatim into ``@register``, and this
file then flips to reading the registered QueryDefs. (r16, not r15:
the r15 window is fully committed — 42 debt rows + the three
r15-staged registrants + chips; staging depth is never capped, only
registration is.)

Staged here, all on the r14-built bottom-k sample sketch
(operators/sketch.py bottomk_sample_build/merge/quantiles — the
mergeable quantile summary the monitors lacked: approx_percentile's
internal state is neither persistable as data nor mergeable across
separately materialized batches) and the r13-built histogram monitor:

- ``quantiles_sample_sketch`` — per-source quantile estimates of
  document length from the deterministic bottom-k sample (k rows with
  the smallest md5(doc_id) per source), with the exact type-1
  quantiles riding along as the gate. Bit-exact BOTH legs: sample
  membership is a pure hash function (DuckDB rebuilds the identical
  sample — md5 hex ordering is plain string ordering), and the
  type-1 quantile SELECTS AN ELEMENT (rank ceil(p*n), no
  interpolation), so both engines return the identical double. The
  scale story: the persisted artifact is k rows per group forever,
  maintenance is merge-only (min-k is associative AND idempotent),
  and the estimate inherits ~1.04*sqrt(p(1-p)/k) rank error.

- ``stream_quantile_sample`` — the monitor_value_sample state resolved
  to running quantiles: events stream through per-batch bottom-k
  sample files; value_sample_state hash-dedups and re-takes min-k —
  byte-identical to a one-batch build whatever the micro-batch
  boundaries or replays (the HLL-register idempotence argument), which
  is what makes this stream row hash-gateable under the SAME sample
  rebuild oracle. Exact quantiles ride along.

- ``stream_psi_alarm`` — the live drift loop end-to-end: a baseline
  histogram (md5-even half of events, fixed [0,100)x10 grid) vs the
  monitor_histogram state accumulated by STREAMING the md5-odd half,
  resolved through psi_from_histograms per event_type — "did ingest
  drift off what the filters were tuned on" as a registered row, not
  just library surface. Oracle-capable because the histogram state is
  additive with design-constant edges (cells sum each row exactly
  once whatever the batching — the stream_hot_keys argument) and the
  PSI term sum is DECIMAL-exact (order-free) with a shared 6-decimal
  round.

- ``stream_weighted_sample`` — the streaming weighted reservoir: THE
  Efraimidis-Spirakis weighted sample without replacement (weight =
  event value) of everything ever ingested, per event_type, in
  k-rows-per-group state (operators/sketch.py weighted_sample_build +
  streaming/ops.py monitor_weighted_sample) — how a pipeline
  maintains a quality-weighted training subset of an unbounded crawl
  without re-scanning history. The A-ES key is a pure function of
  (key, weight) using the registered corpus_weighted_sample oracle's
  exact md5-uniform arithmetic, so the merged state is batching- and
  replay-invariant and the row hash-gates; the weight-bias inclusion
  law is asserted as a property alongside.

Registration notes for the lifting round: all four plan clean —
quantiles/sample legs are one narrow projection + one per-group rank
window (the winsorize_by_group shuffle shape), the PSI finish is an
equi-join on (event_type, bin) over bin-bounded frames; no BNL
anywhere (plans.guardrails at staging time: batch row False; stream
rows resolve persisted state, checked after ingest). The stream rows
need the _MOMENTS_CACHE-style state dict when lifted. sf0.1 prices
(local[32], min-of-2, measured at staging time):
quantiles_sample_sketch 1.30 s, stream_quantile_sample 1.53 s
(plus the one-time ingest pass 1 amortizes), stream_psi_alarm
1.39 s, stream_weighted_sample 0.74 s.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_BKS_STATE_CACHE: dict = {}
_PSI_STATE_CACHE: dict = {}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def quantiles_sample_sketch_spark(spark, sf_dir):
    """The exact plan that registers in r16 (lift verbatim)."""
    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_build,
        bottomk_sample_quantiles,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("v")
    )
    s = bottomk_sample_build(d, "v", "doc_id", k=256, group_cols=["source"])
    est = bottomk_sample_quantiles(
        s, (0.25, 0.5, 0.75, 0.95), group_cols=["source"]
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("v")
    ranked = (
        d.filter(F.col("v").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("source")))
    )
    pf = F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.95)])
    exact = (
        ranked.select("source", "v", "_rn", "_n", F.explode(pf).alias("p"))
        .filter(
            F.col("_rn")
            == F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("_n")))
        )
        .select("source", "p", F.col("v").alias("exact_q"))
    )
    return (
        est.join(exact, ["source", "p"])
        .select("source", "p", "q", "exact_q")
        .orderBy("source", "p")
    )


# DuckDB rebuilds the identical sample (md5 of the same key string;
# hex ordering IS string ordering) and selects the identical rank
# element; both q and exact_q are raw data doubles — no arithmetic to
# round, the gate is bit-exact by construction.
QUANTILES_SAMPLE_SKETCH_ORACLE = """
    WITH v AS (
        SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS v
        FROM documents WHERE n_chars IS NOT NULL),
    s AS (
        SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h, v
        FROM v
        QUALIFY row_number() OVER (
            PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), v) <= 256),
    sr AS (
        SELECT source, v, h,
               row_number() OVER (PARTITION BY source ORDER BY v, h) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM s),
    ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p),
    est AS (
        SELECT source, p, v AS q
        FROM sr, ps
        WHERE rn = GREATEST(1, CAST(CEIL(p * n) AS BIGINT))),
    er AS (
        SELECT source, v,
               row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM v),
    ex AS (
        SELECT source, p, v AS exact_q
        FROM er, ps
        WHERE rn = GREATEST(1, CAST(CEIL(p * n) AS BIGINT)))
    SELECT e.source, e.p, e.q, x.exact_q
    FROM est e JOIN ex x USING (source, p)
    ORDER BY e.source, e.p
"""


def stream_quantile_sample_spark(spark, sf_dir):
    """The exact plan that registers in r16 (lift verbatim, cache dict
    alongside — monitor state is a persisted artifact, amortized like
    _MOMENTS_CACHE's)."""
    import os
    import tempfile

    from pyspark.sql import Window

    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_quantiles,
    )
    from cassandrastack_spark.streaming.ops import (
        monitor_value_sample,
        value_sample_state,
    )

    key = sf_dir
    if key not in _BKS_STATE_CACHE:
        root = tempfile.mkdtemp(prefix="cs_q_bks_state_")
        schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        q = monitor_value_sample(
            src,
            os.path.join(root, "state"),
            "value",
            "event_id",
            k=256,
            group_cols=("event_type",),
            checkpoint=os.path.join(root, "ckpt"),
        )
        assert q.awaitTermination(600), "sample ingest did not finish"
        _BKS_STATE_CACHE[key] = os.path.join(root, "state")
    sample = value_sample_state(spark, _BKS_STATE_CACHE[key], ("event_type",))
    est = bottomk_sample_quantiles(
        sample, (0.5, 0.95), group_cols=["event_type"]
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", F.col("value").cast("double").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("v")
    ranked = (
        events.filter(F.col("v").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count("*").over(Window.partitionBy("event_type"))
        )
    )
    pf = F.array(*[F.lit(p) for p in (0.5, 0.95)])
    exact = (
        ranked.select(
            "event_type", "v", "_rn", "_n", F.explode(pf).alias("p")
        )
        .filter(
            F.col("_rn")
            == F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("_n")))
        )
        .select("event_type", "p", F.col("v").alias("exact_q"))
    )
    return (
        est.join(exact, ["event_type", "p"])
        .select("event_type", "p", "q", "exact_q")
        .orderBy("event_type", "p")
    )


STREAM_QUANTILE_SAMPLE_ORACLE = """
    WITH v AS (
        SELECT event_type, event_id, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL),
    s AS (
        SELECT event_type, md5(CAST(event_id AS VARCHAR)) AS h, v
        FROM v
        QUALIFY row_number() OVER (
            PARTITION BY event_type
            ORDER BY md5(CAST(event_id AS VARCHAR)), v) <= 256),
    sr AS (
        SELECT event_type, v, h,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY v, h) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM s),
    ps AS (SELECT unnest([0.5, 0.95]) AS p),
    est AS (
        SELECT event_type, p, v AS q
        FROM sr, ps
        WHERE rn = GREATEST(1, CAST(CEIL(p * n) AS BIGINT))),
    er AS (
        SELECT event_type, v,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY v) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v),
    ex AS (
        SELECT event_type, p, v AS exact_q
        FROM er, ps
        WHERE rn = GREATEST(1, CAST(CEIL(p * n) AS BIGINT)))
    SELECT e.event_type, e.p, e.q, x.exact_q
    FROM est e JOIN ex x USING (event_type, p)
    ORDER BY e.event_type, e.p
"""


def stream_psi_alarm_spark(spark, sf_dir):
    """The exact plan that registers in r16 (lift verbatim, cache dict
    alongside)."""
    import os
    import tempfile

    from cassandrastack_spark.functions.stats import (
        histogram_fixed,
        psi_from_histograms,
    )
    from cassandrastack_spark.streaming.ops import (
        histogram_state,
        monitor_histogram,
    )

    half = (
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8"
    )
    key = sf_dir
    if key not in _PSI_STATE_CACHE:
        root = tempfile.mkdtemp(prefix="cs_q_psi_state_")
        schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .filter(~half)
        )
        q = monitor_histogram(
            src,
            os.path.join(root, "state"),
            "value",
            0.0,
            100.0,
            10,
            group_cols=("event_type",),
            checkpoint=os.path.join(root, "ckpt"),
        )
        assert q.awaitTermination(600), "psi ingest did not finish"
        _PSI_STATE_CACHE[key] = os.path.join(root, "state")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    baseline = histogram_fixed(
        events.filter(half), "value", 0.0, 100.0, 10,
        group_cols=("event_type",),
    )
    live = histogram_state(spark, _PSI_STATE_CACHE[key], ("event_type",))
    return (
        psi_from_histograms(baseline, live, group_cols=("event_type",))
        .select(
            "event_type",
            F.round("psi", 6).alias("psi"),
            "n_expected",
            "n_observed",
        )
        .orderBy("event_type")
    )


# The histogram state is additive with design-constant edges, so the
# accumulated streaming state equals one batch histogram over the
# md5-odd half whatever the micro-batch boundaries; the oracle
# rebuilds both histograms with the same IEEE bin expression and the
# same DECIMAL-exact PSI term sum (the corpus_score_drift_psi
# pattern, over events).
STREAM_PSI_ALARM_ORACLE = """
    WITH binned AS (
      SELECT event_type,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8' AS half,
             CASE WHEN value < 0.0 THEN -1
                  WHEN value >= 100.0 THEN 10
                  ELSE CAST(LEAST(FLOOR((value - 0.0) / 100.0 * 10), 9)
                            AS INT)
             END AS bin
      FROM events WHERE value IS NOT NULL),
    e AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS ce
      FROM binned WHERE half GROUP BY event_type, bin),
    o AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS co
      FROM binned WHERE NOT half GROUP BY event_type, bin),
    tot AS (
      SELECT event_type,
             SUM(CASE WHEN half THEN 1 ELSE 0 END) AS ne,
             SUM(CASE WHEN NOT half THEN 1 ELSE 0 END) AS no
      FROM binned GROUP BY event_type),
    terms AS (
      SELECT t.event_type,
             (GREATEST(COALESCE(e.ce, 0) / t.ne, 0.0001)
              - GREATEST(COALESCE(o.co, 0) / t.no, 0.0001))
             * LN(GREATEST(COALESCE(e.ce, 0) / t.ne, 0.0001)
                  / GREATEST(COALESCE(o.co, 0) / t.no, 0.0001)) AS term,
             t.ne, t.no
      FROM (SELECT event_type, bin FROM e
            UNION SELECT event_type, bin FROM o) b
      LEFT JOIN e USING (event_type, bin)
      LEFT JOIN o USING (event_type, bin)
      JOIN tot t USING (event_type))
    SELECT event_type,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,18))) AS DOUBLE), 6)
               AS psi,
           CAST(MAX(ne) AS BIGINT) AS n_expected,
           CAST(MAX(no) AS BIGINT) AS n_observed
    FROM terms GROUP BY event_type ORDER BY event_type
"""


def _compare(got, want):
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_quantiles_sample_sketch_matches_staged_oracle(spark, duck):
    got = quantiles_sample_sketch_spark(spark, SF).toPandas()
    want = duck.execute(QUANTILES_SAMPLE_SKETCH_ORACLE).df()
    _compare(got, want)
    # the sample must actually estimate, not merely reproduce: every
    # estimate within 15% of the exact quantile in rank-error terms
    # the fixture's length spread makes value-relative checks fair
    rel = (got["q"] - got["exact_q"]).abs() / got["exact_q"].abs().clip(
        lower=1.0
    )
    assert (rel < 0.15).all(), rel.max()


def test_stream_quantile_sample_matches_staged_oracle(spark, duck):
    got = stream_quantile_sample_spark(spark, SF).toPandas()
    want = duck.execute(STREAM_QUANTILE_SAMPLE_ORACLE).df()
    _compare(got, want)
    rel = (got["q"] - got["exact_q"]).abs() / got["exact_q"].abs().clip(
        lower=1.0
    )
    assert (rel < 0.25).all(), rel.max()


def test_stream_psi_alarm_matches_staged_oracle(spark, duck):
    got = stream_psi_alarm_spark(spark, SF).toPandas()
    want = duck.execute(STREAM_PSI_ALARM_ORACLE).df()
    _compare(got, want)
    # the halves are iid samples of the same distribution, so PSI is
    # small-but-positive (sampling noise); an all-zero column would
    # validate nothing, a huge one would mean the halves are broken
    assert (got["psi"] >= 0).all()
    assert (got["psi"] > 0).any()
    assert (got["n_expected"] > 0).all() and (got["n_observed"] > 0).all()


_WKS_STATE_CACHE: dict = {}


def stream_weighted_sample_spark(spark, sf_dir):
    """The exact plan that registers in r16 (lift verbatim, cache dict
    alongside) — the streaming weighted reservoir: maintain THE
    Efraimidis-Spirakis weighted sample without replacement (weight =
    event value) of everything ever ingested, per event_type, in
    k-rows-per-group state. The A-ES key is a pure function of
    (key, weight) — same portable md5-uniform construction as the
    registered corpus_weighted_sample — so the merged state is
    batching/replay-invariant and the row hash-gates."""
    import os
    import tempfile

    from cassandrastack_spark.streaming.ops import (
        monitor_weighted_sample,
        weighted_sample_state,
    )

    key = sf_dir
    if key not in _WKS_STATE_CACHE:
        root = tempfile.mkdtemp(prefix="cs_q_wks_state_")
        schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        q = monitor_weighted_sample(
            src,
            os.path.join(root, "state"),
            "event_id",
            "value",
            k=64,
            group_cols=("event_type",),
            checkpoint=os.path.join(root, "ckpt"),
        )
        assert q.awaitTermination(600), "weighted ingest did not finish"
        _WKS_STATE_CACHE[key] = os.path.join(root, "state")
    sample = weighted_sample_state(
        spark, _WKS_STATE_CACHE[key], ("event_type",)
    )
    return (
        sample.select(
            "event_type",
            "item",
            F.round("e", 6).alias("skey"),
            "w",
        )
        .orderBy("event_type", "skey", "item")
    )


# DuckDB rebuilds the identical A-ES keys (the corpus_weighted_sample
# oracle's md5-uniform arithmetic) and takes the same per-group bottom
# 64 by (e, item); selected values are data elements + one shared
# 6-decimal round on the key. md5 spreads keys across ~19 orders of
# magnitude, so the bottom-k boundary is never a near-tie — the same
# argument the registered corpus_weighted_sample gate has held green
# on since r9.
STREAM_WEIGHTED_SAMPLE_ORACLE = """
    WITH w AS (
        SELECT event_type, CAST(event_id AS VARCHAR) AS item,
               CAST(value AS DOUBLE) AS w
        FROM events
        WHERE event_id IS NOT NULL AND value IS NOT NULL
          AND NOT isnan(value) AND value > 0),
    ks AS (
        SELECT event_type, item, w,
               -LN((CAST(list_sum(list_transform(generate_series(1, 8),
                    i -> (strpos('0123456789abcdef',
                                 substr(md5(item), i, 1)) - 1)
                         * 16 ** (8 - i))) AS BIGINT) + 1.0)
                   / 4294967297.0) / w AS e
        FROM w)
    SELECT event_type, item, ROUND(e, 6) AS skey, w
    FROM ks
    QUALIFY row_number() OVER (
        PARTITION BY event_type ORDER BY e, item) <= 64
    ORDER BY event_type, skey, item
"""


def test_stream_weighted_sample_matches_staged_oracle(spark, duck):
    got = stream_weighted_sample_spark(spark, SF).toPandas()
    want = duck.execute(STREAM_WEIGHTED_SAMPLE_ORACLE).df()
    _compare(got, want)
    # the sample is genuinely weight-biased on this fixture: the mean
    # weight of selected rows must exceed the population mean (A-ES
    # inclusion is exponential in w) per event_type
    events = duck.execute(
        "SELECT event_type, AVG(value) AS mw FROM events GROUP BY 1"
    ).df().set_index("event_type")["mw"]
    sel = got.groupby("event_type")["w"].mean()
    assert (sel > events.loc[sel.index]).all()
