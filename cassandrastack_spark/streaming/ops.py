"""Streaming operators over the ``events`` stream.

Design notes (100 TB / always-on):

- **File-source streams.** ``readStream`` over a directory is the batch
  table's streaming twin: the same schema, the same downstream plan. In
  production the source would be Kafka; only ``events_stream`` changes.
- **Watermarks bound state.** Every windowed/stateful op takes a
  watermark delay: state for windows older than ``max(event_time) -
  delay`` is dropped, so state size is O(active windows), not O(stream
  length). Late rows beyond the watermark are dropped (tested).
- **Built-in windows first.** Tumbling/sliding via ``F.window``, session
  gaps via ``F.session_window`` — all JVM-side incremental aggregation
  with partial-agg + state store. ``applyInPandasWithState`` only for
  the genuinely custom stateful op (running per-user totals with
  arbitrary Python state), Arrow-batched per group.
- **run_to_batch** executes a streaming plan over the finite test
  directory with ``availableNow`` + memory sink — the driver's
  correctness gate can then hash streaming results like any batch
  DataFrame (same-result-as-batch is exactly Structured Streaming's
  contract: incrementalized execution of the same logical plan).
"""

from __future__ import annotations

import itertools
import json
import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        # ts is probed from the actual files at stream start (physical
        # type has varied across testdata generations: nanos-as-long vs
        # native micros); this default covers the micros encoding.
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_sink_ids = itertools.count()


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming read of events parquet (a directory or a single file).

    A streaming source needs an explicit schema, but ``ts``'s physical
    type has varied across testdata generations (TIMESTAMP(NANOS) read
    as long nanos vs native TIMESTAMP(MICROS) -> timestamp_ntz), so the
    schema is probed from the files' own footers with a driver-side
    batch read (metadata only, no job) instead of hard-coding either
    encoding. Long nanos are converted with integer division — double
    math would lose precision at 1.7e18.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    directory, glob = (
        (os.path.dirname(path), os.path.basename(path))
        if path.endswith(".parquet")
        else (path, "*.parquet")
    )
    probed = (
        spark.read.option("pathGlobFilter", glob).parquet(directory).schema
    )
    stream = (
        spark.readStream.schema(probed)
        .option("pathGlobFilter", glob)
        .parquet(directory)
    )
    if isinstance(probed["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        # Watermarks require TimestampType (EVENT_TIME_IS_NOT_ON_TIMESTAMP
        # for ntz); under a UTC session the cast is wall-clock-identical.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


# ---------------------------------------------------------------------------
# windowed aggregation
# ---------------------------------------------------------------------------


def tumbling_window_counts(
    stream: DataFrame, width: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-(window, event_type) count + value sum, watermarked."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_counts(
    stream: DataFrame,
    width: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping-window counts: each event lands in width/slide windows."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_window_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows with an inactivity gap (built-in
    ``session_window`` — merges overlapping per-key windows in the state
    store; the streaming twin of operators/windows.py sessionize)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# streaming dedup
# ---------------------------------------------------------------------------


def streaming_dedup(
    stream: DataFrame, keys: list[str], watermark: str = "30 minutes"
) -> DataFrame:
    """Exactly-once rows per key within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — bounded state, unlike plain ``dropDuplicates``
    which retains every key forever (unusable on an infinite stream).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


# ---------------------------------------------------------------------------
# stream-stream join
# ---------------------------------------------------------------------------


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    lookback_seconds: int,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner join of two streams on key + time interval: each left row
    matches right rows with ``right_time`` in ``[left_time - lookback,
    left_time]``.

    Both sides are watermarked and the join condition bounds event time
    in BOTH directions, so Spark can expire join state: buffered rows
    older than watermark + lookback are dropped — bounded state on an
    infinite stream (without the interval bound, stream-stream state
    grows forever). Time/key columns should be distinctly named across
    the two sides so the joined output is unambiguous.
    """
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    return l.join(
        r,
        (l[left_key] == r[right_key])
        & (r[right_time] >= l[left_time] - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
        & (r[right_time] <= l[left_time]),
        "inner",
    )


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Running per-user (count, value-sum) with explicit state — the
    template for custom stateful ops Spark's built-ins can't express
    (per-key model state, decaying counters, CEP). Arrow-batched per
    group; state is two scalars per user, emitted once per batch.
    """

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BLOOM_DEDUP_STATE = StructType([StructField("bitmap", BinaryType())])


def stateful_bloom_dedup(
    stream: DataFrame,
    item_col: str,
    n_buckets: int = 64,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Streaming content dedup with BOUNDED state: emit only rows whose
    ``item_col`` value has not been seen before, tracking "seen" in a
    per-bucket Bloom bitmap instead of an exact key store.

    The trade vs ``streaming_dedup`` (dropDuplicatesWithinWatermark):
    exact dedup state grows with the distinct-key count inside the
    watermark horizon and needs a watermark to be bounded at all; the
    Bloom state is a FIXED ``n_buckets x m_bits`` bits forever (64 x
    64 Ki bits = 512 KiB total at the defaults), so it can dedup an
    unbounded horizon — the training-data ingest case, where "have I
    ever ingested this document" has no time window. Guarantees: a
    seen item is NEVER re-emitted (no false negatives — bits only get
    set); a novel item may be wrongly dropped with probability
    ~(1 - e^(-k*n_items/(n_buckets*m_bits)))^k (the design FP rate;
    size the bitmap at >= 12 bits per expected item for ~1%). That
    asymmetry — duplicates impossible, rare novel-drops — is the right
    one for corpus ingest, where a duplicate poisons training and a
    dropped doc costs one sample.

    Spark shape: the k probe positions are computed JVM-side (md5
    slices, the ``operators.sketch`` Bloom's layout) BEFORE the
    shuffle; rows hash into ``n_buckets`` independent groups
    (``xxhash64(item) % n_buckets``), so state updates parallelize
    across buckets and each group's update is pure vectorized numpy
    over an Arrow batch — no per-row Python, no global coordinator.
    Items are deduped within the batch first (keep-first), so
    intra-batch duplicates collapse too.
    """
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in 1..4, got {k}")
    if m_bits < 8 or m_bits % 8:
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from cassandrastack_spark.operators.sketch import _BLOOM_OFFSETS

    hx = F.md5(F.col(item_col).cast("string"))
    pos = F.array(*[
        F.conv(F.substring(hx, off, 7), 16, 10).cast("long") % m_bits
        for off in _BLOOM_OFFSETS[:k]
    ])
    tagged = (
        stream.withColumn(
            "_bucket",
            F.pmod(
                F.xxhash64(F.col(item_col).cast("string")), F.lit(n_buckets)
            ).cast("int"),
        )
        .withColumn("_pos", pos)
    )
    out_schema = StructType(list(stream.schema.fields))
    out_cols = [f.name for f in stream.schema.fields]
    nbytes = m_bits // 8

    def update(key, pdf_iter, state: GroupState):
        import numpy as np

        if state.exists:
            (buf,) = state.get
            bitmap = np.frombuffer(buf, dtype=np.uint8).copy()
        else:
            bitmap = np.zeros(nbytes, dtype=np.uint8)
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            # NULL content can't be a member: emit such rows as-is and
            # keep them out of the bitmap (their positions are null and
            # would poison the vectorized path)
            null_rows = pdf.loc[pdf[item_col].isna()]
            if len(null_rows):
                yield null_rows[out_cols]
                pdf = pdf.loc[~pdf[item_col].isna()]
                if not len(pdf):
                    continue
            pdf = pdf.drop_duplicates(subset=[item_col], keep="first")
            P = np.asarray(pdf["_pos"].tolist(), dtype=np.int64)
            seen = (
                (bitmap[P // 8] >> (P % 8).astype(np.uint8)) & 1
            ).all(axis=1)
            novel = pdf.loc[~seen]
            if len(novel):
                Pn = P[~seen]
                np.bitwise_or.at(
                    bitmap,
                    (Pn // 8).ravel(),
                    (np.uint8(1) << (Pn % 8).astype(np.uint8)).ravel(),
                )
                yield novel[out_cols]
        state.update((bitmap.tobytes(),))

    return tagged.groupBy("_bucket").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_BLOOM_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# finite execution harness
# ---------------------------------------------------------------------------


def run_to_batch(
    streaming_df: DataFrame,
    output_mode: str = "complete",
    state_partitions: int = 8,
) -> DataFrame:
    """Run a streaming plan over its (finite) source to completion and
    return the result as a batch DataFrame (memory sink + availableNow).

    Used by the correctness gate: streaming results hash-compare against
    the batch oracle, which is Structured Streaming's core guarantee.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for this
    query only (restored after). Stateful operators create one state
    store PER partition PER operator-internal store (a stream-stream
    join keeps four), each paying checkpoint-commit I/O every micro-
    batch — fixed cost independent of data volume, so state partition
    count must be sized to STATE volume, not defaulted to the batch
    shuffle width (32 partitions made this harness 5x slower on
    kilobyte-scale state). The count is frozen into the checkpoint at
    first run — a production stream sizes it up front the same way.
    """
    spark = streaming_df.sparkSession
    name = f"cs_stream_sink_{os.getpid()}_{next(_sink_ids)}"
    checkpoint = tempfile.mkdtemp(prefix="cs_stream_ckpt_")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming ingest into the wide-column store
# ---------------------------------------------------------------------------


def ingest_stream(
    stream: DataFrame,
    table,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Continuously append a stream into a ``WideColumnTable`` — the
    streaming twin of the reference's write path (W1/W3 batched inserts,
    ``server.py:131-139``): each micro-batch lands as ONE atomic
    bucketed+sorted append through the table's own writer, so upsert
    semantics, clustering order, and bucket routing are identical to
    batch writes, and the checkpoint gives exactly-once per batch.

    ``foreachBatch`` is the right seam here (not a direct file sink):
    the store's layout contract — hash-bucket directories, per-file
    clustering sort, monotonic ``_writetime`` — lives in
    ``WideColumnTable.append``, and micro-batches reuse it unchanged.

    Returns the StreamingQuery. With ``trigger_available_now`` the call
    drains the available input and stops (the testable finite mode); in
    production pass ``False`` for a continuous trigger and keep a
    durable ``checkpoint``.
    """
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_ingest_ckpt_")

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        table.append(batch_df)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# stream-static (dimension) join
# ---------------------------------------------------------------------------


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: list[tuple[str, str]]
) -> DataFrame:
    """Enrich a stream with a static (batch) dimension — the standard
    fact-stream x dim-table join. Structured Streaming re-plans the
    static side per micro-batch, so a small dim becomes a broadcast
    join with NO stream-side shuffle and no state store (unlike
    stream-stream joins); at 100 TB of stream this is the only join
    shape that costs nothing in state. The dim snapshot is re-read per
    batch, so slowly-changing dims pick up updates between batches.
    """
    cond = None
    for ls, rs in on:
        c = stream[ls] == dim[rs]
        cond = c if cond is None else (cond & c)
    return stream.join(dim, cond, "inner")


# ---------------------------------------------------------------------------
# streaming ingest with continuous-aggregate maintenance
# ---------------------------------------------------------------------------


def ingest_with_rollup(
    stream: DataFrame,
    table,
    rollup_path: str,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    width: str = "1 hour",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """``ingest_stream`` plus a maintained continuous aggregate: each
    micro-batch lands through the table's writer, then the rollup at
    ``rollup_path`` is refreshed incrementally — the micro-batch itself
    IS the change feed (no CDC scan needed on the hot path), so only
    the (bucket, key) groups it touched are recomputed from the
    table's current (upsert-reconciled) state and grafted onto the
    prior rollup. Work per batch scales with the batch, and the rollup
    stays exact under upserts because affected groups re-read current
    state rather than adding deltas blindly.

    The prior rollup is materialized (``localCheckpoint``) before the
    overwrite so the job never reads the files it is replacing.
    """
    from cassandrastack_spark.operators.rollup_ts import (
        refresh_rollup_incremental, rollup_events,
    )

    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_rollup_ckpt_")
    spark = stream.sparkSession

    def _rollup_exists() -> bool:
        # explicit existence probe (any Hadoop scheme): a TRANSIENT read
        # failure on a live rollup must raise, not silently truncate the
        # maintained aggregate to one batch's groups
        return _fs_exists(spark, rollup_path)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        table.append(batch_df)
        current = table.read()
        if _rollup_exists():
            prior = spark.read.parquet(rollup_path).localCheckpoint(eager=True)
        else:
            prior = rollup_events(
                current.limit(0), time_col, key_cols, value_col, width
            )
        refreshed = refresh_rollup_incremental(
            prior, current, batch_df, time_col, key_cols, value_col, width
        )
        refreshed.write.mode("overwrite").parquet(rollup_path)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# custom stateful operator, Spark 4 API (transformWithStateInPandas)
# ---------------------------------------------------------------------------


def stateful_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Running per-user totals on the ``transformWithStateInPandas``
    API (Spark 4's successor to ``applyInPandasWithState``): typed
    ValueState in the RocksDB-backed state store, Arrow-batched input.
    Same contract as ``stateful_user_totals`` — kept side by side so
    both stateful APIs stay exercised; new operators should prefer
    this one (schema'd state, timers, state TTL live here).

    Requires the RocksDB state store provider on the session
    (``spark.sql.streaming.stateStore.providerClass = ...RocksDB...``)
    AND the ``protobuf`` package (the state-server protocol speaks
    protobuf; this container does not ship it, so the accompanying
    test skips here and runs on a real cluster —
    ``applyInPandasWithState`` in ``stateful_user_totals`` is the
    fully-exercised stateful path in this environment).
    """
    try:  # gate: protobuf is not installed in every environment
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(pyspark's state-server protocol); use "
            "stateful_user_totals (applyInPandasWithState) here"
        ) from e
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events long, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n],
                 "total_value": [round(total, 6)]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Totals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def _fs_exists(spark, p: str) -> bool:
    """Hadoop-FS existence probe (any scheme: s3a/gs/abfs/hdfs/file)."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(p)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hp))


def _fs_mkdirs(spark, p: str) -> None:
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(p)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(hp)


def _read_parquet_if_committed(spark, path: str):
    """Distinguish "store committed" from "directory created by a
    crashed first write" (review r16): DataFrameWriter creates the
    target directory BEFORE any file commits, so a crash during the
    very first append leaves an existing-but-unreadable path — a bare
    existence probe then routes the replay into a read that fails
    with a schema-inference error on every restart, wedging the
    stream until manual cleanup. Returns the DataFrame when ``path``
    holds readable parquet data, else None (missing OR uncommitted —
    both mean "no committed state yet", and the first-write branches
    are idempotent under that reading)."""
    if not _fs_exists(spark, path):
        return None
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force schema inference inside the guard
        return df
    except AnalysisException:
        return None


def ingest_with_dedup(
    stream: DataFrame,
    index_path: str,
    accepted_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
    bm25_index_path: str | None = None,
):
    """Streaming corpus ingest with near-dup rejection — the full
    production loop over the persisted MinHash band index
    (``llm/dedup.py build/probe/extend_dedup_index``): each micro-batch

    1. probes the STORED index (only the batch is shingled/hashed),
    2. drops batch docs whose Jaccard vs any accepted doc ≥ threshold
       (and collapses in-batch exact duplicates on the text digest —
       the cheap guard for dups arriving within one batch),
    3. appends survivors to the accepted corpus at ``accepted_path``
       and EXTENDS the index with their band rows.

    With ``bm25_index_path`` set, each batch's survivors also extend
    the persisted BM25 postings (``llm/retrieval.py build/extend_
    bm25_index``) under their OWN per-epoch replay guard — one pass
    through the pipeline maintains both the dedup gate and the
    retrieval index, the whole crawl-drop loop: probe → reject →
    append → index for search. Turning the option on mid-life is
    supported: a missing BM25 index is (re)built from the full
    accepted corpus plus the current survivors, then later batches
    extend. Correctness under replay does not rest on the marker —
    ``probe_bm25_index`` collapses duplicate postings at read time —
    the marker only keeps the index copy-free in the common case.

    ``foreachBatch`` is the seam because the batch must observe the
    index state left by every previous batch — exactly the read-probe-
    write cycle a 100 TB crawl pipeline runs per drop; work per batch
    scales with the batch, never with the accepted corpus (the probe
    is an equi-join on (band, sig) against bucket-sorted parquet).
    Near-dups WITHIN one batch (non-exact) ride to the next drop's
    probe only if accepted here — the standard at-drop-granularity
    trade; run a periodic in-corpus ``minhash_lsh_pairs`` sweep to
    catch stragglers.

    Replay-safe: foreachBatch is at-least-once, so a crashed batch can
    re-run. A replayed doc already in the accepted corpus matches
    ITSELF in the probe (same id, jaccard 1.0 — ``probe_dedup_index``
    deliberately keeps self-id matches) and the id anti-join below
    drops anything accepted under the same id even at lower
    thresholds, so re-running a batch appends nothing twice. Index
    existence is decided by the INDEX's own metadata (Hadoop FS
    existence probe, any scheme) — read failures on a live index
    raise instead of silently rebuilding it from one batch. The index
    extend itself is guarded by a per-epoch marker directory
    (``<checkpoint>/cs_epochs/<batch_id>`` — batch ids are CHECKPOINT-
    scoped, so the marker must share the checkpoint's lineage; an
    index-global marker would make a second run with a fresh checkpoint
    skip extends for colliding batch ids), so a batch replayed after its
    extend committed never appends its band rows twice.
    """
    from cassandrastack_spark.llm.dedup import (
        build_dedup_index,
        extend_dedup_index,
        probe_dedup_index,
    )
    from cassandrastack_spark.llm.retrieval import (
        build_bm25_index,
        extend_bm25_index,
    )

    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_dedup_ckpt_")
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        # in-batch exact dedup: first (lowest id) per text digest wins
        w_digest = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w_digest))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if not _fs_exists(spark, index_path + "/_meta") or not _fs_exists(spark, accepted_path):
            # first batch — or its replay after a crash between the
            # index build and the accepted write (index overwrite is
            # idempotent, so rebuilding from the same batch is safe)
            survivors = batch_df
            build_dedup_index(
                survivors, index_path, id_col=id_col, text_col=text_col
            )
            if bm25_index_path is not None:
                # overwrite-idempotent like the band-index build: a
                # replay of the first batch rebuilds the same postings
                build_bm25_index(
                    survivors, bm25_index_path,
                    id_col=id_col, text_col=text_col,
                )
        else:
            accepted = spark.read.parquet(accepted_path)
            dups = probe_dedup_index(
                batch_df, index_path, accepted,
                id_col=id_col, text_col=text_col, threshold=threshold,
            ).select(F.col("batch_id").alias(id_col)).distinct()
            survivors = (
                batch_df.join(dups, id_col, "left_anti")
                # replay guard: an id already accepted never re-appends
                .join(accepted.select(id_col), id_col, "left_anti")
                .localCheckpoint(eager=True)
            )
            # per-epoch marker (underscore dir: invisible to partition
            # discovery, like `_meta`) makes the extend idempotent under
            # foreachBatch's at-least-once replay: a crash between the
            # index append and the accepted append used to re-extend the
            # index with the same band rows on replay (benign — probe
            # dedups candidates — but the index accreted). Extending
            # BEFORE the accepted append is deliberate: the reverse
            # order would, on a crash between the two writes, replay
            # into "docs accepted but never indexed" — a permanent
            # recall hole, worse than accretion. Only the sub-second
            # extend→touch window can still double-write.
            marker = f"{checkpoint}/cs_epochs/{batch_id}"
            if not _fs_exists(spark, marker):
                extend_dedup_index(
                    survivors, index_path, id_col=id_col, text_col=text_col
                )
                _fs_mkdirs(spark, marker)
            if bm25_index_path is not None:
                if not _fs_exists(spark, bm25_index_path + "/_meta"):
                    # retrofit: the pipeline ran before bm25_index_path
                    # was configured — build the postings from the
                    # FULL corpus (already-accepted docs + this batch's
                    # survivors), not just the batch; build overwrites,
                    # so a replay of this branch is idempotent
                    build_bm25_index(
                        accepted.select(id_col, text_col).unionByName(
                            survivors.select(id_col, text_col)
                        ),
                        bm25_index_path, id_col=id_col, text_col=text_col,
                    )
                else:
                    # own epoch marker (the band extend above may have
                    # committed in a crashed earlier attempt that never
                    # reached this line): double-appended postings from
                    # the residual extend->marker crash window are
                    # collapsed at read time (probe_bm25_index
                    # aggregates per (w, doc_id)), so the marker is an
                    # efficiency guard, not the correctness one
                    bm_marker = f"{checkpoint}/cs_bm25_epochs/{batch_id}"
                    if not _fs_exists(spark, bm_marker):
                        extend_bm25_index(
                            survivors, bm25_index_path,
                            id_col=id_col, text_col=text_col,
                        )
                        _fs_mkdirs(spark, bm_marker)
        survivors.write.mode("append").parquet(accepted_path)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest_vectors(
    stream: DataFrame,
    index_path: str,
    accepted_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reject_cosine: float | None = None,
    nprobe: int = 4,
    k_centroids: int = 16,
    m_sub: int = 8,
    k_codes: int = 16,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming vector ingest into a persisted IVF+PQ index — the
    embedding-side twin of ``ingest_with_dedup``: each micro-batch

    1. collapses in-batch id duplicates (first row per id wins),
       in-batch bit-identical vectors (lowest id wins — without this,
       an availableNow backlog replayed as one batch would land every
       copy of a duplicate cluster), and — when ``reject_cosine`` is
       set — in-batch NEAR-identical vectors: an exact batch-vs-batch
       cosine pass (``cosine_pairs_above``, cost bounded by the batch
       size, never the corpus) feeds connected components and the
       lowest id per near-dup cluster survives (the probe in step 2
       only sees previously ACCEPTED vectors, so without this pass
       two noise-perturbed copies arriving in ONE batch would both
       land permanently),
    2. optionally rejects vectors whose exact re-ranked cosine vs any
       ACCEPTED vector is ≥ ``reject_cosine`` (embedding near-dup
       rejection — probed through the index, so only nprobe lists'
       CODES are scanned per query, never the accepted floats at
       large),
    3. appends survivors' floats to ``accepted_path`` and EXTENDS the
       index with their codes via the STORED training (no retrain —
       ``extend_ivfpq_index``, cost ∝ batch).

    The first batch trains and builds the index (``build_ivfpq_index``
    — overwrite, replay-idempotent). Centroid/codebook drift under a
    shifting stream is handled by periodic rebuilds, like every IVF
    system. Same replay discipline as ``ingest_with_dedup``: an
    accepted id never re-appends (anti-join), and the index extend is
    guarded by a per-epoch marker under ``<checkpoint>/cs_epochs/``
    (checkpoint-scoped, like the batch ids it keys).

    Size the geometry to the SEED batch: PQ training fails loud when
    the first batch holds fewer than ``k_codes`` vectors, and IVF
    clamps ``k_centroids`` to the batch size (each vector seeds its
    own list) — pass smaller ``k_codes``/``m_sub`` for tiny seeds.
    """
    from cassandrastack_spark.llm.simsearch import (
        build_ivfpq_index,
        extend_ivfpq_index,
        probe_ivfpq_index,
    )

    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_vec_ckpt_")
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        # content-keyed election: replay-stable regardless of partition
        # layout (monotonically_increasing_id is neither)
        vec_key = F.xxhash64(F.col(vec_col).cast("string"))
        w_id = Window.partitionBy(id_col).orderBy(
            vec_key, F.col(vec_col).cast("string")
        )
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w_id))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # in-batch CONTENT dedup: bit-identical vectors under different
        # ids collapse to the lowest id (matching ingest_with_dedup's
        # md5-digest in-batch pass) — otherwise an availableNow backlog
        # processed as one batch lands every copy of a duplicate
        # cluster permanently. NEAR-identical in-batch vectors (same
        # content up to float noise, different bits) are handled by
        # the cosine collapse pass right below when reject_cosine is
        # set; with reject_cosine=None they are all kept, matching
        # the corpus probe being off. Partitioned by the
        # vector CONTENT itself, not its 64-bit hash — a hash
        # collision between two different vectors would silently drop
        # one forever, and at the billions-of-vectors backlog this
        # loop targets that probability is not ignorable.
        w_vec = Window.partitionBy(F.col(vec_col).cast("string")).orderBy(
            id_col
        )
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w_vec))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if reject_cosine is not None:
            # in-batch NEAR-dup collapse (batch-vs-batch, bounded):
            # exact cosine pairs at the rejection threshold →
            # connected components → lowest id per cluster survives.
            # Runs on the FIRST batch too (it builds the index and
            # never probes), and before the corpus probe on later
            # batches so a near-dup cluster arriving inside one
            # availableNow backlog lands exactly once. Cost is the
            # triangle-block self-join over THIS batch only —
            # short-circuited for the continuous low-volume case: a
            # <2-row batch can hold no pair (one cheap count on the
            # checkpointed dedup output), and an empty pair frame
            # skips the iterative components loop (several
            # driver-synchronized jobs) that would otherwise tax
            # every micro-batch a fixed latency.
            from cassandrastack_spark.llm.dedup import dedup_components
            from cassandrastack_spark.llm.simsearch import (
                cosine_pairs_above,
            )

            batch_df = batch_df.localCheckpoint(eager=True)
            losers = None
            if batch_df.count() >= 2:
                pairs = cosine_pairs_above(
                    batch_df, id_col=id_col, vec_col=vec_col,
                    threshold=reject_cosine, method="exact",
                ).select("a_id", "b_id").localCheckpoint(eager=True)
                if not pairs.isEmpty():
                    losers = (
                        dedup_components(pairs)
                        .filter(F.col("id") != F.col("component"))
                        .select(F.col("id").alias(id_col))
                    )
            if losers is not None:
                batch_df = batch_df.join(
                    losers, id_col, "left_anti"
                ).localCheckpoint(eager=True)
        if not _fs_exists(spark, index_path + "/_meta") or not _fs_exists(spark, accepted_path):
            survivors = batch_df
            build_ivfpq_index(
                survivors, index_path, id_col=id_col, vec_col=vec_col,
                k_centroids=k_centroids, m_sub=m_sub, k_codes=k_codes,
            )
        else:
            accepted = spark.read.parquet(accepted_path)
            survivors = batch_df
            if reject_cosine is not None:
                # on_missing_corpus="skip": a replay after a crash
                # between the index extend and the accepted append
                # probes with a corpus that lacks exactly THIS batch's
                # ids (extend-before-append is deliberate, see
                # ingest_with_dedup) — "raise" would wedge the stream
                # permanently on that state; the skipped ids are the
                # batch's own vectors, re-checked as they re-land.
                hits = probe_ivfpq_index(
                    spark, index_path, batch_df, accepted,
                    id_col=id_col, vec_col=vec_col,
                    k=1, nprobe=nprobe, include_score=True,
                    on_missing_corpus="skip",
                ).filter(F.col("cosine") >= reject_cosine)
                dups = hits.select(
                    F.col("query_id").alias(id_col)
                ).distinct()
                survivors = survivors.join(dups, id_col, "left_anti")
            survivors = (
                survivors
                # replay guard: an id already accepted never re-appends
                .join(accepted.select(id_col), id_col, "left_anti")
                .localCheckpoint(eager=True)
            )
            marker = f"{checkpoint}/cs_epochs/{batch_id}"
            if not _fs_exists(spark, marker):
                extend_ivfpq_index(
                    survivors, index_path, id_col=id_col, vec_col=vec_col
                )
                _fs_mkdirs(spark, marker)
        survivors.write.mode("append").parquet(accepted_path)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest_with_fuzzy_dedup(
    stream: DataFrame,
    index_path: str,
    accepted_path: str,
    key_col: str = "key",
    str_col: str = "name",
    max_dist: int = 1,
    n_buckets: int = 16,
    block_cols: tuple = (),
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming record ingest with fuzzy-key rejection — the
    entity-resolution twin of ``ingest_with_dedup``, completing the ER
    family's production loop the way the band index, BM25, and IVF+PQ
    loops were completed (VERDICT r15 #6): each micro-batch

    1. drops rows with NULL key/string/blocks (the index contract —
       they carry no match evidence; a crawl record without id or name
       is malformed) and collapses in-batch exact duplicates (lowest
       key per (block_cols..., string) wins — the cheap guard for
       copies arriving within one drop),
    2. probes the PERSISTED deletion-variant index
       (``operators/fuzzy.py probe_fuzzy_index`` — only the batch is
       exploded; the stored corpus never is) and rejects batch rows
       within ``max_dist`` edits of an ACCEPTED record in the same
       block,
    3. appends survivors to ``accepted_path`` and EXTENDS the index
       with their variants under a fresh epoch
       (``extend_fuzzy_index``), marker-guarded.

    Rejection counts only matches whose index (block_cols..., key)
    identity is already in the accepted store — NOT every index hit
    (identity is block-scoped throughout the fuzzy-index family: the
    same key under different block values is different evidence). The difference is the crash
    window between the index extend and the accepted append: a batch
    replayed inside it self-matches its OWN just-extended rows, and
    rejecting on those would permanently lose the batch (indexed but
    never accepted — the recall-hole analysis of ``ingest_with_dedup``,
    inverted). Joining matches to accepted keys makes the replay
    re-derive the identical survivor set: the accepted store is
    unchanged, the new index rows' keys are not in it, so they reject
    nothing; the per-epoch marker (``<checkpoint>/cs_epochs/<batch_id>``
    — checkpoint-scoped for the same lineage reason as
    ``ingest_with_dedup``'s) then skips the re-extend, and the append
    completes the interrupted attempt. Replay after the accepted
    append committed: every batch key self-matches an accepted row at
    dist 0 and the accepted-key anti-join drops it — nothing appends
    twice.

    Near-duplicates WITHIN one batch (non-exact) ride through
    together — the standard at-drop-granularity trade, same as
    ``ingest_with_dedup``; run a periodic ``fuzzy_self_pairs`` +
    ``dedup_components`` sweep over the accepted store to catch
    stragglers. Work per batch scales with the batch, never the
    corpus: probe variants are a constant fan-out of the batch,
    pruned to their own variant buckets; the extend explodes only
    survivors.
    """
    from cassandrastack_spark.operators.fuzzy import (
        build_fuzzy_index,
        extend_fuzzy_index,
        probe_fuzzy_index,
    )

    bc = tuple(block_cols)
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_fuzzy_ckpt_")
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = (
            batch_df.withColumn("_s", F.col(str_col).cast("string"))
            .na.drop(subset=[*bc, key_col, "_s"])
            .localCheckpoint(eager=True)
        )
        if not batch_df.limit(1).count():
            # empty batch (no-data tick, or every row malformed):
            # nothing to probe, index, or append — and the first-batch
            # branch must not reach build_fuzzy_index's empty-corpus
            # raise
            return
        # in-batch exact collapse: lowest key per (blocks, string) wins
        w_s = Window.partitionBy(*bc, "_s").orderBy(key_col)
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w_s))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        accepted = _read_parquet_if_committed(spark, accepted_path)
        if accepted is None:
            # first batch — or its replay after a crash between the
            # index build and the accepted write, INCLUDING a crash
            # mid-first-append that left the directory created but
            # uncommitted (review r16; index overwrite is idempotent,
            # so rebuilding from the same batch is safe)
            survivors = batch_df.drop("_s")
            build_fuzzy_index(
                survivors, index_path, key_col, str_col,
                max_dist=max_dist, n_buckets=n_buckets, block_cols=bc,
            )
        else:
            if not _fs_exists(spark, index_path + "/_meta"):
                # recovery: the index was lost AFTER batches were
                # accepted (deleted, mis-pathed, partial restore).
                # Rebuilding from the batch alone would leave the
                # whole pre-existing accepted corpus unguarded — every
                # future near-dup of it silently accepted (review r16;
                # the bm25 retrofit branch of ingest_with_dedup is the
                # precedent). Rebuild from the FULL accepted store,
                # then probe this batch against it as normal; build
                # overwrites, so a replay of this branch is idempotent.
                build_fuzzy_index(
                    accepted, index_path, key_col, str_col,
                    max_dist=max_dist, n_buckets=n_buckets,
                    block_cols=bc,
                )
            matches = probe_fuzzy_index(
                spark, index_path, batch_df, "_s", max_dist=max_dist
            )
            # identity is (block_cols..., key) — the fuzzy-index
            # family's contract (_current_epochs): the same key under
            # different block values is DIFFERENT evidence. Joining on
            # key alone would (a) treat a crashed attempt's index row
            # in block B2 as "accepted" because the key is accepted in
            # B1, re-rejecting rows the crash-window analysis promises
            # to re-accept, and (b) let the replay guard silently drop
            # a record whose key is accepted under another block
            # (review r16).
            acc_keys = accepted.select(
                *bc, F.col(key_col).alias("key")
            ).distinct()
            rejected = (
                matches.join(acc_keys, [*bc, "key"])
                .select(*bc, F.col("s_probe").alias("_s"))
                .distinct()
            )
            survivors = (
                batch_df.join(rejected, [*bc, "_s"], "left_anti")
                # replay guard: a (blocks, key) already accepted never
                # re-appends
                .join(
                    accepted.select(*bc, key_col), [*bc, key_col],
                    "left_anti",
                )
                .drop("_s")
                .localCheckpoint(eager=True)
            )
            # extend BEFORE the accepted append (the ingest_with_dedup
            # ordering): the reverse order would, on a crash between
            # the writes, replay into "records accepted but never
            # indexed" — a permanent recall hole, worse than the
            # marker-closed accretion window
            marker = f"{checkpoint}/cs_epochs/{batch_id}"
            if not _fs_exists(spark, marker):
                extend_fuzzy_index(survivors, index_path, key_col, str_col)
                _fs_mkdirs(spark, marker)
        survivors.write.mode("append").parquet(accepted_path)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def monitor_components(
    stream: DataFrame,
    state_path: str,
    src_col: str = "a_id",
    dst_col: str = "b_id",
    algorithm: str = "auto",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming connected components: maintain the transitive closure
    of an unbounded edge stream (duplicate pairs, entity matches,
    identity links) as a persisted ``(node, comp, epoch)`` mapping —
    the cluster-level completion of the streaming ER loop:
    ``ingest_with_fuzzy_dedup`` maintains the PAIR gate, this operator
    maintains the CLUSTERS those pairs imply, without ever re-running
    the closure over all edges seen.

    Per micro-batch: contract the batch's edges through the current
    mapping (each endpoint replaced by its component root, or itself if
    unseen), run ``dedup_components`` on the contracted edges — a graph
    whose size is bounded by the BATCH's edge count, never the history
    — and append one row per node whose component root changed (plus
    the batch's new nodes). Resolution (``components_state``) takes
    each node's newest-epoch row.

    The state equals the batch ``dedup_components`` over ALL edges ever
    streamed, whatever the batching: component roots are minimum member
    ids, and contraction is label-preserving (every contracted label IS
    its component's current minimum, so the minimum over merged labels
    is the global minimum of the merged component). The same argument
    makes the loop replay-safe WITHOUT an epoch marker — re-processing
    a batch whose rows committed contracts every edge to a self-loop
    and appends nothing, and a replay over a PARTIALLY appended attempt
    re-derives the same final roots from the same edge set and appends
    exactly the missing rows (min-root is a pure function of the edge
    union; duplicate (node, comp, epoch) rows are identical and
    resolution is unaffected). The HLL-register idempotence class, for
    graphs.

    Scale shape: the per-batch star/label rounds run on contracted
    batch edges only; the mapping join touches state once per batch
    (narrow columns, equi-join); a merge rewrites one row per node of
    the ABSORBED components — bounded by affected-cluster size, the
    known cost of materialized components, not by history. State
    accretes one row per (node, change); compact by rewriting
    newest-epoch rows per node (the ``components_state`` resolution)
    when the dead-row ratio warrants.

    NULL endpoints are dropped (no identity to link); self-loops add
    the node as a singleton. ``algorithm`` passes through to
    ``dedup_components`` — callers whose edge streams chain deeply
    (serial-number name graphs) pick ``"star"`` for the same measured
    reason the batch er_fuzzy_components plan does. Like every
    maintenance path in this engine: single writer.
    """
    from cassandrastack_spark.llm.dedup import dedup_components

    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_comp_ckpt_")
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        edges = (
            batch_df.select(
                F.col(src_col).alias("u"), F.col(dst_col).alias("v")
            )
            .na.drop()
            .distinct()
            .localCheckpoint(eager=True)
        )
        if not edges.limit(1).count():
            return
        # readability probe, not existence: a crash during the very
        # first state append leaves the directory created but
        # uncommitted, which must route back to the fresh-state
        # branch, not a wedging read (review r16)
        rows = _read_parquet_if_committed(spark, state_path)
        if rows is not None:
            # ONE read serves both the resolution and the epoch agg
            # (review r16 — two independent reads doubled the
            # per-batch state I/O as the table accretes)
            m = _resolve_components(rows).localCheckpoint(eager=True)
            epoch = (
                rows.agg(F.coalesce(F.max("epoch"), F.lit(0)).alias("e"))
                .head()
                .e
                + 1
            )
        else:
            m = (
                edges.select(F.col("u").alias("node"))
                .limit(0)
                .withColumn("comp", F.col("node"))
            )
            epoch = 0
        nodes_b = (
            edges.select(F.col("u").alias("node"))
            .unionByName(edges.select(F.col("v").alias("node")))
            .distinct()
        )
        # rep = current root, or the node itself if unseen
        rep_b = (
            nodes_b.join(m, "node", "left")
            .select(
                "node", F.coalesce("comp", F.col("node")).alias("rep")
            )
            .localCheckpoint(eager=True)
        )
        e = (
            edges.join(
                rep_b.select(
                    F.col("node").alias("u"), F.col("rep").alias("ru")
                ),
                "u",
            )
            .join(
                rep_b.select(
                    F.col("node").alias("v"), F.col("rep").alias("rv")
                ),
                "v",
            )
            .filter(F.col("ru") != F.col("rv"))
            .select(F.col("ru").alias("a_id"), F.col("rv").alias("b_id"))
            .distinct()
        )
        if e.limit(1).count():
            cc = dedup_components(e, algorithm=algorithm)
            ccr = cc.select(
                F.col("id").alias("_lbl"), F.col("component").alias("_newc")
            )
        else:
            ccr = (
                rep_b.select(F.col("rep").alias("_lbl"))
                .limit(0)
                .withColumn("_newc", F.col("_lbl"))
            )
        # rows to append: state nodes whose label merged away, plus the
        # batch's unseen nodes (at their possibly-merged root)
        remapped = (
            m.join(ccr, m.comp == ccr._lbl)
            .filter(F.col("_newc") != F.col("comp"))
            .select("node", F.col("_newc").alias("comp"))
        )
        newnodes = (
            rep_b.join(m.select("node"), "node", "left_anti")
            .join(ccr, rep_b.rep == ccr._lbl, "left")
            .select(
                "node",
                F.coalesce("_newc", F.col("rep")).alias("comp"),
            )
        )
        # materialize the (batch-bounded) changed set once, skip the
        # write job entirely when it is empty (replayed or
        # intra-component-only batch), and land ONE part file per
        # batch like every sibling monitor writer — the resolution
        # read pays per-file open cost on every later batch
        # (review r16)
        changed = (
            remapped.unionByName(newnodes)
            .distinct()
            .localCheckpoint(eager=True)
        )
        if changed.limit(1).count():
            (
                changed.withColumn("epoch", F.lit(epoch).cast("long"))
                .coalesce(1)
                .write.mode("append")
                .parquet(state_path)
            )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _resolve_components(rows: DataFrame, keep_epoch: bool = False) -> DataFrame:
    """Newest-epoch row per node — ONE copy of the resolution window,
    shared by the per-batch sink (which already holds the state read),
    ``components_state``, and the compactor (which keeps the epoch
    column so stamps survive compaction)."""
    w = Window.partitionBy("node").orderBy(F.desc("epoch"), "comp")
    cols = ["node", "comp"] + (["epoch"] if keep_epoch else [])
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )


def compact_components_state(spark: SparkSession, state_path: str) -> None:
    """Maintenance for a ``monitor_components`` state table: rewrite
    the accreted change rows (one per node per merge) as each node's
    single newest-epoch row, under the shared append-then-delete-
    snapshot protocol (``_compact_sample_state``'s argument, adapted):
    epochs are PRESERVED, not renumbered — the compacted row carries
    its original epoch, so the monitor's max-epoch read and any
    interleaved resolution see exactly the values they would have seen
    uncompacted. CONTENT-safe at every interleaving: a concurrent
    batch append survives outside the snapshot and is strictly newer;
    a reader whose file listing lands inside the append-to-delete
    window sees (old ∪ merged) whose per-node newest rows are
    byte-identical duplicates; a crash between append and delete
    leaves a correct, merely-uncompacted table. (The additive manifest
    protocol is for sum-merged states — last-writer resolution, like
    min-k, tolerates duplicates.) FILE-listing races are another
    matter (review r16): a reader that listed the snapshot BEFORE the
    delete and scans after it fails with missing-file errors — and
    unlike the sample twins, this monitor's own sink reads the state
    every batch. Run compaction in the monitor's idle window, the
    single-writer maintenance discipline every compactor in this
    engine assumes.
    """
    from pyspark.errors import AnalysisException

    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        return
    snapshot = sorted(raw.inputFiles())
    if len(snapshot) <= 1:
        return  # nothing to compact
    snap = spark.read.option("basePath", state_path).parquet(*snapshot)
    merged = (
        _resolve_components(snap, keep_epoch=True)
        .localCheckpoint(eager=True)  # materialize BEFORE any delete
    )
    merged.coalesce(1).write.mode("append").parquet(state_path)
    _delete_snapshot_files(spark, snapshot)


def components_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Resolve the ``monitor_components`` state table to the current
    ``(node, comp)`` mapping: each node's newest-epoch row. Equal to
    the batch ``dedup_components`` over every edge ever streamed (the
    min-root/label-preserving-contraction argument in
    ``monitor_components``). A node never receives two rows at the
    same epoch (each batch appends at max(epoch)+1 and computes one
    comp per node; a crash-window replay writes any missing rows at
    the NEXT epoch, whose values the invariance argument proves
    consistent with the committed ones) — the comp tie-break below is
    therefore never load-bearing, it just makes the plan's determinism
    self-evident to a reader."""
    return _resolve_components(spark.read.parquet(state_path))


def monitor_embedding_moments(
    stream: DataFrame,
    state_path: str,
    vec_col: str = "embedding",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming embedding-drift accumulator: every micro-batch reduces
    to ONE (batch_id, n, s, ss) moment row — the same constant
    dim²-sized state as ``embstats._moment_partials`` — appended to
    ``state_path``. ``embedding_moments_state`` merges the rows into
    the RUNNING covariance of everything ingested so far; comparing it
    against the covariance the IVF/PQ training saw is the drift signal
    that decides index-rebuild cadence (every persisted index here
    documents "retrain on drift" — this operator is the detector).

    Replay discipline, mirroring ``ingest_vectors``: the append is
    guarded by a per-batch marker under ``<checkpoint>/cs_epochs/``, so
    a crash inside the append→marker window re-lands the SAME
    (batch_id, n, s, ss) row byte-identically, and the reader
    additionally collapses duplicate batch_ids — both halves of the
    at-least-once window are closed. Cost per batch: one pass over the
    batch plus a dim-bounded (dim² + dim doubles) driver assembly —
    never corpus state.
    """
    from cassandrastack_spark.llm.embstats import _moment_partials

    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_mom_ckpt_")
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"{checkpoint}/cs_epochs/{batch_id}"
        if _fs_exists(spark, marker):
            return
        # eager checkpoint: the summed totals AND the count read these
        # partials — without it the batch-sized moment pass runs twice
        parts = _moment_partials(batch_df, vec_col).localCheckpoint(
            eager=True
        )
        summed = (
            parts.select(F.posexplode(F.concat("s", "ss")).alias("pos", "v"))
            .groupBy("pos")
            .agg(F.sum("v").alias("v"))
            .collect()  # dim + dim² rows — bounded by DIMENSION
        )
        stats = parts.agg(
            F.sum("n").alias("n"),
            F.min(F.size("s")).alias("dmin"),
            F.max(F.size("s")).alias("dmax"),
        ).head()
        n = stats.n
        if not summed or not n:
            _fs_mkdirs(spark, marker)
            return  # empty batch contributes nothing
        if stats.dmin != stats.dmax:
            raise ValueError(
                "monitor_embedding_moments: ragged vector lengths "
                "across this batch's partitions — every vector must "
                "have the same dimension"
            )
        cnt = len(summed)
        dim = int(((4 * cnt + 1) ** 0.5 - 1) / 2)
        v = [0.0] * cnt
        for r in summed:
            v[r.pos] = r.v
        spark.createDataFrame(
            [(int(batch_id), int(n), v[:dim], v[dim:])],
            "batch_id long, n long, s array<double>, ss array<double>",
        ).coalesce(1).write.mode("append").parquet(state_path)
        _fs_mkdirs(spark, marker)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_moments_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The running covariance from a ``monitor_embedding_moments``
    state table: collapse replayed batch rows (same batch_id ⇒
    byte-identical content — ``first`` per id is exact), sum the
    surviving moment rows elementwise, and finish with the same
    (i, j, cov) assembly as ``embedding_covariance`` — so the merged
    state over any stream equals the batch covariance over the union
    of its rows (tested), and drift is one join between two cov
    frames. Everything here is batches × dim² — never corpus-sized.
    A monitor that has only seen empty batches has written markers but
    no state files yet — that reads as an EMPTY covariance frame (a
    young stream is zero evidence, not an error), so a polling drift
    scheduler never wedges on startup.
    """
    from pyspark.errors import AnalysisException

    from cassandrastack_spark.llm.embstats import _cov_frame_from_totals

    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        return spark.createDataFrame([], "i int, j int, cov double")
    # cross-BATCH dim guard: a stream whose vector length changed
    # between batches would merge into a silently wrong dim — the
    # state table is batches-sized, so this distinct is trivial
    dims = [r.d for r in raw.select(F.size("s").alias("d")).distinct().collect()]
    if len(dims) > 1:
        raise ValueError(
            f"embedding_moments_state: state at {state_path} mixes "
            f"vector dimensions {sorted(dims)} — the stream's "
            "embedding dim changed between batches; rebuild the state"
        )
    state = (
        raw.groupBy("batch_id")
        .agg(
            F.first("n").alias("n"),
            F.first("s").alias("s"),
            F.first("ss").alias("ss"),
        )
    )
    totals = (
        state.select(F.posexplode(F.concat("s", "ss")).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    n = state.agg(F.sum("n").cast("double").alias("n"))
    return _cov_frame_from_totals(totals, n)


def _marker_guarded_sketch_monitor(
    stream: DataFrame,
    state_path: str,
    notnull_col: str,
    build_fn,
    ckpt_prefix: str,
    checkpoint: str | None,
    trigger_available_now: bool,
    partition_by: tuple[str, ...] = (),
    pass_batch_id: bool = False,
):
    """The shared sink shape of the sketch monitors
    (``monitor_distinct_count`` / ``monitor_hot_keys`` /
    ``monitor_histogram``): per batch, probe the epoch marker (skip a
    replay's wasted work), short-circuit an all-null batch on the RAW
    frame (so the build aggregation runs exactly once, in the write),
    reduce the batch with ``build_fn`` and append one small file, then
    commit the marker. The marker lands AFTER the append everywhere —
    what that buys differs per sketch and is each monitor's own
    docstring (idempotent max makes it pure thrift for HLL; for the
    additive CM/histogram states it is the deliberate
    at-least-once/overcount-only policy).
    """
    checkpoint = checkpoint or tempfile.mkdtemp(prefix=ckpt_prefix)
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"{checkpoint}/cs_epochs/{batch_id}"
        if _fs_exists(spark, marker):
            return
        if batch_df.filter(F.col(notnull_col).isNotNull()).isEmpty():
            _fs_mkdirs(spark, marker)
            return
        built = (
            build_fn(batch_df, batch_id) if pass_batch_id
            else build_fn(batch_df)
        )
        out = built.coalesce(1).write.mode("append")
        if partition_by:
            out = out.partitionBy(*partition_by)
        out.parquet(state_path)
        _fs_mkdirs(spark, marker)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def monitor_distinct_count(
    stream: DataFrame,
    state_path: str,
    item_col: str,
    p: int = 12,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming distinct-count accumulator: every micro-batch reduces
    to its HyperLogLog register table (``operators.sketch.hll_build``,
    at most ``2**p`` rows) appended to ``state_path``;
    ``distinct_count_state`` resolves the accumulated registers to the
    running number of distinct ``item_col`` values EVER ingested —
    "how many unique documents/URLs/users has this stream seen" in
    constant per-batch cost and bounded state, with no watermark: like
    the Bloom dedup, the question has no time window, so exact
    distinct-state (which grows with stream cardinality) is the wrong
    tool at corpus scale.

    Replay discipline: the append is marker-guarded like
    ``monitor_embedding_moments`` — but HLL needs less. The register
    update is ``max``: associative, commutative, IDEMPOTENT — so even
    a batch appended twice through the crash window merges to the
    byte-identical estimate; the marker only saves the wasted work.
    At-least-once delivery is semantically invisible to this sketch,
    which is precisely why it is the streaming cardinality primitive
    (same property the mergeable-summaries literature calls out).

    Cost per batch: one map pass over the batch + a ``2**p``-bounded
    map-side-combined shuffle + a ≤ ``2**p``-row file. The state table
    grows one small file per non-empty batch; readers always merge, so
    ``compact_distinct_count_state`` may run at any time — its
    append-then-delete-snapshot commit (see its docstring for why NOT
    a directory overwrite) never changes any answer, even against a
    concurrently appending monitor.
    """
    from cassandrastack_spark.operators.sketch import hll_build

    return _marker_guarded_sketch_monitor(
        stream, state_path, item_col,
        lambda b: hll_build(b, item_col, p=p),
        ckpt_prefix="cs_hll_ckpt_",
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
        partition_by=("p",),
    )


def distinct_count_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The running distinct count from a ``monitor_distinct_count``
    state table: max-merge every appended register row per bucket
    (replays collapse for free — max is idempotent) and resolve with
    ``hll_estimate``; equals ``hll_estimate(hll_build(...))`` over the
    union of every batch ever ingested (tested). A monitor that has
    only seen empty batches reads as a 0-estimate frame, not an error,
    so a polling scheduler never wedges on startup. Mixed precisions
    in one state directory mean two incompatible sketches were pointed
    at the same path — refuse loudly rather than merge garbage.
    """
    from pyspark.errors import AnalysisException

    from cassandrastack_spark.operators.sketch import hll_estimate

    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        return spark.createDataFrame(
            [(0.0, 0, 0)], "est_distinct double, m long, nonempty long"
        )
    ps = [r.p for r in raw.select("p").distinct().collect()]
    if len(ps) > 1:
        raise ValueError(
            f"distinct_count_state: state at {state_path} mixes HLL "
            f"precisions {sorted(ps)} — two different sketches were "
            "written to one path; rebuild the state"
        )
    merged = raw.groupBy("bucket").agg(
        F.max("maxrank").alias("maxrank"), F.max("p").alias("p")
    )
    return hll_estimate(merged)


def compact_distinct_count_state(spark: SparkSession, state_path: str) -> None:
    """Maintenance for a ``monitor_distinct_count`` state table: the
    monitor appends one small register file per non-empty batch, so an
    always-on stream accretes files whose only cost is open latency —
    the ANSWER never drifts (the reader max-merges). Rewrite the state
    as its merged ≤ ``2**p``-row register table.

    Commit protocol — append-then-delete-snapshot, NOT a partition
    overwrite: (1) snapshot the file list, (2) APPEND the max-merge of
    exactly those files, (3) delete exactly the snapshot files. An
    overwrite (the other compactors' protocol) would be WRONG here: a
    register file the live monitor appends between the compactor's
    read and its commit is not in the merged result, and overwriting
    the directory would delete it — silently and permanently dropping
    that batch's distinct items (its epoch marker and the streaming
    checkpoint guarantee it is never re-processed). With
    append-then-delete, a concurrent append is simply not in the
    snapshot and survives untouched, and every read interleaving is
    correct by register idempotence: between (2) and (3) a reader
    sees old files + merged (max-merges to the same registers), after
    (3) just merged + any newer appends. A crash between (2) and (3)
    leaves a correct, merely-uncompacted table. The one availability
    caveat (shared with every file-level compaction): a reader that
    listed files before (3) can hit a deleted file and must retry —
    set ``spark.sql.files.ignoreMissingFiles`` on always-on readers;
    a missing file only ever removes rows the merged file re-states.
    """
    raw = spark.read.parquet(state_path)
    snapshot = list(raw.inputFiles())
    if len(snapshot) <= 1:
        return  # nothing to compact
    _compact_hll_snapshot(spark, state_path, snapshot)


def _compact_hll_snapshot(
    spark: SparkSession, state_path: str, snapshot: list[str]
) -> None:
    """The commit half of ``compact_distinct_count_state``, taking the
    file-list snapshot explicitly: merge EXACTLY the snapshot files,
    append the result, delete exactly those files. Split out so the
    concurrent-append race is testable — a test can take a snapshot,
    append a register file (the live monitor's move inside the
    compactor's window), then commit against the STALE snapshot and
    assert the late file's items survive.
    """
    merged = (
        # basePath recovers the p= partition column when reading the
        # snapshot's leaf files directly
        spark.read.option("basePath", state_path).parquet(*snapshot)
        .groupBy("bucket", "p")
        .agg(F.max("maxrank").alias("maxrank"))
        .select("bucket", "maxrank", "p")
        .localCheckpoint(eager=True)  # materialize BEFORE any delete
    )
    merged.coalesce(1).write.mode("append").partitionBy("p").parquet(
        state_path
    )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for f in snapshot:
        fpath = jvm.org.apache.hadoop.fs.Path(f)
        fpath.getFileSystem(hconf).delete(fpath, False)


def monitor_hot_keys(
    stream: DataFrame,
    state_path: str,
    item_col: str,
    width: int = 4096,
    depth: int = 3,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming frequency accumulator: every micro-batch reduces to
    its Count-Min sketch (``operators.sketch.cm_build``, at most
    ``depth x width`` cells) appended to ``state_path``;
    ``hot_keys_state`` resolves the accumulated cells to running
    occurrence estimates for ANY probe key — "how often has this
    stream EVER seen this token/URL/user" in constant per-batch cost
    and bounded state, no watermark (the question has no time window;
    exact per-key streaming counts grow state with the key space —
    the wrong tool when keys are open-ended).

    Replay discipline: the append is marker-guarded like
    ``monitor_distinct_count`` — but the failure mode DIFFERS, and it
    matters. CM cells merge by ADDITION, which is associative and
    commutative but NOT idempotent (HLL's max is), so a batch replayed
    through the crash window (appended, crashed before its marker)
    double-counts. The marker is placed AFTER the append —
    at-least-once — deliberately: a replay can only OVERcount, which
    is the SAME side as CM's one-sided design error, so the sketch's
    load-bearing guarantee (an estimate never undercounts the true
    total) survives every crash/replay interleaving; the overhang is
    bounded by the one replayed batch. The opposite order (marker
    first, at-most-once) could LOSE a batch and silently break the
    guarantee consumers size thresholds against. Callers needing
    exactly-once magnitudes use the epoch markers' absence to detect
    and re-derive; callers using CM as designed (hot-key detection,
    threshold alarms) get the one-sided contract unconditionally.

    Cost per batch: one map pass + a ``depth x width``-bounded
    map-side-combined shuffle + one small file. Readers always
    sum-merge, so ``compact_hot_keys_state`` may run at any time
    (see its one-sided-window note).
    """
    from cassandrastack_spark.operators.sketch import cm_build

    return _marker_guarded_sketch_monitor(
        stream, state_path, item_col,
        lambda b: cm_build(b, item_col, width=width, depth=depth),
        ckpt_prefix="cs_cm_ckpt_",
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
    )


def hot_keys_state(
    spark: SparkSession,
    state_path: str,
    probes: DataFrame,
    item_col: str,
    out_col: str = "est_count",
) -> DataFrame:
    """Running frequency estimates from a ``monitor_hot_keys`` state
    table: sum-merge every appended cell per (row, col) — addition is
    the ``cm_merge`` fold, so the merged table equals one whole build
    over every batch ever ingested (tested) — then probe with
    ``cm_estimate``. A monitor that has only seen empty batches
    estimates 0 for everything (empty sketch contract), so a polling
    scheduler never wedges on startup. Mixed geometries in one state
    directory mean two incompatible sketches were pointed at the same
    path — refuse loudly rather than sum garbage.
    """
    from pyspark.errors import AnalysisException

    from cassandrastack_spark.operators.sketch import cm_estimate

    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        return probes.withColumn(out_col, F.lit(0).cast("long"))
    geoms = [
        (r.w, r.d) for r in raw.select("w", "d").distinct().collect()
    ]
    if len(geoms) > 1:
        raise ValueError(
            f"hot_keys_state: state at {state_path} mixes CM geometries "
            f"{sorted(geoms)} — two different sketches were written to "
            "one path; rebuild the state"
        )
    merged = raw.groupBy("row", "col").agg(
        F.sum("cnt").alias("cnt"),
        F.max("w").alias("w"),
        F.max("d").alias("d"),
    )
    return cm_estimate(merged, probes, item_col, out_col=out_col)


def compact_hot_keys_state(spark: SparkSession, state_path: str) -> None:
    """Maintenance for a ``monitor_hot_keys`` state table: the monitor
    appends one small cell file per non-empty batch; rewrite the state
    as its sum-merged ≤ ``depth x width``-row table.

    The HLL compactor's append-then-delete protocol is NOT safe here,
    and the difference is the whole design note: HLL registers are
    idempotent (max), so a crash that leaves both the old files and
    the merged file changes no answer — CM cells SUM, so the same
    crash would permanently DOUBLE the compacted counts, and a
    re-run of the compactor would bake the doubling in (sum-merging
    doubled cells cannot un-double them). This compactor therefore
    uses a manifest-recovery commit:

    1. stage the sum-merge of a snapshotted file list into a side
       directory (``<state>.compact.tmp`` — never visible to readers);
    2. atomically rename a manifest into place recording the snapshot
       (the staged merge is complete whenever the manifest exists);
    3. move the staged part files INTO the state directory;
    4. delete exactly the snapshot files;
    5. remove the manifest and the side directory.

    Every entry first runs recovery: an existing manifest means a
    previous compaction crashed mid-commit — finish its moves, finish
    its deletes, clean up. Crash anywhere leaves a state a re-run
    makes exact: before (2) nothing is visible; after (2) the
    snapshot+staged pair is replayed to completion. Readers inside
    the (3)-(4) window can transiently OVERcount (old + merged — the
    one-sided direction, same side as CM's design error and the
    monitor's replay policy); no interleaving can ever UNDERcount — a
    snapshot file is deleted only after every staged part is in
    place, and a concurrent monitor append is not in the snapshot and
    survives untouched. Always-on readers set
    ``spark.sql.files.ignoreMissingFiles`` (a missing file only ever
    removes rows the merged file re-states).
    """
    _recover_hot_keys_compaction(spark, state_path)
    if _stage_hot_keys_compaction(spark, state_path):
        _recover_hot_keys_compaction(spark, state_path)


def _stage_hot_keys_compaction(spark: SparkSession, state_path: str) -> bool:
    """The CM instantiation of ``_stage_additive_compaction`` — kept as
    a named seam so the crash-window test reads like the protocol note.
    Geometry (w, d) stays a GROUP KEY (the HLL compactor's bucket,p
    discipline): if two incompatible sketches were mistakenly written
    to one path, compaction must PRESERVE both geometries so
    hot_keys_state's loud refusal still fires — collapsing them under
    max(w)/max(d) would launder the corruption into a single
    plausible-looking sketch.
    """
    return _stage_additive_compaction(
        spark, state_path, key_cols=("row", "col", "w", "d"), sum_col="cnt"
    )


def _stage_additive_compaction(
    spark: SparkSession,
    state_path: str,
    sum_col: str,
    key_cols: tuple[str, ...] | None = None,
) -> bool:
    """Steps (1)-(2) of the manifested commit for ANY additive state
    table (rows merge by summing ``sum_col`` per every other column —
    the Count-Min cells, the fixed-width histogram bins), split out so
    the crash window is testable (the _compact_hll_snapshot
    discipline): stage the sum-merge of the current snapshot into the
    side directory and atomically rename the manifest into place.
    Returns False when there is nothing to compact. After this returns
    True, the commit is durable — ANY later compact entry (or
    ``_recover_additive_compaction`` directly) finishes it exactly
    once, however many crashes intervene.

    The merge key is DERIVED from the state schema as every non-sum
    column (review r13): additive states carry their geometry/grid/
    group columns as data, and collapsing any of them would launder an
    incompatible-write mistake — or a caller's wrong group_cols — into
    one plausible-looking table, permanently summing counts across
    groups. ``key_cols``, when supplied, is VALIDATED against the
    derived set and a mismatch raises rather than merges. A state path
    the monitor has not written yet (only empty batches so far) is
    "nothing to compact", not an error — the compactor may run at any
    time, like its readers.

    The manifest records the snapshot file list, the staged part
    names AND the per-attempt staging directory (JSON), so recovery
    can prove the merged data is in place before deleting any
    snapshot file — the guard that makes a concurrent compactor's
    pre-commit orphan sweep (which may race away this instance's tmp
    dir between the stage write and the manifest rename) an aborted
    commit instead of a permanent undercount. The staging directory
    is UNIQUE per attempt (``<state>.compact.tmp.<uuid>``) — ADVICE
    r14: with a SHARED tmp dir, a concurrent compactor's overwrite in
    the window between this attempt's stage write and its listStatus
    made this manifest record the OTHER attempt's staged parts
    (merged from a possibly newer snapshot) against THIS attempt's
    older snapshot list, and recovery then double-counted any file
    appended between the two snapshots (deleted via neither list,
    re-stated by the merged parts). With per-attempt dirs each
    manifest's staged names are provably its own. Concurrent
    compactors therefore cannot lose OR double data; they can only
    waste each other's staging work (the orphan sweep aborts the
    slower commit) — still schedule one compactor per state path.
    """
    from pyspark.errors import AnalysisException

    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        return False  # monitor has not written a first file yet
    snapshot = sorted(raw.inputFiles())
    if len(snapshot) <= 1:
        return False  # nothing to compact
    derived = tuple(c for c in raw.columns if c != sum_col)
    if sum_col not in raw.columns:
        raise ValueError(
            f"additive compaction: sum column {sum_col!r} not in state "
            f"schema {raw.columns} at {state_path}"
        )
    if key_cols is not None and set(key_cols) != set(derived):
        raise ValueError(
            "additive compaction: supplied key_cols "
            f"{sorted(key_cols)} do not cover the state's non-sum "
            f"columns {sorted(derived)} at {state_path} — merging on a "
            "subset would permanently collapse counts across the "
            "missing columns"
        )
    import uuid

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    attempt = uuid.uuid4().hex
    tmp_dir = state_path.rstrip("/") + ".compact.tmp." + attempt
    kcols = list(derived)
    (
        spark.read.parquet(*snapshot)
        .groupBy(*kcols)
        .agg(F.sum(sum_col).alias(sum_col))
        .select(*kcols, sum_col)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp_dir)
    )
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(tmp_dir).getFileSystem(hconf)
    staged_names = sorted(
        st.getPath().getName()
        for st in fs.listStatus(P(tmp_dir))
        if st.getPath().getName().endswith(".parquet")
    )
    # manifest rename is the commit point: staged merge is complete.
    # The staging FILE is per-attempt too (review r15): a shared
    # staging path written with overwrite lets attempt B clobber A's
    # record between A's create and A's rename — A then commits B's
    # record while B's refused-rename cleanup deletes the staging dir
    # that record references, silently aborting a commit whose stage
    # call returned True. Per-attempt names make every rename carry
    # its own attempt's record.
    manifest = P(state_path.rstrip("/") + ".compact.manifest")
    staging = P(
        state_path.rstrip("/") + ".compact.manifest.tmp." + attempt
    )
    out = fs.create(staging, True)
    out.write(bytearray(
        json.dumps({
            "staged": staged_names,
            "snapshot": snapshot,
            # the attempt's own staging dir NAME (sibling of the state
            # dir) — recovery moves parts from exactly this dir, never
            # another attempt's
            "tmp": tmp_dir.rsplit("/", 1)[-1],
        }),
        "utf-8",
    ))
    out.close()
    if not fs.rename(staging, manifest):
        # another compactor committed first (its manifest occupies the
        # path): our staging work is superseded, not lost — recovery
        # will finish THEIR commit; ours aborts cleanly (including our
        # own per-attempt staging dir, so no orphan accumulates)
        fs.delete(staging, False)
        fs.delete(P(tmp_dir), True)
        raise RuntimeError(
            f"additive compaction: manifest rename refused at "
            f"{state_path} (concurrent compactor?) — commit aborted, "
            "state untouched; re-run after the other compactor finishes"
        )
    return True


def _recover_hot_keys_compaction(spark: SparkSession, state_path: str) -> None:
    """Schema-agnostic alias kept for the protocol's CM-named seam."""
    _recover_additive_compaction(spark, state_path)


def _recover_additive_compaction(spark: SparkSession, state_path: str) -> None:
    """Finish (or initially perform) a manifested compaction commit:
    move every staged part file from the MANIFEST'S OWN staging dir
    into the state directory, PROVE every manifest-listed staged part
    is in place, only then delete the manifest-listed snapshot files,
    then drop the manifest and every ``.compact.tmp*`` side directory
    (the manifest's own plus any other attempt's pre-commit orphans —
    staging dirs are per-attempt since ADVICE r14, so an unreferenced
    one is always a crashed or superseded attempt). Idempotent — each
    step skips work already done, so any number of crashed re-entries
    converge. With no manifest present, only sweeps stale side
    directories (a pre-commit crash: nothing visible happened, so
    nothing to redo).

    The staged-parts proof is the concurrent-compactor guard (review
    r13): instance B's pre-commit orphan sweep here can race away
    instance A's tmp dir between A's stage write and A's manifest
    rename. A's manifest then commits with its merged data gone —
    under the old recovery (delete snapshot unconditionally) that was
    a permanent, silent undercount. Now: any manifest-listed staged
    part missing from BOTH the tmp dir and the state dir ABORTS the
    commit — manifest and tmp dropped, every snapshot file kept, the
    state stays merely uncompacted and a re-run compacts it. Deletion
    of data is gated on proof the same data is re-stated.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    base = state_path.rstrip("/")
    manifest = P(base + ".compact.manifest")
    fs = manifest.getFileSystem(hconf)

    def _tmp_dirs():
        # every side staging artifact for this state path: data dirs
        # (legacy shared name plus per-attempt uuid-suffixed ones) AND
        # orphaned per-attempt manifest-staging files (a crash between
        # create and rename leaves one; it references a staging dir
        # this sweep also removes, so it can never be resurrected)
        out = [
            st.getPath()
            for st in fs.globStatus(P(base + ".compact.tmp*")) or []
        ]
        out += [
            st.getPath()
            for st in fs.globStatus(P(base + ".compact.manifest.tmp*"))
            or []
        ]
        return out

    if not fs.exists(manifest):
        for d in _tmp_dirs():
            fs.delete(d, True)  # pre-commit orphans
        return
    ins = fs.open(manifest)
    try:
        data = bytes(ins.readAllBytes()).decode("utf-8")
    finally:
        ins.close()
    try:
        rec = json.loads(data)
        staged, snapshot = rec["staged"], rec["snapshot"]
        # per-attempt staging dir (ADVICE r14), recorded as a NAME and
        # resolved as a sibling of the state dir; a JSON manifest from
        # the r14 shared-dir code carries no "tmp" key — fall back to
        # the shared name it staged into
        if "tmp" in rec:
            tmp_dir = P(P(base).getParent(), rec["tmp"])
        else:
            tmp_dir = P(base + ".compact.tmp")
    except (ValueError, KeyError, TypeError):
        # legacy manifest (pre-JSON: bare newline-joined snapshot
        # paths, no staged-part record) left by a crash under the old
        # code — must still recover, not wedge every future compaction
        # on a parse error. Without staged names the presence proof
        # can't run, so be conservative: with the tmp dir present,
        # whatever staged parts exist are the merge — move them and
        # treat them as the proof set; with the tmp dir gone the
        # merged data is unprovable, so ABORT (keep every snapshot
        # file; the state stays uncompacted but exact). Pre-JSON code
        # always staged into the shared side dir.
        snapshot = [ln for ln in data.splitlines() if ln]
        tmp_dir = P(base + ".compact.tmp")
        if not fs.exists(tmp_dir):
            fs.delete(manifest, False)
            return
        staged = [
            st.getPath().getName()
            for st in fs.listStatus(tmp_dir)
            if st.getPath().getName().endswith(".parquet")
        ]
    # (3) move staged parts in (skip any already moved)
    if fs.exists(tmp_dir):
        for st in fs.listStatus(tmp_dir):
            name = st.getPath().getName()
            if not name.endswith(".parquet"):
                continue
            dst = P(state_path.rstrip("/") + "/" + name)
            if not fs.exists(dst):
                fs.rename(st.getPath(), dst)
    # (3b) the deletion gate: every staged part must now be in the
    # state dir, or the merged data was lost pre-commit — abort
    missing = [
        n for n in staged
        if not fs.exists(P(state_path.rstrip("/") + "/" + n))
    ]
    if missing:
        # back out any staged parts already moved in: with the
        # snapshot kept, a surviving merged part would DOUBLE the
        # counts it re-states (the abort must be all-or-nothing)
        for n in staged:
            dst = P(state_path.rstrip("/") + "/" + n)
            if fs.exists(dst):
                fs.delete(dst, False)
        fs.delete(manifest, False)
        if fs.exists(tmp_dir):
            fs.delete(tmp_dir, True)
        return  # snapshot kept: uncompacted but exact; re-run compacts
    # (4) delete exactly the manifested snapshot files
    for f in snapshot:
        if f:
            fp = P(f)
            if fs.exists(fp):
                fs.delete(fp, False)
    # (5) cleanup: the manifest, its own staging dir, and any other
    # attempt's orphaned staging dirs (all unreferenced once the only
    # manifest is gone)
    fs.delete(manifest, False)
    for d in _tmp_dirs():
        fs.delete(d, True)


def monitor_histogram(
    stream: DataFrame,
    state_path: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    group_cols: tuple[str, ...] = (),
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming distribution accumulator: every micro-batch reduces to
    its fixed-width histogram (``functions.stats.histogram_fixed``, at
    most ``groups x (bins + 2)`` rows) appended to ``state_path``;
    ``histogram_state`` sum-merges the accumulated bins into the
    running distribution of every value EVER ingested. Feed the result
    to ``functions.stats.psi_from_histograms`` against a baseline
    snapshot and this is the live drift alarm — "has the score/length/
    perplexity distribution of what we are ingesting moved off what
    the filters were tuned on" — in constant per-batch cost and
    bounded state. Fixed (DESIGN-constant) bin edges are what make the
    state additive; see ``histogram_fixed``'s note.

    Replay/crash policy is ``monitor_hot_keys``'s (bin counts SUM, so
    they are not idempotent): marker AFTER append — at-least-once — so
    a crash-window replay can only overcount a batch, never lose one.
    Unlike CM there is no one-sided estimate guarantee to preserve;
    the policy choice here is that a monitoring histogram must never
    silently UNDER-represent a region of the distribution (a lost
    batch could hide exactly the drifted tail the monitor exists to
    catch), while a replayed batch at worst overstates by one batch —
    visible, bounded, and self-documenting in the epoch markers.
    """
    from cassandrastack_spark.functions.stats import histogram_fixed

    # fail at the CALL SITE, not inside the first non-empty batch's
    # foreachBatch (by then empty batches are already marked processed
    # and the error surfaces as a StreamingQueryException much later)
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got lo={lo} hi={hi}")
    gcols = tuple(group_cols)
    return _marker_guarded_sketch_monitor(
        stream, state_path, value_col,
        lambda b: histogram_fixed(b, value_col, lo, hi, bins,
                                  group_cols=gcols),
        ckpt_prefix="cs_hist_ckpt_",
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
    )


def histogram_state(
    spark: SparkSession,
    state_path: str,
    group_cols: tuple[str, ...] = (),
    group_schema: str | None = None,
) -> DataFrame:
    """The running histogram from a ``monitor_histogram`` state table:
    sum every appended bin count per (group, bin) — equal to one
    ``histogram_fixed`` over the union of every batch ever ingested
    (tested). A monitor that has only seen empty batches reads as an
    EMPTY frame (a histogram with no observations has no bins), so a
    polling scheduler never wedges; ``psi_from_histograms`` against a
    baseline then reports NULL psi with n_observed = 0 — the honest
    "no data yet" answer. The empty frame types group columns as
    ``string`` unless ``group_schema`` supplies the real DDL (e.g.
    ``"shard_id int"``) — a monitor with non-string group keys should
    pass it so the no-data frame unions/joins cleanly against the
    real state that appears later.
    """
    from pyspark.errors import AnalysisException

    gcols = list(group_cols)
    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        fields = group_schema or ", ".join(f"{c} string" for c in gcols)
        schema = (fields + ", " if fields else "") + "bin int, cnt long"
        return spark.createDataFrame([], schema)
    return raw.groupBy(*gcols, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def compact_histogram_state(
    spark: SparkSession,
    state_path: str,
    group_cols: tuple[str, ...] = (),
) -> None:
    """Maintenance for a ``monitor_histogram`` state table: rewrite the
    accreted per-batch bin files as the sum-merged table, under the
    same manifest-recovery commit as ``compact_hot_keys_state`` (bin
    counts SUM — not idempotent — so the HLL append-then-delete
    protocol would permanently double them on a mid-commit crash; see
    that function's protocol note). The merge key is DERIVED from the
    state schema (every non-cnt column), so a caller's group_cols can
    no longer silently collapse counts across groups (review r13: the
    old code trusted them as the merge key — calling with the default
    () on a grouped monitor's state was irreversible data loss guarded
    only by a docstring sentence); when supplied, group_cols are
    validated against the schema and a mismatch raises.
    """
    _recover_additive_compaction(spark, state_path)
    if _stage_additive_compaction(
        spark, state_path, sum_col="cnt",
        key_cols=(*group_cols, "bin") if group_cols else None,
    ):
        _recover_additive_compaction(spark, state_path)


def monitor_value_sample(
    stream: DataFrame,
    state_path: str,
    value_col: str,
    key_col: str,
    k: int = 1024,
    group_cols: tuple[str, ...] = (),
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming quantile accumulator: every micro-batch reduces to its
    deterministic bottom-k sample (``operators.sketch.
    bottomk_sample_build``, at most ``k`` rows per group) appended to
    ``state_path``; ``value_sample_state`` min-k-merges the
    accumulated samples into THE sample of everything ever ingested,
    and ``bottomk_sample_quantiles`` resolves it to running medians /
    p95s / score spread — the live "what does the value distribution
    look like" monitor in bounded state over an unbounded horizon,
    the quantile sibling of ``monitor_distinct_count``.
    ``approx_percentile`` cannot be this monitor: its summary state is
    not persistable as data nor mergeable across separately
    materialized batches; the bottom-k sample is both.

    Replay discipline: marker-guarded like the HLL monitor, and like
    HLL it needs less — sample membership is a pure function of
    ``md5(key_col)``, so a batch appended twice merges to the
    byte-identical sample (the dedup in the merge collapses it);
    at-least-once delivery is semantically invisible. Same property,
    same compactor protocol: ``compact_value_sample_state`` uses the
    append-then-delete-snapshot commit (see
    ``compact_distinct_count_state`` for why NOT an overwrite), safe
    against a concurrently appending monitor because
    bottomk(bottomk(A) ∪ B) == bottomk(A ∪ B).

    Cost per batch: one narrow (group, h, v) projection + one
    per-group rank window over THAT BATCH ONLY + a ≤ k-rows-per-group
    file. ``k`` rides every row and partitions the state files, so a
    mismatched re-point of the monitor fails loudly in the reader
    rather than merging incompatible samples.
    """
    from cassandrastack_spark.operators.sketch import bottomk_sample_build

    return _marker_guarded_sketch_monitor(
        stream, state_path, key_col,
        lambda b: bottomk_sample_build(
            b, value_col, key_col, k=k, group_cols=group_cols
        ),
        ckpt_prefix="cs_bks_ckpt_",
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
        partition_by=("k",),
    )


def value_sample_state(
    spark: SparkSession,
    state_path: str,
    group_cols: tuple[str, ...] = (),
    group_schema: str | None = None,
) -> DataFrame:
    """The running bottom-k sample from a ``monitor_value_sample``
    state table: dedup the appended per-batch samples on
    (group, h, v) — replays collapse for free — and re-take the k
    smallest hashes per group; equals ``bottomk_sample_build`` over
    the union of every batch ever ingested (tested). Feed the result
    to ``bottomk_sample_quantiles``. A monitor that has only seen
    empty batches reads as an EMPTY frame (a sample with no rows has
    no quantiles), so a polling scheduler never wedges; mixed ``k``
    in one state directory means two incompatible monitors were
    pointed at the same path — refuse loudly rather than merge
    samples sized for different accuracies. The empty frame types
    group columns as ``string`` unless ``group_schema`` supplies the
    real DDL (the ``histogram_state`` contract).
    """
    from pyspark.errors import AnalysisException

    from cassandrastack_spark.operators.sketch import bottomk_retake

    gcols = list(group_cols)
    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        gddl = group_schema or ", ".join(f"{g} string" for g in gcols)
        ddl = (gddl + ", " if gcols else "") + "h string, v double, k int"
        return spark.createDataFrame([], ddl)
    _check_sample_state_schema(raw, gcols, state_path, "value_sample_state")
    _check_sample_state_k(raw, state_path, "value_sample_state")
    return bottomk_retake(raw, gcols)


def _check_sample_state_schema(
    raw: DataFrame,
    gcols: list[str],
    state_path: str,
    caller: str,
    data_cols: tuple[str, ...] = ("h", "v", "k"),
) -> None:
    """Refuse a group-column set that doesn't cover the state schema
    (review r14 — the merge-key rule _stage_additive_compaction
    enforces, applied to the sample states' readers AND compactors): a
    bottom-k retake under MISSING group columns ranks every group in
    one window and keeps only the globally-smallest k keys —
    permanently halving each group's sample in the compactor's case.
    Every non-``data_cols`` column of the state is a group column by
    construction (the monitors write nothing else); ``data_cols`` is
    ("h", "v", "k") for the uniform sample and
    ("item", "e", "w", "k") for the weighted one — ONE guard for both
    twins, so a future fix cannot diverge between them.
    """
    derived = sorted(c for c in raw.columns if c not in data_cols)
    if sorted(gcols) != derived:
        raise ValueError(
            f"{caller}: supplied group_cols {sorted(gcols)} do not "
            f"cover the state's group columns {derived} at "
            f"{state_path} — a retake under missing group columns "
            "would silently drop sample rows across groups"
        )


def _check_sample_state_k(
    raw: DataFrame, state_path: str, caller: str
) -> None:
    """Refuse mixed sample sizes in one state path — two different
    monitors were pointed at it; merging/retaking interleaved samples
    sized for different accuracies would corrupt both. Shared by the
    readers (before resolving) and the compactors (BEFORE any write,
    so the corruption can never be laundered into the state)."""
    ks = [r.k for r in raw.select("k").distinct().collect()]
    if len(ks) > 1:
        raise ValueError(
            f"{caller}: state at {state_path} mixes sample sizes "
            f"k={sorted(ks)} — two different monitors were written to "
            "one path; rebuild the state"
        )


def _delete_snapshot_files(spark: SparkSession, files) -> None:
    """The shared snapshot-delete tail of the append-then-delete
    compactors — one copy of the FS loop, so a hardening (retry,
    trash, listing fence) lands everywhere at once (review r16)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for f in files:
        fpath = jvm.org.apache.hadoop.fs.Path(f)
        fpath.getFileSystem(hconf).delete(fpath, False)


def _compact_sample_state(
    spark: SparkSession,
    state_path: str,
    data_cols: tuple[str, ...],
    retake_fn,
    caller: str,
) -> None:
    """The shared append-then-delete-snapshot compactor for BOTH
    sample-sketch monitors (uniform bottom-k and weighted reservoir) —
    one copy of the commit protocol, so a future protocol fix cannot
    diverge between the twins. Safe because each twin's merge is
    idempotent (key dedup) and min-k is associative: a concurrent
    append survives outside the snapshot, every read interleaving
    min-k-merges to the same sample, and a crash between append and
    delete leaves a correct, merely-uncompacted table. (The additive
    manifest protocol is NOT needed here — that exists for sum-merged
    states, where old + merged double-counts.) Group columns are
    DERIVED from the state schema; mixed sample sizes refuse BEFORE
    any write.
    """
    from pyspark.errors import AnalysisException

    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        return
    snapshot = sorted(raw.inputFiles())
    if len(snapshot) <= 1:
        return  # nothing to compact
    gcols = [c for c in raw.columns if c not in data_cols]
    _check_sample_state_k(raw, state_path, caller)
    merged = (
        retake_fn(
            spark.read.option("basePath", state_path).parquet(*snapshot),
            gcols,
        )
        .select(*gcols, *data_cols)
        .localCheckpoint(eager=True)  # materialize BEFORE any delete
    )
    merged.coalesce(1).write.mode("append").partitionBy("k").parquet(
        state_path
    )
    _delete_snapshot_files(spark, snapshot)


def compact_value_sample_state(spark: SparkSession, state_path: str) -> None:
    """Maintenance for a ``monitor_value_sample`` state table: rewrite
    the accreted per-batch sample files as the merged
    ≤ k-rows-per-group sample. See ``_compact_sample_state`` for the
    protocol and its safety argument (shared verbatim with the
    weighted twin).
    """
    from cassandrastack_spark.operators.sketch import bottomk_retake

    _compact_sample_state(
        spark, state_path, ("h", "v", "k"), bottomk_retake,
        "compact_value_sample_state",
    )


def monitor_weighted_sample(
    stream: DataFrame,
    state_path: str,
    key_col: str,
    weight_col: str,
    k: int = 1024,
    group_cols: tuple[str, ...] = (),
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming weighted-reservoir accumulator: every micro-batch
    reduces to its Efraimidis-Spirakis bottom-k
    (``operators.sketch.weighted_sample_build``, at most ``k`` rows per
    group) appended to ``state_path``; ``weighted_sample_state``
    min-k-merges the accumulated samples into THE weighted sample
    without replacement of everything ever ingested — "maintain a
    quality-weighted training subset of the whole crawl, updated per
    batch, never re-scan history", the importance-weighted sibling of
    ``monitor_value_sample``. The exponential key is a pure function
    of (key, weight) — no RNG — so at-least-once replay is
    byte-invisible (dedup on the key) and the marker guard is pure
    thrift, the HLL argument. Same compactor protocol for the same
    reason (min-k is associative + idempotent):
    ``compact_weighted_sample_state``.

    The weight must be STABLE per key (fix it at first ingest); a key
    re-ingested with a new weight is two rows and the dedup keeps an
    arbitrary one — dedup upstream if weights can drift.
    """
    from cassandrastack_spark.operators.sketch import weighted_sample_build

    return _marker_guarded_sketch_monitor(
        stream, state_path, key_col,
        lambda b: weighted_sample_build(
            b, key_col, weight_col, k=k, group_cols=group_cols
        ),
        ckpt_prefix="cs_wks_ckpt_",
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
        partition_by=("k",),
    )


def weighted_sample_state(
    spark: SparkSession,
    state_path: str,
    group_cols: tuple[str, ...] = (),
    group_schema: str | None = None,
) -> DataFrame:
    """The running weighted sample from a ``monitor_weighted_sample``
    state table: dedup the appended per-batch samples on
    (group, item) — replays collapse for free — and re-take the k
    smallest exponential keys per group; equals
    ``weighted_sample_build`` over the union of every batch ever
    ingested (tested). Missing state reads as an EMPTY frame
    (``group_schema`` types the group columns, the
    ``histogram_state`` contract); a group set that doesn't cover the
    state schema, or mixed ``k`` in one path, refuses loudly (the
    ``value_sample_state`` contracts).
    """
    from pyspark.errors import AnalysisException

    from cassandrastack_spark.operators.sketch import weighted_sample_retake

    gcols = list(group_cols)
    try:
        raw = spark.read.parquet(state_path)
    except AnalysisException:
        gddl = group_schema or ", ".join(f"{g} string" for g in gcols)
        ddl = (
            (gddl + ", " if gcols else "")
            + "item string, e double, w double, k int"
        )
        return spark.createDataFrame([], ddl)
    _check_sample_state_schema(
        raw, gcols, state_path, "weighted_sample_state",
        data_cols=("item", "e", "w", "k"),
    )
    _check_sample_state_k(raw, state_path, "weighted_sample_state")
    return weighted_sample_retake(raw, gcols)


def compact_weighted_sample_state(
    spark: SparkSession, state_path: str
) -> None:
    """Maintenance for a ``monitor_weighted_sample`` state table — the
    weighted twin of ``compact_value_sample_state``, on the SAME
    shared ``_compact_sample_state`` protocol.
    """
    from cassandrastack_spark.operators.sketch import weighted_sample_retake

    _compact_sample_state(
        spark, state_path, ("item", "e", "w", "k"), weighted_sample_retake,
        "compact_weighted_sample_state",
    )


def monitor_nb_counts(
    stream: DataFrame,
    state_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "is_pos",
    dim: int = 4096,
    bigrams: bool = True,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming Naive-Bayes trainer: accumulate the hashed-gram
    class counts of a labeled document stream as persisted state, so
    the quality filter retrains continuously as curated seed examples
    arrive — the trained-classifier completion of the monitor family
    (``llm/classifier.py`` is the batch twin; this is how the CCNet-
    style quality model stays current against a live crawl without
    re-featurizing history).

    Every micro-batch reduces to its per-bucket class gram counts
    ``(bucket, pb, nb)`` plus one ``bucket = -1`` row carrying the
    batch's (n_pos_docs, n_neg_docs) — at most ``dim + 1`` rows
    whatever the batch size — appended to ``state_path``;
    ``nb_weights_state`` sums the accumulated cells and resolves them
    through the SAME smoothing arithmetic as the batch trainer
    (``_assemble_nb_weights``, one shared copy), yielding a
    ``linear_text_score``-ready weight table. Counts are additive and
    checkpointed micro-batches deliver each input row to the state
    exactly once within a run, so the summed cells are bit-identical
    to a one-batch build whatever the micro-batch boundaries — the
    stream_hot_keys argument; the per-epoch marker excludes replays,
    since unlike HLL max a sum is NOT idempotent.

    Label hygiene is at-batch granularity: NULL-id/NULL-label rows
    are dropped, verbatim-repeated in-batch rows collapse (labels AND
    (id, text) document rows — a seed row arriving twice in one drop
    counts once in grams and in doc counts alike), and an in-batch
    doc id carrying both labels OR two different texts fails the
    batch loud (contradictory evidence; a sum-state cannot un-count
    later). ACROSS batches the stream must deliver each doc id at
    most once — exactly what an upstream ``ingest_with_dedup`` gate
    guarantees; a doc re-ingested in a later batch double-counts
    (dedup upstream, or rebuild from the corpus). Model geometry
    (dim, bigrams) is recorded under ``state_path/_meta`` on the
    first batch, so the resolution and any later monitor run cannot
    silently disagree; a monitor started with different geometry
    against existing state fails loud (validated once per run — the
    single-writer rule means it cannot drift mid-run).

    Each state row carries its ``(ckpt, batch_id)`` — the checkpoint
    scope plus the batch id, because batch ids are only unique PER
    CHECKPOINT (review r16: a later monitor run over a NEW seed drop
    with a fresh checkpoint restarts batch ids at 0, and a
    batch-id-only dedup would silently max-merge two different
    batches' cells instead of summing them) — and the resolution
    collapses duplicate (ckpt, batch_id, bucket) cells, so the
    append→marker crash window (a batch whose cells committed but
    whose marker did not, replayed on restart under the SAME
    checkpoint) re-lands byte-identical rows that dedup away instead
    of double-counting — the ``monitor_embedding_moments`` pattern;
    both halves of at-least-once are closed, which is what licenses
    the bit-identical-to-batch claim.
    """
    import hashlib

    from cassandrastack_spark.llm.classifier import hashed_gram_features

    spark = stream.sparkSession
    # resolved HERE (not in the shared helper) because the state rows
    # must carry the checkpoint scope
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="cs_nb_ckpt_")
    run_scope = hashlib.md5(checkpoint.encode()).hexdigest()[:16]
    validated = False

    def _build(batch_df: DataFrame, batch_id: int) -> DataFrame:
        nonlocal validated
        meta_path = state_path + "/_meta"
        if not validated and _fs_exists(spark, meta_path):
            meta = spark.read.parquet(meta_path).head()
            if int(meta.dim) != int(dim) or bool(meta.bigrams) != bool(
                bigrams
            ):
                raise ValueError(
                    f"monitor_nb_counts: state at {state_path} was built "
                    f"with dim={meta.dim}, bigrams={meta.bigrams} — "
                    f"monitor started with dim={dim}, bigrams={bigrams}; "
                    "mixed-geometry counts would silently corrupt the "
                    "model (rebuild into a new path instead)"
                )
        validated = True
        lab = (
            batch_df.select(
                F.col(id_col),
                F.col(label_col).cast("boolean").alias("_pos"),
            )
            .filter(F.col("_pos").isNotNull() & F.col(id_col).isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
        # verbatim-repeated document rows collapse; an id with two
        # DIFFERENT texts is contradictory evidence — featurizing the
        # raw batch would double its grams while the doc count stays
        # one (review r16, the ADVICE r15 double-count class)
        docs_txt = (
            batch_df.select(F.col(id_col), F.col(text_col))
            .distinct()
            .join(lab.select(id_col), id_col)
            .localCheckpoint(eager=True)
        )
        n = lab.agg(
            F.count("*").alias("_nlab"),
            F.count_distinct(F.col(id_col)).alias("_nids"),
        ).head()
        if n._nlab != n._nids:
            raise ValueError(
                "monitor_nb_counts: a doc id in this batch carries "
                "both labels — contradictory seed rows must be "
                "resolved upstream"
            )
        nd = docs_txt.agg(
            F.count("*").alias("_nrows"),
            F.count_distinct(F.col(id_col)).alias("_nids"),
        ).head()
        if nd._nrows != nd._nids:
            raise ValueError(
                "monitor_nb_counts: a doc id in this batch carries two "
                "different texts — contradictory seed rows must be "
                "resolved upstream"
            )
        # first batch: record geometry AFTER the hygiene checks, so a
        # rejected first batch leaves no meta-only state dir
        if not _fs_exists(spark, meta_path):
            spark.createDataFrame(
                [(int(dim), bool(bigrams))], "dim int, bigrams boolean"
            ).coalesce(1).write.mode("overwrite").parquet(meta_path)
        feats = hashed_gram_features(docs_txt, id_col, text_col, dim, bigrams)
        fl = feats.join(lab, id_col)
        cells = fl.groupBy("bucket").agg(
            F.sum(
                F.when(F.col("_pos"), F.col("cnt")).otherwise(0)
            ).cast("bigint").alias("pb"),
            F.sum(
                F.when(~F.col("_pos"), F.col("cnt")).otherwise(0)
            ).cast("bigint").alias("nb"),
        )
        docs = lab.agg(
            F.lit(-1).cast("int").alias("bucket"),
            F.count_distinct(
                F.when(F.col("_pos"), F.col(id_col))
            ).cast("bigint").alias("pb"),
            F.count_distinct(
                F.when(~F.col("_pos"), F.col(id_col))
            ).cast("bigint").alias("nb"),
        )
        return (
            cells.unionByName(docs)
            .withColumn("ckpt", F.lit(run_scope))
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        )

    return _marker_guarded_sketch_monitor(
        stream, state_path, id_col, _build,
        ckpt_prefix="cs_nb_ckpt_",
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
        pass_batch_id=True,
    )


def nb_weights_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Resolve a ``monitor_nb_counts`` state table to the
    ``(bucket, weight, bias, dim, bigrams)`` model artifact —
    bit-identical to ``nb_logodds_weights`` over the same labeled
    documents delivered in one batch (additive cells + the batch_id
    dedup closing the append→marker replay window + the shared
    ``_assemble_nb_weights`` arithmetic). Directly consumable by
    ``linear_text_score``, which reads BOTH geometry columns from the
    artifact (the gram space the model was trained in travels with
    it — a bigrams=False model can never be silently scored in bigram
    space, review r16). The crash-window dedup is scoped to
    (ckpt, batch_id, bucket): batch ids restart per checkpoint, so
    cells from DIFFERENT monitor runs sum while a replayed batch's
    byte-identical cells collapse. Fails loud with the real cause if
    the state holds no count rows yet, and loud in-plan if either
    class has no documents yet."""
    from pyspark.errors import AnalysisException

    from cassandrastack_spark.llm.classifier import _assemble_nb_weights

    meta = spark.read.parquet(state_path + "/_meta").head()
    dim = int(meta.dim)
    try:
        rows = spark.read.option("pathGlobFilter", "*.parquet").parquet(
            state_path
        )
        rows.schema  # force schema inference now, inside the try
    except AnalysisException as e:
        raise ValueError(
            f"nb_weights_state: {state_path} holds geometry metadata "
            "but no count rows — every batch so far was empty or "
            "failed its hygiene checks before appending; keep "
            "streaming labeled seed"
        ) from e
    # duplicate (ckpt, batch_id, bucket) cells — the append→marker
    # crash window's byte-identical replay rows — collapse before the
    # sum; ckpt is in the key because batch ids restart per
    # checkpoint (review r16)
    dedup = rows.groupBy("ckpt", "batch_id", "bucket").agg(
        F.max("pb").alias("pb"), F.max("nb").alias("nb")
    )
    per_bucket = (
        dedup.filter(F.col("bucket") >= 0)
        .groupBy("bucket")
        .agg(F.sum("pb").alias("pb"), F.sum("nb").alias("nb"))
    )
    scal = dedup.agg(
        F.sum(F.when(F.col("bucket") == -1, F.col("pb"))).alias("n_pos"),
        F.sum(F.when(F.col("bucket") == -1, F.col("nb"))).alias("n_neg"),
        F.sum(F.when(F.col("bucket") >= 0, F.col("pb"))).alias("pt"),
        F.sum(F.when(F.col("bucket") >= 0, F.col("nb"))).alias("nt"),
    )
    guard = (
        F.col("n_pos").isNotNull() & (F.col("n_pos") > 0)
        & F.col("n_neg").isNotNull() & (F.col("n_neg") > 0)
    )
    return _assemble_nb_weights(
        per_bucket, scal, dim, guard,
        "nb_weights_state: the accumulated stream has no documents of "
        "one class yet — a one-class model scores everything "
        "identically; keep streaming labeled seed (or check the "
        "label column)",
    ).withColumn("bigrams", F.lit(bool(meta.bigrams)))
