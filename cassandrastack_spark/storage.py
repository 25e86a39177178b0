"""Wide-column storage engine on Parquet — the reference's data model, Spark-native.

Physical layout contract (SURVEY.md §1.4):

- **Token routing → hash buckets.** Cassandra hash-routes each row by the
  Murmur3 token of its partition key (``cassandra.yaml:184``; 256 vnodes
  ``cassandra.yaml:25``). Here every row gets a ``_bucket`` directory
  column = ``pmod(hash(partition_key), n_buckets)`` — Spark's ``hash()``
  is also Murmur3, so this is the same design. A partition-key-equality
  read computes the bucket driver-side and prunes to ONE directory
  (Catalyst partition pruning), the analogue of single-token-range
  routing (``server.py:98``).
- **Clustering order → sortWithinPartitions.** ``CLUSTERING ORDER BY
  (message_id DESC)`` (``server.py:185``) becomes
  ``sortWithinPartitions(desc(clustering))`` at write: rows in each file
  are stored newest-first, and Parquet min/max stats make in-partition
  range seeks cheap (the column-index analogue, ``cassandra.yaml:785``).
- **Upsert (last-writer-wins) → dedup-on-read.** CQL INSERT is an upsert
  on the primary key (``server.py:307-308`` re-seeding overwrites).
  Parquet is append-only, so every write carries a monotonically
  increasing ``_writetime``; reads keep the newest row per primary key
  via max_by/row_number (SURVEY.md §7.4). A ``compact()`` job rewrites
  buckets to physically drop shadowed rows — the compaction analogue
  (``cassandra.yaml:818``).
- **Batch atomicity → commit protocol.** The reference wraps writes in
  logged batches for atomicity (``server.py:191-207``); one Spark write
  job is already atomic per the Parquet commit protocol (SURVEY.md §2.2
  W3), so a multi-row append IS the batch.

At 100 TB: n_buckets scales with data volume (buckets ≈ data /
target_file_size); appends touch only the buckets their rows hash to;
point reads stay O(1 bucket); full scans parallelize across buckets.
"""

from __future__ import annotations

import itertools
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from cassandrastack_spark.catalog import Keyspace, TableSpec
from cassandrastack_spark.hashing import bucket_of

_BUCKET = "_bucket"
_WRITETIME = "_writetime"

# Engine-side monotonic write sequence: (epoch_micros, counter) so two
# appends in the same microsecond still order deterministically.
_write_counter = itertools.count()


def _next_writetime() -> int:
    return int(time.time() * 1_000_000) * 1000 + (next(_write_counter) % 1000)


class WideColumnTable:
    """One wide-column table: append/upsert writes, pruned reads."""

    def __init__(
        self,
        spark: SparkSession,
        keyspace: Keyspace,
        spec: TableSpec,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.keyspace = keyspace
        self.spec = spec
        self.n_buckets = n_buckets

    @property
    def path(self) -> str:
        return self.keyspace.table_path(self.spec.name)

    # ---- write path (W1-W3, server.py:131-139, 191-207) -------------------

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        key_cols = [F.col(c) for c in self.spec.partition_keys]
        return df.withColumn(
            _BUCKET, F.pmod(F.hash(*key_cols), F.lit(self.n_buckets))
        )

    def append(self, df: DataFrame) -> None:
        """Atomic multi-row upsert-append (W1/W2/W3).

        Enforces schema-on-write (SURVEY.md §1.3): input columns must
        match the declared schema exactly (names + order coerced here,
        extra/missing columns error).
        """
        declared = [f.name for f in self.spec.schema.fields]
        missing = set(declared) - set(df.columns)
        extra = set(df.columns) - set(declared)
        if missing or extra:
            raise ValueError(
                f"schema mismatch for {self.spec.name}: missing={sorted(missing)} "
                f"extra={sorted(extra)} (schema-on-write, declared DDL wins)"
            )
        out = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in self.spec.schema.fields]
        )
        out = self._with_bucket(out).withColumn(
            _WRITETIME, F.lit(_next_writetime())
        )
        sort_cols = self._sort_cols()
        writer = (
            # _BUCKET leads the sort: the partitioned-file writer requires
            # task rows ordered by the partition dirs and would otherwise
            # insert its own (non-stable) sort, destroying the clustering
            # order inside each file.
            out.repartition(self.n_buckets, F.col(_BUCKET))
            .sortWithinPartitions(F.col(_BUCKET), *sort_cols)
            .write.mode("append")
            .partitionBy(_BUCKET)
        )
        writer.parquet(self.path)

    def _sort_cols(self):
        cols = []
        for c in self.spec.clustering_keys:
            cols.append(F.desc(c) if self.spec.clustering_desc else F.asc(c))
        return cols or [F.asc(self.spec.partition_keys[0])]

    # ---- read path (R1-R4) -------------------------------------------------

    def _raw(self) -> DataFrame:
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        read_schema = StructType(
            list(self.spec.schema.fields)
            + [StructField(_BUCKET, IntegerType()), StructField(_WRITETIME, LongType())]
        )
        return self.spark.read.schema(read_schema).parquet(self.path)

    def read(self) -> DataFrame:
        """Full table with upsert semantics: newest row per primary key.

        Uses max_by over a single groupBy — one shuffle, map-side
        combinable, no window-sort. Shadowed (overwritten) rows drop out
        exactly as Cassandra's read-path reconciliation does.
        """
        raw = self._raw()
        pk = self.spec.primary_key
        payload = [c for c in raw.columns if c not in pk and c != _BUCKET]
        agg = [F.expr(f"max_by(`{c}`, `{_WRITETIME}`)").alias(c) for c in payload]
        return (
            raw.groupBy(*pk)
            .agg(*agg)
            .drop(_WRITETIME)
            .select(*[f.name for f in self.spec.schema.fields])
        )

    def read_partition(self, **key_values) -> DataFrame:
        """R1: partition-key-equality read, pruned to one bucket directory.

        The bucket is computed driver-side with the same Murmur3 hash
        the writer used, so Catalyst prunes the scan to a single
        ``_bucket=k`` directory — the single-token-range read of
        ``server.py:98``. Results come back in clustering order
        (``server.py:185``).
        """
        if set(key_values) != set(self.spec.partition_keys):
            raise ValueError(
                f"partition read needs exactly {self.spec.partition_keys}"
            )
        # Bucket routing is pure driver-side arithmetic (hashing.py is a
        # bit-exact mirror of F.hash) — no Spark job per point lookup.
        # The DECLARED column types drive the hash dispatch.
        types = {f.name: f.dataType.simpleString() for f in self.spec.schema.fields}
        bucket = bucket_of(
            [key_values[k] for k in self.spec.partition_keys],
            self.n_buckets,
            dtypes=[types[k] for k in self.spec.partition_keys],
        )
        raw = self._raw().filter(F.col(_BUCKET) == int(bucket))
        for k, v in key_values.items():
            raw = raw.filter(F.col(k) == v)
        pk = self.spec.primary_key
        payload = [c for c in raw.columns if c not in pk and c != _BUCKET]
        agg = [F.expr(f"max_by(`{c}`, `{_WRITETIME}`)").alias(c) for c in payload]
        deduped = raw.groupBy(*pk).agg(*agg)
        order = self._sort_cols()
        return deduped.select(*[f.name for f in self.spec.schema.fields]).orderBy(*order)

    # ---- maintenance -------------------------------------------------------

    def compact(self) -> None:
        """Rewrite the table dropping shadowed rows and small files.

        The engine's analogue of Cassandra compaction
        (``cassandra.yaml:818``): read → dedup → rewrite bucketed +
        sorted. Run periodically; at 100 TB run it per-bucket-range so
        each job rewrites a bounded slice.

        Commit protocol (object-store-safe, no local-FS calls):

        1. stage the deduped rows next to the table (Spark's own commit
           protocol makes the staging write all-or-nothing);
        2. read the staging copy back and DYNAMIC-partition-overwrite
           the live table — each ``_bucket=k`` directory is replaced in
           its own commit, so concurrent readers always see a complete
           table (never the rmtree-then-move gap a rename swap has);
        3. drop staging through the Hadoop FileSystem API, which
           resolves s3a/gs/abfs/hdfs/file alike.
        """
        stage = self.path + ".compacting"
        out = self._with_bucket(self.read()).withColumn(
            _WRITETIME, F.lit(_next_writetime())
        )
        out.write.mode("overwrite").parquet(stage)
        staged = self.spark.read.parquet(stage)
        conf = self.spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                staged.repartition(self.n_buckets, F.col(_BUCKET))
                .sortWithinPartitions(F.col(_BUCKET), *self._sort_cols())
                .write.mode("overwrite")
                .partitionBy(_BUCKET)
                .parquet(self.path)
            )
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        jvm = self.spark._jvm
        stage_path = jvm.org.apache.hadoop.fs.Path(stage)
        fs = stage_path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        fs.delete(stage_path, True)
