"""Layout guardrails and plan lints.

Thresholds default to the reference's own envelope, re-interpreted for
a columnar engine (sources cited per field on ``Guardrails``). All
checks are DataFrame aggregations — they run distributed and return
small summaries; nothing collects raw data to the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Guardrails:
    """Engine thresholds, defaulted from the reference's config.

    - ``large_partition_bytes``: warn threshold for one partition key's
      data volume — ``compaction_large_partition_warning_threshold_mb:
      100`` (``cassandra.yaml:1164``).
    - ``skew_warn_ratio``: max/avg partition-key frequency ratio that
      flags a hot key — the analogue of the unlogged-batch-partitions
      warning guarding fan-out writes (``cassandra.yaml:1161``); AQE
      uses 5x medians for skew-join splitting, matched here.
    - ``rows_scanned_warn``: per-query scanned-row warning — the
      tombstone scan warn/fail pair (``cassandra.yaml:1150-1151``)
      generalized to "you are reading far more than you return".
    - ``small_file_bytes``: files below this are compaction candidates
      (the LSM compaction analogue, ``cassandra.yaml:818``).
    """

    large_partition_bytes: int = 100 * 1024 * 1024
    skew_warn_ratio: float = 5.0
    rows_scanned_warn: int = 100_000
    small_file_bytes: int = 8 * 1024 * 1024
    warnings: list = field(default_factory=list)

    def warn(self, msg: str) -> None:
        self.warnings.append(msg)


def partition_stats(
    df: DataFrame, key_cols: list[str], top_n: int = 20
) -> DataFrame:
    """Per-partition-key stats: rows and approximate in-memory bytes,
    largest keys first — the large-partition report.

    Byte estimate = sum of column sizes per row via to_json length
    (cheap, proportional; exact bytes are a storage-format concern).
    """
    row_bytes = F.octet_length(F.to_json(F.struct(*df.columns)))
    return (
        df.groupBy(*key_cols)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(row_bytes).alias("approx_bytes"),
        )
        .orderBy(F.desc("approx_bytes"))
        .limit(top_n)
    )


def skew_report(
    df: DataFrame, key_cols: list[str], guard: Guardrails | None = None
) -> dict:
    """Hot-key detection: max/avg/median key frequency in ONE pass
    (single aggregation over the key histogram). Returns a dict and
    appends a warning to ``guard`` when max/avg exceeds the ratio."""
    guard = guard or Guardrails()
    hist = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    row = hist.agg(
        F.max("n").alias("mx"),
        F.avg("n").alias("avg"),
        F.expr("percentile(n, 0.5)").alias("med"),
        F.count("*").alias("n_keys"),
    ).head()
    ratio = (row.mx / row.avg) if row.avg else 0.0
    report = {
        "n_keys": row.n_keys,
        "max_rows": row.mx,
        "avg_rows": float(row.avg or 0.0),
        "median_rows": float(row.med or 0.0),
        "max_over_avg": float(ratio),
        "skewed": bool(ratio > guard.skew_warn_ratio),
    }
    if report["skewed"]:
        guard.warn(
            f"skewed key in {key_cols}: hottest key has {row.mx} rows, "
            f"{ratio:.1f}x the average — salt the key or rely on AQE "
            f"skew-join splitting"
        )
    return report


def table_file_stats(
    spark: SparkSession, path: str, guard: Guardrails | None = None
) -> dict:
    """File-layout report for a parquet table directory: counts, byte
    histogram, small-file ratio. Small-file buildup is the LSM-memtable
    analogue — the signal to run the compaction job
    (``WideColumnTable.compact``).

    Walks through the Hadoop FileSystem API (same pattern as
    ``compact()``'s staging cleanup), so the report works on any
    ``fs.Path``-resolvable scheme — s3a/gs/abfs/hdfs as well as
    local files — where a 100 TB table actually lives."""
    guard = guard or Guardrails()
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = []
    if fs.exists(root):
        it = fs.listFiles(root, True)  # recursive
        while it.hasNext():
            status = it.next()
            if status.getPath().getName().endswith(".parquet"):
                sizes.append(status.getLen())
    n_small = sum(1 for s in sizes if s < guard.small_file_bytes)
    report = {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "max_bytes": max(sizes, default=0),
        "n_small_files": n_small,
        "small_ratio": (n_small / len(sizes)) if sizes else 0.0,
    }
    if sizes and report["small_ratio"] > 0.5 and len(sizes) > 8:
        guard.warn(
            f"{n_small}/{len(sizes)} files under "
            f"{guard.small_file_bytes >> 20} MB in {path} — run compact()"
        )
    return report


def plan_lints(df: DataFrame, execute: bool = False) -> dict:
    """Programmatic plan inspection — the CI-able form of .explain():

    - ``pushed_filters``: filters that reached the source scan
    - ``read_columns``: columns actually read from the source
    - ``n_shuffles`` / ``n_broadcasts``: exchange counts
    - ``whole_stage_codegen``: at least one codegen span exists
    - ``has_sort_merge_join`` / ``has_bnl_join``: expensive-join flags
      (broadcast-nested-loop on big inputs is almost always a bug)

    With ``execute=True`` the DataFrame's own execution is triggered
    (JVM-side count over its internal RDD — no rows reach the driver)
    so AQE finalizes it in place: codegen spans and runtime join choices
    are only visible in the FINAL adaptive plan, not the initial one.
    """
    if execute:
        df._jdf.queryExecution().toRdd().count()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    fmt = df._jdf.queryExecution().explainString(mode)
    # structural counts come from the simple physical-plan tree (the
    # formatted mode repeats every node in its details section, which
    # would double-count; codegen there is only an annotation). For a
    # finalized adaptive plan, keep only the Final Plan section.
    tree = df._jdf.queryExecution().executedPlan().toString()
    tree = tree.split("== Initial Plan ==")[0]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", fmt)
    cols: set[str] = set()
    for rs in read_schema:
        for part in rs.split(","):
            if ":" in part:
                cols.add(part.split(":")[0].strip())
    return {
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_columns": sorted(cols),
        "n_shuffles": len(re.findall(r"Exchange hashpartitioning", tree)),
        "n_broadcasts": len(re.findall(r"BroadcastExchange", tree)),
        # whole-stage-codegen spans print as "*(n)" node prefixes
        "whole_stage_codegen": bool(re.search(r"\*\(\d+\)", tree)),
        "has_sort_merge_join": "SortMergeJoin" in tree,
        "has_bnl_join": "BroadcastNestedLoopJoin" in tree,
    }
