"""Query registry: every engine query + its DuckDB oracle SQL.

Each implemented operator from SURVEY.md §2 (and the north-star LLM
pipeline set) registers here as a ``QueryDef``: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent ANSI SQL for the DuckDB oracle. ``__spark_entry__.py`` simply
re-exports this registry to the driver.

Determinism rules (so Spark and DuckDB hash-match):

- alias every computed column identically on both sides;
- round double aggregates (sum/avg of doubles) to fixed decimals on both
  sides — parallel summation order differs between engines at the ulp
  level;
- integer-derived ratios (jaccard, token stats) are exact IEEE division
  → no rounding needed;
- order-sensitive outputs (top-k) carry a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module so their registrations run."""
    from cassandrastack_spark.queries import (  # noqa: F401
        analytics,
        analytics_ext,
        llm,
        streaming,
        surface_ext,
        tpch_ext,
    )

    return REGISTRY
