"""cassandrastack_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference system
(``QualmandDriven/cassandraStack``: a Flask REST API over a Cassandra 3.0
wide-column store — see ``SURVEY.md``), re-expressed Spark-first:

- wide-column data model (partition key + clustering order) on Parquet
  (`cassandrastack_spark.storage`, reference ``server.py:178-186``),
- the reference's DDL/DML/read operators as catalog + DataFrame ops
  (`cassandrastack_spark.catalog`, `cassandrastack_spark.queries.parity`),
- a full analytical layer (joins/aggs/windows/set-ops) over the star
  schema (`cassandrastack_spark.queries.analytics`),
- LLM-data-pipeline operators: dedup, similarity search, text analysis,
  multimodal column plumbing (`cassandrastack_spark.llm`),
- Structured Streaming over the events table
  (`cassandrastack_spark.streaming`).

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning,
join selection; custom operators are compositions of built-in ops with
Pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from cassandrastack_spark.session import get_spark  # noqa: F401
