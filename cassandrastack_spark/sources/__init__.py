"""Sources & sinks (SURVEY.md §2.4 scans/sources/sinks row).

The reference reads/writes only Cassandra tables through the CQL driver
(``server.py:56-61``); the Spark-native engine's source surface is the
DataFrameReader family plus a connector seam for real Cassandra.
"""

from cassandrastack_spark.sources.io import (
    cassandra_table,
    cassandra_write,
    read_file,
    read_table,
    write_file,
    write_sorted_bucketed,
)

__all__ = [
    "cassandra_table",
    "cassandra_write",
    "read_file",
    "read_table",
    "write_file",
    "write_sorted_bucketed",
]
