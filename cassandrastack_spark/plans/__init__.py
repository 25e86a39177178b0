"""Plan inspection & data-layout guardrails (SURVEY.md §4).

The reference protects its node with config guardrails — tombstone scan
warn/fail (``cassandra.yaml:1150-1151``), batch size warn/fail
(``cassandra.yaml:1155-1158``), large-partition warn 100 MB
(``cassandra.yaml:1164``), GC-pause warn (``cassandra.yaml:1169``).
The 100 TB Spark analogue is data-layout hygiene: detect skewed keys,
oversized partitions, and small-file buildup BEFORE they take down a
job, plus programmatic plan lints (did the filter push down? did the
dim broadcast?) usable in CI.
"""

from cassandrastack_spark.plans.guardrails import (
    Guardrails,
    partition_stats,
    plan_lints,
    skew_report,
    table_file_stats,
)

__all__ = [
    "Guardrails",
    "partition_stats",
    "plan_lints",
    "skew_report",
    "table_file_stats",
]
