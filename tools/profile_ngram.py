#!/usr/bin/env python
"""Stage-level profile of the ngram_jaccard_pairs + dedup_components
pipeline (the dedup_cluster_* family's shared cost) at sf0.1.

Times each materialization boundary separately so the optimization
round can attribute seconds to stages instead of guessing.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")

from pyspark.sql import functions as F  # noqa: E402

from cassandrastack_spark.session import get_spark  # noqa: E402
from cassandrastack_spark.llm.dedup import (  # noqa: E402
    dedup_components,
    ngram_jaccard_pairs,
    shingle_sets,
)

spark = get_spark("profile-ngram")
t0 = time.perf_counter()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
print(f"warmup sentinel: {time.perf_counter() - t0:.3f}s", flush=True)

docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def timed(label, fn, n=2):
    best = None
    for _ in range(n):
        t = time.perf_counter()
        out = fn()
        el = time.perf_counter() - t
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.3f}s", flush=True)
    return out


# stage 1: shingling alone (matches the sh checkpoint inside
# ngram_jaccard_pairs: shingles + hashed shingles, materialized)
def _sh():
    return (
        shingle_sets(docs, "doc_id", "text", 3)
        .withColumn("hx", F.expr("transform(shingles, s -> xxhash64(s))"))
        .localCheckpoint(eager=True)
    )


sh = timed("stage1 shingle_sets+hash (checkpoint)", _sh)

# stage 2: full pair generation (includes stage 1 again)
pairs = timed(
    "stage2 ngram_jaccard_pairs end-to-end (noop)",
    lambda: ngram_jaccard_pairs(docs, threshold=0.2),
)
timed(
    "stage2 execute",
    lambda: ngram_jaccard_pairs(docs, threshold=0.2)
    .write.format("noop").mode("overwrite").save(),
)

# stage 3: components on materialized pairs (isolates the star/label
# rounds from pair generation)
mat = ngram_jaccard_pairs(docs, threshold=0.2).localCheckpoint(eager=True)
print(f"pairs rows: {mat.count()}", flush=True)
timed(
    "stage3 dedup_components on checkpointed pairs (noop)",
    lambda: dedup_components(mat)
    .write.format("noop").mode("overwrite").save(),
)

# stage 4: whole query as registered
from cassandrastack_spark.queries import load_all  # noqa: E402

reg = load_all()
for q in (
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "dedup_canonical_election",
):
    timed(
        f"stage4 {q} (noop)",
        lambda q=q: reg[q].fn(spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
    )
