#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

Times named queries standalone against $SPARK_GRAFT_SF_DIR with the
noop sink (min-of-N, default 2) and captures ``explain("formatted")``
for each into ``plans/r16/<query>_<tag>.txt``. Jobs are labelled via
``setJobDescription`` so any UI/event-log inspection maps back to the
query.

Usage::

    python tools/opt_measure.py --tag before q1 q2 ...
    python tools/opt_measure.py --tag after --passes 3 q1
    python tools/opt_measure.py --tag before --all-over 3.0   # every query whose
                                                              # r16 ledger price >= 3s
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--all-over", type=float, default=None,
                    help="also include every query at or above this many "
                         "seconds in BENCH_FULL_r17.json")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    names = list(args.names)
    if args.all_over is not None:
        with open(os.path.join(REPO, "BENCH_FULL_r17.json")) as f:
            ledger = json.load(f)["queries"]
        names += [q for q, s in sorted(ledger.items(), key=lambda kv: -kv[1])
                  if s >= args.all_over and q not in names]
    if not names:
        ap.error("no queries named")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    from cassandrastack_spark.queries import load_all
    from cassandrastack_spark.session import get_spark

    registry = load_all()
    spark = get_spark("opt-measure")
    # warmup sentinel, same as bench.py
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    print(f"warmup_sentinel_sec={time.perf_counter() - t0:.3f}", flush=True)

    plans_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r17"))
    os.makedirs(plans_dir, exist_ok=True)
    out: dict[str, float] = {}
    for name in names:
        qd = registry[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        best = None
        for p in range(max(1, args.passes)):
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            print(f"  {name} pass{p + 1}: {el:.3f}s", flush=True)
        out[name] = round(best, 3)
        if not args.no_plans:
            plan = qd.fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "queries": out,
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
