#!/usr/bin/env python
"""Sharded test gate: the full suite in under 10 minutes.

``pytest tests/`` single-process is ~25 min of work and a 4-way
file-granularity split is bounded by ``test_llm_ops.py`` alone
(~10.5 min) — so this runner shards by TEST ITEM, round-robin in
collection order, which spreads every file's items across all shards.
Safe because the suite is tmp_path-isolated throughout (no named
warehouse/table/view is shared between tests; verified by grep and by
rounds of parallel-by-file runs).

Usage::

    python tools/run_tests.py            # 4 shards, local[8] each
    python tools/run_tests.py -n 8       # 8 shards, local[4] each
    python tools/run_tests.py -- -k cql  # extra pytest args pass through

Each shard is its own pytest process with its own SparkSession JVM
(``SPARK_GRAFT_MASTER=local[cores/N]`` so the shards share the machine
instead of each grabbing all 32 threads). Exit status is non-zero if
any shard fails; per-shard tails and wall times print at the end.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def collect_ids(extra: list[str]) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         *extra],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if out.returncode not in (0, 5):
        sys.stderr.write(out.stdout + out.stderr)
        raise SystemExit(f"collection failed (exit {out.returncode})")
    ids = [
        line.strip()
        for line in out.stdout.splitlines()
        if "::" in line and not line.startswith(("=", "warning", " "))
    ]
    if not ids:
        raise SystemExit("no tests collected")
    return ids


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--shards", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8,
                    help="total cores to split across shards")
    ap.add_argument("extra", nargs="*", help="extra pytest args (after --)")
    args = ap.parse_args()

    ids = collect_ids(args.extra)
    n = max(1, min(args.shards, len(ids)))
    shards: list[list[str]] = [ids[i::n] for i in range(n)]
    per_shard_cores = max(2, args.cpus // n)

    print(f"{len(ids)} tests -> {n} shards x local[{per_shard_cores}]",
          flush=True)
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        env = dict(os.environ)
        env["SPARK_GRAFT_MASTER"] = f"local[{per_shard_cores}]"
        # each JVM gets a private driver heap well under RAM/N
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
        log = tempfile.NamedTemporaryFile(
            mode="w+", prefix=f"shard{i}_", suffix=".log", delete=False
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             *args.extra, *shard],
            cwd=REPO,
            stdout=log,
            stderr=subprocess.STDOUT,
            env=env,
        )
        procs.append((i, p, log))

    failed = False
    for i, p, log in procs:
        rc = p.wait()
        log.flush()
        log.seek(0)
        tail = [ln.rstrip() for ln in log.read().splitlines() if ln.strip()]
        summary = tail[-1] if tail else "(no output)"
        status = "OK" if rc == 0 else f"FAIL rc={rc}"
        print(f"shard {i}: {status}  {summary}  [{log.name}]", flush=True)
        if rc != 0:
            failed = True
            # surface the failing tests, not just the count
            for ln in tail:
                if ln.startswith("FAILED") or ln.startswith("ERROR"):
                    print(f"  {ln}", flush=True)
    print(f"total wall: {time.time() - t0:.0f}s", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
