#!/usr/bin/env python
"""Sharded test gate: the full suite in under 10 minutes.

``pytest tests/`` single-process is ~25 min of work and a 4-way
file-granularity split is bounded by ``test_llm_ops.py`` alone
(~10.5 min) — so this runner shards by TEST ITEM. Safe because the
suite is tmp_path-isolated throughout (no named warehouse/table/view
is shared between tests; verified by grep and by rounds of
parallel-by-file runs).

Assignment is DURATION-AWARE: each run records per-test wall times
(pytest ``--durations=0`` output) into ``tools/test_durations.json``,
and the next run greedily bin-packs items longest-first by recorded
cost (unknown items cost the median). Plain round-robin left one
shard ~2x longer than the rest — the handful of 30-90s streaming /
property tests land wherever collection order puts them; with the
profile the shards finish together and the gate keeps headroom as
the suite grows.

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
import json
import os
import re
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PROFILE = os.path.join(HERE, "test_durations.json")

# pytest --durations lines: "  12.34s call     tests/test_x.py::test_y"
_DUR_RE = re.compile(
    r"^\s*(\d+(?:\.\d+)?)s\s+(call|setup|teardown)\s+(tests/\S+)"
)


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


def load_profile() -> dict[str, float]:
    try:
        with open(PROFILE) as f:
            raw = json.load(f)
        return {k: float(v) for k, v in raw.items()}
    except (OSError, ValueError):
        return {}


def assign(
    ids: list[str], n: int, profile: dict[str, float]
) -> list[list[str]]:
    """Greedy longest-processing-time bin packing by recorded cost.

    Unknown items (new tests, or ones below pytest's 5ms durations
    cutoff) cost the median of known durations — overestimating a
    trivial test by a median is harmless for balance; underestimating
    a new 60s test self-corrects on the next run's profile update.
    Deterministic: ties break on the test id.
    """
    known = sorted(profile.get(i, -1.0) for i in ids if i in profile)
    med = known[len(known) // 2] if known else 1.0
    cost = {i: profile.get(i, med) for i in ids}
    bins: list[list[str]] = [[] for _ in range(n)]
    totals = [0.0] * n
    for i in sorted(ids, key=lambda x: (-cost[x], x)):
        j = totals.index(min(totals))
        bins[j].append(i)
        totals[j] += cost[i]
    return [b for b in bins if b]


def update_profile(logs: list[str]) -> None:
    """Merge per-test (call+setup+teardown) seconds from the shard
    logs into the profile. Partial runs (``-k`` filters) update only
    the items they ran, so the profile converges without ever being
    invalidated by a subset run."""
    merged = load_profile()
    seen: dict[str, float] = {}
    for path in logs:
        try:
            with open(path) as f:
                for line in f:
                    m = _DUR_RE.match(line)
                    if m:
                        secs, _phase, tid = m.groups()
                        seen[tid] = seen.get(tid, 0.0) + float(secs)
        except OSError:
            continue
    if not seen:
        return
    merged.update({k: round(v, 3) for k, v in seen.items()})
    tmp = PROFILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=0, sort_keys=True)
    os.replace(tmp, PROFILE)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--shards", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8,
                    help="total cores to split across shards")
    ap.add_argument("extra", nargs="*", help="extra pytest args (after --)")
    args = ap.parse_args()

    ids = collect_ids(args.extra)
    n = max(1, min(args.shards, len(ids)))
    shards = assign(ids, n, load_profile())
    per_shard_cores = max(2, args.cpus // n)

    print(f"{len(ids)} tests -> {len(shards)} shards x "
          f"local[{per_shard_cores}]", flush=True)
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
             "--durations=0", "--durations-min=0.05",
             *args.extra, *shard],
            cwd=REPO,
            stdout=log,
            stderr=subprocess.STDOUT,
            env=env,
        )
        procs.append((i, p, log))

    failed = False
    logs = []
    for i, p, log in procs:
        rc = p.wait()
        log.flush()
        log.seek(0)
        tail = [ln.rstrip() for ln in log.read().splitlines() if ln.strip()]
        summary = tail[-1] if tail else "(no output)"
        status = "OK" if rc == 0 else f"FAIL rc={rc}"
        print(f"shard {i}: {status}  {summary}  [{log.name}]", flush=True)
        logs.append(log.name)
        if rc != 0:
            failed = True
            # surface the failing tests, not just the count
            for ln in tail:
                if ln.startswith("FAILED") or ln.startswith("ERROR"):
                    print(f"  {ln}", flush=True)
    update_profile(logs)
    print(f"total wall: {time.time() - t0:.0f}s", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
