#!/usr/bin/env python
"""Per-query timing bands across every committed bench ledger.

Every round's perf adjudication answers the same two questions — "is
this reading inside the query's historical band?" and "did the whole
sweep run on a degraded host?" — by hand-joining BENCH_FULL_r*.json
files. This tool does that join once:

    python tools/bench_history.py                 # movers vs band, newest round
    python tools/bench_history.py --all           # full per-query table
    python tools/bench_history.py -q ann_lsh_topk # one query's trajectory

Output per query: every round's reading, the historical band
[min..max] over PRIOR rounds, and the latest reading's ratio to the
prior-round value and to the band median. "Mover" = latest/prior >
1.3x AND latest above the historical max AND base > 0.5 s — the same
thresholds BENCH_NOTES has applied since r9, so the tool's movers
list is exactly the set the notes must adjudicate. Host context
(loadavg_start, warmup sentinel) prints per round because totals
track host state (the r10-r12 adjudication discipline): a mover on a
degraded-host sweep is host evidence, not code evidence.

Reads committed ledgers only — it never runs Spark.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ledgers() -> dict[int, dict]:
    out = {}
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json"))):
        m = re.search(r"BENCH_FULL_r(\d+)\.json$", p)
        if not m:
            continue
        with open(p) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--all", action="store_true", help="full table")
    ap.add_argument("-q", "--query", help="one query's trajectory")
    ap.add_argument(
        "--threshold", type=float, default=1.3,
        help="mover ratio vs prior round (default 1.3)",
    )
    args = ap.parse_args()

    ledgers = load_ledgers()
    if len(ledgers) < 2:
        print("need >= 2 committed BENCH_FULL_r*.json ledgers")
        return 1
    rounds = sorted(ledgers)
    latest = rounds[-1]

    print("# host context per round (totals track host state)")
    for r in rounds:
        h = ledgers[r].get("host", {})
        la = h.get("loadavg_start", ["?"])
        print(
            f"  r{r:02d}: total {ledgers[r].get('value', '?'):>8} s  "
            f"loadavg_start {la[0] if la else '?':>5}  "
            f"sentinel {h.get('warmup_sentinel_sec', '?')}"
        )
    print()

    names = sorted(
        set().union(*(ledgers[r].get("queries", {}) for r in rounds))
    )
    if args.query:
        if args.query not in names:
            print(f"unknown query {args.query!r}")
            return 1
        names = [args.query]

    header = "query".ljust(36) + "".join(f"r{r:02d}".rjust(8) for r in rounds)
    header += "  vs-prior  vs-band-med"
    rows_out, movers = [], []
    for n in names:
        vals = {r: ledgers[r].get("queries", {}).get(n) for r in rounds}
        prior_vals = [vals[r] for r in rounds[:-1] if vals[r] is not None]
        cur = vals[latest]
        prev = vals[rounds[-2]] if len(rounds) >= 2 else None
        vs_prior = (cur / prev) if cur and prev else None
        band_med = statistics.median(prior_vals) if prior_vals else None
        vs_med = (cur / band_med) if cur and band_med else None
        is_mover = bool(
            cur is not None
            and prev is not None
            and prev > 0.5
            and vs_prior is not None
            and vs_prior > args.threshold
            and prior_vals
            and cur > max(prior_vals)
        )
        line = n.ljust(36) + "".join(
            (f"{vals[r]:8.2f}" if vals[r] is not None else "       -")
            for r in rounds
        )
        line += (
            f"  {vs_prior:7.2f}x" if vs_prior is not None else "        -"
        ) + (f"  {vs_med:9.2f}x" if vs_med is not None else "          -")
        if is_mover:
            movers.append(line + "   << MOVER")
        rows_out.append(line + ("   << MOVER" if is_mover else ""))

    if args.all or args.query:
        print(header)
        print("\n".join(rows_out))
    else:
        print(
            f"# movers: latest/prior > {args.threshold}x AND above the "
            "historical max AND base > 0.5 s"
        )
        print(header)
        print("\n".join(movers) if movers else "  (none)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
