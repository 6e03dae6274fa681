"""Round-over-round bench comparison — mechanizes the perf-review
protocol the close-out analyses apply by hand every round:

1. sum the SHARED queries of two BENCH.json files and report the
   suite ratio (absolute seconds are host-dependent; ratios against a
   same-host run are the only meaningful unit);
2. list per-query movers above a threshold, worst first;
3. report the UNCHANGED-CODE control — the movers whose implementation
   did not change between the two revisions are pure host drift, and
   their median ratio calibrates the host band that code-attributable
   movers must be judged against.

Usage: python tools/bench_diff.py OLD_BENCH.json [NEW_BENCH.json]
       [--threshold 1.3] [--git-old REV]
NEW defaults to ./BENCH.json; --git-old REV enables the unchanged-code
control by diffing each query's plans/ source between REV and HEAD
(cheap textual check: a query counts as changed if any plans/ or
engine file git-diffs between the revisions).
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    return d["queries"] if "queries" in d else d


def changed_files(rev: str) -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", rev, "HEAD", "--",
         "kafka_metrics_exporter_spark/"],
        capture_output=True, text=True, check=True,
    )
    return [l for l in out.stdout.splitlines() if l.strip()]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new", nargs="?", default="BENCH.json")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--git-old", default=None)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    shared = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    ratios = {q: new[q] / max(old[q], 0.01) for q in shared}
    print(f"shared {len(shared)} queries: {t_new:.1f}s vs {t_old:.1f}s "
          f"= {t_new / t_old:.3f}x  (median per-query "
          f"{statistics.median(ratios.values()):.3f}x)")

    movers = sorted(
        ((r, q) for q, r in ratios.items() if r >= args.threshold),
        reverse=True,
    )
    for r, q in movers:
        print(f"  {r:.2f}x  {q}  {old[q]:.2f} -> {new[q]:.2f} s")
    if not movers:
        print(f"  (no mover >= {args.threshold}x)")

    added = sorted(set(new) - set(old))
    if added:
        print("new queries:", ", ".join(f"{q}={new[q]:.2f}s" for q in added))

    if args.git_old:
        files = changed_files(args.git_old)
        print(f"engine files changed since {args.git_old}: {len(files)}")
        # the control: if NO engine file changed, every mover is host
        # drift; with changes, eyeball which movers touch changed files
        for f in files:
            print(f"  {f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
