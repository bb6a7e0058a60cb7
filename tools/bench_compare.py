"""Bench regression gate: diff two bench artifacts and fail on slowdowns.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--ratio 1.5] [--floor 1.0]

Accepts either the driver's BENCH_r{N}.json shape ({"parsed": {"queries":
{...}}} or the raw one-line {"queries": {...}}) or bench.py's
BENCH_FULL.json ({"queries": {...}}).  Queries folded into "_rest(N)" in
the compact line are skipped (compare BENCH_FULL.json for full detail).

Exit 0 when no query is > --ratio slower than before; exit 1 otherwise,
printing the offending queries.  Queries faster than --floor seconds in
BOTH runs are ignored — sub-second timings at sf0.1 are dominated by
scheduling jitter and a 1.5x swing there is noise, not a regression.
Errored queries (-1 sentinels) in the NEW run always fail the gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    q = data.get("queries", {})
    return {k: float(v) for k, v in q.items() if not k.startswith("_rest")}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="fail when new/old exceeds this (default 1.5)")
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore queries under this many seconds in both "
                         "runs (default 1.0)")
    args = ap.parse_args()

    old = load_queries(args.old)
    new = load_queries(args.new)

    failures: list[str] = []
    for name, t_new in sorted(new.items()):
        if t_new < 0:
            failures.append(f"{name}: errored in new run")
            continue
        t_old = old.get(name)
        if t_old is None or t_old <= 0:
            continue  # new query, or old run errored — nothing to compare
        if t_old < args.floor and t_new < args.floor:
            continue
        ratio = t_new / t_old if t_old else float("inf")
        marker = "REGRESSED" if ratio > args.ratio else (
            "improved " if ratio < 1 / args.ratio else "         ")
        print(f"{marker} {name}: {t_old:.2f}s -> {t_new:.2f}s ({ratio:.2f}x)")
        if ratio > args.ratio:
            failures.append(f"{name}: {t_old:.2f}s -> {t_new:.2f}s ({ratio:.2f}x)")

    if failures:
        print(f"\nFAIL: {len(failures)} quer{'y' if len(failures)==1 else 'ies'} "
              f"regressed beyond {args.ratio}x:", file=sys.stderr)
        for f_ in failures:
            print(f"  {f_}", file=sys.stderr)
        return 1
    print(f"\nOK: no query regressed beyond {args.ratio}x "
          f"({len(new)} compared)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
