"""Paired A/B benchmark: HEAD vs a given commit, alternating fresh
sessions (VERDICT r7 task 7 — the drift-adjudication protocol used ad
hoc in rounds 6-7, now committed and artifact-producing).

Single-session timings on this VM drift 1.5-2x between rounds with no
code change (CPU steal, page cache, JIT).  A same-session comparison
inherits whichever drift regime the session landed in; this tool
instead runs each side in its OWN fresh process, strictly alternating
H,B,B,H,H,B,... so slow phases of the VM hit both sides equally, and
records the full per-side sample distributions.  A query is flagged a
REAL regression only when the distributions separate (head_min >
base_max) AND the median ratio exceeds the threshold; overlapping
distributions are recorded as drift.

Usage:
  python tools/bench_ab.py BASE_COMMIT [-q q1,q2,...] [--pairs N]
         [--sf DIR] [--out FILE] [--threshold R]

Defaults: queries = the >threshold set of the newest BENCH_COMPARE_r*.txt
(or all flagged files absent), pairs = 5, sf = $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.1, out = BENCH_AB_<base7>.json at the repo root.

The base tree is materialized read-only via `git worktree add --detach`
and removed afterwards; testdata paths are shared (read-only inputs).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import __spark_entry__ as entry_mod
from powa_archivist_spark.session import get_spark

sf_dir = os.environ["AB_SF_DIR"]
names = json.loads(os.environ["AB_QUERIES"])
spark = get_spark("bench_ab", master=os.environ.get("AB_MASTER", "local[32]"))
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        spark.read.parquet(p).limit(1).collect()
spark.range(2).mapInPandas(lambda it: it, "id long").count()

qs = entry_mod.queries()
out = {}
for name in names:
    fn = qs.get(name)
    if fn is None:
        out[name] = None  # query absent at this commit
        continue
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
print("AB_RESULT " + json.dumps(out), flush=True)
"""


def newest_compare_flags(threshold: float) -> list[str]:
    files = sorted(REPO.glob("BENCH_COMPARE_r*.txt"))
    if not files:
        return []
    flagged = []
    for line in files[-1].read_text().splitlines():
        # lines like: "REGRESSED dedup_keep_list: 0.98s -> 1.53s (1.56x)"
        m = re.match(r"(?:REGRESSED)?\s*([\w\[\]-]+):.*\(([\d.]+)x\)", line)
        if m and float(m.group(2)) >= threshold:
            flagged.append(m.group(1))
    return list(dict.fromkeys(flagged))  # dedupe (summary re-lists)


def run_side(tree: Path, queries: list[str], sf_dir: str) -> dict:
    env = dict(
        os.environ,
        AB_SF_DIR=sf_dir,
        AB_QUERIES=json.dumps(queries),
        AB_MASTER=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER], cwd=str(tree), env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"runner produced no result in {tree}:\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_commit")
    ap.add_argument("-q", "--queries", default=None,
                    help="comma-separated; default = newest compare flags")
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    if args.queries:
        queries = [q for q in args.queries.split(",") if q]
    else:
        queries = newest_compare_flags(args.threshold)
    if not queries:
        print("no queries to compare (no flags found; pass -q)",
              file=sys.stderr)
        return 2

    base = subprocess.run(
        ["git", "rev-parse", args.base_commit], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    out_path = Path(args.out) if args.out else (
        REPO / f"BENCH_AB_{base[:7]}.json"
    )

    tmp = Path(tempfile.mkdtemp(prefix="bench_ab_"))
    base_tree = tmp / "base"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(base_tree), base],
        cwd=REPO, check=True, capture_output=True,
    )
    samples: dict[str, dict[str, list]] = {
        q: {"head": [], "base": []} for q in queries
    }
    try:
        for i in range(args.pairs):
            # ABBA ordering: head first on even pairs, base first on odd
            order = (("head", REPO), ("base", base_tree))
            if i % 2:
                order = tuple(reversed(order))
            for side, tree in order:
                res = run_side(tree, queries, args.sf)
                for q, v in res.items():
                    if v is not None:
                        samples[q][side].append(v)
                print(f"pair {i + 1}/{args.pairs} {side}: {res}",
                      file=sys.stderr, flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force",
                        str(base_tree)], cwd=REPO, capture_output=True)

    report = {
        "base_commit": base,
        "head_commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip(),
        "sf_dir": args.sf,
        "pairs": args.pairs,
        "generated_unix": int(time.time()),
        "queries": {},
    }
    for q in queries:
        h, b = samples[q]["head"], samples[q]["base"]
        if not h or not b:
            report["queries"][q] = {"verdict": "missing", "head": h, "base": b}
            continue
        hm, bm = statistics.median(h), statistics.median(b)
        ratio = round(hm / bm, 3) if bm > 0 else None
        overlap = min(h) <= max(b) and min(b) <= max(h)
        verdict = (
            "regression"
            if (not overlap and ratio is not None
                and ratio >= args.threshold)
            else ("drift" if ratio is not None and ratio >= args.threshold
                  else "ok")
        )
        report["queries"][q] = {
            "head": h, "base": b,
            "head_median": round(hm, 3), "base_median": round(bm, 3),
            "ratio": ratio, "distributions_overlap": overlap,
            "verdict": verdict,
        }
    out_path.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps({
        "out": str(out_path),
        "verdicts": {q: r["verdict"] for q, r in report["queries"].items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
