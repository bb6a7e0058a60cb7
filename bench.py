"""Benchmark harness: run the declared query surface at a scale-factor
directory and print ONE JSON line the driver records as BENCH_r{N}.json.

Env:
  SPARK_GRAFT_SF_DIR      parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_REPS  repetitions per query (default 3); the per-query
                          number reported is the MEDIAN of the reps, and
                          the headline "value" is the sum of medians.

Each query is forced with a full materialization (noop sink — every row
computed, nothing collected to the driver).  A warmup pass touches every
table and forks the Python/Arrow workers first so per-query numbers
reflect execution, not session startup.

Median-of-k discipline (round-5): single-shot timings at sf0.1 showed
2-4x swings on identical data purely from run-order/JIT/page-cache
effects, which is indistinguishable from a real regression.  Each query
now runs k times back-to-back; BENCH_FULL.json records min/median/max so
a real regression (tight spread, high median) is separable from noise
(wide spread).  The headline total is the sum of medians — comparable
round-over-round even if the rep count changes.

Spread-or-paired discipline (r13, VERDICT r12 task 2): two regens of
IDENTICAL code disagreed by up to 6.8x on single-sample heavy queries,
so round-over-round deltas on this artifact alone are NOT regression
evidence.  Three changes make the headline self-describing about its
own confidence: (a) over-cutoff queries now take a SECOND sample
(n=2) unless they exceed SPARK_GRAFT_BENCH_SLOW_CAP — an n=1 number is
unfalsifiable, one extra rep makes the spread visible; (b) every
detail row records ``spread`` = max/min; (c) BENCH_FULL.json carries a
``low_confidence`` list (reps==1 or spread > 2) and the headline line
a ``_lowconf`` count.  Regression claims should run the paired A/B
protocol (tools/bench_ab.py — alternating arms against a base commit,
overlap-gated verdicts); the committed BENCH_AB_FULL_r{N}.json is the
trustworthy round-over-round comparator.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    import __spark_entry__ as entry_mod
    from powa_archivist_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")

    # warmup: touch every table once (parquet footer reads + JVM warm)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count() if name == "region" else spark.read.parquet(p).limit(1).collect()
    # spawn the Python/Arrow workers once so the first mapInPandas query
    # doesn't absorb the ~5s interpreter fork into its own number
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # a query whose FIRST run exceeds the cutoff drops to TWO samples
    # (r13, VERDICT r12 task 2 — n=1 on exactly the heaviest queries
    # made regens of identical code disagree 6.8x with no visible
    # spread); only past the hard cap does it stay at one, and that row
    # is flagged low-confidence in the artifact either way
    slow_cutoff = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_CUTOFF", "20"))
    slow_cap = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_CAP", "90"))
    timings: dict[str, float] = {}          # median per query (headline)
    detail: dict[str, dict] = {}            # min/median/max/reps per query
    for name, fn in entry_mod.queries().items():
        samples: list[float] = []
        err = None
        want = reps
        for _ in range(reps):
            t0 = time.time()
            try:
                # noop sink: full computation of every row, no driver collect
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
                err = str(e)
                break
            # only the FIRST run decides the rep budget — re-deciding on
            # a later over-cutoff sample would leave an even-count
            # median polluted by the outlier (r5 code review)
            if len(samples) == 1 and samples[0] > slow_cutoff:
                want = 1 if samples[0] > slow_cap else min(2, reps)
            if len(samples) >= want:
                break
        if err is not None or not samples:
            timings[name] = -1.0
            detail[name] = {"error": err}
            print(f"bench error in {name}: {err}", file=sys.stderr, flush=True)
            continue
        s = sorted(samples)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        timings[name] = round(med, 3)
        detail[name] = {
            "median": round(med, 3),
            "min": round(s[0], 3),
            "max": round(s[-1], 3),
            "reps": len(s),
            "spread": round(s[-1] / max(s[0], 1e-9), 2),
        }
        print(
            f"bench {name}: median {timings[name]}s "
            f"(min {detail[name]['min']} max {detail[name]['max']} n={len(s)})",
            file=sys.stderr, flush=True,
        )
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    # rows whose number can't support a round-over-round delta on its
    # own: single-sampled, or spread past 2x (VM interference class —
    # PERF.md measured 4.5x intra-arm spread on identical binaries)
    low_confidence = sorted(
        k for k, d in detail.items()
        if "error" not in d and (d["reps"] == 1 or d["spread"] > 2.0)
    )

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # The driver parses the final JSON line out of a bounded (2000-char)
    # output tail, so the line MUST stay under that budget no matter how
    # many queries are declared.  Emit slowest-first with compact floats;
    # if the full dict would overflow, fold the fastest remainder into a
    # single "_rest(N)" sum.  Full per-query detail goes to BENCH_FULL.json.
    budget = 1800

    def fmt(v: float) -> float:
        return round(v, 2) if v < 10 else round(v, 1)

    # -1.0 sentinels mark errored queries; they are NOT times — keep them
    # out of the slowest-first sort and the _rest fold (summing them once
    # produced a nonsense negative "_rest" in a recorded bench line).
    errored = sorted(k for k, v in timings.items() if v < 0)
    ordered = sorted(
        ((k, v) for k, v in timings.items() if v >= 0), key=lambda kv: -kv[1]
    )
    if errored:
        print(f"bench: {len(errored)} errored queries: {errored}",
              file=sys.stderr, flush=True)
    # fold the committed 100x-posture run (tools/bench_scaling.py) into
    # the full artifact so the driver's record carries the per-query
    # scaling exponents alongside the sf0.1 medians
    scaling = None
    scaling_path = Path(__file__).resolve().parent / "BENCH_SCALING.json"
    if scaling_path.exists():
        try:
            with open(scaling_path) as f:
                scaling = json.load(f)
        except (OSError, json.JSONDecodeError):
            scaling = None
    with open(Path(__file__).resolve().parent / "BENCH_FULL.json", "w") as f:
        json.dump({"total_sec": total, "sf": sf, "errors": errored,
                   "reps": reps, "metric": "sum_of_medians",
                   "low_confidence": low_confidence,
                   "queries": timings, "detail": detail,
                   "scaling": scaling}, f, indent=1)

    def line_for(n_keep: int) -> str:
        q = {k: fmt(v) for k, v in ordered[:n_keep]}
        rest = ordered[n_keep:]
        if rest:
            q[f"_rest({len(rest)})"] = fmt(sum(v for _, v in rest))
        payload = {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            "queries": q,
            "sf": sf,
        }
        if low_confidence:
            payload["_lowconf"] = len(low_confidence)
        if errored:
            payload["_errors"] = len(errored)
        return json.dumps(payload, separators=(",", ":"))

    n_keep = len(ordered)
    out = line_for(n_keep)
    while len(out) > budget and n_keep > 1:
        n_keep -= max(1, (len(out) - budget) // 30)
        out = line_for(n_keep)
    if n_keep < len(ordered):
        print(f"bench: JSON line folds {len(ordered) - n_keep} fastest "
              f"queries into _rest; full detail in BENCH_FULL.json",
              file=sys.stderr, flush=True)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
