#!/usr/bin/env python
"""Interleaved A/B timing harness (round-16; guide §1 protocol, the same
min-of-N-across-passes discipline as bench.py).

Times a set of REGISTERED queries (plus the serving surfaces) interleaved —
one full pass over the set per rep, each query's reported number is its MIN
across passes — so a host contention burst must span the entire session to
contaminate a minimum. Includes bench.py's pinned pure-CPU calibration probe
at both ends so the artifact carries host context.

Usage:
    python tools/ab_compare.py [--reps 7] [--sf /root/testdata/sf0.1]
                               [--out plans/r16/foo_ab.json] q1 q2 ...

Output JSON: {"queries": {name: min_sec}, "pass_totals": [...],
"calibration": {...}, "reps": N, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from transf_spark import queries as q
from transf_spark.session import get_spark


def materialize(df) -> int:
    return df.select(
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h")
    ).collect()[0][0]


def calibrate(spark, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        spark.range(5_000_000_000).select(F.sum(F.xxhash64("id")).alias("h")).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("transf_spark_ab")
    import bench as _b  # reuse the serving-surface registry

    registry = {**q.queries(), **_b._serving_surfaces()}
    missing = [n for n in args.names if n not in registry]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # page-cache prefault + warmup (bench.py protocol)
    for path in glob.glob(os.path.join(args.sf, "*.parquet")):
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass
    for n in args.names:
        try:
            materialize(registry[n](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass

    cal_start = calibrate(spark)
    t: dict[str, float] = {}
    pass_totals: list[float] = []
    for _ in range(args.reps):
        p0 = time.perf_counter()
        for n in args.names:
            t0 = time.perf_counter()
            materialize(registry[n](spark, args.sf))
            dt = time.perf_counter() - t0
            if dt < t.get(n, float("inf")):
                t[n] = dt
        pass_totals.append(round(time.perf_counter() - p0, 3))
    cal_end = calibrate(spark)

    out = {
        "queries": {n: round(v, 4) for n, v in t.items()},
        "pass_totals": pass_totals,
        "calibration": {
            "range_start_sec": cal_start,
            "range_end_sec": cal_end,
            "range_anchor_sec": 0.749,  # bench.py CAL_RANGE_ANCHOR_SEC (r15)
        },
        "reps": args.reps,
        "agg": "min",
        "sf_dir": args.sf,
    }
    line = json.dumps(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
