"""Control decomposition for the 2v8 scaling story (VERDICT r4 #5).

Two PIPELINE-INDEPENDENT Spark microbenchmarks run at two parallelism
levels (default local[2] vs local[8]) with interleaved repeats:

* ``alu``     — whole-stage-codegen arithmetic over ``spark.range``
                (a chain of trig/sqrt per row): pure compute, ~zero
                memory traffic per flop. If the box scaled compute
                perfectly, core-seconds would be flat across legs.
* ``shuffle`` — build ~200-byte strings, full hash-exchange groupBy
                with string aggregation: the memory-bus-heavy shape of
                the pipeline's wide stages (pair build, rerank).

Purpose: show that the +52% core-second inflation the 600k-doc linkage
job exhibits at 8 threads (BENCH_SCALING.md) is BOX-GENERIC — any
memory-traffic-heavy Spark job on this host inflates similarly, while
compute-bound work does not — converting the "one box has one memory
bus; a real 4N-executor cluster adds memory subsystems with its cores"
argument from credible to measured.

Usage: python scripts/control_scaling.py [--cores 2,8] [--repeats 3]
Each (cores, repeat) leg is a fresh subprocess/JVM; repeats interleave
across the two core counts so ambient host-load windows hit both legs.
Prints one JSON line with per-workload medians and core-s inflation,
ready to paste into BENCH_SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

# calibrated so each workload runs ~15-40 s at local[2] on this host
ALU_ROWS = 1_500_000_000
SHUFFLE_ROWS = 6_000_000


def single_run(cores: int) -> None:
    """Child process: run both workloads once at local[cores]."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from alligator_spark.session import get_spark

    spark = get_spark(app_name=f"control_scaling_{cores}", cores=cores)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    out = {"cores": cores}

    t0 = time.monotonic()
    spark.range(0, ALU_ROWS, 1, cores * 2).selectExpr(
        "sum(sin(id * 1e-7) * cos(id * 1.3e-7) + sqrt(abs(sin(id * 0.7e-7))))"
    ).collect()
    out["alu_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    rows = spark.range(0, SHUFFLE_ROWS, 1, cores * 2).selectExpr(
        "pmod(xxhash64(id), 3000000) AS k",
        "repeat(md5(cast(id AS string)), 6) AS payload",
    )
    rows.groupBy("k").agg({"payload": "max"}).selectExpr(
        "count(*)", "sum(length(`max(payload)`))"
    ).collect()
    out["shuffle_sec"] = round(time.monotonic() - t0, 2)

    print("CONTROL_RESULT " + json.dumps(out))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--single-run", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.single_run is not None:
        single_run(args.single_run)
        return 0

    lo, hi = (int(c) for c in args.cores.split(","))
    samples: dict[int, dict[str, list[float]]] = {
        c: {"alu": [], "shuffle": []} for c in (lo, hi)
    }
    for rep in range(args.repeats):
        for cores in (lo, hi):  # interleaved: every repeat sweeps both legs
            print(f"leg cores={cores} rep={rep + 1}/{args.repeats} ...",
                  file=sys.stderr)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--single-run", str(cores)],
                capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = next(
                ln for ln in proc.stdout.splitlines()
                if ln.startswith("CONTROL_RESULT ")
            )
            res = json.loads(line[len("CONTROL_RESULT "):])
            samples[cores]["alu"].append(res["alu_sec"])
            samples[cores]["shuffle"].append(res["shuffle_sec"])

    med = {
        c: {w: statistics.median(ts) for w, ts in ws.items()}
        for c, ws in samples.items()
    }
    ratio = hi / lo
    summary = {"cores": [lo, hi], "repeats": args.repeats, "runs": samples,
               "medians": med, "workloads": {}}
    for w in ("alu", "shuffle"):
        speedup = med[lo][w] / med[hi][w]
        core_lo = lo * med[lo][w]
        core_hi = hi * med[hi][w]
        summary["workloads"][w] = {
            "speedup": round(speedup, 2),
            "efficiency": round(speedup / ratio, 3),
            "core_sec_low": round(core_lo, 1),
            "core_sec_high": round(core_hi, 1),
            "core_sec_inflation_pct": round(100 * (core_hi / core_lo - 1), 1),
        }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
