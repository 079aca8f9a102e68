"""Two-cluster-size scaling evidence (sandbox protocol per BASELINE.md).

The north rule requires throughput scaling efficiency >= 0.8 between N
and 4N executors; with no real cluster available, the sandbox protocol
runs the identical linkage job at local[8] and local[32] on the same
deterministic corpus and reports docs/sec at both plus
efficiency = (docs_sec_32 / docs_sec_8) / 4.

Each parallelism level runs in its own subprocess (one JVM per master
setting). Wall time excludes session startup (a warmup job runs first)
— on a real cluster that is executor provisioning, not query time.

Usage:
    python scaling_bench.py [--spec 50000x5+50000] [--out BENCH_SCALING.md]
                            [--cores 2,8] [--repeats N]
    python scaling_bench.py --single-run <cores> <spec>   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def single_run(cores: int, spec_str: str) -> None:
    from alligator_spark.cli import parse_spec
    from alligator_spark.datagen import generate_docs
    from alligator_spark.plans.pipeline import run_linkage
    from alligator_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores)
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    spec = parse_spec(spec_str)
    stage_times: dict = {}
    t0 = time.monotonic()
    docs = generate_docs(spark, spec)
    out = run_linkage(spark, docs, stage_times=stage_times)
    tc = time.monotonic()
    n = out["components"].count()
    stage_times["final_count"] = round(time.monotonic() - tc, 2)
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": spec.n_docs,
                "rows": n,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(spec.n_docs / wall, 1),
                "stage_times": stage_times,
            }
        )
    )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--single-run":
        single_run(int(sys.argv[2]), sys.argv[3])
        return 0

    spec = "50000x5+50000"
    out_md = "BENCH_SCALING.md"
    repeats = 2
    cores_pair = (8, 32)
    args = sys.argv[1:]
    if "--spec" in args:
        spec = args[args.index("--spec") + 1]
    if "--out" in args:
        out_md = args[args.index("--out") + 1]
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    if "--cores" in args:
        lo, hi = args[args.index("--cores") + 1].split(",")
        cores_pair = (int(lo), int(hi))

    # the sandbox host carries an external background load of ~10 cores
    # (loadavg > 10 with no local processes); each leg runs `repeats`
    # times interleaved and the best (least-interfered) run counts
    results = {}
    lo, hi = cores_pair
    runs: dict[int, list] = {lo: [], hi: []}
    for _ in range(repeats):
        for cores in cores_pair:
            print(f"running local[{cores}] on {spec} ...", file=sys.stderr)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single-run", str(cores), spec],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = proc.stdout.strip().splitlines()[-1]
            runs[cores].append(json.loads(line))
            print(line, file=sys.stderr)
    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    for cores in cores_pair:
        results[cores] = max(runs[cores], key=lambda r: r["docs_per_sec"])
        results[cores]["all_runs_docs_per_sec"] = [
            r["docs_per_sec"] for r in runs[cores]
        ]
        results[cores]["median_docs_per_sec"] = round(
            median(results[cores]["all_runs_docs_per_sec"]), 1
        )

    ratio = hi / lo
    # the 0.8 gate runs on the MEDIAN of the interleaved runs (per-leg
    # maxima from different interference windows can over/under-state
    # efficiency under the host's external load); best-of is reported too
    eff_med = (
        results[hi]["median_docs_per_sec"] / results[lo]["median_docs_per_sec"]
    ) / ratio
    eff_best = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / ratio
    summary = {
        "spec": spec,
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        "scaling_efficiency_median": round(eff_med, 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "target": 0.8,
        "pass": eff_med >= 0.8,
    }
    print(json.dumps(summary))
    with open(out_md, "w") as f:
        f.write(
            "# BENCH_SCALING — two-parallelism throughput evidence\n\n"
            "Sandbox protocol for the north rule's two-cluster-size criterion\n"
            "(no real cluster available): the identical linkage job runs at\n"
            f"local[{lo}] and local[{hi}] on the same deterministic corpus.\n"
            "The sandbox host carries an external background load, so each\n"
            "leg runs multiple times interleaved; the 0.8 efficiency gate\n"
            "uses the MEDIAN docs/s per leg (best-of is also shown, and all\n"
            "raw runs are listed).\n\n"
            f"- local[{lo}] runs (docs/s):  {results[lo]['all_runs_docs_per_sec']}\n"
            f"- local[{hi}] runs (docs/s): {results[hi]['all_runs_docs_per_sec']}\n"
            f"- corpus spec: `{spec}` ({results[lo]['docs']} docs)\n"
            f"- local[{lo}]:  median {results[lo]['median_docs_per_sec']} docs/s "
            f"(best {results[lo]['docs_per_sec']})\n"
            f"- local[{hi}]: median {results[hi]['median_docs_per_sec']} docs/s "
            f"(best {results[hi]['docs_per_sec']})\n"
            f"- scaling efficiency (median) = "
            f"({results[hi]['median_docs_per_sec']} / "
            f"{results[lo]['median_docs_per_sec']}) / {ratio:.0f} = "
            f"**{eff_med:.3f}** (target >= 0.8: "
            f"{'PASS' if eff_med >= 0.8 else 'FAIL'}; best-of {eff_best:.3f})\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
