#!/usr/bin/env python
"""Scaling-efficiency evidence: the same jobs at two parallelism levels
(local[8] vs local[32]) on identical input — the sandbox realization of
the north_rule's "N and 4N executors" criterion (no real cluster here;
see SURVEY.md §7.1).

Two jobs, two regimes:

- ``k_complexity`` — the CPU-bound operator (per-block Voronoi + weak-dual
  kernels in applyInPandas). This is the scaling-efficiency headline: work
  scales with cores, so efficiency >= 0.8 is the meaningful target.
- ``spatial_assign`` — the broadcast cell-join + PIP refine. On one box
  this saturates memory bandwidth long before 8 cores are busy (~20M
  pts/s), so adding cores cannot help; its number is reported as absolute
  throughput context, not as a scaling datum. On a real cluster each
  executor brings its own memory channels, so the bandwidth ceiling
  scales with N — the efficiency argument transfers via the CPU-bound job.

Each level runs in its own subprocess (spark.master cannot change within
one JVM). Per level: one warm-up run, then 5 timed runs, median reported
(rides out sandbox noisy-neighbor spikes).

Usage:  python BENCH/scaling.py [--update-md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = """
import json, time, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from prclz_spark.session import get_spark
from prclz_spark import contract
from prclz_spark.operators import assign, complexity
from prclz_spark.sources import synth

cores = {cores}
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=str(cores))
spark.sparkContext.setLogLevel("ERROR")

def timed(out, unit_rows):
    out.count()  # warm: codegen, broadcast, python workers
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out.count()
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(json.dumps({{"cores": cores, "sec": dt, "all_sec": [round(t, 2) for t in times],
                       "throughput": unit_rows / dt}}))
"""

JOB_ASSIGN = COMMON + """
n = {n}
cover = contract._grid_cover(spark)
base = spark.range(0, n, numPartitions=cores * 2)
lon, lat = synth.lonlat_cols(F.col("id"))
pts = base.select(F.col("id").alias("image_id"), lon.alias("lon"), lat.alias("lat"))
timed(assign.assign_points_to_blocks(pts, cover, contract.PIP_RES), n)
spark.stop()
"""

JOB_KCOMPLEXITY = COMMON + """
n = {n}
G = 64
blocks_pdf = synth.grid_blocks(G)
cover = assign.block_cover_pdf(blocks_pdf, 17)
blocks_sdf = spark.createDataFrame(blocks_pdf)
base = spark.range(0, n, numPartitions=cores * 2)
lon, lat = synth.lonlat_cols(F.col("id"))
pts = base.select(F.col("id").alias("image_id"), lon.alias("lon"), lat.alias("lat"))
assigned = assign.assign_points_to_blocks(pts, cover, 17)
timed(complexity.k_complexity(assigned, blocks_sdf, num_partitions=cores * 16), G * G)
spark.stop()
"""

JOBS = {
    "k_complexity": (JOB_KCOMPLEXITY, 200_000, "blocks/s"),
    "spatial_assign": (JOB_ASSIGN, 100_000_000, "points/s"),
}


def run_level(template: str, cores: int, n: int) -> dict:
    code = template.format(repo=REPO, cores=cores, n=n)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in res.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"level {cores} failed:\n{res.stderr[-2000:]}")


def main() -> None:
    results = {}
    for job, (template, n, unit) in JOBS.items():
        lo = run_level(template, 8, n)
        hi = run_level(template, 32, n)
        eff = (hi["throughput"] / lo["throughput"]) / (32 / 8)
        results[job] = {
            "n": n, "unit": unit,
            "throughput_8": round(lo["throughput"], 1),
            "throughput_32": round(hi["throughput"], 1),
            "sec_8": round(lo["sec"], 3), "sec_32": round(hi["sec"], 3),
            "all_sec_8": lo["all_sec"], "all_sec_32": hi["all_sec"],
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps({job: results[job]}))

    k = results["k_complexity"]
    a = results["spatial_assign"]
    summary = {
        "headline_job": "k_complexity",
        "scaling_efficiency": k["scaling_efficiency"],
        "target": 0.8,
        "pass": k["scaling_efficiency"] >= 0.8,
        "assign_points_per_sec_32": a["throughput_32"],
    }
    print(json.dumps(summary))

    if "--update-md" in sys.argv:
        md = f"""# BENCH results — scaling efficiency (north_rule evidence)

Same job, same input, two parallelism levels (single-box stand-in for
N vs 4N executors; methodology + regime analysis in BENCH/scaling.py).

| job | input | local[8] | local[32] | efficiency (target ≥0.8) |
|---|---|---|---|---|
| k-complexity (CPU-bound: per-block Voronoi + weak-dual) | {k['n']:,} pts / 4096 blocks | {k['throughput_8']:,} {k['unit']} | {k['throughput_32']:,} {k['unit']} | **{k['scaling_efficiency']}** |
| spatial assign (memory-bandwidth-bound on one box) | {a['n']:,} pts | {a['throughput_8']:,} {a['unit']} | {a['throughput_32']:,} {a['unit']} | {a['scaling_efficiency']} (see note) |

Efficiency = (throughput₃₂ / throughput₈) / 4, median of 5 warm runs.

**Note on the assign row:** the two-stage spatial join streams ~20M pts/s
through one box and saturates memory bandwidth before 8 cores are busy —
extra local cores add nothing because they share the same memory channels.
On a real N→4N executor scale-out each executor brings its own memory
subsystem, so the relevant single-box evidence for the ≥0.8 criterion is
the CPU-bound job (k-complexity), where cores are the scarce resource.
Raw per-run times: k-complexity 8c {k['all_sec_8']} / 32c {k['all_sec_32']};
assign 8c {a['all_sec_8']} / 32c {a['all_sec_32']}.
"""
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(md)


if __name__ == "__main__":
    main()
