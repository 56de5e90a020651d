#!/usr/bin/env python
"""Benchmark harness: headline spatial-join/tiling throughput + per-query
wall time for every contract query.

Prints ONE JSON line:
    {"metric": "images_assigned_per_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., ...}

Env knobs:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[N] cores (default 32)
    SPARK_GRAFT_BENCH_N  synthetic points for the headline assign
                         throughput run (default 2_000_000)

The headline metric matches BASELINE.json: images assigned/sec through the
two-stage (cell equi-join -> Arrow PIP refine) spatial join, measured on a
JVM-side synthesized point table (no Python in the point-generation path),
plus the raster<->vector tile-membership operator on the same points.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from prclz_spark import contract  # noqa: E402
from prclz_spark.operators import assign, tiles  # noqa: E402
from prclz_spark.session import get_spark  # noqa: E402
from prclz_spark.sources import synth  # noqa: E402


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def machine_ceiling_4to16() -> float:
    """Pure-Python multiprocessing strong-scaling control (fixed task bag,
    zero shared state), 4 -> 16 procs: the best efficiency ANY
    embarrassingly-parallel Python workload can demonstrate on this host
    right now (shared memory subsystem + hypervisor steal). Recorded in
    the bench JSON so scaling-efficiency numbers can be read against the
    box's own ceiling, not an idealized 1.0."""
    import multiprocessing as mp

    walls = {}
    for procs in (4, 16):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            with mp.Pool(procs) as p:
                p.map(_burn, [2_000_000] * 64)
            best = min(best, time.perf_counter() - t0)
        walls[procs] = best
    return round((walls[4] / walls[16]) / 4.0, 3)


def synth_points(spark, n: int, partitions: int):
    """n deterministic points, pure Column arithmetic (codegen, no UDF)."""
    base = spark.range(0, n, numPartitions=partitions)
    lon, lat = synth.lonlat_cols(F.col("id"))
    return base.select(
        F.col("id").alias("image_id"), lon.alias("lon"), lat.alias("lat")
    )


def bench_assign(spark, n: int, partitions: int) -> tuple[float, int]:
    pts = synth_points(spark, n, partitions)
    cover = contract._grid_cover(spark)
    t0 = time.perf_counter()
    out = assign.assign_points_to_blocks(pts, cover, contract.PIP_RES)
    n_assigned = out.count()
    return time.perf_counter() - t0, n_assigned


def bench_tiles(spark, n: int, partitions: int) -> tuple[float, int]:
    pts = synth_points(spark, n, partitions)
    bounds = contract._grid_bounds(spark)
    t0 = time.perf_counter()
    out = tiles.tile_membership_rect(
        pts, bounds, t=contract.TILE_T, footprint=contract.TILE_FOOT
    )
    n_tiles = out.count()
    return time.perf_counter() - t0, n_tiles


def _median3(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_n = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2000000"))
    # 5 warm runs: interpreted-HOF-heavy queries ramp over the first 2-3
    # invocations (C2 JIT of the expression-interpreter paths), so a
    # median-of-3 can straddle the ramp; median-of-5 lands steady-state
    warm_runs = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "5"))

    spark = get_spark(
        app_name="prclz_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=str(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + Arrow path once (tiny run, not measured)
    bench_assign(spark, 10_000, 4)

    # headline: median-of-3 (host-noise variance is ~±40% on single runs)
    assign_runs, tile_runs = [], []
    for _ in range(3):
        s, n_assigned = bench_assign(spark, bench_n, cpus * 2)
        assign_runs.append(s)
        s, n_tiles = bench_tiles(spark, bench_n, cpus * 2)
        tile_runs.append(s)
    assign_s, tiles_s = _median3(assign_runs), _median3(tile_runs)

    # per query: one cold run (codegen/broadcast/fixture first-touch), then
    # median of `warm_runs` warm runs — the steady-state number the driver
    # records. Cold times + individual warm samples go to the detail file;
    # the printed line carries ONLY the warm medians so it stays compact
    # enough to survive the driver's bounded tail capture (r2's two-dict
    # line was truncated mid-JSON and failed to parse).
    qcold: dict[str, float] = {}
    qmed: dict[str, float] = {}
    qsamples: dict[str, list[float]] = {}
    for name, fn in contract.queries().items():
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            qcold[name] = round(time.perf_counter() - t0, 3)
            samples = []
            for _ in range(warm_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(round(time.perf_counter() - t0, 3))
            qsamples[name] = samples
            qmed[name] = round(_median3(samples), 2)
        except Exception as exc:  # never fail the whole bench on one query
            qmed[name] = -1.0
            print(f"# bench query {name} failed: {exc}", file=sys.stderr)
        # drop py-side refs so ContextCleaner can free broadcasts and
        # localCheckpoint blocks — 49 queries x 6 runs otherwise build up
        # heap pressure that GC-stalls the late CPU-heavy queries
        gc.collect()

    images_per_sec = n_assigned / assign_s if assign_s > 0 else 0.0
    # the printed line must fit the driver's 2000-char tail capture
    # (measured from BENCH_r02.json); row counts / cold times / individual
    # warm samples live in BENCH/bench_detail.json instead
    result = {
        "metric": "images_assigned_per_sec",
        "value": round(images_per_sec, 1),
        "unit": "sec",
        "queries": qmed,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "assign_sec": round(assign_s, 3),
        "tiles_per_sec": round(n_tiles / tiles_s, 1) if tiles_s > 0 else 0.0,
        "cpus": cpus,
        "warm_runs": warm_runs,
        "mp_pool_ceiling_4to16": machine_ceiling_4to16(),
    }
    # self-describing noise guard: when the box's own mp.Pool 4->16 strong
    # scaling is < 0.75, background load is stealing cores and per-query
    # times inflate ~2-3x (the r3 driver run recorded ceiling 0.712 and ran
    # ~2.5x over quiet-box re-measures) — cross-round comparisons should
    # weight such runs accordingly
    result["noisy"] = result["mp_pool_ceiling_4to16"] < 0.75
    if result["noisy"]:
        print(
            "# WARNING: machine ceiling {:.3f} < 0.75 — box is loaded; "
            "re-run on an otherwise idle machine before comparing "
            "per-query times across rounds".format(
                result["mp_pool_ceiling_4to16"]
            ),
            file=sys.stderr,
        )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "bench_detail.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump({**result, "queries_cold": qcold,
                       "queries_warm_samples": qsamples,
                       "bench_points": bench_n,
                       "assigned_rows": n_assigned,
                       "tile_sec": round(tiles_s, 3),
                       "tile_rows": n_tiles,
                       "assign_runs": [round(x, 3) for x in assign_runs],
                       "tile_runs": [round(x, 3) for x in tile_runs]}, fh, indent=1)
    except OSError as exc:
        print(f"# bench detail write failed: {exc}", file=sys.stderr)
    line = json.dumps(result)
    if len(line) > 1900:
        # the driver's tail capture is ~2000 chars: an oversized line gets
        # truncated mid-JSON and the whole round's numbers fail to parse
        # (the r2 failure). Degrade by trimming the per-query dict to the
        # slowest entries — the full dict is in BENCH/bench_detail.json.
        ranked = sorted(qmed.items(), key=lambda kv: -kv[1])
        while len(line) > 1900 and ranked:
            ranked = ranked[:-5]
            result["queries"] = dict(sorted(ranked))
            result["queries_trimmed_to"] = len(ranked)
            line = json.dumps(result)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
