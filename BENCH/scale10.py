#!/usr/bin/env python
"""10x scale-up check (secondary bench line, VERDICT r4 #6).

Runs the pinned headline protocol (2,000,000 JVM-synthesized points through
the two-stage assign + the rect tile-membership operator at local[32]) next
to a 10x run (20,000,000 points) in the SAME session/config, and compares:

  - per-point throughput at both scales (a superlinear fall-off flags
    hash-agg spill, broadcast-threshold flips, or AQE re-plans that the
    pinned sf0.1-scale protocol cannot see);
  - a plan signature at each scale (join strategy + Exchange count) so any
    flip is named, not guessed.

The pinned 2M protocol in bench.py stays the cross-round headline; this is
the scale-sanity line recorded in BENCH/BASELINE.md.

Usage:  python BENCH/scale10.py [--update-md]
Env:    SPARK_GRAFT_CPUS (default 32), SCALE10_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from prclz_spark import contract  # noqa: E402
from prclz_spark.operators import assign, tiles  # noqa: E402
from prclz_spark.session import get_spark  # noqa: E402
from prclz_spark.sources import synth  # noqa: E402

SCALES = (2_000_000, 20_000_000)


def _points(spark, n: int, partitions: int):
    base = spark.range(0, n, numPartitions=partitions)
    lon, lat = synth.lonlat_cols(F.col("id"))
    return base.select(
        F.col("id").alias("image_id"), lon.alias("lon"), lat.alias("lat")
    )


def _signature(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    joins = sorted(set(re.findall(r"(\w*Join\w*)", p)))
    return {"joins": joins, "exchanges": p.count("Exchange")}


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SCALE10_RUNS", "3"))
    spark = get_spark(
        "prclz_scale10", master=f"local[{cpus}]", shuffle_partitions=str(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    cover = contract._grid_cover(spark)
    bounds = contract._grid_bounds(spark)

    # warm JVM + Arrow once, unmeasured
    assign.assign_points_to_blocks(
        _points(spark, 10_000, 4), cover, contract.PIP_RES
    ).count()

    out: dict = {"metric": "scale10_assign_tiles", "cpus": cpus, "runs": runs}
    for n in SCALES:
        parts = cpus * 2
        pts = _points(spark, n, parts)
        a_df = assign.assign_points_to_blocks(pts, cover, contract.PIP_RES)
        t_df = tiles.tile_membership_rect(
            pts, bounds, t=contract.TILE_T, footprint=contract.TILE_FOOT
        )
        a_walls, t_walls = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            n_assigned = a_df.count()
            a_walls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_tiles = t_df.count()
            t_walls.append(time.perf_counter() - t0)
        key = f"{n // 1_000_000}M"
        out[key] = {
            "assign_pts_per_sec": round(n_assigned / _median(a_walls), 1),
            "tiles_memb_per_sec": round(n_tiles / _median(t_walls), 1),
            "assign_walls": [round(x, 3) for x in a_walls],
            "tile_walls": [round(x, 3) for x in t_walls],
            "assign_plan": _signature(a_df),
            "tiles_plan": _signature(t_df),
        }

    k2, k20 = (f"{n // 1_000_000}M" for n in SCALES)
    out["assign_retention_10x"] = round(
        out[k20]["assign_pts_per_sec"] / out[k2]["assign_pts_per_sec"], 3
    )
    out["tiles_retention_10x"] = round(
        out[k20]["tiles_memb_per_sec"] / out[k2]["tiles_memb_per_sec"], 3
    )
    out["plan_flip"] = (
        out[k2]["assign_plan"] != out[k20]["assign_plan"]
        or out[k2]["tiles_plan"] != out[k20]["tiles_plan"]
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
