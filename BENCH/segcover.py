#!/usr/bin/env python
"""Fact-sized roads bench (VERDICT r4 #1 "done" line).

Synthesizes a 10^6-segment roads table ENTIRELY JVM-side (same AOI +
30%-hotspot skew as the images table, so road density mirrors point
density — the adversarial co-located case), then measures the two
distributed primitives that replaced the driver-side pandas loops:

  1. ``segment_cover_df`` — the 1/4-cell supercover + 3x3 dilation as
     Column arithmetic (one Generate chain + one Exchange for the
     distinct); reported as segments/s and emitted (cell, segment) rows.
  2. ``nearest_segment_join_distributed`` — exact NN for every point
     against the full segment table with NO broadcast of the cover and
     NO cartesian anywhere (exhaustive coarse cascade, hot-cell chunk
     guard); reported as points/s, with the executed-plan join
     signature asserted CartesianProduct-free.

The working resolution scales with density (res 19 ≈ 1.15 segments per
cell uniform, ~23/cell in the hotspot — a planetary 10^8-segment table
at its own working res sees the same per-cell loads, so per-task memory
and join fan-out here are representative even though the AOI is small).

Usage:  python BENCH/segcover.py [n_segs] [n_pts]
        python BENCH/segcover.py --xcheck [n_segs] [n_pts]
Env:    SPARK_GRAFT_CPUS (default 32), SEGCOVER_RUNS (default 3)

``--xcheck`` (default 100k segs / 200k pts): random-jittered segments,
distributed path vs the legacy driver-built-cover path, asserted
row-identical on round(road_dist, 9) — the 250x-scale replication of
tests/test_rangejoin.py's 800-point equivalence fixture (run round 5:
row-identical, 57 s at local[16]).
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from prclz_spark.operators import rangejoin  # noqa: E402
from prclz_spark.session import get_spark  # noqa: E402
from prclz_spark.sources import synth  # noqa: E402

RES = 19  # cell_h ≈ 3.43e-4° — ~1.15 segs/cell uniform at 1M segments


def _segments(spark, n: int, partitions: int):
    """1M-road synth: anchor from the shared LCG position stream (keeps
    the hotspot), heading/length from two fresh LCG draws, 0.5–1.5 cells
    long at the working res — pure Column arithmetic, no driver data."""
    cell_h = 180.0 / (1 << RES)
    base = spark.range(0, n, numPartitions=partitions)
    lon, lat = synth.lonlat_cols(F.col("id"))
    u2 = ((F.col("id") * synth.A_U + F.lit(101)) % synth.M1) / F.lit(float(synth.M1))
    u3 = ((F.col("id") * synth.A_V + F.lit(907)) % synth.M1) / F.lit(float(synth.M1))
    ang = u2 * F.lit(2.0 * math.pi)
    ln = (F.lit(0.5) + u3) * F.lit(cell_h)
    return base.select(
        F.concat(F.lit("s"), F.col("id")).alias("seg_id"),
        lon.alias("ax"),
        lat.alias("ay"),
        (lon + ln * F.cos(ang)).alias("bx"),
        (lat + ln * F.sin(ang)).alias("by"),
    )


def _points(spark, n: int, partitions: int):
    base = spark.range(0, n, numPartitions=partitions)
    lon, lat = synth.lonlat_cols(F.col("id") + F.lit(17))  # decorrelate from segs
    return base.select(
        F.col("id").alias("pid"), lon.alias("lon"), lat.alias("lat")
    )


def _signature(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    joins = sorted(set(re.findall(r"(\w*Join\w*)", p)))
    return {"joins": joins, "exchanges": p.count("Exchange")}


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def xcheck(n_segs: int = 100_000, n_pts: int = 200_000) -> None:
    """Distributed vs legacy row-identity at random-jittered scale (the
    scale the pytest fixture can't afford): seeded numpy segments, both
    plans, exact compare on round(road_dist, 9)."""
    import numpy as np
    import pandas as pd

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        "prclz_segcover_x", master=f"local[{cpus}]", shuffle_partitions=str(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = 16
    cell_h = 180.0 / (1 << res)
    rng = np.random.default_rng(11)
    ax = synth.AOI_LON0 + rng.uniform(0, synth.AOI_SPAN, n_segs)
    ay = synth.AOI_LAT0 + rng.uniform(0, synth.AOI_SPAN, n_segs)
    ang = rng.uniform(0, 2 * math.pi, n_segs)
    ln = rng.uniform(0.3, 2.0, n_segs) * cell_h
    segs_pdf = pd.DataFrame({
        "seg_id": [f"s{i}" for i in range(n_segs)],
        "ax": ax, "ay": ay,
        "bx": ax + ln * np.cos(ang), "by": ay + ln * np.sin(ang),
    })
    pts = _points(spark, n_pts, cpus)
    legacy = rangejoin.nearest_segment_join(
        pts, rangejoin.segment_cover_pdf(segs_pdf, res), res, point_id="pid"
    )
    dist = rangejoin.nearest_segment_join_distributed(
        pts, spark.createDataFrame(segs_pdf), res, point_id="pid"
    )
    a = (legacy.select("pid", F.round("road_dist", 9).alias("d"))
         .toPandas().sort_values("pid").reset_index(drop=True))
    b = (dist.select("pid", F.round("road_dist", 9).alias("d"))
         .toPandas().sort_values("pid").reset_index(drop=True))
    identical = bool(a.equals(b))
    print(json.dumps({
        "metric": "segcover_xcheck", "n_segs": n_segs, "n_pts": n_pts,
        "res": res, "rows": len(b), "row_identical": identical,
    }))
    spark.stop()
    assert identical


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--xcheck":
        xcheck(*(int(x) for x in sys.argv[2:4]))
        return
    n_segs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SEGCOVER_RUNS", "3"))
    spark = get_spark(
        "prclz_segcover", master=f"local[{cpus}]", shuffle_partitions=str(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    parts = cpus * 2

    # warm JVM once, unmeasured
    rangejoin.nearest_segment_join_distributed(
        _points(spark, 5_000, 4), _segments(spark, 5_000, 4), RES, point_id="pid"
    ).count()

    segs = _segments(spark, n_segs, parts)
    cov = rangejoin.segment_cover_df(segs, RES)
    c_walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        cover_rows = cov.count()
        c_walls.append(time.perf_counter() - t0)

    j_walls = []
    for _ in range(runs):
        # rebuild per run AND time construction + count together: the
        # cascade localCheckpoints its levels and its empty-residue
        # early-exit counts run at construction time, so a reused frame
        # (or a count-only timer) would measure cached reads, not the join
        t0 = time.perf_counter()
        nn = rangejoin.nearest_segment_join_distributed(
            _points(spark, n_pts, parts), segs, RES, point_id="pid"
        )
        nn_rows = nn.count()
        j_walls.append(time.perf_counter() - t0)
    sig = _signature(nn)
    assert "CartesianProduct" not in "".join(sig["joins"]), sig
    assert not any("BroadcastNestedLoop" in j for j in sig["joins"]), sig

    print(json.dumps({
        "metric": "segcover_1m",
        "n_segs": n_segs,
        "n_pts": n_pts,
        "res": RES,
        "cpus": cpus,
        "cover_rows": cover_rows,
        "cover_segs_per_sec": round(n_segs / _median(c_walls), 1),
        "cover_walls": [round(x, 3) for x in c_walls],
        "nn_rows": nn_rows,
        "nn_pts_per_sec": round(n_pts / _median(j_walls), 1),
        "nn_walls": [round(x, 3) for x in j_walls],
        "nn_plan": sig,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
