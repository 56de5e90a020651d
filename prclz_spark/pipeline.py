"""Stage orchestration with checkpoint/resume — the spark-submit entry.

The reference chains five CLI jobs through a shared directory tree and
resumes via output-file-exists checks and CheckPointer CSVs (SURVEY.md
§3, §2.1 S9). Here each stage is a DataFrame program whose output commits
atomically to the TableStore with per-partition lineage; re-running the
pipeline recomputes only partitions absent from lineage (kill-and-resume:
a killed commit leaves no manifest, so its partitions re-run).

Partitioning follows the north_rule: points carry a cell *prefix*
(coarse cell id) and every stage table is partitioned by it, so a
neighborhood's images, blocks and k-values co-locate and downstream
stages join without a shuffle.

Cluster deploy (north_rule 'ships as spark-submit --py-files modules'):

    python -m zipfile -c prclz_spark.zip prclz_spark
    spark-submit --master <cluster> --py-files prclz_spark.zip \\
        run_pipeline.py --store <warehouse-uri> --n <rows>

(local dev: ``python -m prclz_spark.pipeline``) — args in main(). The
package is pure Python + numpy/pandas/pyarrow (standard executor images),
so the zip plus the thin ``run_pipeline.py`` launcher is the entire
deployment artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import cells
from .operators import assign as assign_op
from .operators import complexity as complexity_op
from .operators import curation as curation_op
from .operators import parcel as parcel_op
from .operators import reblock as reblock_op
from .sources import synth
from .sources.tablestore import TableStore

ASSIGN_TABLE = "assign"
MANIFEST_TABLE = "manifest"
COMPLEXITY_TABLE = "complexity"
PARCELS_TABLE = "parcels"
REBLOCK_ALL_TABLE = "reblock_all"
REBLOCK_TABLE = "reblock_summary"
REBLOCK_EDGES_TABLE = "reblock_edges"
REBLOCK_TERMINALS_TABLE = "reblock_terminals"
EVENTS_FACT_TABLE = "events_fact"
EVENTS_ASSIGN_TABLE = "events_assign"
EVENTS_BUCKETS = 32


def image_points(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    base = spark.range(0, n, numPartitions=partitions or 32)
    lon, lat = synth.lonlat_cols(F.col("id"))
    return base.select(
        F.col("id").alias("image_id"), lon.alias("lon"), lat.alias("lat")
    )


def _caption_phash_cols(df: DataFrame) -> DataFrame:
    """JVM-synthesized caption and phash columns from image_id (the
    input_hint row shape, minus the binary payload): captions vary over
    two coprime cycles so text features are non-constant; every 8
    consecutive ids share a phash, giving the manifest's keep-list real
    exact-dup groups to collapse. Pure Column arithmetic, so it applies
    identically to fresh points and to the committed assign table."""
    return df.withColumn(
        "caption",
        F.format_string(
            "a photo of landmark %d near gate %d",
            F.col("image_id") % 997,
            F.col("image_id") % 53,
        ),
    ).withColumn(
        "phash", F.xxhash64(F.floor(F.col("image_id") / 8).cast("string"))
    )


def image_rows(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """image_points plus the synthesized caption/phash columns."""
    return _caption_phash_cols(image_points(spark, n, partitions))


def run_pipeline(
    spark: SparkSession,
    store_root: str,
    n_images: int = 100_000,
    grid_g: int = 8,
    res: int = 17,
    prefix_res: int = 6,
    lines_pdf=None,
    res_min: int | None = None,
    compact_cover_rows: int = 20_000,
) -> dict:
    """The reference's full stage chain — assign → k-complexity →
    parcelization → reblocking (SURVEY.md §3) — each stage committed
    atomically with per-partition lineage and resumable independently.

    Stage 1 is size-gated between the classic single-cell cover join and
    the compacted ancestor-array join (assign_points_to_blocks_compact):
    when the classified cover exceeds ``compact_cover_rows`` rows, the
    interior cells are compacted through the quadtree down to ``res_min``
    (default res-4, floored at prefix_res) before broadcasting — the
    production lever for continent-scale AOIs at fine res, where the flat
    cover would blow the broadcast budget. Row-identical to the classic
    join (pinned in tests/test_cells_compact.py); the chosen plan and both
    cover sizes land in the assign stage's lineage metrics.

    Returns per-stage counts actually computed this run (0 for a fully
    resumed stage)."""
    store = TableStore(store_root)
    blocks_pdf = synth.grid_blocks(grid_g)
    cover = assign_op.block_cover_pdf(blocks_pdf, res)
    computed = {}

    # -- stage 1: spatial assign, partitioned by cell prefix ---------------
    rmin = res_min if res_min is not None else max(prefix_res, res - 4)
    use_compact = len(cover) > compact_cover_rows and rmin < res
    pts = image_points(spark, n_images)
    pts = pts.withColumn(
        "cell_prefix",
        cells.cell_prefix(
            cells.cell_id(F.col("lon"), F.col("lat"), res), res, prefix_res
        ),
    )
    todo = store.resume_filter(pts, ASSIGN_TABLE, "cell_prefix")
    n_todo = todo.count()
    computed[ASSIGN_TABLE] = n_todo
    if n_todo > 0:
        if use_compact:
            comp = assign_op.compact_cover_pdf(cover, res, rmin)
            assigned_new = assign_op.assign_points_to_blocks_compact(
                todo, cover, res, rmin, compacted_pdf=comp
            )
            broadcast_rows = len(comp)
        else:
            assigned_new = assign_op.assign_points_to_blocks(todo, cover, res)
            broadcast_rows = len(cover)
        store.commit(
            assigned_new, ASSIGN_TABLE, "cell_prefix", stage=ASSIGN_TABLE,
            extra={
                "cover_rows": len(cover),
                "cover_broadcast_rows": broadcast_rows,
                "cover_compacted": use_compact,
            },
        )
    assigned = store.read(spark, ASSIGN_TABLE)
    if assigned is None:
        # no snapshot was ever committed (n_images == 0, or every point
        # fell outside all blocks) — short-circuit stage 2 cleanly instead
        # of crashing on a None frame
        computed[COMPLEXITY_TABLE] = 0
        return computed

    blocks_sdf = spark.createDataFrame(blocks_pdf)

    def per_block_stage(table: str, build) -> int:
        """Shared per-block resume pattern (CheckPointer anti-join analog,
        i_reblock.py:254-255): blocks already in the table's lineage are
        skipped; ``build(todo_blocks, todo_assigned)`` produces the new
        rows, committed partitioned by block_id."""
        done = store.completed_partitions(table)
        todo_blocks = blocks_sdf
        if done:
            todo_blocks = blocks_sdf.filter(
                ~F.col("block_id").isin(*sorted(done))
            )
        n_todo_blocks = todo_blocks.count()
        computed[table] = n_todo_blocks
        if n_todo_blocks > 0:
            todo_assigned = assigned.join(
                F.broadcast(todo_blocks.select("block_id")), "block_id", "left_semi"
            )
            out = build(todo_blocks, todo_assigned)
            store.commit(out, table, "block_id", stage=table)
        return n_todo_blocks

    # -- stage 2: k-complexity per block -----------------------------------
    per_block_stage(
        COMPLEXITY_TABLE,
        lambda blks, pts_: complexity_op.k_complexity(pts_, blks),
    )

    # -- stage 3: parcelization per block (reference stage 3) --------------
    per_block_stage(
        PARCELS_TABLE,
        lambda blks, pts_: parcel_op.parcelize(pts_, blks),
    )
    parcels = store.read(spark, PARCELS_TABLE)
    if parcels is None:
        computed[REBLOCK_TABLE] = 0
        return computed

    # -- stage 4: Steiner reblocking per block (reference stage 5) ---------
    # ONE kernel pass emits the long-format 'all' frame; the three
    # reference sinks — summary, steiner lines, terminal points
    # (i_reblock.py:159-165) — are cheap filters of the committed table,
    # each with its own lineage so resume covers all three. Typed
    # boundaries (lines_pdf) feed the reference's F25 edge weighting.
    if lines_pdf is not None:
        from .operators import rangejoin as rangejoin_op

        if "seg_id" not in lines_pdf.columns:
            # OSM-style polyline table (osm_id/highway/waterway/natural/
            # geometry) — flatten to the typed segment dimension
            lines_pdf = rangejoin_op.segments_from_lines(lines_pdf)
        blocks_sdf = rangejoin_op.boundary_types_for_blocks(
            blocks_sdf, lines_pdf, res=min(res, 12)
        )
    per_block_stage(
        REBLOCK_ALL_TABLE,
        lambda blks, pts_: reblock_op.reblock(
            parcels.join(
                F.broadcast(blks.select("block_id")), "block_id", "left_semi"
            ),
            pts_,
            blks,
            emit="all",
        ),
    )
    allf = store.read(spark, REBLOCK_ALL_TABLE)
    if allf is None:
        return computed
    # the three sink splits each count AND commit their slice — cache the
    # long frame once so that is 1 parquet scan, not 6
    allf = allf.cache()
    scols = [f.name for f in reblock_op.REBLOCK_SUMMARY_SCHEMA.fields]
    ecols = [f.name for f in reblock_op.REBLOCK_EDGES_SCHEMA.fields]
    tcols = [f.name for f in reblock_op.REBLOCK_TERMINALS_SCHEMA.fields]
    for tname, kind, cols in (
        (REBLOCK_TABLE, "summary", scols),
        (REBLOCK_EDGES_TABLE, "edge", ecols),
        (REBLOCK_TERMINALS_TABLE, "terminal", tcols),
    ):
        done = store.completed_partitions(tname)
        sub = allf.filter(F.col("kind") == kind).select(*cols)
        if done:
            sub = sub.filter(~F.col("block_id").isin(*sorted(done)))
        n_new = sub.count()
        computed[tname] = n_new
        if n_new > 0:
            store.commit(sub, tname, "block_id", stage=tname)
    allf.unpersist()

    # -- stage 5: curated training manifest ---------------------------------
    # The keep-list (phash connected components) is a GLOBAL property of
    # the corpus, so this stage commits atomically as one unit — a
    # per-block resume would cluster within subsets and change results.
    # The lineage stage marker makes the commit idempotent: a re-run
    # after a crash either sees no manifest (recompute) or the marker
    # (skip) — same guard as the streaming foreachBatch sink.
    man = store.manifest(MANIFEST_TABLE)
    if man and any(
        l.get("stage") == MANIFEST_TABLE for l in man.get("lineage", [])
    ):
        computed[MANIFEST_TABLE] = 0
    else:
        # reuse stage 1's committed assign output for the manifest ROWS —
        # caption and phash are pure Column arithmetic of image_id, so
        # the PIP join (the pipeline's most expensive stage) never runs
        # twice. The keep-list corpus, however, is the FULL image set
        # (image_rows), not the assigned subset: a cluster whose min-id
        # keeper fell outside every block must still elect that keeper,
        # or is_keep flips for its in-block members (the keep-list is a
        # global corpus property — same reason this stage is atomic).
        mf = curation_op.training_manifest(
            image_rows(spark, n_images),
            cover,
            res,
            idnum=F.col("image_id"),
            assigned=_caption_phash_cols(assigned),
        )
        # partition by block_id like every other stage: high-cardinality
        # parallel writes that co-locate with the spatial tables (a
        # 'split' partitioning would funnel the write through 3 tasks)
        store.commit(mf, MANIFEST_TABLE, "block_id", stage=MANIFEST_TABLE)
        computed[MANIFEST_TABLE] = store.read(spark, MANIFEST_TABLE).count()

    return computed


def block_hourly_rollup(events: DataFrame, assigned: DataFrame) -> DataFrame:
    """Spatio-temporal rollup: events x their PIP-assigned block_id,
    aggregated into (block_id, 1-hour event-time bucket) cells — the
    hotspot-monitoring composition of J1 with the hourly window agg
    (contract evt_block_hourly; reference analog: the per-block summary
    rollups of midway/single_file_complexity.py keyed on time instead).
    Same expression tree as contract._q_evt_block_hourly so the bucketed
    production path below is oracle-checked by proxy."""
    return (
        events.select("event_id", "ts", "value")
        .join(assigned.select("event_id", "block_id"), "event_id")
        .groupBy(
            "block_id",
            F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def run_events_rollup(
    spark: SparkSession,
    store_root: str,
    events: DataFrame | None = None,
    assigned: DataFrame | None = None,
    n_buckets: int = EVENTS_BUCKETS,
) -> DataFrame:
    """The rollup's PRODUCTION shape (the plan contract._q_evt_block_hourly's
    docstring promises): the events fact AND its block assignment live in
    the TableStore as CO-BUCKETED snapshots on event_id, so the fact-sized
    equi-join is EXCHANGE-FREE (zero-shuffle SortMergeJoin over co-located
    buckets) and the only shuffle in the whole job is the final
    (block_id, hour) aggregation — whose key count is bounded by
    blocks x hours, not by the fact row count. Pinned in
    tests/test_bucketed.py::test_evt_block_hourly_bucketed_single_exchange.

    Resume semantics: a bucketed snapshot is a full rewrite, so the stage
    is committed at most once — when a snapshot already exists it is
    REUSED and the ``events``/``assigned`` frames may be omitted (the
    kill-and-resume analog of the per-partition anti-join for stages whose
    layout is a whole-fileset property)."""
    store = TableStore(store_root)
    ev = store.read_bucketed(spark, EVENTS_FACT_TABLE)
    if ev is None:
        if events is None:
            raise ValueError(
                f"no committed '{EVENTS_FACT_TABLE}' snapshot and no events frame"
            )
        store.commit_bucketed(
            events, EVENTS_FACT_TABLE, ["event_id"], n_buckets,
            sort_cols=["event_id"], stage=EVENTS_FACT_TABLE,
        )
        ev = store.read_bucketed(spark, EVENTS_FACT_TABLE)
    asg = store.read_bucketed(spark, EVENTS_ASSIGN_TABLE)
    if asg is None:
        if assigned is None:
            raise ValueError(
                f"no committed '{EVENTS_ASSIGN_TABLE}' snapshot and no assign frame"
            )
        store.commit_bucketed(
            assigned, EVENTS_ASSIGN_TABLE, ["event_id"], n_buckets,
            sort_cols=["event_id"], stage=EVENTS_ASSIGN_TABLE,
        )
        asg = store.read_bucketed(spark, EVENTS_ASSIGN_TABLE)
    return block_hourly_rollup(ev, asg)


def main() -> None:
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/prclz_warehouse")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--grid", type=int, default=8)
    args = ap.parse_args()
    spark = get_spark("prclz_pipeline")
    out = run_pipeline(spark, args.store, n_images=args.n, grid_g=args.grid)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
