"""Checkpoint/lineage/resume tests (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

Reference analog: CheckPointer.completed anti-join
(/root/reference/reblock/i_reblock.py:103-165, 254-255) and
skip-if-output-exists (midway/midway_blocks.py:31).
"""

import os

import pytest
from pyspark.sql import functions as F

from prclz_spark import pipeline
from prclz_spark.sources.tablestore import TableStore


def test_tablestore_commit_read_lineage(spark, tmp_path):
    store = TableStore(str(tmp_path))
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    sid = store.commit(df, "t", "bucket", stage="s1")
    assert sid == 1
    back = store.read(spark, "t")
    assert back.count() == 100
    # partition column is restored from the directory layout
    assert set(back.columns) == {"id", "bucket"}
    lin = store.read_lineage("t")
    assert len(lin) == 4
    assert {r["partition_id"] for r in lin} == {"0", "1", "2", "3"}
    assert all(r["rows_out"] == 25 for r in lin)
    assert all(r["wall_ms"] >= 0 for r in lin)


def test_tablestore_append_snapshot_and_time_travel(spark, tmp_path):
    store = TableStore(str(tmp_path))
    d1 = spark.range(0, 10).select(F.col("id"), F.lit("a").alias("p"))
    d2 = spark.range(10, 30).select(F.col("id"), F.lit("b").alias("p"))
    s1 = store.commit(d1, "t", "p")
    s2 = store.commit(d2, "t", "p")
    assert (s1, s2) == (1, 2)
    assert store.read(spark, "t", snapshot_id=1).count() == 10  # time travel
    assert store.read(spark, "t").count() == 30
    assert store.completed_partitions("t") == {"a", "b"}


def test_tablestore_uncommitted_invisible(spark, tmp_path):
    """A killed job's data files (no manifest) must stay invisible."""
    store = TableStore(str(tmp_path))
    d1 = spark.range(0, 10).select(F.col("id"), F.lit("a").alias("p"))
    store.commit(d1, "t", "p")
    # simulate a crash: orphan data file, no manifest update
    datadir = os.path.join(str(tmp_path), "t", "data")
    orphan = os.path.join(datadir, "orphan.parquet")
    d1.limit(5).write.mode("overwrite").parquet(orphan + ".dir")
    assert store.read(spark, "t").count() == 10


def test_resume_filter(spark, tmp_path):
    store = TableStore(str(tmp_path))
    df = spark.range(0, 40).select(F.col("id"), (F.col("id") % 4).alias("b"))
    store.commit(df.filter(F.col("b") < 2), "t", "b")
    rest = store.resume_filter(df, "t", "b")
    assert rest.count() == 20
    assert set(r["b"] for r in rest.select("b").distinct().collect()) == {2, 3}


@pytest.mark.slow
def test_pipeline_kill_and_resume(spark, tmp_path):
    """Full run commits both stages; a re-run computes nothing; a partial
    (simulated-kill) store recomputes exactly the missing partitions."""
    root = str(tmp_path / "wh")
    out1 = pipeline.run_pipeline(spark, root, n_images=5_000, grid_g=4)
    assert out1["assign"] == 5_000
    assert out1["complexity"] == 16
    assert out1["parcels"] == 16
    assert out1["reblock_all"] == 16
    assert out1["reblock_summary"] == 16  # summary rows derived, 1/block
    assert out1["manifest"] == 5_000

    # resume on a complete store: nothing recomputed in ANY stage
    out2 = pipeline.run_pipeline(spark, root, n_images=5_000, grid_g=4)
    assert out2 == {
        "assign": 0, "complexity": 0, "parcels": 0, "reblock_all": 0,
        "reblock_summary": 0, "reblock_edges": 0, "reblock_terminals": 0,
        "manifest": 0,
    }

    store = TableStore(root)
    total_assigned = store.read(spark, "assign").count()
    assert total_assigned == 5_000  # every point assigned exactly once

    # stage-1 plan metrics: the g=4/res=17 cover (28,677 rows) crosses the
    # compaction gate, so the broadcast side must be the compacted cover
    # and the lineage must record both sizes + the plan choice
    asg_lin = store.read_lineage("assign")
    assert asg_lin and all(r["cover_compacted"] for r in asg_lin)
    assert all(r["cover_broadcast_rows"] < r["cover_rows"] for r in asg_lin)
    assert all(r["cover_rows"] == 28_677 for r in asg_lin)
    k_pdf = store.read(spark, "complexity").toPandas()
    assert len(k_pdf) == 16

    # downstream tables materialized with sane shapes
    parcels_pdf = store.read(spark, "parcels").toPandas()
    assert parcels_pdf.block_id.nunique() == 16
    reblock_pdf = store.read(spark, "reblock_summary").toPandas()
    assert len(reblock_pdf) == 16
    assert set(reblock_pdf.status) <= {0, 1, 2, 3}
    # all three reference sinks exist (summary / steiner lines / terminal
    # points — i_reblock.py:159-165) and cohere with the summary counts
    edges_pdf = store.read(spark, "reblock_edges").toPandas()
    term_pdf = store.read(spark, "reblock_terminals").toPandas()
    ok_blocks = set(reblock_pdf[reblock_pdf.status == 0].block_id)
    assert set(edges_pdf.block_id) <= set(reblock_pdf.block_id)
    n_term_by_block = term_pdf.groupby("block_id").size()
    for bid in ok_blocks:
        want = int(reblock_pdf.set_index("block_id").loc[bid, "n_terminals"])
        assert n_term_by_block.get(bid, 0) == want

    # simulated kill: drop the complexity table's snapshots entirely and
    # re-run — assign resumes (0 recomputed), complexity re-runs all 16,
    # the untouched downstream tables resume from their own lineage
    import shutil

    shutil.rmtree(os.path.join(root, "complexity"))
    out3 = pipeline.run_pipeline(spark, root, n_images=5_000, grid_g=4)
    assert out3 == {
        "assign": 0, "complexity": 16, "parcels": 0, "reblock_all": 0,
        "reblock_summary": 0, "reblock_edges": 0, "reblock_terminals": 0,
        "manifest": 0,
    }

    # kill the TERMINALS sink only: it re-derives from the committed
    # reblock_all table — the Steiner kernel does NOT re-run
    n_terms = len(term_pdf)
    shutil.rmtree(os.path.join(root, "reblock_terminals"))
    out4 = pipeline.run_pipeline(spark, root, n_images=5_000, grid_g=4)
    assert out4["reblock_all"] == 0  # no kernel recompute
    assert out4["reblock_terminals"] == n_terms
    assert store.read(spark, "reblock_terminals").count() == n_terms
    # identical results after resume (determinism across re-runs)
    k2 = store.read(spark, "complexity").toPandas()
    m1 = k_pdf.sort_values("block_id")[["block_id", "complexity"]].reset_index(drop=True)
    m2 = k2.sort_values("block_id")[["block_id", "complexity"]].reset_index(drop=True)
    assert m1.equals(m2)

    # stage 5: curated manifest — one row per image, all-or-nothing
    mf = store.read(spark, "manifest").toPandas()
    assert len(mf) == 5_000
    assert mf.image_id.is_unique
    assert set(mf.split.unique()) <= {"train", "val", "test"}
    assert (mf.groupby("cluster_root")["is_keep"].sum() == 1).all()
    # kill the manifest table: exactly stage 5 re-runs, nothing upstream
    shutil.rmtree(os.path.join(root, "manifest"))
    out5 = pipeline.run_pipeline(spark, root, n_images=5_000, grid_g=4)
    assert out5["manifest"] == 5_000
    assert out5["assign"] == 0 and out5["reblock_all"] == 0
    mf2 = store.read(spark, "manifest").toPandas()
    a = mf.sort_values("image_id").reset_index(drop=True)
    b = mf2.sort_values("image_id").reset_index(drop=True)
    assert a[["image_id", "split", "is_keep"]].equals(b[["image_id", "split", "is_keep"]])


def test_tablestore_metrics_df(spark, tmp_path):
    """north_rule 'per-partition lineage and metrics tables': the lineage
    must be queryable as a real DataFrame, aggregating across stages."""
    store = TableStore(str(tmp_path))
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 4).alias("bucket"))
    store.commit(df, "t", "bucket", stage="s1")
    store.commit(
        df.filter("id < 50"), "t", "bucket", stage="s2",
        extra={"cover_rows": 123, "cover_compacted": True},
    )
    # stage-level extras ride every lineage row of their commit...
    s2 = [r for r in store.read_lineage("t") if r["stage"] == "s2"]
    assert all(r["cover_rows"] == 123 for r in s2)
    # ...and metrics_df keeps its fixed schema regardless
    m = store.metrics_df(spark, "t")
    assert m.count() == 8  # 4 partitions x 2 stages
    agg = {
        r["stage"]: r["rows"]
        for r in m.groupBy("stage").agg(F.sum("rows_out").alias("rows")).collect()
    }
    assert agg == {"s1": 100, "s2": 50}
    assert store.metrics_df(spark, "missing") is None
