"""Bucketed TableStore snapshots: the one-time shuffle at write must buy
exchange-free joins and aggregations on the bucket key ever after — the
co-location contract that makes repeated 100-TB joins affordable.

Pins (vs an unbucketed control on the SAME files):
  - co-bucketed equi-join: SortMergeJoin with ZERO Exchange
  - groupBy on the bucket key: ZERO Exchange
  - a raw parquet read of the same files (bucket info dropped) DOES exchange
  - re-registration path: a manifest round-trip restores bucket metadata
"""

import pytest
from pyspark.sql import functions as F

from prclz_spark.sources.tablestore import TableStore


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def store(spark, tmp_path):
    st = TableStore(str(tmp_path / "wh"))
    facts = spark.range(0, 20_000, numPartitions=8).select(
        F.col("id").alias("image_id"),
        (F.col("id") % 97).alias("score"),
    )
    dims = spark.range(0, 20_000, numPartitions=8).select(
        F.col("id").alias("image_id"),
        (F.col("id") % 7).alias("region"),
    )
    st.commit_bucketed(facts, "facts", ["image_id"], 8, sort_cols=["image_id"])
    st.commit_bucketed(dims, "dims", ["image_id"], 8, sort_cols=["image_id"])
    return st


def test_cobucketed_join_no_exchange(spark, store, no_broadcast):
    fa = store.read_bucketed(spark, "facts")
    di = store.read_bucketed(spark, "dims")
    j = fa.join(di, "image_id")
    p = _plan(j)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p
    assert j.count() == 20_000

    # control: raw path reads of the same files lose the bucket spec and
    # must shuffle both sides
    m = store.manifest("facts")["bucket"]
    md = store.manifest("dims")["bucket"]
    raw = spark.read.parquet(m["path"]).join(
        spark.read.parquet(md["path"]), "image_id"
    )
    assert "Exchange" in _plan(raw)


def test_bucketed_groupby_no_exchange(spark, store):
    fa = store.read_bucketed(spark, "facts")
    g = fa.groupBy("image_id").agg(F.sum("score").alias("s"))
    assert "Exchange" not in _plan(g)
    assert g.count() == 20_000


def _mk_events(spark, n):
    return spark.range(0, n, numPartitions=8).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 701).alias("ts"),
        (F.col("id") % 101).cast("double").alias("value"),
    )


def _mk_assigned(spark, n):
    return spark.range(0, n, numPartitions=8).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("b"), (F.col("id") % 37).cast("string")).alias("block_id"),
    )


def test_evt_block_hourly_bucketed_single_exchange(spark, tmp_path, no_broadcast):
    """The production evt_block_hourly plan (pipeline.run_events_rollup):
    events fact + block assignment co-bucketed on event_id => the
    fact-sized join is a zero-Exchange SortMergeJoin, and the ONLY
    Exchange in the whole job is the final (block_id, hour) aggregation
    shuffle — whose key count is blocks x hours, not fact rows."""
    from prclz_spark import pipeline

    n = 20_000
    events, assigned = _mk_events(spark, n), _mk_assigned(spark, n)
    root = str(tmp_path / "wh")
    out = pipeline.run_events_rollup(spark, root, events, assigned, n_buckets=8)
    p = _plan(out)
    assert "SortMergeJoin" in p
    assert p.count("Exchange") == 1, p
    assert "hashpartitioning(block_id" in p, p

    # query hash unchanged: row-identical to the unbucketed join+agg
    base = pipeline.block_hourly_rollup(events, assigned)
    assert sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, base.collect()), key=lambda t: (t[0], t[1]))

    # resume: both snapshots already committed — the stage reuses them
    # without the input frames and keeps the single-Exchange plan
    again = pipeline.run_events_rollup(spark, root)
    assert _plan(again).count("Exchange") == 1
    assert again.count() == out.count()

    # missing snapshot + missing frame is a hard error, not a recompute
    with pytest.raises(ValueError):
        pipeline.run_events_rollup(spark, str(tmp_path / "empty_wh"))


def test_bucketed_reregistration_roundtrip(spark, store):
    # simulate a fresh session by dropping the catalog entry; read_bucketed
    # must restore it from the manifest DDL and keep the no-exchange property
    b = store.manifest("facts")["bucket"]
    spark.sql(f"DROP TABLE {b['catalog_name']}")
    fa = store.read_bucketed(spark, "facts")
    assert fa.count() == 20_000
    g = fa.groupBy("image_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(g)
    # lineage carries the bucketed commit
    stages = [r["partition_id"] for r in store.read_lineage("facts")]
    assert stages == ["bucketed_1"]
