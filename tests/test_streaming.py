"""Structured Streaming incremental-assign tests: availableNow triggers,
exactly-once across invocations, correct assignment counts."""

import os

import numpy as np
import pytest

from prclz_spark.operators import assign
from prclz_spark.sources import synth
from prclz_spark.streaming.incremental import incremental_assign


@pytest.mark.slow
def test_incremental_assign_exactly_once(spark, tmp_path):
    input_dir = str(tmp_path / "landing")
    output_dir = str(tmp_path / "assigned")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)
    cover = assign.block_cover_pdf(synth.grid_blocks(4), 15)

    # batch 1 lands
    synth.write_images_parquet(os.path.join(input_dir, "b1.parquet"), 300)
    n1 = incremental_assign(spark, input_dir, output_dir, ckpt, cover, 15)
    assert n1 == 300
    assert spark.read.parquet(output_dir).count() == 300

    # nothing new → zero processed, output unchanged
    n2 = incremental_assign(spark, input_dir, output_dir, ckpt, cover, 15)
    assert n2 == 0
    assert spark.read.parquet(output_dir).count() == 300

    # batch 2 lands (ids disjoint — write a shifted range)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = synth.images_batch_pdf(np.arange(300, 500))
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(input_dir, "b2.parquet"),
    )
    n3 = incremental_assign(spark, input_dir, output_dir, ckpt, cover, 15)
    assert n3 == 200
    out = spark.read.parquet(output_dir)
    assert out.count() == 500
    # exactly one block per image, partition column present
    assert out.select("image_id").distinct().count() == 500
    assert "cell_prefix" in out.columns


def test_stateful_sessionize_matches_batch(spark):
    """applyInPandasWithState sessionizer: one availableNow drain over the
    static events fixture (emit_open drain mode) must reproduce the batch
    lag+cumsum sessionization exactly."""
    import os
    import uuid

    import pandas as pd

    from prclz_spark import contract
    from prclz_spark.streaming.stateful import sessionize_stream

    sf_dir = "/root/testdata/sf0.001"
    stream_dir = os.path.join(contract._DATA_DIR, "stream_events_sf0.001")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "part-0.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    schema = spark.read.parquet(stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    out = sessionize_stream(stream, gap_min=contract.SESSION_GAP_MIN, emit_open=True)
    name = f"sess_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(name).toPandas()
    want = contract._q_evt_sessionize(spark, sf_dir).toPandas()
    key = ["user_id", "sess_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got.n_events.to_numpy() == want.n_events.to_numpy()).all()
    assert (pd.to_datetime(got.session_start).to_numpy()
            == pd.to_datetime(want.session_start).to_numpy()).all()
    assert (pd.to_datetime(got.session_end).to_numpy()
            == pd.to_datetime(want.session_end).to_numpy()).all()
