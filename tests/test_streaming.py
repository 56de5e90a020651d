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
