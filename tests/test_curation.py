"""Curation operators: split determinism/stability and manifest
coherence (the contract harness separately proves the manifest against
the composed DuckDB oracle)."""

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prclz_spark.operators import curation  # noqa: E402


def _py_bucket(idnum: int, n_buckets: int = 10_000) -> int:
    h = ((idnum % curation.SPLIT_P) * curation.SPLIT_MULT
         + curation.SPLIT_OFF) % curation.SPLIT_P
    return h % n_buckets


def test_split_bucket_frozen_values(spark):
    """Pin the hash: if anyone changes the constants or formula, frozen
    assignments move and eval contamination follows — fail loudly."""
    ids = [0, 1, 2, 7, 123456789, 999999999]
    pdf = pd.DataFrame({"id": ids})
    out = (
        curation.split_assign(
            spark.createDataFrame(pdf), idnum=F.col("id"), id_col="id"
        )
        .toPandas()
        .set_index("id")
    )
    for i in ids:
        assert out.loc[i, "split_bucket"] == _py_bucket(i)
    # regression freeze (computed once from the formula, must never move)
    assert _py_bucket(0) == 40503 % 10_000
    assert out.loc[1, "split_bucket"] == (curation.SPLIT_MULT + 40503) % curation.SPLIT_P % 10_000


def test_split_stable_under_corpus_growth(spark):
    """An id's split must not depend on what else is in the corpus —
    the invariant that keeps eval sets frozen across daily ingests."""
    small = spark.createDataFrame(pd.DataFrame({"id": list(range(500))}))
    big = spark.createDataFrame(pd.DataFrame({"id": list(range(2000))}))
    s = (
        curation.split_assign(small, idnum=F.col("id"), id_col="id")
        .toPandas().set_index("id")["split"]
    )
    b = (
        curation.split_assign(big, idnum=F.col("id"), id_col="id")
        .toPandas().set_index("id")["split"]
    )
    assert (b.loc[s.index] == s).all()


def test_split_distribution(spark):
    """90/5/5 within sampling tolerance on 20k sequential ids."""
    df = spark.createDataFrame(pd.DataFrame({"id": list(range(20_000))}))
    out = (
        curation.split_assign(df, idnum=F.col("id"), id_col="id")
        .groupBy("split").count().toPandas().set_index("split")["count"]
    )
    n = out.sum()
    assert abs(out.get("train", 0) / n - 0.90) < 0.02
    assert abs(out.get("val", 0) / n - 0.05) < 0.01
    assert abs(out.get("test", 0) / n - 0.05) < 0.01


def test_manifest_selected_coherence(spark):
    """selected == is_keep AND quality >= threshold, and every image of
    the fixture appears exactly once."""
    from prclz_spark import contract as C

    m = C._q_img_training_manifest(spark, "/root/testdata/sf0.001").toPandas()
    assert m.image_id.is_unique
    want = ((m.is_keep == 1) & (m.quality_r6 >= 0.2)).astype(int)
    assert (m.selected == want).all()
    assert m.selected.sum() > 0  # the gate actually passes the keepers
    # every cluster keeps exactly one canonical copy
    keeps = m.groupby("cluster_root")["is_keep"].sum()
    assert (keeps == 1).all()
