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


def _brute_cap(pdf, n):
    """pandas oracle: top-n per key by (portable_hash(id), id)."""
    h = ((pdf.id % curation.SPLIT_P) * curation.SPLIT_MULT
         + curation.SPLIT_OFF) % curation.SPLIT_P
    d = pdf.assign(h=h).sort_values(["key", "h", "id"])
    return d.groupby("key").head(n)[["id", "key"]].reset_index(drop=True)


@pytest.mark.parametrize("margin", [4.0, 0.2])
def test_cap_per_key_exact_with_skew(spark, margin):
    """Two-phase cap == plain-window semantics on a skewed corpus; at
    margin 0.2 the prefilter under-admits on most keys, forcing the
    fallback path — output must not change."""
    import numpy as np

    rng = np.random.default_rng(7)
    keys = np.concatenate([
        np.zeros(3000, dtype=int),          # hot key: 3000 rows
        rng.integers(1, 40, size=2000),     # long tail
    ])
    pdf = pd.DataFrame({"id": np.arange(len(keys)), "key": keys})
    got = (
        curation.cap_per_key(
            spark.createDataFrame(pdf), ["key"], 25,
            idnum=F.col("id"), id_col="id", margin=margin,
        )
        .select("id", "key").toPandas()
        .sort_values(["key", "id"]).reset_index(drop=True)
    )
    want = _brute_cap(pdf, 25).sort_values(["key", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got.groupby("key").size() <= 25).all()


def test_pack_shards_equals_naive_window(spark):
    """Two-level prefix sum == naive global cumsum, and every shard's
    token mass stays within budget + one straddling document."""
    import numpy as np

    rng = np.random.default_rng(11)
    toks = rng.integers(1, 900, size=4000)
    pdf = pd.DataFrame({"doc_id": np.arange(4000), "n_tok": toks})
    got = (
        curation.pack_shards(
            spark.createDataFrame(pdf), "n_tok", 2048,
            idnum=F.col("doc_id"), range_width=97, id_col="doc_id",
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    start = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert (got.token_start.to_numpy() == start).all()
    assert (got.shard_id.to_numpy() == start // 2048).all()
    per_shard = got.assign(n=toks).groupby("shard_id")["n"].sum()
    assert (per_shard.iloc[:-1] <= 2048 + toks.max()).all()
