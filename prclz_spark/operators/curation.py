"""Training-data curation: deterministic corpus splits and the manifest
composition that turns the raw image+caption table into the curated
training set a 10^12-image pipeline feeds to a trainer.

This is the capstone of the graft's training-data extensions (SURVEY.md
§8 "Training-data extensions"): one call composes the spatial surface
(J1 broadcast PIP assign), the text surface (quality / lang-ID / BPE
piece counts), the dedup surface (F29 phash → banded Hamming pairs →
connected components keep-list) and a deterministic train/val/test
split into a single manifest row per image.

Scale design:
- Every per-row feature (quality, lang, token counts, split) is inlined
  as Column arithmetic into ONE wide projection over the assign output —
  features add ZERO shuffles and stay in whole-stage codegen. The only
  exchanges are the ones the semantics force: the phash pair join + CC
  for the keep-list, and one equi-join of that keep-list back onto the
  manifest rows.
- The split hash is pure bigint arithmetic — a Knuth multiplicative
  hash mod a prime — NOT xxhash64, so the DuckDB oracle replicates it
  bit-for-bit ((id % P) * M + O all stay < 2^63). Stable across Spark
  versions, parallelism, and row order by construction; re-running the
  split on a grown corpus never reassigns an existing id (the property
  that keeps eval sets frozen while the corpus ingests daily batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import assign, dedup, text

SPLIT_P = 1_000_000_007      # prime modulus
SPLIT_MULT = 2_654_435_761   # Knuth multiplicative constant (2^32 * phi)
SPLIT_OFF = 40_503


def split_bucket(idnum: Column, n_buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, n_buckets) from a nonnegative bigint
    id. ((id % P) * M + O) % P % B — every intermediate < 2^63, so the
    SQL mirror is exact (no float, no overflow, no engine hash)."""
    h = F.pmod(
        F.pmod(idnum.cast("long"), F.lit(SPLIT_P)) * F.lit(SPLIT_MULT)
        + F.lit(SPLIT_OFF),
        F.lit(SPLIT_P),
    )
    return F.pmod(h, F.lit(n_buckets))


def split_bucket_sql(idnum_expr: str, n_buckets: int = 10_000) -> str:
    return (
        f"((({idnum_expr}) % {SPLIT_P}) * {SPLIT_MULT} + {SPLIT_OFF})"
        f" % {SPLIT_P} % {n_buckets}"
    )


def _cuts(weights: tuple[float, float, float], n_buckets: int) -> tuple[int, int]:
    t_hi = int(round(weights[0] * n_buckets))
    v_hi = t_hi + int(round(weights[1] * n_buckets))
    return t_hi, v_hi


def split_label(bucket: Column,
                weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
                n_buckets: int = 10_000) -> Column:
    t_hi, v_hi = _cuts(weights, n_buckets)
    return (
        F.when(bucket < t_hi, F.lit("train"))
        .when(bucket < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_label_sql(bucket_expr: str,
                    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
                    n_buckets: int = 10_000) -> str:
    t_hi, v_hi = _cuts(weights, n_buckets)
    return (
        f"(case when ({bucket_expr}) < {t_hi} then 'train' "
        f"when ({bucket_expr}) < {v_hi} then 'val' else 'test' end)"
    )


def split_assign(df: DataFrame, idnum: Column | None = None,
                 id_col: str = "image_id",
                 weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
                 n_buckets: int = 10_000) -> DataFrame:
    """Add (split_bucket, split) columns. ``idnum``: a nonnegative bigint
    Column for the portable (oracle-checkable) hash; default derives one
    from ``id_col`` via xxhash64 — fine in production, not SQL-mirrored."""
    if idnum is None:
        idnum = F.pmod(F.xxhash64(F.col(id_col)), F.lit(SPLIT_P))
    b = split_bucket(idnum, n_buckets)
    return df.withColumn("split_bucket", b).withColumn(
        "split", split_label(F.col("split_bucket"), weights, n_buckets)
    )


def training_manifest(
    img: DataFrame,
    cover,
    res: int,
    *,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    lon_col: str = "lon",
    lat_col: str = "lat",
    idnum: Column | None = None,
    min_quality: float = 0.5,
    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    n_buckets: int = 10_000,
) -> DataFrame:
    """One manifest row per image: containing block, dedup cluster root +
    keep flag, caption quality / language / BPE piece count, split, and
    the final ``selected`` bit (keeper AND quality >= min_quality) — the
    row set a trainer's datamodule filters on.

    ``img`` needs (id, caption, phash, lon, lat); ``cover``/``res`` as in
    assign.assign_points_to_blocks (pandas cover → broadcast fast path).
    """
    assigned = assign.assign_points_to_blocks(img, cover, res, lon_col, lat_col)
    q = text.quality_cols(caption_col)
    lg = text.lang_cols(caption_col)
    bp = text.bpe_cols(caption_col)
    if idnum is None:
        idnum = F.pmod(F.xxhash64(F.col(id_col)), F.lit(SPLIT_P))
    bucket = split_bucket(idnum, n_buckets)
    wide = assigned.select(
        id_col,
        "block_id",
        q["quality_r6"].alias("quality_r6"),
        lg["pred_lang"].alias("pred_lang"),
        bp["n_pieces_bpe"].alias("n_pieces_bpe"),
        bucket.alias("split_bucket"),
        split_label(bucket, weights, n_buckets).alias("split"),
    )
    keep = dedup.phash_clusters(img, id_col, phash_col)
    return wide.join(keep, id_col).select(
        id_col,
        "block_id",
        "cluster_root",
        "is_keep",
        "quality_r6",
        "pred_lang",
        "n_pieces_bpe",
        "split_bucket",
        "split",
        (
            (F.col("is_keep") == 1) & (F.col("quality_r6") >= F.lit(min_quality))
        ).cast("int").alias("selected"),
    )
