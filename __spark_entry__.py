"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`prclz_spark.contract` — the engine's query
registry. Each ``queries()`` entry is a DataFrame program built from the
engine's operators (two-stage spatial join, kNN kRing join, tiling,
dedup/similarity, relational surface); each ``oracle_sql()`` entry is an
independent ANSI-SQL restatement DuckDB runs on the same parquet.
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prclz_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
