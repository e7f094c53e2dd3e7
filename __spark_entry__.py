"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship: CDC last-image compaction over events @ sf0.001.
queries()        — every implemented operator (SURVEY.md §2 + training-data
                   analytics) as (spark, sf_dir) -> DataFrame callables.
oracle_sql()     — DuckDB-equivalent SQL for each SQL-expressible query;
                   engine-internal stages (binary WAL decode, lake MERGE)
                   are rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_walstream_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["cdc_last_image"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
