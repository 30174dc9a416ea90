"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ETL pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2), each
``(spark, sf_dir) -> DataFrame``, built from the engine's own operators
(``orion_etl_oracle_to_postgres_spark.queries``).
``oracle_sql()`` — matching DuckDB SQL per query (omitted for the few
ops whose hash choices are engine-specific → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orion_etl_oracle_to_postgres_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.etl_customer_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE)
