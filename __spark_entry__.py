"""Driver contract for the spark-graft harness (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose the full registry from
``engagement_data_pipeline_spark.queries.registry`` so the driver can
hash-compare every query against its DuckDB oracle at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from engagement_data_pipeline_spark.queries import FLAGSHIP, QUERIES

    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from engagement_data_pipeline_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys get a rows-only check."""
    from engagement_data_pipeline_spark.queries import get_oracles

    return get_oracles()
