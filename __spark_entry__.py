"""Driver contract for the spark-graft builder (PySpark target).

Backed by the sfdc_cdc_aws_spark engine: every implemented operator
from SURVEY.md §2 registers a (Spark builder, DuckDB oracle) pair in
``sfdc_cdc_aws_spark.registry``; this module just exposes the
registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sfdc_cdc_aws_spark.registry import load_all

FLAGSHIP = "cdc_latest_snapshot"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is SURVEY.md §2.7's ``cdc_latest_snapshot`` — the
    latest non-deleted record per Id over the CDC change feed, i.e.
    the lake-side table the whole reference pipeline exists to
    produce (README.md:3-5; UIND stamping app.py:102).
    """
    specs = load_all()
    return specs[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
