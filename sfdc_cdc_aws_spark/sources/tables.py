"""Snapshot-table source: the engine's equivalent of the reference's
SOQL access to live entity tables (worker/lambda/app.py:97-101) is a
columnar parquet scan — Catalyst pushes filters and prunes columns
into the scan, which is what replaces ``SELECT <fields> WHERE Id IN``
at scale.

Schema introspection (reference ``getObjectFields``, app.py:115-118)
is ``spark.read.parquet(...).schema`` — resolved at plan time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Correctness-critical runtime confs, enforced on WHATEVER session
    the caller hands us (the driver harness builds its own): the
    nanos-as-long flag keeps the TIMESTAMP(NANOS) events table
    readable, and a UTC session timezone keeps every timestamp
    rendering oracle-comparable. Both are runtime-settable SQL confs;
    engine-owned sessions (session.py) already set them at build
    time, so this is a no-op there."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if spark.conf.get(key, None) != val:
            spark.conf.set(key, val)


# columns stored as TIMESTAMP(NANOS) in the driver's parquet; read as
# long (session config spark.sql.legacy.parquet.nanosAsLong) and
# converted to a microsecond timestamp here. Conversion cost: one div
# in codegen. Caveat: predicates on the converted column no longer
# reach parquet row-group stats — queries that need that pushdown at
# scale should filter on the raw long (see bench notes).
_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, widen: bool = False
) -> DataFrame:
    """Read a snapshot table.

    ``widen=True`` requests full-core parallelism for CPU-bound
    per-row compute (signature hashing, vector math): if the scan
    yields fewer partitions than the cluster's parallelism — the
    single-row-group small-file case — round-robin repartition it.
    On a production multi-file table the condition is false and no
    shuffle is added; compute-heavy callers opt in, scan-bound
    queries never pay for it.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in _NANOS_COLS.get(name, ()):
        # the driver writes events.ts as TIMESTAMP(NANOS), which the
        # nanosAsLong conf surfaces as a long → convert ns→µs; a
        # REGENERATED source may carry a plain µs timestamp instead,
        # in which case there is nothing to convert — branch on the
        # actual physical type rather than assuming the driver's
        if isinstance(df.schema[c].dataType, (T.LongType, T.IntegerType)):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            # session TZ is UTC, so NTZ → instant is identity
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if widen:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def object_fields(spark: SparkSession, sf_dir: str, name: str) -> list[str]:
    """Runtime schema discovery — the Spark analog of the reference's
    ``describe()`` call (app.py:115-118): field names come from the
    snapshot's parquet footer, not a compile-time schema.
    """
    return load_table(spark, sf_dir, name).schema.fieldNames()
