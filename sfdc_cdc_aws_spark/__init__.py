"""sfdc_cdc_aws_spark — a PySpark-native CDC analytics engine.

A from-scratch re-expression of the capabilities of the reference
system nickksun/sfdc-cdc-aws (a Salesforce CDC → Kinesis → Lambda →
S3 replication pipeline) as an idiomatic Apache Spark engine:

* the CDC envelope is a typed ``StructType`` parsed with ``from_json``
  (reference: worker/lambda/app.py:48-62 does base64+json.loads row
  at a time);
* the worker's imperative loop (explode recordIds, dedup, branch on
  DELETE, SOQL enrichment join, UIND stamp, JSON sink —
  app.py:57-113) becomes a declarative DataFrame pipeline that
  Catalyst optimizes and Tungsten executes;
* streaming is the same pipeline under Structured Streaming with
  checkpoint-based replay (reference: ReplayExtension.java:39-82).

Everything here derives from public knowledge only: the Apache Spark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from sfdc_cdc_aws_spark.session import get_session  # noqa: F401
from sfdc_cdc_aws_spark.registry import QUERIES, query  # noqa: F401
