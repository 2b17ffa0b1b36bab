"""Streaming quality gate with OBSERVED drop metrics: arriving
documents flow through a stateless rule filter on their way into the
training lake, and the drop rate is an ``observe()`` metric on the
stream itself — Spark's native observability hook (one aggregate
evaluated inline per micro-batch, no second pass over the data) —
so a mis-tuned gate that silently eats the corpus is visible in the
query progress, not discovered at training time. Same
observed-not-silent discipline as the LSH bucket caps
(operators/dedup.py) and the Bayeux reader's dropped_no_replay
counter (sources/bayeux.py).

Reference parity: the reference forwards every event unfiltered
(worker/lambda/app.py:96-118); the gate is SURVEY.md §2.9 extension
surface on the streaming lane.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.text import _DUCK_TOKENS, tokens_col
from sfdc_cdc_aws_spark.registry import query

# Rules sized so the synthetic corpus splits both ways at every test
# SF (~48% pass): a gate everything passes (or fails) verifies
# nothing.
GATE_MIN_TOKENS = 40
GATE_MAX_CHARS = 450

#: totals of the last drain's observed metrics, summed across
#: micro-batches: {"n_in": int, "n_pass": int, "n_dropped": int,
#: "n_batches": int}. A test hook AND the artifact surface — the
#: number an operator dashboards.
LAST_GATE_METRICS: dict[str, int] = {}


def _gate_pass() -> F.Column:
    return (F.size(tokens_col()) >= GATE_MIN_TOKENS) & (
        F.col("n_chars") < GATE_MAX_CHARS
    )


_LANDING_REV = "g1"


def ensure_corpus_landing(
    spark: SparkSession, sf_dir: str, base: str = "/tmp/sfdc_gate_landing"
) -> str:
    """Materialize the FULL document corpus as a 4-file landing dir
    (idempotent per (revision, source content) — the cache-key
    discipline of streaming/job.py:58-78) so maxFilesPerTrigger chops
    the drain into multiple micro-batches; unlike ingest_dedup's
    arrival slice, the gate feeds on every document with its full
    metadata columns."""
    import os

    from sfdc_cdc_aws_spark.sources import load_table
    from sfdc_cdc_aws_spark.sources.tables import table_path

    st = os.stat(table_path(sf_dir, "documents"))
    name = (
        f"{os.path.basename(sf_dir.rstrip('/'))}_{_LANDING_REV}"
        f"_{st.st_mtime_ns}_{st.st_size}"
    )
    out = os.path.join(base, name)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "documents")
            .repartitionByRange(4, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


@query(
    "stream_quality_gate",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len({_DUCK_TOKENS})) AS BIGINT) AS n_tokens
FROM documents
WHERE len({_DUCK_TOKENS}) >= {GATE_MIN_TOKENS}
  AND n_chars < {GATE_MAX_CHARS}
GROUP BY lang
""",
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the document landing through the quality gate
    (≥{GATE_MIN_TOKENS} tokens, <{GATE_MAX_CHARS} chars) and
    aggregate the admitted slice per language. The gate's in/pass
    counts ride as ``observe()`` metrics evaluated inside each
    micro-batch; after the drain they are summed across batch
    progresses into :data:`LAST_GATE_METRICS` — in production a
    StreamingQueryListener ships the same numbers to the metrics
    bus per batch.

    Plan: the filter and the observation are stateless column
    expressions (whole-stage-codegen'd, evaluated once per row in
    the same pass); the per-lang aggregate is the only stateful
    operator (|langs| state keys). At 100 TB the gate itself adds no
    shuffle and no state — the observe aggregate is map-side only."""
    landing = ensure_corpus_landing(spark, sf_dir)
    arrivals = (
        spark.readStream.schema("doc_id long, text string, lang string, "
                                "source string, n_chars long")
        .option("maxFilesPerTrigger", 2)
        .parquet(landing)
    )
    gated = (
        arrivals.observe(
            "quality_gate",
            F.count(F.lit(1)).alias("n_in"),
            F.sum(_gate_pass().cast("long")).alias("n_pass"),
        )
        .where(_gate_pass())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens"),
        )
    )
    # drain with availableNow and harvest the observation PER BATCH,
    # keyed by batchId, from BOTH a StreamingQueryListener and the
    # query's recentProgress buffer. recentProgress alone retains only
    # the last spark.sql.streaming.numRecentProgressUpdates (default
    # 100) entries — a drain of >100 micro-batches would silently
    # undercount; the listener sees every batch but is dispatched
    # asynchronously, so the tail batches may not have been delivered
    # when awaitTermination returns. The union by batchId is complete
    # under both failure modes.
    import json as _json

    from pyspark.sql.streaming import StreamingQueryListener

    qname = f"quality_gate_{uuid.uuid4().hex[:8]}"
    ckpt = f"/tmp/sfdc_cdc_ckpt/{qname}"
    by_batch: dict[int, tuple[int, int]] = {}

    def _harvest(d: dict) -> None:
        om = (d.get("observedMetrics") or {}).get("quality_gate")
        if om and d.get("name") == qname:
            by_batch[d["batchId"]] = (om["n_in"], om["n_pass"] or 0)

    class _GateListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            _harvest(_json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _GateListener()
    spark.streams.addListener(listener)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    q = None
    try:
        q = (
            gated.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            _harvest(p if isinstance(p, dict) else _json.loads(p.json))
        n_in = sum(v[0] for v in by_batch.values())
        n_pass = sum(v[1] for v in by_batch.values())
        LAST_GATE_METRICS.clear()
        LAST_GATE_METRICS.update(
            n_in=n_in, n_pass=n_pass, n_dropped=n_in - n_pass,
            n_batches=len(by_batch),
        )
        result = spark.table(qname).localCheckpoint()
    finally:
        # cleanup must run on the failure path too: a failed drain
        # would otherwise leak the memory-sink temp view and the
        # checkpoint directory (round-9 advice)
        import shutil

        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.streams.removeListener(listener)
        try:
            spark.catalog.dropTempView(qname)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
    return result
