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
    # drain via run_available_now, whose listener+recentProgress
    # union (keyed by batchId — complete under both the >100-batch
    # progress-buffer eviction and the async-listener tail) now
    # harvests EVERY observe() uniformly into LAST_DRAIN_OBSERVED;
    # this module keeps its LAST_GATE_METRICS contract as a view
    # over that harvest.
    from sfdc_cdc_aws_spark.streaming.job import (
        LAST_DRAIN_OBSERVED,
        drain_state_width,
        run_available_now,
    )

    # complete mode: the last data batch already emitted the full state
    result = run_available_now(
        gated,
        "quality_gate",
        output_mode="complete",
        shuffle_partitions=drain_state_width(spark, landing),
        no_data_batch=False,
    )
    obs = LAST_DRAIN_OBSERVED.get("quality_gate", {})
    n_in = int(obs.get("quality_gate.n_in", 0))
    n_pass = int(obs.get("quality_gate.n_pass", 0))
    LAST_GATE_METRICS.clear()
    LAST_GATE_METRICS.update(
        n_in=n_in,
        n_pass=n_pass,
        n_dropped=n_in - n_pass,
        n_batches=int(obs.get("n_batches", 0)),
    )
    return result
