"""Incremental ANN near-dup screening at ingest: newly arriving
vectors streamed against the standing corpus's materialized IVF cell
index.

The vector twin of :mod:`ingest_dedup` (round-6 verdict framed both
as the production admission shape): the corpus index is a
MATERIALIZED table probed per micro-batch — "is the NEW embedding a
near-duplicate" answered without recomputing corpus assignments —
while the batch family (operators/similarity.py) answers "what is
near-duplicated in the corpus".

The streaming-specific trick: per-arrival probe selection (top
N_PROBE of N_CENTROIDS cells) cannot use a window function (not
supported on unbounded inputs) or an aggregate (would force complete
mode for a stateless screen). Instead the coarse quantizer — tiny by
definition; it IS what makes IVF an index — is collected once at plan
build (N_CENTROIDS rows, the same bounded-side-input class as the
N_QUERIES collect in similarity.py) and baked into ONE narrow
expression: an array literal of (centroid, prenormed norm) structs,
scored per row with a higher-order transform, sorted with an
array_sort comparator (cos DESC, cent_id ASC — the oracle's
row_number order), sliced to N_PROBE, exploded. Fully stateless ⇒
append-mode exact, zero state stores, and the arrival batch joins the
cell index on cent_id (at 100 TB: a bucketed index table, probes
shuffle-free; the per-batch side is small).

Reference parity: stream plumbing mirrors the CDC landing pattern
(streaming/job.py:55-78); the reference has no vector surface — §2.9
extension composed with S5 streaming machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.functions.vector import (
    DUCK_COSINE,
    cosine_prenorm,
    norm,
)
from sfdc_cdc_aws_spark.operators.similarity import (
    N_CENTROIDS,
    N_PROBE,
    NEARDUP_COS,
    ensure_ivf_index,
)
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.sources.tables import table_path
from sfdc_cdc_aws_spark.streaming.job import run_available_now

# deterministic corpus/arrival split, same discipline as ingest_dedup:
# every 4th vector "arrives", the rest are the standing corpus.
VEC_ARRIVAL_MOD = 4

_LANDING_REV = "v1"


def ensure_vec_landing(
    spark: SparkSession, sf_dir: str, base: str = "/tmp/sfdc_vec_landing"
) -> str:
    """Materialize the arriving-vectors landing dir (idempotent per
    source content): the arrival slice as 4 parquet files so
    maxFilesPerTrigger chops the drain into micro-batches like a real
    shard feed."""
    st = os.stat(table_path(sf_dir, "embeddings"))
    name = (
        f"{os.path.basename(sf_dir.rstrip('/'))}_{_LANDING_REV}"
        f"_{st.st_mtime_ns}_{st.st_size}"
    )
    out = os.path.join(base, name)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") % VEC_ARRIVAL_MOD == 0)
            .select("vec_id", "embedding")
            .repartitionByRange(4, "vec_id")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def _probe_cells_expr(emb: F.Column, nrm: F.Column, cents) -> F.Column:
    """Top-N_PROBE centroid ids for one row as a narrow expression:
    score the baked centroid array, sort (cos DESC, cent_id ASC),
    slice.  ``cents`` is [(cent_id, vector, norm)] collected at plan
    build."""
    scored = F.array(
        *[
            F.struct(
                cosine_prenorm(
                    emb,
                    # one array literal per centroid (a single py4j
                    # call), not one F.lit per component — this
                    # expression is 16 centroids x 64 dims and is
                    # built on the driver's critical path
                    F.lit([float(x) for x in vec]),
                    nrm,
                    F.lit(c_nrm),
                ).alias("cos"),
                F.lit(int(cid)).alias("cent_id"),
            )
            for cid, vec, c_nrm in cents
        ]
    )
    ordered = F.array_sort(
        scored,
        lambda x, y: (
            F.when(x["cos"] > y["cos"], F.lit(-1))
            .when(x["cos"] < y["cos"], F.lit(1))
            .when(x["cent_id"] < y["cent_id"], F.lit(-1))
            .when(x["cent_id"] > y["cent_id"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )
    return F.slice(ordered, 1, N_PROBE)


@query(
    "stream_ann_ingest",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {N_CENTROIDS}
),
corpus_assign AS (
  SELECT vec_id, embedding, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {DUCK_COSINE.format(a='e.embedding', b='c.c_emb')} DESC,
                      c.cent_id) AS rn
    FROM embeddings e, cents c
    WHERE e.vec_id % {VEC_ARRIVAL_MOD} <> 0
  ) WHERE rn = 1
),
arrivals AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {VEC_ARRIVAL_MOD} = 0
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT a.vec_id AS query_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY {DUCK_COSINE.format(a='a.embedding', b='c.c_emb')} DESC,
                      c.cent_id) AS rn
    FROM arrivals a, cents c
  ) WHERE rn <= {N_PROBE}
)
SELECT new_vec, corpus_vec, cos_sim FROM (
  SELECT p.query_id AS new_vec, s.vec_id AS corpus_vec,
         {DUCK_COSINE.format(a='a.embedding', b='s.embedding')} AS cos_sim
  FROM probes p
  JOIN corpus_assign s ON s.cent_id = p.cent_id
  JOIN arrivals a ON a.vec_id = p.query_id
) WHERE cos_sim >= {NEARDUP_COS}
""",
)
def stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed arriving vectors screened against the corpus IVF index
    for near-duplicates before admission: readStream over the arrival
    landing (micro-batched via maxFilesPerTrigger), per-row probe-cell
    selection as one narrow expression (see module docstring — baked
    coarse quantizer, array_sort comparator, no window/agg/state),
    stream-static equi-join on cent_id against the MATERIALIZED cell
    index (ensure_ivf_index filtered to the corpus slice — a
    stream-static join re-reads its static side every micro-batch, so
    the index must be a table), cosine on prenormed vectors, admit
    threshold on the 6-dp ROUNDED value so a boundary pair cannot
    classify differently across engines."""
    landing = ensure_vec_landing(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        (r["vec_id"], list(r["embedding"]), float(sum(x * x for x in r["embedding"]) ** 0.5))
        for r in e.where(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    ]
    index = (
        ensure_ivf_index(spark, sf_dir)
        .where(F.col("vec_id") % VEC_ARRIVAL_MOD != 0)
        .select(
            F.col("vec_id").alias("corpus_vec"),
            "cent_id",
            F.col("embedding").alias("c_embedding"),
            F.col("nrm").alias("c_nrm"),
        )
    )
    arrivals = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 2)
        .parquet(landing)
        # drop accounting (quality-gate discipline, uniform across the
        # screen quartet): arriving vectors counted per micro-batch;
        # run_available_now unions listener+progress metrics into
        # LAST_DRAIN_OBSERVED["ann_ingest"].
        .observe("arrivals", F.count(F.lit(1)).alias("n_in"))
        .select(
            F.col("vec_id").alias("new_vec"),
            "embedding",
            norm(F.col("embedding")).alias("nrm"),
        )
    )
    probed = arrivals.select(
        "new_vec",
        "embedding",
        "nrm",
        F.explode(
            _probe_cells_expr(F.col("embedding"), F.col("nrm"), cents)
        ).alias("p"),
    ).select("new_vec", "embedding", "nrm", F.col("p.cent_id").alias("cent_id"))
    matches = (
        probed.join(index, "cent_id")
        .select(
            "new_vec",
            "corpus_vec",
            cosine_prenorm(
                F.col("embedding"),
                F.col("c_embedding"),
                F.col("nrm"),
                F.col("c_nrm"),
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= NEARDUP_COS)
        # flagged near-dup pairs emitted per batch (append mode —
        # every observed row is new, so the cross-batch sum is exact)
        .observe("flagged", F.count(F.lit(1)).alias("n_pairs"))
    )
    from sfdc_cdc_aws_spark.streaming.job import drain_state_width

    return run_available_now(
        matches,
        "ann_ingest",
        output_mode="append",
        shuffle_partitions=drain_state_width(spark, landing),
    )


@query(
    "ivf_index_merge",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {N_CENTROIDS}
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT e.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {DUCK_COSINE.format(a='e.embedding', b='c.c_emb')} DESC,
                      c.cent_id) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
)
SELECT cent_id,
       count(*) AS n_vecs,
       bit_xor(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT)
         AS member_xor,
       min(vec_id) AS min_vec,
       max(vec_id) AS max_vec
FROM assign
GROUP BY cent_id
""",
)
def ivf_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the IVF cell index — the vector
    twin of minhash_index_merge (streaming/ingest_dedup.py): fold an
    arrival batch's cell assignments into the MATERIALIZED index and
    prove the merged index equals the from-scratch assignment over
    ALL vectors. After stream_ann_ingest admits a batch, its vectors
    must join the cells the next batch probes, or the ANN screen
    goes stale exactly like the band index would.

    MERGE(state, delta): the state partial aggregates the
    materialized index parquet (ensure_ivf_index — the n×C cosine
    scoring ran once at build; maintenance reads assignments, it
    never re-scores the corpus), the delta scores ONLY the arrival
    slice against the FIXED quantizer (ivf_assignments(vectors=...) —
    the same centroids the from-scratch oracle uses, so delta cells
    are by construction the cells a full rebuild would pick), and
    the merge re-aggregates count/xor/min/max — all mergeable
    partials, the ivm_agg_merge algebra.

    Plan at 100 TB: state branch is an index-metadata scan grouped
    on cent_id (C cells out); delta branch is |batch|×C broadcast
    cosine work; the merge exchange carries ≤2C rows. Nothing
    rescans or re-scores corpus vectors."""
    from sfdc_cdc_aws_spark.operators.similarity import ivf_assignments
    from sfdc_cdc_aws_spark.operators.text import shared_hash64

    e = load_table(spark, sf_dir, "embeddings")

    def cell_partial(rows: DataFrame) -> DataFrame:
        return rows.groupBy("cent_id").agg(
            F.count("*").alias("n_vecs"),
            F.bit_xor(
                shared_hash64(F.col("vec_id").cast("string"))
            ).alias("member_xor"),
            F.min("vec_id").alias("min_vec"),
            F.max("vec_id").alias("max_vec"),
        )

    state = cell_partial(
        ensure_ivf_index(spark, sf_dir).where(
            F.col("vec_id") % VEC_ARRIVAL_MOD != 0
        )
    )
    delta = cell_partial(
        ivf_assignments(
            spark,
            sf_dir,
            vectors=e.where(F.col("vec_id") % VEC_ARRIVAL_MOD == 0),
        )
    )
    return (
        state.unionByName(delta)
        .groupBy("cent_id")
        .agg(
            F.sum("n_vecs").cast("bigint").alias("n_vecs"),
            F.bit_xor("member_xor").alias("member_xor"),
            F.min("min_vec").alias("min_vec"),
            F.max("max_vec").alias("max_vec"),
        )
    )
