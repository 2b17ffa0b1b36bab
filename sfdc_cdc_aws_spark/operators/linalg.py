"""Distributed linear algebra over the embedding corpus: power
iteration for the dominant principal direction — the whitening /
centering / dimensionality-analysis primitive every embedding
pipeline runs before indexing or semantic dedup (and the engine's
demonstration that an iterative mat-vec loop is expressible as pure
aggregates, like the Lloyd pass in ``ivf_train_centroids`` and the
pointer-doubling loop in ``dedup_clusters``).

Reference parity: no linear-algebra surface in the reference (it
forwards CDC JSON byte-for-byte, worker/lambda/app.py:96-118); this
extends SURVEY.md §2.9's embedding-ops family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.session import truncate_lineage
from sfdc_cdc_aws_spark.sources import load_table

# Two mat-vec passes from a deterministic start (e_0). Production
# iterates to convergence with the same scalar-convergence discipline
# as dedup_clusters' CC loop; two passes keep the oracle one readable
# SQL statement while exercising the full loop body twice.
#
# Normalization is max-|w| (not L2): scale-invariant for power
# iteration, and — unlike an L2 norm — computable as an
# order-independent MAX aggregate, so neither engine's shuffle order
# can perturb the quantizer. Per-element products are cast to
# DECIMAL(28,10) before summing (exact decimal addition, both engines
# associate identically — the ivf_train_centroids discipline); the
# normalized vector rounds to 6 places between iterations so both
# engines re-multiply against bit-identical values.


@query(
    "pca_power_iter",
    oracle="""
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val,
         CAST(embedding[1] AS DOUBLE) AS dot0
  FROM embeddings
),
w1 AS (
  SELECT dim, CAST(sum(CAST(val * dot0 AS DECIMAL(28,10))) AS DOUBLE) AS w
  FROM x GROUP BY dim
),
v1 AS (
  SELECT dim, round(w / (SELECT max(abs(w)) FROM w1), 6) AS v FROM w1
),
d2 AS (
  SELECT vec_id,
         CAST(sum(CAST(x.val * v1.v AS DECIMAL(28,10))) AS DOUBLE) AS dotv
  FROM x JOIN v1 USING (dim) GROUP BY vec_id
),
w2 AS (
  SELECT dim, CAST(sum(CAST(x.val * d2.dotv AS DECIMAL(28,10))) AS DOUBLE) AS w
  FROM x JOIN d2 USING (vec_id) GROUP BY dim
)
SELECT dim, round(w / (SELECT max(abs(w)) FROM w2), 6) AS loading
FROM w2
""",
)
def pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding
    corpus by TWO power-iteration passes: v₀ = e₀, then twice
    w ← Σᵢ xᵢ·(xᵢᵀv) with max-|w| normalization and a 6-decimal
    inter-iteration quantizer. Output is the d-row loading vector —
    the direction embedding pipelines project out (mean/dominant
    component removal) before cosine retrieval or semantic dedup.

    Plan: the corpus explodes ONCE into (vec_id, dim, val) and is
    lineage-truncated (it feeds three aggregates); each mat-vec pass
    is a broadcast join with the d-row vector relation plus one
    combinable decimal aggregate — shuffles carry d rows (per-dim
    sums) or one row per vector (per-row dots), never a pair space.
    At 100 TB both stay map-side-partial; the model state is d
    values, the same "collect nothing but the steering scalars"
    posture as ivf_train_centroids (here not even the vector is
    collected — normalization is a MAX aggregate crossJoined back)."""
    _, v2 = _power_vector(spark, sf_dir)
    return v2.select("dim", F.col("v").alias("loading"))


def _normalize(w: DataFrame, out: str) -> DataFrame:
    """round(w / max|w|, 6) — the order-independent quantizer."""
    m = F.broadcast(w.agg(F.max(F.abs(F.col("w"))).alias("m")))
    return w.crossJoin(m).select(
        "dim", F.round(F.col("w") / F.col("m"), 6).alias(out)
    )


def _power_vector(spark: SparkSession, sf_dir: str):
    """The shared two-pass power iteration: returns the
    lineage-truncated exploded corpus x = (vec_id, dim, val, dot0)
    and the d-row normalized vector v2 = (dim, v)."""
    e = load_table(spark, sf_dir, "embeddings")
    x = truncate_lineage(
        e.select(
            "vec_id",
            F.element_at("embedding", 1).cast("double").alias("dot0"),
            F.posexplode("embedding").alias("dim", "raw"),
        ).select("vec_id", "dot0", "dim", F.col("raw").cast("double").alias("val"))
    )
    w1 = x.groupBy("dim").agg(
        F.sum((F.col("val") * F.col("dot0")).cast("decimal(28,10)"))
        .cast("double")
        .alias("w")
    )
    v1 = F.broadcast(_normalize(w1, "v"))
    d2 = (
        x.join(v1, "dim")
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("val") * F.col("v")).cast("decimal(28,10)"))
            .cast("double")
            .alias("dotv")
        )
    )
    w2 = (
        x.join(d2, "vec_id")
        .groupBy("dim")
        .agg(
            F.sum((F.col("val") * F.col("dotv")).cast("decimal(28,10)"))
            .cast("double")
            .alias("w")
        )
    )
    return x, _normalize(w2, "v")


# ---------------------------------------------------------------------------
# projection residual — what embedding pipelines DO with the component
# ---------------------------------------------------------------------------

_DUCK_POWER_CTE = """
x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val,
         CAST(embedding[1] AS DOUBLE) AS dot0
  FROM embeddings
),
w1 AS (
  SELECT dim, CAST(sum(CAST(val * dot0 AS DECIMAL(28,10))) AS DOUBLE) AS w
  FROM x GROUP BY dim
),
v1 AS (
  SELECT dim, round(w / (SELECT max(abs(w)) FROM w1), 6) AS v FROM w1
),
d2 AS (
  SELECT vec_id,
         CAST(sum(CAST(x.val * v1.v AS DECIMAL(28,10))) AS DOUBLE) AS dotv
  FROM x JOIN v1 USING (dim) GROUP BY vec_id
),
w2 AS (
  SELECT dim, CAST(sum(CAST(x.val * d2.dotv AS DECIMAL(28,10))) AS DOUBLE) AS w
  FROM x JOIN d2 USING (vec_id) GROUP BY dim
),
v2 AS (
  SELECT dim, round(w / (SELECT max(abs(w)) FROM w2), 6) AS v FROM w2
)
""".strip()


@query(
    "pca_project_residual",
    oracle=f"""
WITH {_DUCK_POWER_CTE},
vv AS (
  SELECT CAST(sum(CAST(v * v AS DECIMAL(28,10))) AS DOUBLE) AS vv FROM v2
),
t AS (
  SELECT x.vec_id,
         CAST(sum(CAST(x.val * v2.v AS DECIMAL(28,10))) AS DOUBLE)
           / (SELECT vv FROM vv) AS t
  FROM x JOIN v2 USING (dim) GROUP BY x.vec_id
),
r AS (
  SELECT x.vec_id,
         CAST(sum(CAST((x.val - t.t * v2.v) * (x.val - t.t * v2.v)
                       AS DECIMAL(28,10))) AS DOUBLE) AS rsq,
         CAST(sum(CAST(x.val * x.val AS DECIMAL(28,10))) AS DOUBLE) AS xsq
  FROM x JOIN v2 USING (dim) JOIN t ON x.vec_id = t.vec_id
  GROUP BY x.vec_id
)
SELECT r.vec_id,
       round(t.t, 6) AS coeff,
       round(sqrt(rsq), 6) AS res_norm,
       round(1.0 - rsq / xsq, 6) AS var_removed
FROM r JOIN t ON r.vec_id = t.vec_id
""",
)
def pca_project_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-direction REMOVAL — what a pipeline does with the
    power-iteration vector: every embedding is decomposed as
    x = t·v + r (t = xᵀv/vᵀv, r ⊥ v), and the output reports the
    projection coefficient, the residual norm, and the per-vector
    variance fraction the single direction explains — the
    all-but-the-top-PC whitening step (Mu et al.,
    "All-but-the-Top", ICLR 2018) that improves cosine retrieval on
    anisotropic embedding spaces, plus the audit number
    (var_removed) that says whether the direction was worth
    removing.

    Plan: the two power-iteration passes (see pca_power_iter) plus
    one more broadcast join of the d-row vector and two per-vector
    decimal aggregates — still nothing wider than (vec_id)/(dim)
    shuffles, still no driver collect; the residual never
    materializes as an array, only its norm (at 100 TB the rewritten
    vectors would be written straight to the lake from the same
    join, one column expression away)."""
    x, v2 = _power_vector(spark, sf_dir)
    vv = F.broadcast(
        v2.agg(
            F.sum((F.col("v") * F.col("v")).cast("decimal(28,10)"))
            .cast("double")
            .alias("vv")
        )
    )
    t = (
        x.join(F.broadcast(v2), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("val") * F.col("v")).cast("decimal(28,10)"))
            .cast("double")
            .alias("dot")
        )
        .crossJoin(vv)
        .select("vec_id", (F.col("dot") / F.col("vv")).alias("t"))
    )
    res = F.col("val") - F.col("t") * F.col("v")
    r = (
        x.join(F.broadcast(v2), "dim")
        .join(t, "vec_id")
        .groupBy("vec_id", "t")
        .agg(
            F.sum((res * res).cast("decimal(28,10)"))
            .cast("double")
            .alias("rsq"),
            F.sum((F.col("val") * F.col("val")).cast("decimal(28,10)"))
            .cast("double")
            .alias("xsq"),
        )
    )
    return r.select(
        "vec_id",
        F.round(F.col("t"), 6).alias("coeff"),
        F.round(F.sqrt("rsq"), 6).alias("res_norm"),
        F.round(F.lit(1.0) - F.col("rsq") / F.col("xsq"), 6).alias(
            "var_removed"
        ),
    )
