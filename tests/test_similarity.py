"""Quality bounds for the APPROXIMATE similarity/dedup operators.

Oracle parity proves each approximate operator computes its own
definition exactly; these tests prove the approximations are WORTH
running — recall against the exact answer is bounded below, so a
tuning change that silently destroys recall fails CI even though the
operator still matches its oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import load_all

SF = "/root/testdata/sf0.01"

SPECS = load_all()


@pytest.fixture(scope="module")
def exact_topk(spark):
    df = SPECS["topk_cosine_sim"].fn(spark, SF)
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_topk_recall(spark, exact_topk):
    """IVF with nprobe=2 of 16 cells must find a solid majority of the
    true top-k (random embeddings are the adversarial case for IVF —
    real clustered data does better)."""
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SPECS["ann_ivf_topk"].fn(spark, SF).collect()
    }
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.35, f"IVF recall collapsed: {recall:.2f}"


def test_ivf_pq_refined_recall_reaches_ivf_ceiling(spark, exact_topk):
    """The full IVF-PQ serving path (ADC shortlist + exact refine)
    must recover what the IVF candidate pool contains: recall@k of
    ann_ivf_pq_topk >= recall@k of ann_ivf_topk minus nothing — the
    PQ stage is a scan-order compressor, and with PQ_SHORTLIST deep
    enough the refinement re-ranks every true neighbor the probe
    found. A codebook/shortlist change that silently drops recall
    below the probe ceiling fails here."""
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in SPECS["ann_ivf_pq_topk"].fn(spark, SF).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in SPECS["ann_ivf_topk"].fn(spark, SF).collect()
    }
    r_pq = len(pq & exact_topk) / len(exact_topk)
    r_ivf = len(ivf & exact_topk) / len(exact_topk)
    assert r_pq >= r_ivf - 1e-9, f"PQ refine lost recall: {r_pq} < {r_ivf}"


def test_numpy_topk_is_exact(spark, exact_topk):
    """The BLAS path is exact brute force — identical pair set to the
    HOF-fold implementation, not just oracle-identical."""
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SPECS["topk_cosine_numpy"].fn(spark, SF).collect()
    }
    assert got == exact_topk


def test_rhp_lsh_finds_planted_neardups(spark, tmp_path):
    """RHP-LSH must recover planted near-duplicates. The driver
    embeddings are i.i.d. random, so they contain no true near-dups —
    the only honest recall fixture is one with dups planted: each
    planted pair is an original vector plus tiny noise (cos ≥ 0.99),
    for which 4 bands × 8 bits gives ≥ 1 colliding band w.h.p.
    (theoretical recall ≈ 0.99 at cos 0.99). Random non-dup pairs
    stay out at ~1.6% — both sides of the LSH trade are asserted."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n, dim, n_dups = 400, 64, 25
    base = rng.standard_normal((n, dim))
    dup = base[:n_dups] + 0.05 * rng.standard_normal((n_dups, dim))
    mat = np.vstack([base, dup]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n + n_dups), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(n + n_dups)], type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = {
        (r["vec_a"], r["vec_b"])
        for r in SPECS["rhp_lsh_neardup"].fn(spark, str(tmp_path)).collect()
    }
    planted = {(i, n + i) for i in range(n_dups)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.8, f"RHP-LSH missed planted near-dups: {recall:.2f}"
    # precision side: candidates that survived the cos>=NEARDUP_COS
    # verify step should be dominated by real structure, not the n²
    # random background (which would be ~1.6% of 80k pairs ≈ 1300)
    assert len(got) < 500, f"blocking admitted too much background: {len(got)}"


def test_ivf_training_moves_assignments(spark):
    """The trained quantizer must cover all cells, account for every
    vector exactly once, and actually CHANGE at least one assignment
    vs the seed quantizer (otherwise 'training' did nothing)."""
    from sfdc_cdc_aws_spark.operators.similarity import (
        N_CENTROIDS,
        ensure_ivf_index,
        ivf_train_centroids,
    )

    rows = ivf_train_centroids(spark, SF).collect()
    cells = {r["cent_id"] for r in rows}
    assert len(cells) == N_CENTROIDS
    n_total = sum(r["n_members"] for r in rows if r["dim"] == 0)
    seed = ensure_ivf_index(spark, SF)
    assert n_total == seed.count()
    seed_sizes = {
        r["cent_id"]: r["n"]
        for r in seed.groupBy("cent_id").agg(F.count("*").alias("n")).collect()
    }
    trained_sizes = {r["cent_id"]: r["n_members"] for r in rows if r["dim"] == 0}
    assert trained_sizes != seed_sizes, "second Lloyd pass was a no-op"
