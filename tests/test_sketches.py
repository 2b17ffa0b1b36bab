"""Approximate aggregates: their raw estimates have no cross-engine
oracle (different sketch algorithms), so correctness is (a) an error
bound against the exact answer computed in the same engine over the
FULL domain, and (b) since round 5, the registered queries emit
bound-verification relations whose booleans a DuckDB oracle pins to
TRUE — these tests check the raw helpers AND that the verification
relations verify."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import load_all
from sfdc_cdc_aws_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    from sfdc_cdc_aws_spark.operators.udfs import approx_sketches

    approx = {r["l_returnflag"]: r for r in approx_sketches(spark, SF).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in (
            load_table(spark, SF, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("parts"),
                F.expr(
                    "percentile(CAST(l_quantity AS DOUBLE), array(0.25, 0.5, 0.75))"
                ).alias("qs"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        # HLL++ default rsd is 5%; allow 3x margin
        assert abs(a["approx_parts"] - e["parts"]) <= 0.15 * e["parts"]
        # t-digest with accuracy 10000 on ~100k rows: near-exact quantiles
        for got, want in zip((a["q25"], a["q50"], a["q75"]), e["qs"]):
            assert abs(got - want) <= max(1.0, 0.05 * want)


def test_sketch_suite_verification_relation_all_true(spark):
    rows = load_all()["sketch_suite"].fn(spark, SF).collect()
    assert rows, "verification relation empty"
    for r in rows:
        assert r["distinct_ok"], f"{r['l_returnflag']}: HLL out of bound"
        for c in ("q25_ok", "q50_ok", "q75_ok"):
            assert r[c], f"{r['l_returnflag']}: {c} rank check failed"


def test_heavy_hitters_within_mg_bound(spark):
    """Summed Misra-Gries sketches: estimates within N/C below truth,
    never above, and the true top tokens all survive."""
    from sfdc_cdc_aws_spark.operators.udfs import MG_CAPACITY, mg_sketch

    sf = "/root/testdata/sf0.001"
    specs = load_all()
    exact = {
        r["token"]: r["n"]
        for r in specs["text_token_counts"].fn(spark, sf).collect()
    }
    n_total = sum(exact.values())
    bound = n_total / MG_CAPACITY
    approx = {r["token"]: r["est_count"] for r in mg_sketch(spark, sf).collect()}
    assert approx, "sketch returned nothing"
    for tok, est in approx.items():
        assert est <= exact[tok], f"{tok} overestimated"
        assert exact[tok] - est <= bound, f"{tok} off by more than N/C"
    # survival guarantee for unambiguous heavy hitters
    for tok, n in exact.items():
        if n > bound:
            assert tok in approx, f"heavy hitter {tok} missing"


def test_heavy_hitters_verification_relation_all_true(spark):
    rows = load_all()["heavy_hitters_sketch"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no true heavy hitters at this SF — relation is vacuous"
    for r in rows:
        assert r["in_sketch"], f"{r['token']} missing from sketch"
        assert r["within_bound"], f"{r['token']} estimate out of MG bound"
