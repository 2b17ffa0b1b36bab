"""Semantic invariants for the training-data assembly operators
(oracle parity proves spec-equivalence; these prove the spec itself
has the properties a training pipeline needs)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.training import (
    PACK_CAP,
    pack_sequences,
    source_mixture_sample,
    vector_quantize_int8,
)

SF = "/root/testdata/sf0.01"


def test_pack_bins_respect_cap(spark):
    rows = pack_sequences(spark, SF).collect()
    sums: dict[tuple, int] = defaultdict(int)
    counts: dict[tuple, int] = defaultdict(int)
    for r in rows:
        key = (r["source"], r["shard"], r["bin_id"])
        sums[key] += r["n_tokens"]
        counts[key] += 1
    for key, total in sums.items():
        # a bin exceeds the cap only when it holds a single oversize doc
        assert total <= PACK_CAP or counts[key] == 1, (key, total, counts[key])
    # no doc lost or duplicated
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_pack_bins_are_contiguous_and_greedy(spark):
    rows = pack_sequences(spark, SF).collect()
    by_unit: dict[tuple, list] = defaultdict(list)
    for r in rows:
        by_unit[(r["source"], r["shard"])].append(r)
    for unit in by_unit.values():
        unit.sort(key=lambda r: r["doc_id"])
        assert unit[0]["bin_id"] == 0
        acc = unit[0]["n_tokens"]
        for prev, cur in zip(unit, unit[1:]):
            step = cur["bin_id"] - prev["bin_id"]
            assert step in (0, 1)
            if step == 0:  # greedy: same bin iff it fit
                acc += cur["n_tokens"]
                assert acc <= PACK_CAP
            else:
                acc = cur["n_tokens"]


def test_mixture_rates_converge(spark):
    got = (
        source_mixture_sample(spark, SF)
        .groupBy("source", "keep_permille")
        .agg(F.count("*").alias("kept"))
        .collect()
    )
    # 25 docs per source at sf0.01 — just check monotone direction:
    # aggregate kept counts by target rate bucket
    by_rate: dict[int, int] = defaultdict(int)
    for r in got:
        by_rate[r["keep_permille"]] += r["kept"]
    rates = sorted(by_rate)
    assert rates == [50, 100, 150, 200]
    assert by_rate[200] > by_rate[50], by_rate


def test_quantize_range_and_scale(spark):
    rows = vector_quantize_int8(spark, SF).collect()
    assert all(-127 <= r["qval"] <= 127 for r in rows)
    assert all(r["scale"] >= 0 for r in rows)
    # every probed vector contributes exactly QUANT_PROBE_DIMS rows
    from sfdc_cdc_aws_spark.operators.training import QUANT_PROBE_DIMS

    per_vec: dict[int, int] = defaultdict(int)
    for r in rows:
        per_vec[r["vec_id"]] += 1
    assert set(per_vec.values()) == {QUANT_PROBE_DIMS}


def test_bpe_train_merges_invariants(spark):
    """Training-loop invariants: ranks are 1..N with no gaps, merged
    is the concatenation of its sides, and the winning pair count is
    monotone non-increasing (a merge can only shrink or preserve every
    other pair's count, and any NEW pair containing the merged symbol
    is bounded by that symbol's own occurrence count)."""
    from sfdc_cdc_aws_spark.operators.curation import (
        N_TRAIN_MERGES,
        bpe_train_merges,
    )

    rows = bpe_train_merges(spark, SF).orderBy("merge_rank").collect()
    assert [r["merge_rank"] for r in rows] == list(range(1, N_TRAIN_MERGES + 1))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
        assert r["cnt"] > 0


def test_hash_ngram_classify_splits_and_bounds(spark):
    """The classifier must actually discriminate on this corpus (both
    predicted classes non-empty — a filter that keeps everything
    verifies nothing) and feature counts must be bounded by the
    unigram+bigram budget (2·len - 1)."""
    from sfdc_cdc_aws_spark.operators.curation import hash_ngram_classify
    from sfdc_cdc_aws_spark.operators.text import tokens_col
    from sfdc_cdc_aws_spark.sources import load_table

    res = hash_ngram_classify(spark, SF)
    by_pred = dict(
        res.groupBy("pred").count().rdd.map(lambda r: (r["pred"], r["count"])).collect()
    )
    assert by_pred.get(0, 0) > 0 and by_pred.get(1, 0) > 0, by_pred
    lens = load_table(spark, SF, "documents").select(
        "doc_id", F.size(tokens_col()).alias("n_tok")
    )
    joined = res.join(lens, "doc_id").where(
        F.col("n_feats") > 2 * F.col("n_tok") - 1
    )
    assert joined.count() == 0


def test_dedup_keep_best_manifest_consistency(spark):
    """The drop manifest must reconcile exactly with the cluster
    labels: every cluster has >= 2 members, the survivor is a cluster
    member with the cluster-max n_chars (ties to the lowest doc_id),
    survivor never appears in dropped_docs, and survivors+dropped
    partition the clustered doc set."""
    from sfdc_cdc_aws_spark.operators.dedup import dedup_clusters, dedup_keep_best
    from sfdc_cdc_aws_spark.sources import load_table

    manifest = dedup_keep_best(spark, SF).collect()
    labels = {
        r["doc_id"]: r["cluster_id"] for r in dedup_clusters(spark, SF).collect()
    }
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    seen = set()
    for m in manifest:
        dropped = [int(x) for x in m["dropped_docs"].split(",")] if m["dropped_docs"] else []
        members = dropped + [m["survivor_doc"]]
        assert m["n_members"] == len(members) >= 2
        assert m["survivor_doc"] not in dropped
        for d in members:
            assert labels[d] == m["cluster_id"]
        best = max(members, key=lambda d: (chars[d], -d))
        assert m["survivor_doc"] == best
        assert m["survivor_chars"] == chars[best]
        seen.update(members)
    assert seen == set(labels)


def test_bpe_encode_apply_fertility_bounds(spark):
    """Encode-apply invariants: every word becomes at least 1 and at
    most len(word) BPE units (merges only ever shrink the symbol
    sequence), the corpus-level unit total is strictly below the
    pre-merge character total (the learned merges actually fired),
    and fertility is the ratio of the two count columns."""
    from sfdc_cdc_aws_spark.operators.curation import bpe_encode_apply
    from sfdc_cdc_aws_spark.operators.text import tokens_col
    from sfdc_cdc_aws_spark.sources import load_table

    res = bpe_encode_apply(spark, SF)
    base = (
        load_table(spark, SF, "documents")
        .select("doc_id", F.explode(tokens_col()).alias("t"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_w"), F.sum(F.length("t")).alias("n_ch"))
    )
    j = res.join(base, "doc_id").collect()
    assert len(j) == base.count()
    fired = 0
    for r in j:
        assert r["n_words"] == r["n_w"]
        assert r["n_words"] <= r["n_bpe_units"] <= r["n_ch"]
        assert abs(r["units_per_word"] - r["n_bpe_units"] / r["n_words"]) < 1e-6
        if r["n_bpe_units"] < r["n_ch"]:
            fired += 1
    assert fired > 0


def test_weighted_sample_ares_matches_bruteforce(spark):
    """The A-ES sample is fully deterministic, so a driver-side
    recomputation of the key formula (md5 uniform → ln(u)/w, 6 dp,
    doc_id tiebreak) must reproduce the exact per-stratum top-k the
    engine selected."""
    import hashlib
    import math

    from sfdc_cdc_aws_spark.operators.training import (
        ARES_K,
        ARES_MOD,
        weighted_sample_ares,
    )
    from sfdc_cdc_aws_spark.sources import load_table

    docs = (
        load_table(spark, SF, "documents")
        .select("lang", "doc_id", "n_chars")
        .where(F.col("n_chars") > 0)
        .collect()
    )
    by_lang = {}
    for r in docs:
        h = int(hashlib.md5(f"ares:{r['doc_id']}".encode()).hexdigest()[:15], 16)
        u = (h % ARES_MOD + 1) / (ARES_MOD + 1)
        k = round(math.log(u) / r["n_chars"], 6)
        by_lang.setdefault(r["lang"], []).append((-k, r["doc_id"], r["n_chars"]))
    expected = set()
    for lang, rows in by_lang.items():
        for rank, (_negk, doc_id, n_chars) in enumerate(sorted(rows)[:ARES_K], 1):
            expected.add((lang, doc_id, n_chars, rank))
    got = {
        (r["lang"], r["doc_id"], r["weight"], r["sample_rank"])
        for r in weighted_sample_ares(spark, SF).collect()
    }
    assert got == expected
