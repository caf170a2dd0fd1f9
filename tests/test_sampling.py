"""Properties of the deterministic sampling operators that the oracle
match can't express: temperature up-weighting, exact-k groups, and
run-to-run stability (the whole point of hash-based sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators.quality import (
    MIX_BUCKETS,
    RESERVOIR_K,
    dataset_mixture_sample,
    dataset_reservoir_per_lang,
)

from .conftest import SF_ORACLE


def test_mixture_upweights_low_resource_strata(spark):
    """share ∝ sqrt(n): the dominant stratum (en) must get a LOWER sampling
    rate than every low-resource stratum, while target shares still sum to 1."""
    rows = {r["lang"]: r for r in dataset_mixture_sample(spark, SF_ORACLE).collect()}
    dominant = max(rows.values(), key=lambda r: r["n_docs"])
    assert dominant["lang"] == "en"
    for lang, r in rows.items():
        if lang != dominant["lang"]:
            assert r["threshold"] > dominant["threshold"], (
                f"{lang} should be up-weighted vs {dominant['lang']}"
            )
    assert abs(sum(r["target_share"] for r in rows.values()) - 1.0) < 1e-12
    # the hash-threshold realization lands near the target rate
    for r in rows.values():
        assert abs(r["achieved_rate"] - r["threshold"] / MIX_BUCKETS) < 0.15


def test_reservoir_exact_k_and_stable(spark):
    out1 = dataset_reservoir_per_lang(spark, SF_ORACLE)
    counts = {r["lang"]: r["n"] for r in out1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts.values()) == {RESERVOIR_K}
    # deterministic: a second independent evaluation yields the same rows
    a = sorted(map(tuple, out1.collect()))
    b = sorted(map(tuple, dataset_reservoir_per_lang(spark, SF_ORACLE).collect()))
    assert a == b
