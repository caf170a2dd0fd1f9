"""Prefix-filtered all-pairs cosine (Bayardo et al. WWW'07) — exactness
and non-vacuous pruning.

The prefix filter is only admissible if it loses NO >=threshold pair;
the equality test recomputes the t=0.8 pair set EXHAUSTIVELY (full
inverted-index self-join, no prefix anywhere) and pins that the pruned
path returns the identical capped result.  The prune test pins that the
prefix is a strict subset of the postings (otherwise the query silently
degenerates to the full join and the scale claim is hollow).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from naive_query_engine_spark.queries import QUERIES, t as t_

from .conftest import SF_SMOKE


def _weighted_index(spark):
    from naive_query_engine_spark.operators.dedup import (
        TFIDF_SCALE,
        cached_capped_index,
    )

    d = t_(spark, SF_SMOKE, "documents")
    sh = cached_capped_index(spark, SF_SMOKE)
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    w = F.floor(
        F.lit(TFIDF_SCALE) * (F.col("n_docs").cast("double") / F.col("df"))
    ).cast("decimal(19,0)")
    return (
        sh.join(dfreq, "g")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "g", (w * w).alias("w2"))
    )


def test_prefix_path_equals_exhaustive_recompute(spark):
    from naive_query_engine_spark.operators.dedup import (
        TFIDF_PREFIX_THRESHOLD,
        TFIDF_TOPK_PER_DOC,
    )

    wsh = _weighted_index(spark).persist()
    norms = wsh.groupBy("doc_id").agg(F.sum("w2").alias("n2"))
    x, y = wsh.alias("x"), wsh.alias("y")
    dots = (
        x.join(
            y,
            (F.col("x.g") == F.col("y.g"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("x.w2")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))
    )
    wk = Window.partitionBy("doc_a").orderBy(F.col("cosine").desc(), F.col("doc_b"))
    exhaustive = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= TFIDF_PREFIX_THRESHOLD)
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= TFIDF_TOPK_PER_DOC)
        .drop("rk")
    )
    want = sorted(tuple(r) for r in exhaustive.collect())
    got = sorted(
        tuple(r)
        for r in QUERIES["dedup_tfidf_cosine_prefix"].fn(spark, SF_SMOKE).collect()
    )
    assert got == want
    assert got  # non-vacuous: the smoke corpus has near-identical docs
    wsh.unpersist()


def test_prefix_actually_prunes_postings(spark):
    """The indexed prefix must be a small strict subset of the postings
    (keep-mass (1-t^2) = 0.36 at t=0.8 — measured ~19% of postings on
    the probe corpus; allow headroom for corpus shape)."""
    from naive_query_engine_spark.operators.dedup import TFIDF_PREFIX_FRAC

    wsh = _weighted_index(spark)
    norms = wsh.groupBy("doc_id").agg(F.sum("w2").alias("n2"))
    w_ord = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("w2").desc(), F.col("g"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run2 = F.coalesce(F.sum("w2").over(w_ord), F.lit(0).cast("decimal(38,0)"))
    j = wsh.join(norms, "doc_id").withColumn("run2", run2)
    full = j.count()
    kept = j.filter(
        F.col("run2").cast("double")
        <= F.lit(TFIDF_PREFIX_FRAC) * F.col("n2").cast("double")
    ).count()
    assert kept < full, (kept, full)
    assert kept / full < 0.6, (kept, full)
