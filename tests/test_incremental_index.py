"""Persistent bucketed shingle index for incremental dedup (VERDICT r2 #4).

The incremental-dedup operator's O(|batch|) claim only holds at 100 TB if
the shingle inverted index is a MAINTAINED table, not recomputed per run.
``write_shingle_index`` persists it bucketed by shingle; these tests pin

1. the probe join over the bucketed table is exchange-free on the index
   side (both sides, in fact: probe and index are the same bucketed
   relation), and
2. the bucketed-index path produces byte-identical results to the
   registered ``dedup_incremental`` query (which recomputes the index so
   it stays self-contained).
"""

from __future__ import annotations

import pytest

from naive_query_engine_spark import plans
from naive_query_engine_spark.operators.dedup import (
    incremental_candidates,
    incremental_pairs,
    write_shingle_index,
)
from naive_query_engine_spark.queries import QUERIES, t

from .conftest import SF_SMOKE

INDEX_TABLE = "b_shingle_index"


@pytest.fixture(scope="module")
def shingle_index(spark):
    write_shingle_index(t(spark, SF_SMOKE, "documents"), INDEX_TABLE, n_buckets=8)
    yield
    spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}")


def test_bucketed_probe_has_no_exchange(spark, shingle_index):
    """The candidate join must read the bucketed index WITHOUT an Exchange
    on either input — the write-once-shuffle-never property that makes
    per-batch ingest O(|batch|) instead of re-shuffling the corpus."""
    sh = spark.table(INDEX_TABLE)
    cand = incremental_candidates(sh)
    # force the shuffle-join path so bucketing (not broadcast) is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        text = plans.explain_text(cand, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in text, text
    assert "SortMergeJoin" in text, text


def test_bucketed_index_matches_registered_query(spark, shingle_index):
    """Same pairs, same jaccard values, from the maintained index."""
    via_index = sorted(
        tuple(r) for r in incremental_pairs(spark.table(INDEX_TABLE)).collect()
    )
    via_query = sorted(
        tuple(r) for r in QUERIES["dedup_incremental"].fn(spark, SF_SMOKE).collect()
    )
    assert via_index == via_query
    assert via_index  # non-vacuous: the smoke corpus has real near-dups
