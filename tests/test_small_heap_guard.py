"""dedup_substring's bare-session guard (VERDICT r10 #4).

On a DEFAULT 1 GiB driver heap at sf0.1, AQE broadcasts the df-capped
window-hash frame and the driver OOMs while BUILDING the ~50 MB relation
("Not enough memory to build and broadcast"); shuffle_hash OOMs too (its
build maps don't spill on the shared local-mode heap).  The in-query
guard pins that one join to spillable sort-merge — but ONLY when the
live JVM heap is small, so the tuned path keeps AQE's free strategy
choice.  The bare-session end-to-end proof is the /tmp driver-sim sweep
at sf0.1 (BASELINE.md r11); these tests pin the guard's two branches
in-process.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naive_query_engine_spark.operators import dedup
from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_tuned_session_keeps_aqe_choice(spark):
    """The test session runs an 8 GiB driver — the guard must NOT fire,
    and the analyzed plan must carry no join hint (de-hinting stays)."""
    assert dedup._driver_heap_small(spark) is False
    plan = (
        QUERIES["dedup_substring"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "UnresolvedHint" not in plan and "ResolvedHint" not in plan


def test_small_heap_branch_pins_merge_and_matches(spark, monkeypatch):
    """Force the small-heap branch: the merge hint must appear in the
    plan AND the result must be row-identical to the unhinted plan (a
    join strategy may never change the answer)."""
    baseline = sorted(
        map(tuple, QUERIES["dedup_substring"].fn(spark, SF_SMOKE).collect())
    )
    monkeypatch.setattr(dedup, "_SMALL_DRIVER_HEAP", 1 << 60)
    assert dedup._driver_heap_small(spark) is True
    guarded_df = QUERIES["dedup_substring"].fn(spark, SF_SMOKE)
    plan = guarded_df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan and "merge" in plan.lower()
    assert sorted(map(tuple, guarded_df.collect())) == baseline
