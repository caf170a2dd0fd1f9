"""dedup_substring's bare-session story (VERDICT r10 #4, retired r13).

History: on a DEFAULT 1 GiB driver heap at sf0.1, AQE used to broadcast
the df-capped window-hash frame and the driver OOMed while BUILDING the
~50 MB relation; an in-query guard pinned that join to spillable
sort-merge on small heaps.  r13 removed the join itself: the df cap and
pair counting now run inside one aggregation (pairs_from_postings — group
postings by window hash, df-cap by list size, expand pairs row-locally),
so the plan contains NO join and a bare driver has nothing to broadcast.
These tests pin that structural property — if a join ever reappears in
this query, the small-heap analysis must be redone before shipping.
The end-to-end bare-session proof stays the /tmp driver-sim sweep at
sf0.1.
"""

from __future__ import annotations

from naive_query_engine_spark import plans
from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_substring_plan_is_join_free(spark):
    """No join operator anywhere in the physical plan: the df cap and the
    pair expansion are aggregation + generate, never a broadcast/hash/
    sort-merge join a small driver heap could die building."""
    text = plans.explain_text(QUERIES["dedup_substring"].fn(spark, SF_SMOKE), "simple")
    assert "Join" not in text, text
    assert "BroadcastExchange" not in text, text


def test_substring_strided_plan_is_join_free(spark):
    text = plans.explain_text(
        QUERIES["dedup_substring_strided"].fn(spark, SF_SMOKE), "simple"
    )
    assert "Join" not in text, text
    assert "BroadcastExchange" not in text, text
