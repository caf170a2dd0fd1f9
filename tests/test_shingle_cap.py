"""Stop-shingle doc-frequency cap: boilerplate must not explode the join.

A shingle shared by k documents materializes k² rows in the inverted-index
self-join — one viral boilerplate line ("subscribe to our newsletter ...")
in a web corpus turns the join into an unbounded skew hazard.  The cap
drops such shingles from the universe before the join; these tests pin

1. the candidate **collapse**: a corpus where every doc shares one
   boilerplate sentence produces all-pairs candidates uncapped, and only
   genuinely-overlapping pairs capped;
2. the **recall floor**: true near-dups (sharing many rare shingles) are
   still found at the default cap.
"""

from __future__ import annotations

from naive_query_engine_spark.operators.dedup import ngram_jaccard_pairs

N_DOCS = 30
BOILER = "subscribe to our newsletter for daily updates and exclusive offers today"


def _corpus(spark):
    rows = []
    for i in range(N_DOCS):
        # unique filler: no two docs share any non-boilerplate 3-gram
        filler = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((i, f"{BOILER} {filler}"))
    # one true near-dup pair sharing a long rare passage
    rare = "the quick brown fox jumps over the lazy dog near the river bank"
    rows.append((100, f"{rare} alpha beta gamma"))
    rows.append((101, f"{rare} alpha beta delta"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_candidates_collapse(spark):
    d = _corpus(spark)
    # threshold 0 exposes every pair the inverted index materializes
    uncapped = ngram_jaccard_pairs(d, threshold=0.0, max_df=10**6).count()
    capped = ngram_jaccard_pairs(d, threshold=0.0, max_df=10).count()
    # uncapped: the shared boilerplate alone links all 30 docs pairwise
    assert uncapped >= N_DOCS * (N_DOCS - 1) // 2
    # capped: the boilerplate shingles (df=30 > 10) leave the universe;
    # only the rare-passage pair remains
    assert capped == 1


def test_near_dups_survive_default_cap(spark):
    d = _corpus(spark)
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(d, max_df=10).collect()
    }
    assert (100, 101) in pairs
    assert pairs[(100, 101)] > 0.5
