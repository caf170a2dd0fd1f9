"""Leaf module: shared shingling constants + oracle-SQL fragment.

No package-internal imports — safe to import from any operator module in
any order (dedup and clustering both build their DuckDB oracle strings
from this at module-import time; importing it can never re-enter a
partially-initialized sibling)."""

JACCARD_THRESHOLD = 0.2

#: stop-shingle cutoff shared by the Spark operators and every oracle that
#: derives Jaccard edges: a shingle in more than this many documents is
#: boilerplate and is dropped BEFORE the inverted-index self-join (a
#: shingle shared by k docs fans out k² candidate rows — unbounded skew at
#: corpus scale).  Jaccard is computed over the capped universe on BOTH
#: engines, so results agree exactly; pairs whose only shared shingles are
#: boilerplate are deliberately missed (documented recall tradeoff).
MAX_SHINGLE_DF = 100

#: DuckDB CTE applying the cap (append after SHINGLES_SQL): `capped` is
#: the shingle relation every Jaccard consumer should join against.
#: r14: MATERIALIZED — referenced by cnt AND pair (and, in recursive
#: consumers, re-inlined per fixpoint iteration); DuckDB 1.0 inlines
#: plain CTEs, so without the fence every reference re-ran the whole
#: shingling chain.  Pure planner hint: results are bit-identical.
CAPPED_SHINGLES_SQL = f"""
    capped AS MATERIALIZED (
      SELECT s.doc_id, s.g
      FROM shingles s
      JOIN (SELECT g FROM shingles GROUP BY g
            HAVING COUNT(*) <= {MAX_SHINGLE_DF}) ok USING (g)
    )
"""

#: word-3-gram shingle CTEs over `documents` (DuckDB dialect)
SHINGLES_SQL = r"""
    tok AS (
      SELECT doc_id, regexp_split_to_array(LOWER(TRIM(text)), '[ \t\n\r\f]+') AS ts
      FROM documents
      WHERE LENGTH(regexp_split_to_array(LOWER(TRIM(text)), '[ \t\n\r\f]+')) >= 3
    ),
    words AS (
      SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i FROM tok
    ),
    shingles AS MATERIALIZED (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
      FROM words a
      JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      JOIN words c ON a.doc_id = c.doc_id AND c.i = a.i + 2
    )
"""

#: near-dup EDGE CTEs (append after SHINGLES_SQL): Jaccard >= threshold
#: pairs over the capped universe — the edge set every graph consumer
#: (components, keep-best, BFS, degree) derives from.  Lives here (leaf)
#: so oracle strings that splice it never re-enter a partially
#: initialized sibling module at import time.
EDGES_SQL = f"""
    {CAPPED_SHINGLES_SQL},
    cnt AS (SELECT doc_id, COUNT(*) AS n_g FROM capped GROUP BY doc_id),
    pair AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS shared
      FROM capped x JOIN capped y ON x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
      SELECT doc_a, doc_b FROM pair
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(shared AS DOUBLE) / (ca.n_g + cb.n_g - shared) >= {JACCARD_THRESHOLD}
    )
"""
