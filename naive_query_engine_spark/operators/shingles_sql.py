"""Leaf module: shared shingling constants + oracle-SQL fragment.

No package-internal imports — safe to import from any operator module in
any order (dedup and clustering both build their DuckDB oracle strings
from this at module-import time; importing it can never re-enter a
partially-initialized sibling)."""

JACCARD_THRESHOLD = 0.2

#: word-3-gram shingle CTEs over `documents` (DuckDB dialect)
SHINGLES_SQL = r"""
    tok AS (
      SELECT doc_id, regexp_split_to_array(LOWER(TRIM(text)), '\s+') AS ts
      FROM documents
      WHERE LENGTH(regexp_split_to_array(LOWER(TRIM(text)), '\s+')) >= 3
    ),
    words AS (
      SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i FROM tok
    ),
    shingles AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
      FROM words a
      JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      JOIN words c ON a.doc_id = c.doc_id AND c.i = a.i + 2
    )
"""
