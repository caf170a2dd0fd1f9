"""JSONL source round-trip: the interchange format of training corpora.

Spark's json reader/writer is newline-delimited by default — write a
slice of the documents table as JSONL, read it back with an explicit
schema (schema-on-read; inference only as fallback), and the round-trip
must be lossless.
"""

from __future__ import annotations

from naive_query_engine_spark.queries import t
from naive_query_engine_spark.sources import read_json

from .conftest import SF_SMOKE

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_round_trip(spark, tmp_path):
    out = str(tmp_path / "docs-jsonl")
    d = t(spark, SF_SMOKE, "documents").orderBy("doc_id").limit(100)
    d.write.mode("overwrite").json(out)

    back = read_json(spark, out, schema=DOC_SCHEMA)
    assert back.count() == 100
    orig = {r["doc_id"]: r for r in d.collect()}
    for r in back.collect():
        o = orig[r["doc_id"]]
        assert (r["text"], r["lang"], r["source"], r["n_chars"]) == (
            o["text"], o["lang"], o["source"], o["n_chars"]
        )


def test_jsonl_schema_on_read_prunes_columns(spark, tmp_path):
    """Reading with a narrower schema = column pruning at parse time —
    absent fields come back null, extra fields are skipped, no error."""
    out = str(tmp_path / "docs-jsonl-narrow")
    t(spark, SF_SMOKE, "documents").limit(10).write.mode("overwrite").json(out)
    narrow = read_json(spark, out, schema="doc_id long, lang string")
    rows = narrow.collect()
    assert len(rows) == 10
    assert set(narrow.columns) == {"doc_id", "lang"}
    assert all(r["lang"] is not None for r in rows)
