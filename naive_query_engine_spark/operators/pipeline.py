r"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (lang-ID, quality scoring, token counting,
fingerprint dedup) each carry their own oracle-checked query; this module
registers the COMPOSITION — the realistic pre-training data flow

    documents → language-ID → quality filter → exact dedup → per-language
    corpus summary

as one registered query, proving the pieces compose without breaking
determinism.  Every aggregate stays exact: counts and token sums are
integer; ratios are a single double division of integer sums (never a
float sum across rows, whose value depends on reduction order).

All per-doc expressions are built-in functions (JVM, whole-stage codegen);
the only shuffles are the dedup window (keyed by fingerprint) and the
final small per-language aggregation — at 100 TB that is one
hash-partitioned pass over the corpus plus a 5-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query, t
from .text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    fingerprint,
    predict_lang,
    tokens,
)

#: curation thresholds — tuned to the corpus shape (n_tok spans 10..99
#: with p10 ≈ 21): the length floor drops the bottom ~decile, the
#: punctuation ceiling is a no-op on this synthetic corpus but is the
#: filter a real web corpus needs most.
MIN_TOKENS = 20
MAX_PUNCT_RATIO = 0.1


def scored_filtered(d: DataFrame) -> DataFrame:
    """documents → per-doc curation columns (lang-ID, token/char/punct/BPE
    counts, content fingerprint) → quality filter.  Per-doc maps only —
    this is the expensive stage, and it commutes with batch splitting,
    which is what makes the curation pipeline incrementally mergeable
    (``pipeline_incremental_curation``)."""
    txt = F.col("text")
    toks = tokens(txt)
    scored = d.select(
        "doc_id",
        predict_lang(txt).alias("predicted_lang"),
        F.size(toks).cast("long").alias("n_tok"),
        F.length(txt).cast("long").alias("n_char"),
        F.size(F.regexp_extract_all(txt, F.lit(r"[^\w \t\n\r\f]"), 0)).cast("long").alias("n_punct"),
        bpe_ish_token_count(txt).alias("n_bpe"),
        fingerprint(txt).alias("fp"),
    )
    return scored.filter(
        (F.col("n_tok") >= MIN_TOKENS)
        & ((F.col("n_punct").cast("double") / F.col("n_char")) <= MAX_PUNCT_RATIO)
    )


def curate(d: DataFrame) -> DataFrame:
    """documents → per-doc curation columns → filter → exact-dedup.
    Returns the surviving docs with (doc_id, predicted_lang, n_tok,
    n_char, n_punct, n_bpe)."""
    kept = scored_filtered(d)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )


def _curation_oracle() -> str:
    score = {
        lang: (
            "CAST(LENGTH(list_filter(toks, x -> list_contains(["
            + ", ".join(f"'{w}'" for w in ws)
            + "], x))) AS BIGINT)"
        )
        for lang, ws in LANG_MARKERS.items()
    }
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    case = "CASE "
    for lang in LANG_MARKERS:  # first match wins ties == Spark priority order
        case += f"WHEN s_{lang} = {greatest} THEN '{lang}' "
    case += "END"
    selects = ",\n             ".join(f"{sql} AS s_{lang}" for lang, sql in score.items())
    return rf"""
    WITH tok AS (
      SELECT doc_id, text, regexp_split_to_array(LOWER(TRIM(text)), '[ \t\n\r\f]+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             {selects},
             CAST(LENGTH(toks) AS BIGINT) AS n_tok,
             CAST(LENGTH(text) AS BIGINT) AS n_char,
             CAST(LENGTH(regexp_extract_all(text, '[^\w \t\n\r\f]')) AS BIGINT) AS n_punct,
             CAST(LENGTH(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]')) AS BIGINT) AS n_bpe,
             MD5(TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM tok
    ),
    langed AS (
      SELECT *, CASE WHEN {greatest} = 0 THEN 'und' ELSE {case} END AS predicted_lang
      FROM scored
    ),
    kept AS (
      SELECT * FROM langed
      WHERE n_tok >= {MIN_TOKENS}
        AND CAST(n_punct AS DOUBLE) / n_char <= {MAX_PUNCT_RATIO}
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_doc_tokens,
           CAST(SUM(n_punct) AS DOUBLE) / SUM(n_char) AS corpus_punct_ratio
    FROM deduped
    GROUP BY predicted_lang
    """


@query(
    "pipeline_corpus_curation",
    oracle=_curation_oracle(),
    tags=("pipeline", "text", "dedup", "composition"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation flow: lang-ID → quality filter (length floor +
    punctuation ceiling) → exact dedup (min doc_id per fingerprint) →
    per-language corpus summary.  Ratios are single divisions of exact
    integer sums — no float summation anywhere."""
    d = t(spark, sf_dir, "documents")
    kept = curate(d)
    return kept.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_doc_tokens"),
        (F.sum("n_punct").cast("double") / F.sum("n_char")).alias("corpus_punct_ratio"),
    )


# ---------------------------------------------------------------------------
# batch model inference: the Arrow scoring-job shape


#: fixed linear "quality model" weights over the integer text features
#: (n_ws_tokens, n_bpe_tokens, n_punct, n_char) — in production these come
#: from a trained classifier; here they are literals so both engines score
#: identically in exact integer arithmetic.
MODEL_WEIGHTS = (3, 2, -5, 1)
TIER_HIGH = 700
TIER_MID = 400


@query(
    "pipeline_model_scoring",
    oracle=rf"""
    WITH f AS (
      SELECT doc_id,
             CAST(LENGTH(regexp_split_to_array(LOWER(TRIM(text)), '[ \t\n\r\f]+')) AS BIGINT) AS n_ws,
             CAST(LENGTH(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]')) AS BIGINT) AS n_bpe,
             CAST(LENGTH(regexp_extract_all(text, '[^\w \t\n\r\f]')) AS BIGINT) AS n_punct,
             CAST(LENGTH(text) AS BIGINT) AS n_char
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             {MODEL_WEIGHTS[0]} * n_ws + {MODEL_WEIGHTS[1]} * n_bpe
             + {MODEL_WEIGHTS[2]} * n_punct + {MODEL_WEIGHTS[3]} * n_char AS score
      FROM f
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CASE WHEN score >= {TIER_HIGH} THEN 'high'
                WHEN score >= {TIER_MID} THEN 'mid'
                ELSE 'low' END AS tier
    FROM s
    """,
    tags=("pipeline", "inference", "pandas-udf"),
)
def pipeline_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference — the Arrow scoring-job shape every curation
    pipeline runs at 100 TB: feature extraction stays JVM-side (built-in
    expressions, whole-stage codegen), then an ``mapInPandas`` kernel
    applies the model to Arrow record batches with numpy (here a fixed
    linear scorer; in production the same plumbing hosts an ONNX/sklearn
    classifier — weights ship to executors by closure capture, the batch
    matmul amortizes Python overhead across thousands of rows).  Integer
    features x integer weights keep the scores exact, so the pandas path
    hash-matches the oracle's SQL formulation bit-for-bit."""
    import pandas as _pd  # noqa: F401  (executors need it imported lazily)

    from .text import token_count

    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    feats = d.select(
        "doc_id",
        token_count(txt).alias("n_ws"),
        bpe_ish_token_count(txt).alias("n_bpe"),
        F.size(F.regexp_extract_all(txt, F.lit(r"[^\w \t\n\r\f]"), 0)).cast("long").alias("n_punct"),
        F.length(txt).cast("long").alias("n_char"),
    )
    weights = MODEL_WEIGHTS
    hi, mid = TIER_HIGH, TIER_MID

    def score_batches(batches):
        # closure (NOT module-level): pickles by value so bare-session
        # executors outside the repo cwd can run it — see SKILL.md gotcha
        import numpy as np

        for pdf in batches:
            x = pdf[["n_ws", "n_bpe", "n_punct", "n_char"]].to_numpy(dtype="int64")
            s = x @ np.array(weights, dtype="int64")
            out = pdf[["doc_id"]].copy()
            out["score"] = s
            out["tier"] = np.where(s >= hi, "high", np.where(s >= mid, "mid", "low"))
            yield out

    return feats.mapInPandas(score_batches, "doc_id long, score long, tier string")


MV_DELTA_MOD = 10  #: o_orderkey % 10 == MV_DELTA_REM plays the late-arriving batch
MV_DELTA_REM = 7


@query(
    "mv_incremental_refresh",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    tags=("pipeline", "incremental", "materialized-view", "aggregate"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh — the algebra every
    incremental pipeline (and Spark's own streaming agg state store)
    relies on: a monthly revenue MV maintained as MERGEABLE PARTIALS
    (count, decimal sum), refreshed by aggregating ONLY the late-arriving
    delta batch and union-merging partials by key.  Refresh cost is
    O(delta) + O(|MV|) — the base corpus is never rescanned, which is the
    whole point at 100 TB.  The oracle is the full recompute over all
    orders: merged partials must equal it EXACTLY, which only holds
    because both partials are algebraic (count, decimal sum) — the reason
    MVs store sum+count and derive avg, never store avg.  The delta split
    is keyed on o_orderkey (deterministic), standing in for an ingest
    watermark."""
    orders = t(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    is_delta = F.col("o_orderkey") % MV_DELTA_MOD == MV_DELTA_REM

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
        )

    mv = partials(orders.filter(~is_delta))  # the standing view's state
    delta = partials(orders.filter(is_delta))  # the arriving batch, pre-aggregated
    return (
        mv.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("cnt").cast("long").alias("order_cnt"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def curation_partials(batch: DataFrame) -> DataFrame:
    """One batch's mergeable curation state: per content fingerprint, the
    argmin-by-doc_id canonical document with its features, as a
    ``min(struct(doc_id, ...))`` aggregate — MIN is
    associative/commutative, so partial states from any batch split merge
    into exactly the full-corpus state."""
    kept = scored_filtered(batch)
    return kept.groupBy("fp").agg(
        F.min(
            F.struct(
                "doc_id", "predicted_lang", "n_tok", "n_char", "n_punct", "n_bpe"
            )
        ).alias("s")
    )


@query(
    "pipeline_incremental_curation",
    oracle=_curation_oracle(),
    tags=("pipeline", "text", "dedup", "composition", "incremental"),
)
def pipeline_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline run INCREMENTALLY — the mv_incremental_refresh
    law applied to the LLM-data flow: the corpus splits into a base batch
    and a delta batch (deterministic doc_id % 5), each batch pays the
    expensive per-doc stage (regex features, lang-ID, fingerprint) ONCE,
    and the per-fingerprint argmin-canonical states merge by another MIN —
    so ingesting a delta never re-curates the base corpus.  The oracle is
    the FULL single-pass recompute (``pipeline_corpus_curation``'s), which
    the merge must equal exactly: dedup-by-min is an algebraic aggregate,
    and the per-doc stage commutes with batching.  At 100 TB this is the
    difference between a nightly full rebuild and an O(delta) refresh of
    a maintained curated-state table (the persistent-index pattern
    ``dedup_incremental`` establishes for the near-dup path)."""
    d = t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 5 != 0)
    delta = d.filter(F.col("doc_id") % 5 == 0)
    merged = (
        curation_partials(base)
        .unionAll(curation_partials(delta))
        .groupBy("fp")
        .agg(F.min("s").alias("s"))
    )
    kept = merged.select("s.*")
    return kept.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_doc_tokens"),
        (F.sum("n_punct").cast("double") / F.sum("n_char")).alias("corpus_punct_ratio"),
    )
