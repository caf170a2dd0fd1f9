"""Hybrid retrieval: reciprocal-rank fusion of lexical and dense search.

Production search is rarely one retriever: BM25 (sparse/lexical, exact
token match) and embedding cosine (dense/semantic) fail differently, and
the standard zero-tuning combiner is RECIPROCAL-RANK FUSION
(Cormack/Clarke/Buettcher, SIGIR'09): score(d) = Σ_lists 1/(k + rank_d),
k=60.  Rank-based fusion needs no score calibration between lists —
exactly why it's the default in hybrid vector+keyword search engines.

The corpus links the two modalities by construction: ``embeddings.vec_id``
is aligned 1:1 with ``documents.doc_id`` (same 0-based key space), so the
BM25 list for query doc q and the cosine list for query vec q rank the
same entity space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import QUERIES, query, t

# importing for registration side effects AND to compose their oracle SQL;
# these imports also guarantee registry order (text/similarity register
# before this module's oracle string is built)
from . import similarity as _similarity  # noqa: F401
from . import text as _text  # noqa: F401

RRF_K = 60  # the SIGIR'09 constant
RRF_FP = 1_000_000_000  # fixed-point scale for the fused score
FUSED_TOP_K = 5


def _fusion_oracle() -> str:
    lex = QUERIES["text_bm25_topk"].oracle
    den = QUERIES["similarity_topk_bruteforce"].oracle
    return f"""
    SELECT query_id, neighbor_id, lex_rank, dense_rank, rrf_fp,
           CAST(fused_rnk AS BIGINT) AS fused_rnk
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_fp DESC, neighbor_id) AS fused_rnk
      FROM (
        SELECT COALESCE(lex.query_id, den.query_id) AS query_id,
               COALESCE(lex.neighbor_id, den.neighbor_id) AS neighbor_id,
               CAST(lex.rnk AS BIGINT) AS lex_rank,
               CAST(den.rnk AS BIGINT) AS dense_rank,
               CAST(FLOOR({RRF_FP} * (
                 COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + lex.rnk), 0)
                 + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + den.rnk), 0)
               )) AS BIGINT) AS rrf_fp
        FROM ({lex}) lex
        FULL OUTER JOIN ({den}) den
          ON lex.query_id = den.query_id AND lex.neighbor_id = den.neighbor_id
      )
    )
    WHERE fused_rnk <= {FUSED_TOP_K}
    """


@query(
    "retrieval_rrf_fusion",
    oracle=_fusion_oracle(),
    tags=("retrieval", "hybrid", "rrf", "pipeline", "topk"),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: the BM25 lexical top-k and the brute-force cosine
    dense top-k for the SAME five query entities, fused by reciprocal
    rank — the composition that makes the sparse and dense retrieval
    families one system.

    Determinism: ranks are exact BIGINTs from both source operators, so
    the fused score is two reciprocal terms added in one fixed IEEE
    expression, floored to fixed-point before ranking; ties break on
    neighbor_id.  Scale shape: fusion costs a (queries × top-k)-bounded
    full outer join over two frames that are already tiny — ALL corpus
    scale lives inside the two source operators, each already
    probed/benched on its own (BM25's inverted-index probe, the
    broadcast-query cosine scan)."""
    lex = QUERIES["text_bm25_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rnk").alias("lex_rank")
    )
    den = QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rnk").alias("dense_rank")
    )
    fused = lex.join(den, ["query_id", "neighbor_id"], "full_outer")
    rrf = F.floor(
        F.lit(RRF_FP)
        * (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
            )
        )
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_fp").desc(), F.col("neighbor_id")
    )
    return (
        fused.select(
            "query_id",
            "neighbor_id",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
            rrf.alias("rrf_fp"),
        )
        .withColumn("fused_rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rnk") <= FUSED_TOP_K)
    )


# ---------------------------------------------------------------------------
# retrieval quality evaluation: MRR / NDCG@k / precision@k

EVAL_FP = 1_000_000_000  #: fixed-point scale for reciprocal-rank / DCG gains


def _eval_oracle() -> str:
    from .text import BM25_N_QUERY_DOCS, BM25_TOP_K

    lex = QUERIES["text_bm25_topk"].oracle
    gain = f"CAST(FLOOR({EVAL_FP} / ROUND(LOG2(CAST({{r}} + 1 AS DOUBLE)), 9)) AS BIGINT)"
    return f"""
    WITH lex AS ({lex}),
    qsrc AS (SELECT doc_id, lang FROM documents),
    scount AS (SELECT lang, COUNT(*) AS sc FROM documents GROUP BY lang),
    labeled AS (
      SELECT l.query_id, l.rnk,
             CASE WHEN nq.lang = ns.lang THEN 1 ELSE 0 END AS rel
      FROM lex l
      JOIN qsrc nq ON nq.doc_id = l.query_id
      JOIN qsrc ns ON ns.doc_id = l.neighbor_id
    ),
    per AS (
      SELECT query_id,
             CAST(COUNT(*) AS BIGINT) AS n_retrieved,
             CAST(SUM(rel) AS BIGINT) AS n_rel_topk,
             CAST(MIN(CASE WHEN rel = 1 THEN rnk END) AS BIGINT) AS first_rel_rank,
             CAST(SUM(CASE WHEN rel = 1 THEN {gain.format(r="rnk")} ELSE 0 END)
                  AS BIGINT) AS dcg_fp
      FROM labeled GROUP BY query_id
    ),
    tot AS (
      SELECT q.doc_id AS query_id, s.sc - 1 AS n_rel_total
      FROM qsrc q JOIN scount s ON s.lang = q.lang
      WHERE q.doc_id < {BM25_N_QUERY_DOCS}
    ),
    ranks AS (SELECT UNNEST(range(1, {BM25_TOP_K} + 1)) AS i),
    ideal AS (
      SELECT tot.query_id,
             CAST(SUM({gain.format(r="i")}) AS BIGINT) AS idcg_fp
      FROM tot CROSS JOIN ranks
      WHERE ranks.i <= LEAST(tot.n_rel_total, {BM25_TOP_K})
      GROUP BY tot.query_id
    )
    SELECT per.query_id, per.n_retrieved, per.n_rel_topk, per.first_rel_rank,
           COALESCE(CAST(FLOOR({EVAL_FP} / CAST(per.first_rel_rank AS DOUBLE))
                         AS BIGINT), 0) AS rr_fp,
           per.dcg_fp, ideal.idcg_fp,
           CAST(per.dcg_fp AS DOUBLE) / ideal.idcg_fp AS ndcg_at_k,
           CAST(per.n_rel_topk AS DOUBLE) / per.n_retrieved AS precision_at_k
    FROM per JOIN ideal ON ideal.query_id = per.query_id
    """


@query(
    "retrieval_eval_mrr_ndcg",
    oracle=_eval_oracle(),
    tags=("retrieval", "evaluation", "mrr", "ndcg", "pipeline"),
)
def retrieval_eval_mrr_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION over the BM25 top-k: per query, the
    reciprocal rank of the first relevant hit (MRR's summand), DCG and
    ideal-DCG at k, NDCG@k, and precision@k — the metric layer that
    closes the retrieval loop (build index → retrieve → fuse →
    EVALUATE).  Relevance label: neighbor shares the query document's
    LANGUAGE — the weak-supervision label that is actually meaningful
    for a LEXICAL retriever (shared vocabulary should surface
    same-language content; a cross-language hit is token noise).  A
    same-SOURCE label was tried first and measured VACUOUS on this
    corpus (zero hits in every top-5 — sources don't shape vocabulary
    here); lang yields 3/1/2/0/0 relevant hits across the five queries,
    so every metric is exercised including the no-hit rows.  The ideal DCG
    honors the NDCG@k convention: gains for min(true #relevant, k)
    positions, with the TRUE per-query relevant count computed
    corpus-wide (source size − 1), not from the retrieved page.

    Determinism: ranks are exact ints from the BM25 operator; each gain
    1/log2(rank+1) is one libm log2 ROUNDed to 9 decimals then floored
    to EVAL_FP fixed point (the math_funcs discipline), so DCG/IDCG are
    exact integer sums and NDCG/precision are single divisions of
    identical numbers.  Scale shape: all corpus cost lives in the BM25
    operator (already probed); everything here is (queries × k)-bounded
    plus one source-cardinality aggregate."""
    from .text import BM25_N_QUERY_DOCS, BM25_TOP_K

    d = t(spark, sf_dir, "documents")
    lex = QUERIES["text_bm25_topk"].fn(spark, sf_dir)
    qsrc = d.select("doc_id", "lang")
    scount = d.groupBy("lang").agg(F.count(F.lit(1)).alias("sc"))
    labeled = (
        lex.join(
            qsrc.select(F.col("doc_id").alias("query_id"), F.col("lang").alias("qs")),
            "query_id",
        )
        .join(
            qsrc.select(
                F.col("doc_id").alias("neighbor_id"), F.col("lang").alias("ns")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rnk",
            F.when(F.col("qs") == F.col("ns"), 1).otherwise(0).alias("rel"),
        )
    )

    def gain(r):
        return F.floor(
            F.lit(float(EVAL_FP)) / F.round(F.log2((r + 1).cast("double")), 9)
        ).cast("long")

    per = labeled.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum("rel").cast("long").alias("n_rel_topk"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).cast("long").alias(
            "first_rel_rank"
        ),
        F.sum(F.when(F.col("rel") == 1, gain(F.col("rnk"))).otherwise(0))
        .cast("long")
        .alias("dcg_fp"),
    )
    tot = (
        qsrc.filter(F.col("doc_id") < BM25_N_QUERY_DOCS)
        .join(scount, "lang")
        .select(F.col("doc_id").alias("query_id"), (F.col("sc") - 1).alias("n_rel_total"))
    )
    ranks = spark.range(1, BM25_TOP_K + 1).select(F.col("id").alias("i"))
    ideal = (
        tot.crossJoin(F.broadcast(ranks))
        .filter(F.col("i") <= F.least(F.col("n_rel_total"), F.lit(BM25_TOP_K)))
        .groupBy("query_id")
        .agg(F.sum(gain(F.col("i"))).cast("long").alias("idcg_fp"))
    )
    rr = F.coalesce(
        F.floor(F.lit(float(EVAL_FP)) / F.col("first_rel_rank").cast("double")).cast(
            "long"
        ),
        F.lit(0).cast("long"),
    )
    return per.join(ideal, "query_id").select(
        "query_id",
        "n_retrieved",
        "n_rel_topk",
        "first_rel_rank",
        rr.alias("rr_fp"),
        "dcg_fp",
        "idcg_fp",
        (F.col("dcg_fp").cast("double") / F.col("idcg_fp")).alias("ndcg_at_k"),
        (F.col("n_rel_topk").cast("double") / F.col("n_retrieved")).alias(
            "precision_at_k"
        ),
    )
