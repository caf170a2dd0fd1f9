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

from ..queries import QUERIES, query

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
