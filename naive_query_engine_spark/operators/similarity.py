"""Similarity search over embedding columns (`array<float>`).

Determinism/portability design: embeddings are quantized to integers
(``floor(value * 1e6)`` — float→double is exact, the multiply and floor are
IEEE-deterministic) so every dot product and norm is **exact integer
arithmetic** in both Spark and the DuckDB oracle; the final cosine is a
single double division of identical operands.  No float-summation-order
hazard anywhere.

Scale paths:
- brute-force top-k: broadcast the (small) query set, stream the corpus —
  no shuffle until the final per-query top-k (TakeOrdered-style window).
- LSH buckets: sign-bit bucket on leading dimensions → candidate pairs only
  within a bucket (bounded fan-out; the 100 TB shape for pairwise work).
- vectorized Pandas-UDF path: identical results via Arrow-batched numpy
  matmul (integers < 2^53 are exact in float64) — the throughput variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query, t

QUANT = 1_000_000  # quantization scale; |v|<~100 keeps all sums << 2^53
COSINE_THRESHOLD = 0.8
N_QUERY_VECS = 5
TOP_K = 5
LSH_SIGN_BITS = 12


def quantized(col: Column) -> Column:
    """array<long>: floor(v * 1e6) per element — exact & engine-agnostic."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def cosine_q(dot: Column, na2: Column, nb2: Column) -> Column:
    """cosine from integer dot + squared norms (single double division)."""
    return dot.cast("double") / (F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double")))


def _qtable(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        quantized(F.col("embedding")).alias("q"),
    ).withColumn("nrm2", dot_q(F.col("q"), F.col("q")))


_Q_SQL = f"""
    e AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {QUANT}) AS BIGINT) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, SUM(v * v) AS nrm2 FROM e GROUP BY vec_id)
"""


@query(
    "similarity_cosine_pairs",
    oracle=f"""
    WITH {_Q_SQL},
    dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.v * b.v) AS dot
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm2 AS DOUBLE)) * SQRT(CAST(nb.nrm2 AS DOUBLE)))
             AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm2 AS DOUBLE)) * SQRT(CAST(nb.nrm2 AS DOUBLE)))
          >= {COSINE_THRESHOLD}
    """,
    tags=("similarity", "pipeline", "dedup"),
)
def similarity_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold, via blocked numpy
    matmul inside mapInPandas — each Arrow batch of vectors is multiplied
    against the (broadcast) corpus matrix, so the O(n²) work runs as n/batch
    parallel BLAS calls instead of an interpreted pairwise join.  Quantized
    integers are exact in float64 → identical cosines to the JVM/oracle
    formulation regardless of summation order.  At corpus sizes where even
    blocked n² is too much, use ``similarity_lsh_bucketed``."""
    import numpy as np
    import pandas as pd

    qt = _qtable(spark, sf_dir)
    rows = qt.select("vec_id", "q", "nrm2").collect()
    ids_all = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat_all = np.array([r["q"] for r in rows], dtype=np.float64)
    nrm_all = np.sqrt(np.array([r["nrm2"] for r in rows], dtype=np.float64))
    bc = spark.sparkContext.broadcast((ids_all, mat_all, nrm_all))

    def block_pairs(batches):
        b_ids, b_mat, b_nrm = bc.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            mat = np.asarray(list(pdf["q"]), dtype=np.float64)
            nrm = np.sqrt(pdf["nrm2"].to_numpy(dtype=np.float64))
            cos = (mat @ b_mat.T) / (nrm[:, None] * b_nrm[None, :])
            keep = (cos >= COSINE_THRESHOLD) & (ids[:, None] < b_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"vec_a": ids[ai], "vec_b": b_ids[bj], "cosine": cos[ai, bj]}
            )

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    return (
        qt.select("vec_id", "q", "nrm2")
        .repartition(n_parts)
        .mapInPandas(block_pairs, "vec_a long, vec_b long, cosine double")
    )


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH {_Q_SQL},
    dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < {N_QUERY_VECS} AND b.vec_id <> a.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) /
             (SQRT(CAST(na.nrm2 AS DOUBLE)) * SQRT(CAST(nb.nrm2 AS DOUBLE))) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = query_id
      JOIN norms nb ON nb.vec_id = neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "pipeline", "topk"),
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors, scan the
    corpus once, per-query top-k via ranking window."""
    from pyspark.sql import Window

    qt = _qtable(spark, sf_dir)
    queries = qt.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("nrm2").alias("nq2")
    )
    corpus = qt.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("qn"), F.col("nrm2").alias("nn2")
    )
    cos = cosine_q(dot_q(F.col("qq"), F.col("qn")), F.col("nq2"), F.col("nn2"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


def _sign_bucket_spark(col: Column) -> Column:
    return F.concat(
        *[
            F.when(F.element_at(col, i + 1) >= 0, "1").otherwise("0")
            for i in range(LSH_SIGN_BITS)
        ]
    )


def _sign_bucket_sql(col: str) -> str:
    return " || ".join(
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(LSH_SIGN_BITS)
    )


@query(
    "similarity_lsh_bucketed",
    oracle=f"""
    WITH buck AS (
      SELECT vec_id, {_sign_bucket_sql('embedding')} AS bucket FROM embeddings
    ),
    {_Q_SQL},
    cand AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM buck x JOIN buck y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    dots AS (
      SELECT c.vec_a, c.vec_b, SUM(a.v * b.v) AS dot
      FROM cand c
      JOIN e a ON a.vec_id = c.vec_a
      JOIN e b ON b.vec_id = c.vec_b AND b.i = a.i
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm2 AS DOUBLE)) * SQRT(CAST(nb.nrm2 AS DOUBLE)))
             AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm2 AS DOUBLE)) * SQRT(CAST(nb.nrm2 AS DOUBLE)))
          >= {COSINE_THRESHOLD}
    """,
    tags=("similarity", "pipeline", "lsh"),
)
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH bucketing (random-hyperplane-style, axis-aligned): only
    same-bucket vectors are compared — the bounded-fan-out ANN shape that
    replaces the O(n²) cross join at scale."""
    e = t(spark, sf_dir, "embeddings")
    buck = e.select("vec_id", _sign_bucket_spark(F.col("embedding")).alias("bucket"))
    qt = _qtable(spark, sf_dir)
    a = buck.alias("x").join(
        buck.alias("y"),
        (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vec_id") < F.col("y.vec_id")),
    ).select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
    qa = qt.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("nrm2").alias("na2"))
    qb = qt.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("nrm2").alias("nb2"))
    cos = cosine_q(dot_q(F.col("qa"), F.col("qb")), F.col("na2"), F.col("nb2"))
    return (
        a.join(qa, "vec_a")
        .join(qb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )


@query(
    "similarity_topk_vectorized",
    oracle=None,  # patched below to reuse the bruteforce oracle (must hash-match)
    tags=("similarity", "pipeline", "topk", "pandas-udf"),
)
def similarity_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as ``similarity_topk_bruteforce``, computed via an
    Arrow-batched ``mapInPandas`` numpy matmul — the vectorized throughput
    path.  Quantized integers stay < 2^53, so float64 matmul is exact and
    the output hash-matches the JVM-side variant (and its oracle)."""
    import pandas as pd

    from pyspark.sql import Window

    qt = _qtable(spark, sf_dir)
    queries = qt.filter(F.col("vec_id") < N_QUERY_VECS).select("vec_id", "q", "nrm2").collect()
    q_ids = [r["vec_id"] for r in queries]
    q_mat = [r["q"] for r in queries]
    q_n2 = [r["nrm2"] for r in queries]

    def score(batches):
        import numpy as np

        qm = np.asarray(q_mat, dtype=np.float64)
        qn = np.sqrt(np.asarray(q_n2, dtype=np.float64))
        for pdf in batches:
            nm = np.asarray(list(pdf["q"]), dtype=np.float64)
            nn = np.sqrt(np.asarray(pdf["nrm2"], dtype=np.float64))
            cos = (qm @ nm.T) / (qn[:, None] * nn[None, :])
            n_q, n_n = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": [q_ids[i] for i in range(n_q) for _ in range(n_n)],
                    "neighbor_id": list(pdf["vec_id"]) * n_q,
                    "cosine": cos.reshape(-1),
                }
            )

    scored = qt.select("vec_id", "q", "nrm2").mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


# the vectorized path must hash-match the JVM brute-force path → same oracle
import dataclasses as _dc  # noqa: E402

from ..queries import QUERIES as _Q  # noqa: E402

_Q["similarity_topk_vectorized"] = _dc.replace(
    _Q["similarity_topk_vectorized"], oracle=_Q["similarity_topk_bruteforce"].oracle
)


@query(
    "embedding_label_centroids",
    oracle=f"""
    WITH e AS (
      SELECT label,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {QUANT}) AS BIGINT) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    SELECT label, CAST(i AS BIGINT) AS dim,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) AS centroid_q
    FROM e GROUP BY label, i
    """,
    tags=("similarity", "pipeline", "centroid"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the (quantized) embeddings, one row per
    (label, dimension) — exact integer sums, single double division.
    This is the k-means/IVF building block: the coarse quantizer's
    centroid update is exactly this aggregation."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(quantized(F.col("embedding"))).alias("pos", "v"))
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        .agg((F.sum("v").cast("double") / F.count(F.lit(1))).alias("centroid_q"))
    )


@query(
    "similarity_ivf_topk",
    oracle=f"""
    WITH {_Q_SQL},
    cent AS (
      SELECT e2.label, e2.i, CAST(SUM(e2.v) AS DOUBLE) / COUNT(*) AS c
      FROM (SELECT m.label, q.v, q.i
            FROM e q JOIN embeddings m ON m.vec_id = q.vec_id) e2
      GROUP BY e2.label, e2.i
    ),
    -- assign each vector to its nearest centroid (exact arithmetic on
    -- quantized ints vs exact centroid doubles; tie-break lowest label)
    dists AS (
      SELECT e.vec_id, cent.label,
             SUM((CAST(e.v AS DOUBLE) - cent.c) * (CAST(e.v AS DOUBLE) - cent.c)) AS d2
      FROM e JOIN cent ON cent.i = e.i
      GROUP BY e.vec_id, cent.label
    ),
    assign AS (
      SELECT vec_id, label AS cell FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(ea.v * eb.v) AS dot
      FROM assign a
      JOIN assign b ON a.cell = b.cell AND b.vec_id <> a.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
      WHERE a.vec_id < {N_QUERY_VECS}
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE) /
             (SQRT(CAST(na.nrm2 AS DOUBLE)) * SQRT(CAST(nb.nrm2 AS DOUBLE))) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = query_id
      JOIN norms nb ON nb.vec_id = neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "pipeline", "ivf", "topk"),
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (the label centroids — in a real
    index, k-means centroids; the centroid-update step IS
    ``embedding_label_centroids``) assigns every vector to a cell; each
    query searches only its own cell.  Search cost drops from O(N) to
    O(N / n_cells) per query — the inverted-file structure that makes
    billion-vector search tractable.  Approximate by construction: a true
    neighbor in another cell is missed (nprobe=1)."""
    from pyspark.sql import Window

    qt = _qtable(spark, sf_dir).cache()
    # exact centroid per (label, dim) from quantized components
    cent = (
        qt.select("label", F.posexplode(F.col("q")).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg((F.sum("v").cast("double") / F.count(F.lit(1))).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("cs"))
        .select("label", F.transform(F.col("cs"), lambda s: s.c).alias("centroid"))
    )
    # nearest-centroid assignment (exact doubles; tie-break lowest label)
    d2 = F.aggregate(
        F.zip_with(
            F.col("q"), F.col("centroid"), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_assign = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    assign = (
        qt.crossJoin(F.broadcast(cent.select(F.col("label").alias("c_label"), "centroid")))
        .select("vec_id", "q", "nrm2", F.col("c_label"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", "nrm2", F.col("c_label").alias("cell"))
    )
    queries = assign.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm2").alias("nq2"),
        "cell",
    )
    cos = cosine_q(dot_q(F.col("qq"), F.col("qn")), F.col("nq2"), F.col("nn2"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        assign.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("qn"),
            F.col("nrm2").alias("nn2"),
            "cell",
        )
        .join(F.broadcast(queries), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )
