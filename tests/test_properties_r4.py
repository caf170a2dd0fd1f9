"""Property-based tests for the round-4 operators: each pins an invariant
against a plain-Python model on arbitrary small inputs (example counts low
— each example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
    n_parts=st.integers(1, 9),
)
@SET
def test_global_rank_is_exact_total_order_rank(spark, vals, n_parts):
    """global_rank == the position in the sorted order, for any partition
    count — including n_parts larger than the row count (empty range
    partitions must not shift the offsets)."""
    from naive_query_engine_spark.operators.layout import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    ranked, total = global_rank(df, ["v", "id"], "rn", n_parts=n_parts)
    assert total == len(rows)
    got = {r["id"]: r["rn"] for r in ranked.collect()}
    want = {id_: pos for pos, (v, id_) in enumerate(sorted((v, i) for i, v in rows))}
    assert got == want


@given(
    n_tok=st.integers(0, 700),
)
@SET
def test_chunking_covers_every_token_once_per_stride(spark, n_tok):
    """Every token index lands in >= 1 chunk; chunk starts advance by
    exactly the stride; the final chunk ends at n_tok; a short/empty doc
    still yields one chunk."""
    from naive_query_engine_spark.operators.quality import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        dataset_chunk_documents,
    )
    import naive_query_engine_spark.operators.quality as q

    text = " ".join(f"w{i}" for i in range(n_tok))
    df = spark.createDataFrame(
        [(1, text, "en", "src", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # drive the operator body directly on a synthetic one-doc frame
    import naive_query_engine_spark.queries as qq

    orig_t = qq.t
    try:
        qq.t = lambda spark_, sf_dir_, name_: df  # noqa: E731
        q_t = q.t
        q.t = qq.t
        out = sorted(
            (r["chunk_id"], r["start_tok"], r["chunk_tokens"])
            for r in dataset_chunk_documents(spark, "ignored").collect()
        )
    finally:
        qq.t = orig_t
        q.t = q_t
    # Spark's split on "" yields one empty token — the model's floor
    n_model = max(n_tok, 1)
    covered = set()
    for cid, start, clen in out:
        assert start == cid * CHUNK_STRIDE
        assert clen >= 1
        covered.update(range(start, start + clen))
    assert covered == set(range(n_model))
    assert out[0][0] == 0  # chunk ids start at 0
    assert [c for c, _, _ in out] == list(range(len(out)))  # dense ids


@given(
    vecs=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=3,
        max_size=25,
        unique=True,
    ),
    k=st.integers(2, 4),
)
@SET
def test_kmeans_assignment_is_argmin(spark, vecs, k):
    """After the full Lloyd loop, every vector's assigned cluster is the
    distance-argmin over the SURVIVING centroid set under the lowest-id
    tie-break (verified by recomputing centroids from the assignment)."""
    from naive_query_engine_spark.operators.kmeans import (
        lloyd_kmeans,
        train_centroids,
    )
    from naive_query_engine_spark.queries import cut_lineage, spread

    k = min(k, len(vecs))
    rows = [(i, list(v)) for i, v in enumerate(vecs)]
    qf = spark.createDataFrame(rows, "vec_id long, q array<long>")
    cents = train_centroids(cut_lineage(spread(qf)), k=k, iters=3)
    out = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in
           lloyd_kmeans(qf, k=k, iters=3).collect()}
    for vid, vec in rows:
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(vec, c)), j)
            for j, c in cents.items()
        )
        best_d, best_j = dists[0]
        got_j, got_d = out[vid]
        assert got_d == best_d
        assert got_j == best_j


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),  # (user, day)
        min_size=1,
        max_size=40,
    ),
)
@SET
def test_activity_islands_matches_python_runs(spark, events):
    """n_islands / max_streak match a plain-Python consecutive-run scan."""
    import datetime

    rows = [
        (i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d))
        for i, (u, d) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    days = df.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("island", F.date_sub(F.col("d"), F.row_number().over(w)))
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    got = {
        r["user_id"]: (r["n"], r["mx"])
        for r in runs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("run_len").alias("mx"))
        .collect()
    }
    want = {}
    by_user: dict[int, set[int]] = {}
    for u, d in events:
        by_user.setdefault(u, set()).add(d)
    for u, ds in by_user.items():
        sd = sorted(ds)
        n_runs, longest, cur = 1, 1, 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                n_runs += 1
                cur = 1
            longest = max(longest, cur)
        want[u] = (n_runs, longest)
    assert got == want


@given(
    toks=st.lists(
        st.sampled_from(["aa", "bb", "cc", "ab"]), min_size=2, max_size=30
    ),
)
@SET
def test_bpe_encode_replace_chain_matches_python(spark, toks):
    """The encode rewrite (sequential leftmost-non-overlapping replaces)
    equals Python str.replace applied in the same merge order."""
    merges = [("ab", "\x01"), ("aa", "\x02")]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    enc = F.col("tok")
    for pat, ph in merges:
        enc = F.replace(enc, F.lit(pat), F.lit(ph))
    got = sorted(r["e"] for r in df.select(enc.alias("e")).collect())
    want = sorted(
        t.replace("ab", "\x01").replace("aa", "\x02") for t in toks
    )
    assert got == want


def test_pmi_survives_single_token_and_empty_docs(spark):
    """Regression: Spark's sequence(1, 0) is DESCENDING [1, 0] (default
    step -1), so an unguarded pair expansion over a 1-token doc threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT while the DuckDB oracle's empty
    generate_series silently returned no pairs."""
    from naive_query_engine_spark.queries import QUERIES  # noqa: F401 — registry init first

    import naive_query_engine_spark.operators.text as tx
    import naive_query_engine_spark.queries as qq

    df = spark.createDataFrame(
        [(1, "word", "en", "s", 4), (2, "", "en", "s", 0),
         (3, "a b " * 30, "en", "s", 120)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig, orig_tx = qq.t, tx.t
    qq.t = lambda s_, d_, n_: df  # noqa: E731
    tx.t = qq.t
    try:
        # min-support filtered out for the tiny frame via direct pieces:
        out = tx.text_adjacent_pmi_top(spark, "ignored").collect()
    finally:
        qq.t, tx.t = orig, orig_tx
    pairs = {(r["tok_a"], r["tok_b"]) for r in out}
    assert ("a", "b") in pairs  # the repeated bigram survives min-support


@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_prefix_primitives_match_local_scan(spark, vals, n_parts):
    """distributed_prefix_sums / distributed_prefix_max equal a
    single-threaded scan for ANY data and partition count — the
    range-partition + offset machinery must be invisible."""
    from naive_query_engine_spark.operators.layout import (
        distributed_prefix_max,
        distributed_prefix_sums,
    )
    from pyspark.sql import functions as F

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    got_sum = {
        r["k"]: r["v_cum"]
        for r in distributed_prefix_sums(df, [F.col("k")], ["v"], n_parts=n_parts)
        .collect()
    }
    got_max = {
        r["k"]: r["pm"]
        for r in distributed_prefix_max(df, [F.col("k")], "v", "pm", n_parts=n_parts)
        .collect()
    }
    acc, best = 0, None
    for k, v in rows:
        acc += v
        assert got_sum[k] == acc
        assert got_max[k] == best  # EXCLUSIVE: best BEFORE this row
        best = v if best is None or v > best else best
