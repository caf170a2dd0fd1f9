"""Fixed-point power iteration: bit-exactness and variational sanity.

The registered query's contract is the exact RECURRENCE — "PC_ITERS
max-normalized fixed-point steps from the all-ones start over the exact
integer Gram" — not convergence to machine precision (the rate is
(λ2/λ1)^k and this corpus's spectrum is nearly flat: λ2/λ1 ≈ 0.93, so
six steps give a top-eigenspace mix, which the docstring documents).
This test therefore pins:

1. BIT-EXACT equality with an independent numpy simulation of the same
   recurrence (catches any engine-side arithmetic drift), and
2. the variational bounds: Rayleigh(v6) ≤ λ1 (always true for any v)
   and Rayleigh(v6) strictly above Rayleigh(v0) and ≥ 0.8·λ1 — the
   iteration demonstrably climbs toward the top of the spectrum.
"""

from __future__ import annotations

import numpy as np

from naive_query_engine_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_power_iteration_bit_exact_and_climbing(spark):
    from naive_query_engine_spark.operators.similarity import (
        PC_ITERS,
        PC_SCALE,
        QUANT,
    )

    rows = (
        QUERIES["embedding_top_pc_power_iteration"].fn(spark, SF_SMOKE).collect()
    )
    assert len(rows) == 64
    got = np.zeros(64)
    lam = None
    for r in rows:
        got[r["dim"]] = r["pc_fixed"]
        lam = r["eigenvalue"]

    import pandas as pd

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")["embedding"]
    V = np.stack(emb.to_numpy())
    Q = np.floor(V.astype("float64") * QUANT)
    G = Q.T @ Q  # exact: entries << 2^63 at smoke scale

    # independent simulation of the exact recurrence (float64 is exact
    # here: every intermediate stays below 2^53 only for the normalized
    # vector ops — use object/int64 for the matvec to be safe)
    v = np.full(64, PC_SCALE, dtype=object)
    Gi = G.astype("int64").astype(object)
    for _ in range(PC_ITERS):
        u = Gi @ v
        m = max(abs(x) for x in u)
        v = np.array(
            [int(np.floor((float(x) / float(m)) * float(PC_SCALE))) for x in u],
            dtype=object,
        )
    want = np.array([float(x) for x in v])
    assert np.array_equal(got, want), (got[:5], want[:5])

    uf = Gi @ v
    num = sum(int(a) * int(b) for a, b in zip(v, uf))
    den = sum(int(a) * int(a) for a in v)
    assert lam == float(num) / float(den)

    # variational sanity: the quotient climbs and is bounded by λ1
    w = np.linalg.eigvalsh(G)
    lam1 = w[-1]
    ones = np.full(64, 1.0)
    ray0 = (ones @ G @ ones) / (ones @ ones)
    assert ray0 < lam <= lam1 * (1 + 1e-12), (ray0, lam, lam1)
    assert lam >= 0.8 * lam1, (lam, lam1)
