"""Driver-window rotation invariants (rotation.py is what decides which
queries the round driver correctness-checks — a name typo there would
silently shrink the window, so pin its contract)."""

from __future__ import annotations

from naive_query_engine_spark.queries import QUERIES
from naive_query_engine_spark.rotation import (
    DRIVER_SAMPLED,
    RESAMPLE_SLOTS,
    ROTATION,
    SENTINELS,
    WINDOW_SIZE,
    ordered_names,
    resample_names,
)


def test_ordering_is_a_permutation_of_the_registry():
    names = ordered_names()
    assert len(names) == len(QUERIES)
    assert set(names) == set(QUERIES)


def test_schedule_names_all_exist():
    for n in SENTINELS + ROTATION:
        assert n in QUERIES, n
    for n in DRIVER_SAMPLED:
        assert n in QUERIES, n


def test_window_shape():
    names = ordered_names()
    window = names[:WINDOW_SIZE]
    k = len(SENTINELS)
    # sentinels lead every window
    assert list(window[:k]) == list(SENTINELS)
    # then the rotating re-check slots (ADVICE r5 #1): already-green,
    # not sentinels, deterministic
    resample = window[k : k + RESAMPLE_SLOTS]
    assert list(resample) == list(resample_names())
    for n in resample:
        assert n in DRIVER_SAMPLED and n not in SENTINELS, n
    # the rest of the window is never-driver-sampled work — until the
    # rotation queue is EXHAUSTED (r10: the backlog is smaller than the
    # fresh-slot count), after which already-green tail names may pad
    # the window; no never-sampled name may sit behind a sampled one
    fresh = window[k + RESAMPLE_SLOTS :]
    queue_left = {n for n in ROTATION if n not in DRIVER_SAMPLED}
    seen_sampled = False
    for n in fresh:
        if n in DRIVER_SAMPLED:
            seen_sampled = True
        else:
            assert not seen_sampled, n
    assert queue_left <= set(fresh)
    # every window entry carries a full oracle (rows+schema+hash check)
    for n in window:
        assert QUERIES[n].oracle is not None, n


def test_resample_slots_are_deterministic_and_valid():
    a, b = resample_names(), resample_names()
    assert a == b
    assert len(a) == RESAMPLE_SLOTS == len(set(a))
    for n in a:
        assert n in QUERIES and QUERIES[n].oracle is not None, n


def test_rotation_has_no_duplicates():
    assert len(ROTATION) == len(set(ROTATION))
    assert not (set(ROTATION) & set(SENTINELS))
