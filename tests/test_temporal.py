"""asof_join / range_join semantics (operators/temporal.py).

Hand-computable fixtures pin: backward/forward direction, inclusive
boundaries, tie-breaks on duplicate right timestamps, tolerance
windows, unmatched-left null behavior, and that every matched column
comes from the SAME right row. The sf0.01 gate queries (events_asof,
events_window_join, events_rollup) pin the same semantics hash-exact
against DuckDB LATERAL / inequality-join / ROLLUP oracles.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from entity_resolution__spark.operators.temporal import asof_join, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 101, _ts("2024-01-01 10:00:00")),
            (1, 102, _ts("2024-01-01 12:00:00")),
            (2, 201, _ts("2024-01-01 09:00:00")),  # before any right row
            (3, 301, _ts("2024-01-01 10:00:00")),  # key absent on right
        ],
        "k long, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 11, _ts("2024-01-01 10:00:00"), 1.0),  # ties lid=101 exactly
            (1, 12, _ts("2024-01-01 10:00:00"), 2.0),  # same ts — tiebreak
            (1, 13, _ts("2024-01-01 11:30:00"), 3.0),
            (2, 21, _ts("2024-01-01 09:30:00"), 4.0),
        ],
        "k long, rid long, ts timestamp, v double",
    )
    return left, right


def _rows(df):
    return {r["lid"]: r.asDict() for r in df.collect()}


def test_asof_backward_inclusive_and_tiebreak(sides):
    left, right = sides
    out = _rows(asof_join(left, right, on=["k"], tiebreak="rid"))
    # equal-ts right rows are eligible (inclusive); among the two rows
    # at 10:00 the GREATER rid wins
    assert out[101]["rid_matched"] == 12 and out[101]["v_matched"] == 2.0
    # most recent prior, not just any prior
    assert out[102]["rid_matched"] == 13
    # left row before all right rows for its key -> null
    assert out[201]["rid_matched"] is None
    # key with no right rows at all -> null
    assert out[301]["rid_matched"] is None
    # matched ts comes from the same row as the payload
    assert out[102]["ts_matched"] == _ts("2024-01-01 11:30:00")


def test_asof_forward_and_tolerance(sides):
    left, right = sides
    fwd = _rows(asof_join(left, right, on=["k"], tiebreak="rid", direction="forward"))
    # inclusive forward: the 10:00 tie is eligible; LEAST rid wins
    assert fwd[101]["rid_matched"] == 11
    assert fwd[102]["rid_matched"] is None  # nothing at/after 12:00
    assert fwd[201]["rid_matched"] == 21
    # tolerance: 102's backward match (11:30) is 30 min away — a 10-min
    # bound nulls it while 101's exact-tie match (0 s away) survives
    tol = _rows(
        asof_join(left, right, on=["k"], tiebreak="rid", tolerance_sec=600)
    )
    assert tol[102]["rid_matched"] is None
    assert tol[101]["rid_matched"] == 12


def test_asof_right_cols_subset(sides):
    left, right = sides
    out = asof_join(left, right, on=["k"], tiebreak="rid", right_cols=["rid"])
    # ts is force-included (needed for tolerance/inspection); v is not
    assert set(out.columns) == {"k", "lid", "ts", "ts_matched", "rid_matched"}


def test_asof_rejects_bad_direction(sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], direction="nearest")


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], "k long, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 08:59:59.999999")),  # 1 us outside
            (1, 11, _ts("2024-01-01 09:00:00")),  # exactly on lower bound
            (1, 12, _ts("2024-01-01 09:30:00")),
            (1, 13, _ts("2024-01-01 10:00:00")),  # exactly on upper bound
            (1, 14, _ts("2024-01-01 10:00:00.000001")),  # 1 us outside
            (2, 20, _ts("2024-01-01 09:30:00")),  # wrong key
        ],
        "k long, rid long, ts timestamp",
    )
    out = range_join(left, right, on=["k"], lower_sec=-3600, upper_sec=0)
    assert sorted(r["r_rid"] for r in out.collect()) == [11, 12, 13]


def test_range_join_no_dup_across_bins(spark):
    # a window wider than the bin span would duplicate pairs if the
    # left side's bin explosion overlapped the right's single bin more
    # than once — sequence() bins are distinct so each pair appears once
    left = spark.createDataFrame(
        [(1, i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=10 * i)) for i in range(12)],
        "k long, lid long, ts timestamp",
    )
    out = range_join(left, left.withColumnRenamed("lid", "rid"), on=["k"],
                     lower_sec=-1800, upper_sec=1800)
    n = out.count()
    assert out.dropDuplicates(["l_lid", "r_rid"]).count() == n
    # sanity: each row matches itself plus ±3 ten-minute neighbors
    # (inclusive window), truncated at the ends
    assert n == sum(
        len([j for j in range(12) if abs(j - i) <= 3]) for i in range(12)
    )


def test_range_join_rejects_inverted_window(spark):
    df = spark.createDataFrame([(1, 1, _ts("2024-01-01 00:00:00"))],
                               "k long, lid long, ts timestamp")
    with pytest.raises(ValueError):
        range_join(df, df, on=["k"], lower_sec=10, upper_sec=-10)


# ---------------------------------------------------------------------------
# property tests: random event streams vs brute-force oracles
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_EPOCH = _ts("2024-01-01 00:00:00")

# (key, offset-seconds) streams; duplicate (key, ts) pairs allowed on
# both sides so tie-break paths get generated
_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=0, max_size=25
)


def _brute_asof(left, right, direction, tolerance=None):
    """Brute-force per-left-row scan: eligible right rows by key +
    direction (+ tolerance), winner = nearest ts with greatest rid on
    backward ties / least rid on forward ties."""
    out = {}
    for lid, (k, lt) in enumerate(left):
        cands = []
        for rid, (rk, rt) in enumerate(right):
            if rk != k:
                continue
            if direction == "backward" and rt <= lt:
                if tolerance is None or lt - rt <= tolerance:
                    cands.append((rt, rid))
            if direction == "forward" and rt >= lt:
                if tolerance is None or rt - lt <= tolerance:
                    cands.append((rt, rid))
        if not cands:
            out[lid] = None
        elif direction == "backward":
            out[lid] = max(cands)[1]  # max ts, then max rid
        else:
            out[lid] = min(cands)[1]  # min ts, then min rid
    return out


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events,
       direction=st.sampled_from(["backward", "forward"]),
       tolerance=st.sampled_from([None, 60]))
def test_asof_matches_bruteforce(spark, left, right, direction, tolerance):
    import datetime as dt

    ldf = spark.createDataFrame(
        [(k, i, _EPOCH + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "k long, lid long, ts timestamp",
    ) if left else spark.createDataFrame([], "k long, lid long, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, i, _EPOCH + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(right)],
        "k long, rid long, ts timestamp",
    ) if right else spark.createDataFrame([], "k long, rid long, ts timestamp")
    got = {
        r["lid"]: r["rid_matched"]
        for r in asof_join(
            ldf, rdf, on=["k"], tiebreak="rid", direction=direction,
            tolerance_sec=tolerance, right_cols=["rid"],
        ).collect()
    }
    assert got == _brute_asof(left, right, direction, tolerance)


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events,
       lo=st.integers(-120, 0), width=st.integers(0, 200))
def test_range_join_matches_bruteforce(spark, left, right, lo, width):
    import datetime as dt

    hi = lo + width
    ldf = spark.createDataFrame(
        [(k, i, _EPOCH + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "k long, lid long, ts timestamp",
    ) if left else spark.createDataFrame([], "k long, lid long, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, i, _EPOCH + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(right)],
        "k long, rid long, ts timestamp",
    ) if right else spark.createDataFrame([], "k long, rid long, ts timestamp")
    got = {
        (r["l_lid"], r["r_rid"])
        for r in range_join(
            ldf, rdf, on=["k"], lower_sec=lo, upper_sec=hi
        ).collect()
    }
    expect = {
        (li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and lt + lo <= rt <= lt + hi
    }
    assert got == expect
