"""funnel_users/funnel_counts, group_quantiles,
sequential_poisson_sample, shared_window_pairs — hand-computable
fixtures pin the semantics; the sf0.01 gate queries pin the same ops
hash-exact against DuckDB oracles.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from entity_resolution__spark.operators.dedup import shared_window_pairs
from entity_resolution__spark.operators.funnel import funnel_counts, funnel_users
from entity_resolution__spark.operators.scrub import sequential_poisson_sample
from entity_resolution__spark.operators.textstats import group_quantiles


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "purchase", "2024-01-01 12:00:00"),
        # u2 clicks BEFORE viewing — click must not count; re-clicks after
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 10:30:00"),
        # u3 views only
        (3, "view", "2024-01-01 08:00:00"),
        # u4 purchase with NO view — absent from the funnel
        (4, "purchase", "2024-01-01 08:00:00"),
        # u5 view and purchase SIMULTANEOUS with later click: purchase
        # needs ts > click-ts > view-ts; simultaneous fails strictness
        (5, "view", "2024-01-01 08:00:00"),
        (5, "click", "2024-01-01 08:30:00"),
        (5, "purchase", "2024-01-01 08:30:00"),
    ]
    return spark.createDataFrame(
        [(u, t, _ts(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_users_strict_ordering(ev):
    got = {r["user"]: r for r in funnel_users(ev, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["steps_reached"] == 3
    assert got[2]["steps_reached"] == 2
    assert got[2]["ts_2"] == _ts("2024-01-01 10:30:00")  # not the 09:00 click
    assert got[3]["steps_reached"] == 1 and got[3]["ts_2"] is None
    assert got[5]["steps_reached"] == 2 and got[5]["ts_3"] is None


def test_funnel_counts_monotone(ev):
    got = {r["step"]: r for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert [got[i]["n_users"] for i in (1, 2, 3)] == [4, 3, 1]
    assert got[1]["conversion"] == 1.0
    assert got[3]["conversion"] == 0.25
    assert [got[i]["step_name"] for i in (1, 2, 3)] == ["view", "click", "purchase"]


def test_funnel_empty_and_missing_step(spark, ev):
    empty = ev.limit(0)
    assert funnel_users(empty, ["view", "click"]).count() == 0
    counts = {r["step"]: r for r in funnel_counts(empty, ["view", "click"]).collect()}
    assert [counts[i]["n_users"] for i in (1, 2)] == [0, 0]
    # a step type that never occurs zeroes every later step
    got = funnel_counts(ev, ["view", "refund", "purchase"]).collect()
    by = {r["step"]: r["n_users"] for r in got}
    assert by[1] == 4 and by[2] == 0 and by[3] == 0


def test_group_quantiles_exact(spark):
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [("b", 42)]
    df = spark.createDataFrame(rows, "lang string, n long")
    got = {
        (r["lang"], r["p"]): r["q"]
        for r in group_quantiles(df, "n", "lang", probs=[0.25, 0.5, 1.0]).collect()
    }
    # type-1: rank ceil(p*n) → 0.25*10=2.5→3, 0.5*10=5, 1.0*10=10
    assert got == {
        ("a", 0.25): 3,
        ("a", 0.5): 5,
        ("a", 1.0): 10,
        ("b", 0.25): 42,
        ("b", 0.5): 42,
        ("b", 1.0): 42,
    }


def test_group_quantiles_ties_and_tiny_p(spark):
    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("a", 7), ("a", 9)], "lang string, n long"
    )
    got = {r["p"]: r["q"] for r in group_quantiles(df, "n", "lang", probs=[0.001, 0.9]).collect()}
    assert got[0.001] == 7  # rank clamps to 1
    assert got[0.9] == 9  # ceil(0.9*4)=4


def _sps_ref(items, k):
    """items: [(id, w)] → the k ids with smallest (u/w, id), u from md5."""

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) / float(1 << 60)

    return [
        i for i, _ in sorted(items, key=lambda t: (u(t[0]) / t[1], t[0]))[:k]
    ]


def test_sequential_poisson_sample_matches_reference(spark):
    items = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(items, "doc_id long, w double")
    got = sorted(
        r["doc_id"] for r in sequential_poisson_sample(df, 10, "w").collect()
    )
    assert got == sorted(_sps_ref(items, 10))


def test_sequential_poisson_sample_weight_bias(spark):
    # one item with overwhelming weight is (near-)always selected
    items = [(i, 1.0) for i in range(50)] + [(999, 1e9)]
    df = spark.createDataFrame(items, "doc_id long, w double")
    got = {r["doc_id"] for r in sequential_poisson_sample(df, 5, "w").collect()}
    assert 999 in got and len(got) == 5


def test_sequential_poisson_sample_groups_and_guards(spark):
    items = [(i, "g" + str(i % 2), 1.0) for i in range(20)] + [(100, "g0", 0.0)]
    df = spark.createDataFrame(items, "doc_id long, grp string, w double")
    out = sequential_poisson_sample(df, 3, "w", group_col="grp").collect()
    by = {}
    for r in out:
        by.setdefault(r["grp"], []).append(r["doc_id"])
    assert sorted(len(v) for v in by.values()) == [3, 3]
    assert all(100 not in v for v in by.values())  # zero-weight excluded
    with pytest.raises(ValueError):
        sequential_poisson_sample(df, 0, "w")


def test_shared_window_pairs(spark):
    shared8 = "one two three four five six seven eight"
    docs = [
        (1, shared8 + " alpha beta"),
        (2, "prefix words here " + shared8),
        (3, "completely different text with no overlap at all whatsoever"),
        # 9-token verbatim overlap with doc 1 → two shared 8-windows
        (4, shared8 + " alpha zzz"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_left"], r["id_right"]): r["n_shared_windows"]
        for r in shared_window_pairs(df, window=8).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 4)] == 2
    assert got[(2, 4)] == 1
    assert all(3 not in pair for pair in got)


def test_shared_window_pairs_short_docs_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    assert shared_window_pairs(df, window=8).count() == 0
    assert shared_window_pairs(df.limit(0), window=8).count() == 0


def test_bm25_rank_hand_computed(spark):
    import math

    from entity_resolution__spark.operators.textstats import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark join join"),
            (2, "spark window"),
            (3, "table scan scan scan"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_rank(docs, "Spark JOIN!", k=10).collect()}
    # replicate the exact formula: N=3, avgdl=3, df(spark)=2, df(join)=1
    n, avgdl, k1, b = 3.0, 3.0, 1.2, 0.75
    idf = lambda df: math.log(1.0 + (n - df + 0.5) / (df + 0.5))  # noqa: E731

    def term(tf, df, dl):
        return idf(df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    exp1 = round(term(1, 2, 3) + term(2, 1, 3), 6)
    exp2 = round(term(1, 2, 2), 6)
    assert set(got) == {1, 2}  # d3 has no query terms
    assert got[1]["score6"] == pytest.approx(exp1, abs=2e-6)
    assert got[2]["score6"] == pytest.approx(exp2, abs=2e-6)
    assert got[1]["rank"] == 1 and got[2]["rank"] == 2


def test_bm25_rank_k_truncates_and_ties_on_id(spark):
    from entity_resolution__spark.operators.textstats import bm25_rank

    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(1, 6)],
        "doc_id long, text string",
    )
    got = bm25_rank(docs, "alpha", k=3).collect()
    # identical docs -> identical score6; ranking falls to ascending id
    assert [r["doc_id"] for r in got] == [1, 2, 3]
    assert len({r["score6"] for r in got}) == 1


def test_bm25_rank_bad_args(spark):
    from entity_resolution__spark.operators.textstats import bm25_rank

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_rank(docs, "???")
    with pytest.raises(ValueError):
        bm25_rank(docs, "x", k=0)


def test_unigram_logprob_hand_computed(spark):
    import math

    from entity_resolution__spark.operators.textstats import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    # T=5; counts a:2 b:2 c:1
    exp1 = -(2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = -(math.log(2 / 5) + math.log(1 / 5)) / 2
    assert got[1]["n_tokens"] == 3
    assert got[1]["nll6"] == pytest.approx(exp1, abs=2e-6)
    assert got[2]["nll6"] == pytest.approx(exp2, abs=2e-6)
    assert got[3]["n_tokens"] == 0 and got[3]["nll6"] == 0.0
    # rare-vocab doc scores HIGHER than corpus-typical doc
    assert got[2]["nll6"] > got[1]["nll6"]


def test_profile_table(spark):
    from entity_resolution__spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", 5.0), (3, None, 5.0), (4, "y", 7.0)],
        "a long, b string, c double",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"a", "b", "c"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["a"]["n_nulls"], got["a"]["n_distinct"]) == (0, 4)
    assert (got["b"]["n_nulls"], got["b"]["n_distinct"]) == (1, 2)
    assert (got["c"]["n_nulls"], got["c"]["n_distinct"]) == (1, 2)


def test_profile_table_empty_cols(spark):
    from entity_resolution__spark.operators.profile import profile_table

    with pytest.raises(ValueError):
        profile_table(spark.createDataFrame([], "struct<>"))


def test_pairwise_cluster_metrics_hand_computed(spark):
    from entity_resolution__spark.operators.evaluate import (
        pairwise_cluster_metrics,
    )

    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2)], "node string, cluster long"
    )
    truth = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")],
        "node string, label string",
    )
    r = pairwise_cluster_metrics(pred, truth).collect()[0]
    # TP=1 (a,b); pred pairs=C(3,2)=3; true pairs=1+1=2
    assert (r["tp_pairs"], r["pred_pairs"], r["true_pairs"]) == (1, 3, 2)
    assert r["precision6"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["recall6"] == 0.5
    assert r["f16"] == 0.4


def test_pairwise_cluster_metrics_perfect_and_disjoint(spark):
    from entity_resolution__spark.operators.evaluate import (
        pairwise_cluster_metrics,
    )

    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2)], "node string, cluster long"
    )
    same = spark.createDataFrame(
        [("a", "u"), ("b", "u"), ("c", "v")], "node string, label string"
    )
    r = pairwise_cluster_metrics(pred, same).collect()[0]
    assert (r["precision6"], r["recall6"], r["f16"]) == (1.0, 1.0, 1.0)
    # no common nodes -> all zeros, no nulls/NaN
    other = spark.createDataFrame(
        [("zz", "u")], "node string, label string"
    )
    r0 = pairwise_cluster_metrics(pred, other).collect()[0]
    assert (r0["tp_pairs"], r0["pred_pairs"], r0["true_pairs"]) == (0, 0, 0)
    assert (r0["precision6"], r0["recall6"], r0["f16"]) == (0.0, 0.0, 0.0)
