"""Deterministic distributed k-means (operators/similarity.kmeans):
an exact numpy replica of the algorithm (hash init, index-order sums,
lowest-id ties, empty-cluster retention) pins every semantic; the
sf0.01 gate query `kmeans_embed` pins the same op hash-exact against a
DuckDB oracle that unrolls the iterations as chained CTEs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from entity_resolution__spark.operators.similarity import kmeans


def _replica(ids, X, k, iterations):
    """Bit-faithful numpy replay: init = embeddings of the k
    md5-smallest ids (cluster index in ascending-id order), argmin with
    lowest-cluster ties, mean update, empty cluster keeps centroid."""
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    seed_ids = sorted(order[: min(k, len(ids))])
    idx = {v: p for p, v in enumerate(ids)}
    C = np.array([X[idx[i]] for i in seed_ids], dtype=np.float64)

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        return d.argmin(1), d  # argmin takes the first (lowest) index on ties

    for _ in range(iterations):
        a, _ = assign(C)
        nxt = C.copy()
        for j in range(len(C)):
            pts = X[a == j]
            if len(pts):
                nxt[j] = pts.mean(0)
        C = nxt
    a, d = assign(C)
    return a, d[np.arange(len(X)), a], len(C)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    # 3 separated 4-d blobs + one remote outlier so at least one init
    # configuration strands a centroid (empty-cluster path exercised)
    centers = np.array(
        [[0, 0, 0, 0], [10, 10, 10, 10], [-10, 5, -5, 10]], dtype=np.float64
    )
    X = np.vstack(
        [c + rng.normal(0, 0.5, size=(13, 4)) for c in centers]
        + [np.array([[500.0, 500.0, 500.0, 500.0]])]
    )
    ids = list(range(100, 100 + len(X)))
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in zip(ids, X)],
        "vec_id long, embedding array<float>",
    )
    # the DF carries float32 — the operator upcasts; mirror that here
    return ids, np.array(X, dtype=np.float32).astype(np.float64), df


def test_kmeans_matches_numpy_replica(corpus):
    ids, X, df = corpus
    for k, iters in ((3, 3), (5, 2), (4, 0)):
        a, d, _ = _replica(ids, X, k, iters)
        got = {
            r["vec_id"]: r for r in kmeans(df, k=k, iterations=iters).collect()
        }
        assert set(got) == set(ids)
        for pos, i in enumerate(ids):
            assert got[i]["cluster"] == a[pos], (k, iters, i)
            assert got[i]["dist6"] == pytest.approx(d[pos], abs=5e-6)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """GUARANTEED empty-cluster traversal: 10 identical points + 1 far
    point with k=3 — at least two of the three init seeds coincide, the
    argmin tie sends every point to the lower cluster id, so the other
    seed strands (keeps its centroid, receives nothing). Spark must
    match the replica through that branch, and the output must use
    strictly fewer than k clusters."""
    ids = list(range(50, 61))
    X = np.zeros((11, 2))
    X[-1] = [100.0, 100.0]
    df = spark.createDataFrame(
        [(i, [float(a) for a in row]) for i, row in zip(ids, X)],
        "vec_id long, embedding array<float>",
    )
    a, d, _ = _replica(ids, X, 3, 2)
    assert len(set(a.tolist())) < 3  # a centroid really stranded
    got = {r["vec_id"]: r for r in kmeans(df, k=3, iterations=2).collect()}
    for pos, i in enumerate(ids):
        assert got[i]["cluster"] == a[pos]
        assert got[i]["dist6"] == pytest.approx(d[pos], abs=5e-6)


def test_kmeans_k_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [9.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans(df, k=10, iterations=2).collect()
    assert len(out) == 3
    assert {r["cluster"] for r in out} <= {0, 1, 2}


def test_kmeans_rerun_identical(corpus):
    _, _, df = corpus
    a = sorted(map(tuple, kmeans(df, k=3, iterations=3).collect()))
    b = sorted(map(tuple, kmeans(df, k=3, iterations=3).collect()))
    assert a == b


def test_kmeans_bad_args(corpus):
    _, _, df = corpus
    with pytest.raises(ValueError):
        kmeans(df, k=0)
    with pytest.raises(ValueError):
        kmeans(df, k=2, iterations=-1)
