"""Geo-constraint truth table (reference geo_constraints.py:143-147
conservative semantics) + dotted-acronym handling + threshold/anti-join."""

from __future__ import annotations

import pandas as pd

from entity_resolution__spark.operators.constraints import (
    apply_constraints,
    extract_countries,
    geo_prune_pairs,
)


def test_extract_countries_batch():
    from entity_resolution__spark.operators.constraints import _ACRONYM_RES, _undot

    s = pd.Series(
        [
            "based in Japan and Canada",
            "the U.S.A. office",  # dotted acronym → USA → United States
            "no geography here",
            "japan lowercase",  # case-insensitive
            None,
        ]
    )
    # call the kernel underneath the pandas UDF directly
    def one(t):
        t = _undot(t or "")
        for pat, repl in _ACRONYM_RES:
            t = pat.sub(repl, t)
        from entity_resolution__spark.operators.constraints import _COUNTRY_RES

        return sorted({c for c, cre in _COUNTRY_RES if cre.search(t)})

    got = [one(x) for x in s]
    assert got[0] == ["Canada", "Japan"]
    assert got[1] == ["United States"]
    assert got[2] == []
    assert got[3] == ["Japan"]
    assert got[4] == []


def test_geo_prune_truth_table(spark):
    countries = spark.createDataFrame(
        [
            ("a", ["Japan"]),
            ("b", ["Canada"]),
            ("c", ["Japan", "Canada"]),
            ("d", []),
        ],
        ["conv_id", "countries"],
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d")],
        ["id_left", "id_right"],
    )
    pruned = {
        (r["id_left"], r["id_right"])
        for r in geo_prune_pairs(pairs, countries).collect()
    }
    # disjoint evidence → prune; overlap or missing evidence → keep
    assert pruned == {("a", "b")}


def test_apply_constraints_threshold_and_antijoin(spark):
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.9, 1),
            ("a", "c", 0.5, 0),
            ("a", "d", 0.44, 0),  # below 0.45 → dropped by threshold
            ("b", "c", 0.45, 0),  # exactly at threshold → kept
        ],
        ["id_left", "id_right", "prob_match", "pred_match"],
    )
    prune = spark.createDataFrame([("a", "b")], ["id_left", "id_right"])
    kept, dropped = apply_constraints(scored, [prune], min_prob=0.45)
    k = {(r["id_left"], r["id_right"]) for r in kept.collect()}
    d = {(r["id_left"], r["id_right"]) for r in dropped.collect()}
    assert k == {("a", "c"), ("b", "c")}
    assert d == {("a", "b")}


def test_extract_countries_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("x", "visited Japan and the U.S.A. office")], ["id", "text"]
    )
    row = df.select(extract_countries(F.col("text")).alias("c")).collect()[0]
    assert row["c"] == ["Japan", "United States"]
