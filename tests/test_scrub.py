"""PII scrubbing, hash-stratified sampling, n-gram corpus stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution__spark.operators.scrub import (
    hash_bucket,
    hash_stratified_sample,
    ngram_stats,
    pii_scrub,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pii_scrub_truth_table(spark):
    rows = [
        (1, "mail bob@example.com and jim.doe+x@sub.org today", "en"),
        (2, "server at 10.0.255.3 then call +1 (555) 123-4567 ok", "en"),
        (3, "no pii here at all", "en"),
        (4, "ip 1.2.3.4 twice 5.6.7.8", "en"),
        (5, "", "en"),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(_docs(spark, rows).select("doc_id", "text")).collect()
    }
    assert out[1]["text"] == "mail <EMAIL> and <EMAIL> today"
    assert out[1]["n_emails"] == 2 and out[1]["n_ips"] == 0
    assert out[2]["text"] == "server at <IP> then call <PHONE> ok"
    assert out[2]["n_ips"] == 1 and out[2]["n_phones"] == 1
    assert out[3]["text"] == "no pii here at all"
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 0, 0)
    # the phone pattern must NOT eat dotted IPs (ip redaction runs first)
    assert out[4]["text"] == "ip <IP> twice <IP>"
    assert out[4]["n_phones"] == 0
    assert out[5]["text"] == ""


def test_hash_sample_deterministic_and_rate(spark):
    rows = [(i, f"text {i}", ["en", "de", "zh"][i % 3]) for i in range(3000)]
    d = _docs(spark, rows).select("doc_id", "lang")
    out = hash_stratified_sample(d, rates={"en": 0.5, "de": 0.1})
    got = out.collect()
    # no un-configured group survives
    assert all(r["lang"] in ("en", "de") for r in got)
    # every kept bucket honors its group threshold
    for r in got:
        assert r["bucket"] < (5000 if r["lang"] == "en" else 1000)
    # rates are approximately honored (md5 is uniform)
    n_en = sum(1 for r in got if r["lang"] == "en")
    n_de = sum(1 for r in got if r["lang"] == "de")
    assert abs(n_en / 1000 - 0.5) < 0.08
    assert abs(n_de / 1000 - 0.1) < 0.05
    # bit-identical on rerun and invariant to partitioning
    again = hash_stratified_sample(
        d.repartition(17), rates={"en": 0.5, "de": 0.1}
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)


def test_hash_sample_subquantum_rate_raises(spark):
    """A positive rate below 1/n_buckets can't be expressed by the bucket
    coordinate; round 5 silently clamped it 100x up — now it raises with
    the n_buckets needed to express it (round-5 ADVICE)."""
    d = _docs(spark, [(1, "t", "en")]).select("doc_id", "lang")
    with pytest.raises(ValueError, match="below the 1/10000 quantum"):
        hash_stratified_sample(d, rates={"en": 1e-6})
    # same rate with enough buckets is fine
    assert (
        hash_stratified_sample(d, rates={"en": 1e-6}, n_buckets=1_000_000)
        .count()
        <= 1
    )
    # rate exactly at the quantum is fine (rounds to 1 bucket)
    hash_stratified_sample(d, rates={"en": 1e-4}).count()


def test_hash_bucket_matches_duckdb(spark):
    """The bucket must be engine-portable: Spark conv(md5-hex) equals
    DuckDB's ('0x'||hex)::BIGINT parse for the same ids."""
    import duckdb

    ids = [0, 1, 123, 99991, 2**40 + 7]
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in sdf.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for i in ids:
        want = con.sql(
            f"SELECT ('0x' || substr(md5(CAST({i} AS VARCHAR)),1,8))::BIGINT % 10000"
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)


def test_ngram_stats_counts_and_short_docs(spark):
    rows = [
        (1, "the cat sat", "en"),
        (2, "the cat ran", "en"),
        (3, "the cat sat the cat sat", "en"),  # dup grams within doc
        (4, "single", "en"),  # shorter than n → contributes nothing
        (5, "", "en"),
    ]
    out = ngram_stats(_docs(spark, rows), n=2, k=10).collect()
    counts = {r["ngram"]: r["n_docs"] for r in out}
    assert counts["the cat"] == 3  # document frequency, not raw count
    assert counts["cat sat"] == 2
    assert counts["cat ran"] == 1
    assert "sat the" in counts  # cross-window gram from doc 3
    # deterministic ordering: count desc then ngram asc
    ordered = [(r["n_docs"], r["ngram"]) for r in out]
    assert ordered == sorted(ordered, key=lambda t: (-t[0], t[1]))


def test_ngram_stats_empty_input(spark):
    d = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert ngram_stats(d, n=2, k=5).count() == 0
    assert pii_scrub(d.select("doc_id", "text")).count() == 0
    assert (
        hash_stratified_sample(
            d.select("doc_id", "lang"), rates={"en": 0.5}
        ).count()
        == 0
    )


def test_round5_ops_empty_input_probes(spark):
    """Empty-input probes for the round-5 family (same discipline as the
    round-4 operators): every operator degrades to an empty (or
    identity) result with the right schema, no exceptions."""
    from pyspark.sql import functions as F

    from entity_resolution__spark.operators.cluster import incremental_clusters
    from entity_resolution__spark.operators.dedup import simhash_neardup_pairs
    from entity_resolution__spark.operators.graph_export import louvain_refine
    from entity_resolution__spark.operators.packing import chunk_documents

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert simhash_neardup_pairs(empty_docs).count() == 0
    assert chunk_documents(empty_docs).count() == 0

    empty_edges = spark.createDataFrame(
        [], "src string, dst string, weight double"
    )
    assert louvain_refine(empty_edges).count() == 0  # singleton start
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "node string, community string"
    )
    # no edges → labeling passes through unchanged
    got = {r["node"]: r["community"] for r in louvain_refine(empty_edges, labels).collect()}
    assert got == {"a": "a", "b": "b"}

    prior = spark.createDataFrame(
        [("a", 0, 1)], "conv_id string, cluster_id long, cluster_size int"
    )
    no_delta = spark.createDataFrame([], "src string, dst string")
    out = incremental_clusters(prior, no_delta).collect()
    assert [(r["conv_id"], r["cluster_id"], r["cluster_size"]) for r in out] == [
        ("a", 0, 1)
    ]
    empty_prior = spark.createDataFrame(
        [], "conv_id string, cluster_id long, cluster_size int"
    )
    assert incremental_clusters(empty_prior, no_delta).count() == 0
