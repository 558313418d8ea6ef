"""End-to-end correctness gate: the Spark pipeline must reproduce the
reference-semantics clusters (brute-force all-pairs + DSU oracle) with
pairwise F1 ≥ 0.99 on labeled pairs (BASELINE.json.metric), plus the
kill-and-rerun resume property (north_rule)."""

from __future__ import annotations

import os

import pytest

from entity_resolution__spark.data.synth import make_labeled_pairs, make_transcripts
from entity_resolution__spark.plans.checkpoint import StageStore
from entity_resolution__spark.plans.pipeline import ERConfig, run_pipeline
from entity_resolution__spark.schema import TRANSCRIPTS
from tests.oracle import pairwise_f1, reference_clusters


@pytest.fixture(scope="module")
def pipeline_run(spark, tiny_transcripts, tiny_transcripts_sdf):
    res = run_pipeline(spark, tiny_transcripts_sdf, ERConfig())
    clusters = res.clusters.toPandas()
    return res, clusters


def test_f1_vs_reference_clusters(tiny_transcripts, pipeline_run):
    _, clusters = pipeline_run
    gold = reference_clusters(tiny_transcripts, threshold=0.60)
    labeled = make_labeled_pairs(tiny_transcripts, seed=42)
    f1 = pairwise_f1(labeled, clusters, gold)
    assert f1 >= 0.99, f"pairwise F1 {f1:.4f} < 0.99"


def test_f1_vs_latent_truth(tiny_transcripts, pipeline_run):
    """Sanity: clusters also recover the latent duplicate families."""
    from entity_resolution__spark.data.synth import true_clusters

    _, clusters = pipeline_run
    truth = true_clusters(tiny_transcripts).rename(
        columns={"entity": "cluster_id"}
    )
    truth["cluster_size"] = 1  # unused by the metric
    labeled = make_labeled_pairs(tiny_transcripts, seed=42)
    f1 = pairwise_f1(labeled, clusters, truth)
    assert f1 >= 0.95, f"latent-truth pairwise F1 {f1:.4f}"


def test_cluster_output_shape(pipeline_run):
    _, clusters = pipeline_run
    # dense ids 0..K-1, sizes consistent
    ids = sorted(clusters["cluster_id"].unique())
    assert ids == list(range(len(ids)))
    sizes = clusters.groupby("cluster_id")["conv_id"].count().sort_index()
    got = (
        clusters.drop_duplicates("cluster_id")
        .set_index("cluster_id")["cluster_size"]
        .sort_index()
    )
    assert (sizes.to_numpy() == got.to_numpy()).all()
    assert clusters["conv_id"].is_unique


def test_resume_from_snapshot(spark, tiny_transcripts_sdf, tmp_path_factory):
    """Kill-and-rerun: second run reuses committed snapshots (same
    snapshot ids for early stages) and yields identical clusters."""
    wh = str(tmp_path_factory.mktemp("warehouse"))
    cfg = ERConfig(use_minhash=False)  # smaller/faster stage set
    store = StageStore(wh)
    r1 = run_pipeline(spark, tiny_transcripts_sdf, cfg, store=store)
    c1 = r1.clusters.toPandas().sort_values("conv_id").reset_index(drop=True)
    snap_conv_1 = store.manifest("conversations")["snapshot_id"]

    # simulate crash after scores: clusters manifest lost
    os.remove(os.path.join(wh, "clusters", "manifest.json"))

    store2 = StageStore(wh)
    r2 = run_pipeline(spark, tiny_transcripts_sdf, cfg, store=store2)
    c2 = r2.clusters.toPandas().sort_values("conv_id").reset_index(drop=True)
    # early stages resumed, not recomputed
    assert store2.manifest("conversations")["snapshot_id"] == snap_conv_1
    # final output identical
    assert c1.equals(c2)


def test_warm_resume_skips_edge_recompute(
    spark, tiny_transcripts_sdf, tmp_path_factory, monkeypatch
):
    """ADVICE round 2: a fully-warm resume must serve the edge stages
    from committed snapshots WITHOUT re-running the country-extraction
    pass (compute_edges used to execute eagerly before the stage gate)."""
    import entity_resolution__spark.plans.pipeline as plmod

    wh = str(tmp_path_factory.mktemp("warehouse_warm"))
    cfg = ERConfig(use_minhash=False)
    r1 = run_pipeline(spark, tiny_transcripts_sdf, cfg, store=StageStore(wh))
    c1 = r1.clusters.toPandas().sort_values("conv_id").reset_index(drop=True)

    calls: list[int] = []
    orig = plmod.conv_countries

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(plmod, "conv_countries", spy)
    r2 = run_pipeline(spark, tiny_transcripts_sdf, cfg, store=StageStore(wh))
    c2 = r2.clusters.toPandas().sort_values("conv_id").reset_index(drop=True)
    assert calls == [], "warm resume re-ran the country-extraction pass"
    assert c1.equals(c2)


def test_snapshot_gc_keeps_newest_previous(spark, tmp_path_factory):
    """GC keeps the current snapshot plus the most RECENT other one by
    mtime (round-3 review: a lexicographic sort over random uuids kept
    an arbitrary snapshot as 'previous')."""
    import os

    wh = str(tmp_path_factory.mktemp("warehouse_gc"))
    store = StageStore(wh)
    df = spark.range(3)
    ids = []
    for i in range(3):
        store.commit(df, "s", f"fp{i}")
        ids.append(store.manifest("s")["snapshot_id"])
        # force strictly increasing mtimes regardless of fs resolution
        os.utime(os.path.join(wh, "s", ids[-1]), (i + 1, i + 1))
    store.commit(df, "s", "fp3")
    ids.append(store.manifest("s")["snapshot_id"])
    left = {d for d in os.listdir(os.path.join(wh, "s")) if d.startswith("snap-")}
    assert ids[3] in left            # current
    assert ids[2] in left            # the true most-recent previous
    assert ids[0] not in left and ids[1] not in left


def test_stage_fingerprint_tracks_lineage(spark, tmp_path_factory):
    """stage() must recompute when a lineage dependency recommitted
    (round-3 review: the fingerprint hashed params only, so direct
    callers got stale resume over new upstream data)."""
    wh = str(tmp_path_factory.mktemp("warehouse_lineage"))
    store = StageStore(wh)
    store.commit(spark.range(5), "up", "fp-up-1")
    calls = []

    def compute():
        calls.append(1)
        return spark.range(2)

    store.stage(spark, "down", {"p": 1}, compute, lineage=["up"])
    store.stage(spark, "down", {"p": 1}, compute, lineage=["up"])
    assert len(calls) == 1  # warm resume, same upstream
    store.commit(spark.range(6), "up", "fp-up-2")  # upstream recommitted
    store.stage(spark, "down", {"p": 1}, compute, lineage=["up"])
    assert len(calls) == 2  # invalidated by the new upstream snapshot


def test_release_transients_storeless(spark, tiny_transcripts_sdf):
    """Store-less runs hand their persisted dimensions to the caller;
    release_transients() unpersists them (round-3 review: CacheManager
    holds strong refs — they never leave executor memory on their own)."""
    res = run_pipeline(spark, tiny_transcripts_sdf, ERConfig(use_minhash=False))
    res.clusters.count()
    assert res.transient_persists
    assert all(df.is_cached for df in res.transient_persists)
    kept = list(res.transient_persists)
    res.release_transients()
    assert res.transient_persists == []
    assert all(not df.is_cached for df in kept)


def test_new_input_invalidates_snapshots(spark, tmp_path_factory):
    """Rerunning with a DIFFERENT input against the same warehouse must
    NOT resume from the previous input's snapshots (fingerprints carry
    input identity + lineage snapshot ids)."""
    wh = str(tmp_path_factory.mktemp("warehouse_inputs"))
    cfg = ERConfig(use_minhash=False)
    a = spark.createDataFrame(make_transcripts(seed=1, n_entities=12), schema=TRANSCRIPTS)
    b = spark.createDataFrame(make_transcripts(seed=2, n_entities=15), schema=TRANSCRIPTS)

    store = StageStore(wh)
    run_pipeline(spark, a, cfg, store=store)
    snap_conv_a = store.manifest("conversations")["snapshot_id"]
    snap_clusters_a = store.manifest("clusters")["snapshot_id"]

    store2 = StageStore(wh)
    r_b = run_pipeline(spark, b, cfg, store=store2)
    assert store2.manifest("conversations")["snapshot_id"] != snap_conv_a
    assert store2.manifest("clusters")["snapshot_id"] != snap_clusters_a
    # output reflects input B, not a stale replay of A
    assert r_b.clusters.count() == b.select("conv_id").distinct().count()


def test_token_overlap_constraint_wiring(spark, tiny_transcripts, tiny_transcripts_sdf):
    """C4 standalone form wired behind ERConfig: stopword-aware prune
    keeps the F1 gate green on the fixtures (true pairs share far more
    than 20% of informative tokens)."""
    res = run_pipeline(
        spark, tiny_transcripts_sdf, ERConfig(use_token_overlap_constraint=True)
    )
    clusters = res.clusters.toPandas()
    gold = reference_clusters(tiny_transcripts, threshold=0.60)
    labeled = make_labeled_pairs(tiny_transcripts, seed=42)
    f1 = pairwise_f1(labeled, clusters, gold)
    assert f1 >= 0.99, f"pairwise F1 with token-overlap constraint {f1:.4f}"
