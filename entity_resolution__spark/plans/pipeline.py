"""End-to-end ER pipeline: transcripts → clusters.

Stage DAG (each optionally checkpointed via StageStore, north_rule):

  transcripts ─ canonicalize ─ conversations
  conversations ─ blocking keys (tokens ∪ MinHash-LSH bands) ─ blocks
  blocks ─ candidate_pairs (salted within-block join) ─ pairs
  pairs + conversations ─ featurize ─ score ─ scored
  scored ─ threshold + geo/token constraints ─ edges
  edges ─ large-star/small-star CC ─ clusters (dense ids + sizes)

Mirrors the reference entry points E1–E3 (SURVEY.md §3) as one lazy
Spark DAG with explicit stage boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_resolution__spark.functions.features import global_idf
from entity_resolution__spark.operators.blocking import (
    minhash_band_keys,
    rare_token_keys,
)
from entity_resolution__spark.operators.canonicalize import canonicalize
from entity_resolution__spark.operators.cluster import (
    assign_clusters,
    cohort_transitive_clusters,
    connected_components,
)
from entity_resolution__spark.operators.constraints import (
    apply_constraints,
    conv_countries,
    geo_prune_pairs,
    stopwords_by_df,
    token_overlap_prune_pairs,
)
from entity_resolution__spark.operators.pairs import attach_pair_payload, candidate_pairs
from entity_resolution__spark.operators.score import featurize_pairs, score_pairs
from entity_resolution__spark.plans.checkpoint import StageStore


@dataclass
class ERConfig:
    # blocking
    use_minhash: bool = True
    minhash_perm: int = 32
    minhash_bands: int = 4  # 8 rows/band: strict S-curve — rare-token
    # keys carry family recall (pair completeness ≥0.99 on fixtures);
    # LSH is the near-dup backup, so a steep curve keeps pair volume low
    rare_token_max_df: int = 200
    rare_tokens_per_conv: int = 4
    max_block: int = 2000
    salt_threshold: int = 200
    n_salts: int = 8
    # scoring / constraints (reference thresholds: 0.45 keep, 0.60 seed,
    # C4 token-overlap prune 0.20 → our pre-filter 0.15 is conservative)
    min_token_jaccard: float = 0.15
    keep_threshold: float = 0.45
    cluster_threshold: float = 0.60
    use_geo_constraint: bool = True
    # C4 standalone form (reference token_overlap_constraint.py): prune
    # scored pairs whose STOPWORD-FILTERED token jaccard < 0.20, skipping
    # pairs with an empty side. Off by default — the featurize pre-gate
    # already applies the cheap raw-token form before the feature UDF.
    use_token_overlap_constraint: bool = False
    token_overlap_min_jaccard: float = 0.20
    stopword_df_cutoff: float = 0.30
    use_global_idf: bool = False  # costs one extra pass; off for bench
    # clustering
    cc_max_iter: int = 50
    # bench instrumentation: force+time each stage boundary (not part of
    # the semantic fingerprint). cpu_probe: zero-arg callable returning
    # cumulative CPU seconds (e.g. bench._proc_tree_cpu) — sampled at
    # stage boundaries so the bench JSON carries cpu-vs-wall per stage
    # (host throttling shows up as cpu/wall ≪ thread count; round-2
    # VERDICT asked for this to make throttle claims auditable).
    stage_timing: bool = False
    cpu_probe: object = None
    # gc_probe: zero-arg callable returning cumulative JVM GC seconds
    # (bench reads GarbageCollectorMXBeans via py4j). Splits each
    # stage's cpu_sec into mutator vs collector: at the 4.3M-turn
    # input the un-attributed local[8] cpu inflation vs local[2] could
    # be GC (scales with threads × live set) or host physics — this
    # makes the bench JSON carry the answer per stage.
    gc_probe: object = None

    _NON_SEMANTIC = ("stage_timing", "cpu_probe", "gc_probe")

    def params(self) -> dict:
        return {
            k: v for k, v in self.__dict__.items() if k not in self._NON_SEMANTIC
        }


@dataclass
class ERResult:
    conversations: DataFrame
    blocks: DataFrame
    pairs: DataFrame
    scored: DataFrame
    edges: DataFrame
    dropped: DataFrame
    clusters: DataFrame
    cc_iterations: int = 0
    stage_rows: dict = field(default_factory=dict)
    stage_wall: dict = field(default_factory=dict)  # cfg.stage_timing=True
    stage_cpu: dict = field(default_factory=dict)  # + cfg.cpu_probe set
    stage_gc: dict = field(default_factory=dict)  # + cfg.gc_probe set
    # store-less mode: transient persisted dimensions (countries/prune)
    # still referenced by the LAZY edges/clusters plans — call
    # release_transients() once the outputs are materialized, or they
    # stay cached for the session's lifetime (CacheManager holds strong
    # refs to cached SQL plans; ContextCleaner will NOT reclaim them)
    transient_persists: list = field(default_factory=list)

    def release_transients(self) -> None:
        for df in self.transient_persists:
            df.unpersist()
        self.transient_persists.clear()


def build_blocks(conv: DataFrame, cfg: ERConfig, n_docs: int | None = None) -> DataFrame:
    keys = rare_token_keys(
        conv,
        max_df=cfg.rare_token_max_df,
        per_conv=cfg.rare_tokens_per_conv,
        n_docs=n_docs,
    )
    if cfg.use_minhash:
        keys = keys.unionByName(
            minhash_band_keys(
                conv, num_perm=cfg.minhash_perm, bands=cfg.minhash_bands
            )
        )
    return keys


def cohort_seed_edges(
    scored: DataFrame, countries: DataFrame, min_prob: float = 0.60
) -> DataFrame:
    """G2 seed selection (reference apply_transitivity.py:107-119): keep
    edges with prob ≥ min_prob AND ≥1 shared extracted country, exploded
    one row per shared country (the cohort). Cohorts are lowercased
    canonical names, as in the reference."""
    cl = countries.select(
        F.col("conv_id").alias("id_left"), F.col("countries").alias("c_l")
    )
    cr = countries.select(
        F.col("conv_id").alias("id_right"), F.col("countries").alias("c_r")
    )
    strong = scored.filter(F.col("prob_match") >= F.lit(min_prob))
    return (
        strong.join(cl, "id_left")
        .join(cr, "id_right")
        .select(
            F.col("id_left").cast("string").alias("u"),
            F.col("id_right").cast("string").alias("v"),
            F.explode(F.array_intersect("c_l", "c_r")).alias("cohort"),
        )
        .withColumn("cohort", F.lower("cohort"))
    )


def run_cohort_transitivity(
    scored: DataFrame,
    countries: DataFrame,
    min_prob: float = 0.60,
    max_iter: int = 50,
) -> DataFrame:
    """Reference E3 canonical output (er_clusters_transitive.csv analog):
    cohort-seeded transitive clusters over scored pairs. Returns
    (cohort, node_id, cluster_id, cluster_size)."""
    return cohort_transitive_clusters(
        cohort_seed_edges(scored, countries, min_prob), max_iter=max_iter
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: ERConfig | None = None,
    store: StageStore | None = None,
) -> ERResult:
    cfg = cfg or ERConfig()
    p = cfg.params()
    stage_wall: dict[str, float] = {}
    stage_cpu: dict[str, float] = {}
    stage_gc: dict[str, float] = {}

    # Input identity folded into every stage fingerprint (else a rerun
    # with a different --input but the same warehouse would silently
    # resume from the previous input's snapshots). semanticHash covers
    # the logical plan (source paths, schema, filters); inputFiles pins
    # the concrete file set for file-based sources.
    input_fp: dict | None = None
    if store is not None:
        try:
            files = sorted(transcripts.inputFiles())
        except Exception:
            files = []
        try:
            sem = transcripts.semanticHash()
        except Exception:
            sem = None
        input_fp = {"semantic_hash": sem, "files": files}

    def staged(name: str, compute, lineage: list[str] | None = None) -> DataFrame:
        import time as _time

        cpu0 = cfg.cpu_probe() if (cfg.stage_timing and cfg.cpu_probe) else None
        gc0 = cfg.gc_probe() if (cfg.stage_timing and cfg.gc_probe) else None
        t0 = _time.monotonic()
        if store is None:
            # no snapshot store: still materialize the stage boundary once
            # — conv/scored are referenced by several downstream branches
            # and must not recompute their UDF work per branch. EAGER
            # localCheckpoint, not persist()+count(): the SQL cache pays a
            # columnar re-encode of the nested turn/token arrays on write
            # and a decode per read (measured 0.97-2.2 s materialize +
            # 0.37 s/3 reads for conversations at the 100k-turn bench
            # shape vs 0.55-0.69 s + 0.26 s/3 reads for the RDD-block
            # checkpoint), and count() lets the optimizer prune columns so
            # it did not even warm every column of the cache (guide §1.4).
            out = compute().localCheckpoint(eager=True)
        else:
            # fingerprint chains over the input identity and the lineage
            # stages' committed snapshot ids: an upstream recompute (new
            # snapshot id) invalidates everything downstream
            params = {
                **p,
                "stage": name,
                "input": input_fp,
                "lineage_snapshots": {
                    dep: (store.manifest(dep) or {}).get("snapshot_id")
                    for dep in (lineage or [])
                },
            }
            out = store.stage(spark, name, params, compute, lineage)
        stage_wall[name] = round(_time.monotonic() - t0, 3)
        if cpu0 is not None:
            stage_cpu[name] = round(cfg.cpu_probe() - cpu0, 3)
        if gc0 is not None:
            stage_gc[name] = round(cfg.gc_probe() - gc0, 3)
        return out

    # canonicalize emits norm_text + tokens via one fused Arrow UDF
    conv = staged("conversations", lambda: canonicalize(transcripts))

    # one corpus count, threaded through every operator that needs N
    # (blocking DF caps, stopword cutoffs, idf smoothing); also warms the
    # conv persist so downstream branches read from cache
    n_docs = conv.count()

    blocks = staged(
        "blocks", lambda: build_blocks(conv, cfg, n_docs=n_docs), ["conversations"]
    )

    pairs = staged(
        "candidate_pairs",
        lambda: candidate_pairs(
            blocks,
            max_block=cfg.max_block,
            salt_threshold=cfg.salt_threshold,
            n_salts=cfg.n_salts,
        ),
        ["blocks"],
    )

    idf_map = global_idf(conv, n_docs=n_docs) if cfg.use_global_idf else None

    def compute_scored() -> DataFrame:
        # slim payload: the feature kernel derives token vectors from
        # norm_text and takes role/tool sequences as pre-joined strings,
        # so neither `tokens` nor the raw arrays ship through the pair
        # shuffle (3 exchanges carry this payload; bytes were the 8→32
        # scaling limiter at 537k turns). token_set stays for the
        # Catalyst jaccard pre-gate.
        payload_src = conv.select(
            "conv_id",
            "norm_text",
            "token_set",
            F.array_join("roles", "\x1f").alias("roles_seq"),
            F.array_join("tools", "\x1f").alias("tools_seq"),
        )
        payload = attach_pair_payload(
            pairs,
            payload_src,
            ["norm_text", "token_set", "roles_seq", "tools_seq"],
        )
        # the feature UDF is CPU-bound with small bytes/row: AQE's
        # size-based coalescing would shrink this stage to a handful of
        # tasks — pin it to the core count so kernels use every core
        payload = payload.repartition(spark.sparkContext.defaultParallelism)
        feats = featurize_pairs(
            payload, idf_map, min_token_jaccard=cfg.min_token_jaccard
        )
        return score_pairs(feats, threshold=cfg.cluster_threshold).select(
            "id_left",
            "id_right",
            "prob_match",
            "pred_match",
            "token_jaccard",
        )

    scored = staged("scores", compute_scored, ["candidate_pairs", "conversations"])

    # transient persists released once both edge outputs are committed
    _edge_persists: list[DataFrame] = []

    def compute_edges() -> tuple[DataFrame, DataFrame]:
        prune_sets = []
        if cfg.use_geo_constraint:
            # materialize the derived country table BEFORE the two-branch
            # prune join: left lazy, the UDF subtree is planned inside the
            # join's shuffle-map stages and the composite plan measured ~9×
            # slower (26.8s vs 3.0s at 100k turns) than joining the small
            # cached dimension
            countries = conv_countries(conv).persist()
            countries.count()
            _edge_persists.append(countries)
            prune_sets.append(geo_prune_pairs(scored, countries))
        if cfg.use_token_overlap_constraint:
            sw = stopwords_by_df(conv, cfg.stopword_df_cutoff, n_docs=n_docs)
            tl = conv.select(
                F.col("conv_id").alias("id_left"),
                F.col("token_set").alias("token_set_l"),
            )
            tr = conv.select(
                F.col("conv_id").alias("id_right"),
                F.col("token_set").alias("token_set_r"),
            )
            pairs_tokens = scored.join(tl, "id_left").join(tr, "id_right")
            prune_sets.append(
                token_overlap_prune_pairs(
                    pairs_tokens, sw, min_jaccard=cfg.token_overlap_min_jaccard
                )
            )
        return apply_constraints(
            scored,
            prune_sets,
            min_prob=cfg.keep_threshold,
            persisted_out=_edge_persists,
        )

    # compute (kept, dropped) ONCE and serve both stages from the single
    # pair — the two outputs share the country-extraction UDF and prune
    # joins. The computation is LAZY behind the stage gate (ADVICE round
    # 2): a warm resume that serves both edge stages from committed
    # snapshots never runs the country-extraction pass at all.
    _edge_cache: dict[str, tuple[DataFrame, DataFrame]] = {}

    def _edges_pair() -> tuple[DataFrame, DataFrame]:
        if "kd" not in _edge_cache:
            _edge_cache["kd"] = compute_edges()
        return _edge_cache["kd"]

    if store is not None:
        kept = staged("edges", lambda: _edges_pair()[0], ["scores"])
        dropped = staged("edges_dropped", lambda: _edges_pair()[1], ["scores"])
        # both outputs are committed snapshots now — the transient
        # country/prune caches have served their purpose
        for df in _edge_persists:
            df.unpersist()
        _edge_persists = []
    else:
        # store-less mode returns LAZY kept/dropped: the caches must
        # outlive this function (they feed both downstream branches).
        # They are handed to the caller via ERResult.transient_persists
        # — long-lived sessions running many store-less pipelines must
        # release them after materializing, or they accumulate in
        # executor storage memory (round-3 review: CacheManager holds
        # strong refs, GC does not reclaim cached SQL plans)
        kept, dropped = _edges_pair()

    cluster_edges = kept.filter(
        F.col("prob_match") >= F.lit(cfg.cluster_threshold)
    ).select(F.col("id_left").alias("src"), F.col("id_right").alias("dst"))

    cc_iter_store = {}

    def compute_clusters() -> DataFrame:
        on_iter = None
        if store is not None:
            def on_iter(it, e, fp):  # per-iteration snapshot (north_rule)
                store.commit(
                    e, f"cluster_iter_{it:03d}", f"{fp[0]}:{fp[1]}", ["edges"]
                )

        cc = connected_components(
            cluster_edges, max_iter=cfg.cc_max_iter, on_iteration=on_iter
        )
        cc_iter_store["iterations"] = cc.iterations
        all_nodes = conv.select(F.col("conv_id").alias("node"))
        return assign_clusters(cc.assignments, all_nodes)

    clusters = staged("clusters", compute_clusters, ["edges", "conversations"])

    return ERResult(
        conversations=conv,
        blocks=blocks,
        pairs=pairs,
        scored=scored,
        edges=kept,
        dropped=dropped,
        clusters=clusters,
        cc_iterations=cc_iter_store.get("iterations", 0),
        stage_wall=stage_wall,
        stage_cpu=stage_cpu,
        stage_gc=stage_gc,
        transient_persists=list(_edge_persists),
    )
