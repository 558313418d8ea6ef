"""Corpus-hygiene operators for a training-data pipeline: PII scrubbing,
deterministic stratified sampling, and n-gram corpus statistics.

All pure Catalyst (whole-stage codegen, zero UDFs) and expressible in
ANSI-ish SQL so the DuckDB oracle can replay them exactly. The regex
patterns are deliberately restricted to the common subset of Java regex
(Spark) and RE2 (DuckDB): character classes, bounded/greedy quantifiers
and \\b — no backreferences or lookaround, whose semantics differ.

Scale notes:
- pii_scrub is a narrow map: no shuffle at all; at 100 TB it fuses into
  the scan projection.
- hash_stratified_sample decides membership from md5(id) — a pure
  row-local predicate (no sampleBy/aggregation pass, no RNG): the same
  row set is selected on any engine, any partitioning, any retry. The
  per-group rate lookup is a literal CASE over dimension-sized groups.
- ngram_stats is the classic explode → count — one shuffle on the
  n-gram key with map-side partial aggregation; top-k via a single
  ORDER BY count DESC, ngram ASC LIMIT k (rank ties broken textually so
  the result is deterministic).

The reference has no corpus-hygiene stage (its corpus is one short-text
CSV); this extends the engine's training-data family (dedup / quality /
packing / mixing) per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2 safe patterns (no lookaround, no backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-ish phone: leading + optional, 9+ chars of digit/sep
# runs, digit-anchored both ends so trailing punctuation stays.
PHONE_RE = r"\+?\d[\d .()-]{7,}\d"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, IPv4 addresses and phone-shaped digit runs with
    typed placeholders; report per-category hit counts per document.

    Redaction order matters and is fixed: email → ip → phone (the phone
    pattern would otherwise eat dotted IPs). Counts are taken on the
    ORIGINAL text for email/ip, and for phones on the ip/email-redacted
    text (so an IP is one <IP>, not also a phone hit) — the oracle SQL
    applies the identical composition.

    NULL text is treated as empty (0 hits, empty redacted text): under
    non-ANSI Spark, size(regexp_extract_all(NULL)) is -1 — a nonsense
    count that would also diverge from the SQL oracle's NULL (round-5
    review; the other hygiene operators already null-guard).

    Output: (id, text [redacted], n_emails, n_ips, n_phones).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        scrubbed.alias(text_col),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
    )


def hash_bucket(id_expr: Column, n_buckets: int = 10_000) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets): first 8
    hex digits of md5(id-as-string), parsed base-16, mod n_buckets.
    md5 of the UTF-8 string is identical everywhere; no RNG, no
    partition-order dependence."""
    return (
        F.conv(F.substring(F.md5(id_expr.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def hash_stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-group deterministic sampling: keep a row iff its md5 bucket
    < rate(group)·n_buckets. Groups without a configured rate are
    dropped. Exactly reproducible across engines/retries/partitionings —
    the property `df.sample()`/`sampleBy()` (seeded per-partition RNG)
    does NOT have, which matters when a 100 TB sample must be re-derived
    bit-identically by a downstream team.

    Output: input columns + `bucket` (the sampling coordinate, kept so
    the selection is auditable).
    """
    out = df.withColumn("bucket", hash_bucket(F.col(id_col), n_buckets))
    if not rates:
        return out.filter(F.lit(False))
    rate_expr = None
    for g, r in sorted(rates.items()):
        cond = F.col(group_col) == F.lit(g)
        # quantization floor: a configured positive rate below the
        # 1/n_buckets granularity rounds to threshold 0. Round 5 clamped
        # this up to 1 bucket, but that silently samples at 1/n_buckets —
        # e.g. 100x a requested 1e-6 with the default 10k buckets
        # (round-5 ADVICE). The caller asked for a rate the coordinate
        # cannot express; that's their call to make — raise so they can
        # widen n_buckets instead of shipping a 100x-oversized sample.
        thr_i = int(round(r * n_buckets))
        if r > 0 and thr_i == 0:
            raise ValueError(
                f"hash_stratified_sample: rate {r!r} for group {g!r} is "
                f"below the 1/{n_buckets} quantum (rounds to 0 buckets); "
                f"raise n_buckets to at least {int(1 / r)} to express it"
            )
        thr = F.lit(thr_i)
        rate_expr = (
            F.when(cond, thr) if rate_expr is None else rate_expr.when(cond, thr)
        )
    rate_expr = rate_expr.otherwise(F.lit(0))
    return out.filter(F.col("bucket") < rate_expr)


def ngram_stats(
    df: DataFrame,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k corpus n-grams (space-joined token windows) with document
    frequencies: explode per-doc n-gram lists (distinct within doc, so
    the count is a document frequency, robust to spammy repetition),
    hash-shuffle on the n-gram, count, deterministic top-k.

    Output: (ngram, n_docs), ordered count DESC then ngram ASC, LIMIT k.
    """
    # Reuse the zip_with shingle builder: the obvious alternative — a
    # transform lambda indexing back into the token array — re-evaluates
    # the captured regexp tokenization PER ELEMENT (no CSE across the
    # Catalyst lambda boundary; dedup.ngram_shingles documents the
    # measured ~50× blowup). ngram_shingles already yields the distinct
    # space-joined n-gram set with the short-doc guard built in.
    from entity_resolution__spark.operators.dedup import ngram_shingles

    grams = ngram_shingles(F.col(text_col), n=n)
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("ngram"))
        .limit(k)
    )


def repetition_stats(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals in the spirit of Gopher's
    repetition filters (Rae et al. 2021 §A1.1 / RefinedWeb): fraction of
    duplicate tokens, fraction of the n-gram stream occupied by the
    single most frequent n-gram, and fraction of duplicate n-grams.
    Spam/loop-generated documents score high on all three; these feed
    `quality_gate`.

    Output: (id, n_tokens, dup_token_frac, top_ngram_frac,
    dup_ngram_frac) — fractions rounded to 6 dp (engine-portable), 0.0
    for documents too short to have any n-gram.

    Scale: token stats are a narrow map fused into the scan. The n-gram
    mode requires a per-(doc, gram) count — explode → two-level partial
    aggregation keyed (doc_id, gram) then doc_id, re-joined to the token
    stats co-partitioned on doc_id. No driver state, no UDF; skew-free
    (doc_id is in every shuffle key).
    """
    from entity_resolution__spark.operators.textstats import tokens_col

    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(text)
    n_tok = F.size(toks)
    base = df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_tok == 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct(toks)).cast("double") / n_tok
            ),
            6,
        ).alias("dup_token_frac"),
    )
    return base.join(_ngram_mode_agg(df, n, id_col, text_col), id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        "dup_token_frac",
        *_mode_frac_cols(),
    )


def _ngram_mode_agg(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Per-doc n-gram mode aggregate (total count, max count, distinct
    count) over the positional n-gram stream — the shuffle-side half of
    `repetition_stats`, shared with `quality_gate` so the gate pays the
    explode pass once."""
    from entity_resolution__spark.operators.dedup import ngram_sequence

    text = F.coalesce(F.col(text_col), F.lit(""))
    per_gram = (
        df.select(F.col(id_col), F.explode(ngram_sequence(text, n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        F.count(F.lit(1)).alias("n_distinct"),
    )


def _mode_frac_cols() -> list[Column]:
    """top_ngram_frac / dup_ngram_frac projections over a frame
    left-joined with `_ngram_mode_agg` (null → 0.0, 6 dp)."""
    return [
        F.round(
            F.coalesce(F.col("top").cast("double") / F.col("total"), F.lit(0.0)), 6
        ).alias("top_ngram_frac"),
        F.round(
            F.coalesce(
                1.0 - F.col("n_distinct").cast("double") / F.col("total"),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_ngram_frac"),
    ]


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination pass: flag corpus documents sharing at
    least `min_hits` distinct word n-grams with any document in an
    evaluation set (the standard n-gram-overlap contamination rule used
    for LLM training corpora; 13-grams in GPT-3/PaLM — `n` is a
    parameter here because the synthetic docs are short).

    Output: (id, n_eval_ngrams, contaminated) for EVERY corpus doc —
    n_eval_ngrams = how many of the doc's distinct n-grams appear
    anywhere in the eval set.

    Scale: the eval side (benchmark suites, thousands of docs) is tiny
    next to a 100 TB corpus — its distinct shingle set is broadcast, so
    the corpus-side explode joins map-side with NO shuffle of the
    corpus; the only wide op is the per-doc count, keyed doc_id. Set
    `broadcast_eval=False` if the eval set ever outgrows the driver; the
    same plan then shuffles both sides on the shingle key.
    """
    from entity_resolution__spark.operators.dedup import ngram_shingles

    text = F.coalesce(F.col(text_col), F.lit(""))
    eval_grams = (
        eval_df.select(F.explode(ngram_shingles(text, n)).alias("g")).distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    hits = (
        corpus.select(F.col(id_col), F.explode(ngram_shingles(text, n)).alias("g"))
        .join(eval_grams, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_eval_ngrams"))
    )
    return corpus.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_eval_ngrams"), F.lit(0)).alias("n_eval_ngrams"),
        (F.coalesce(F.col("n_eval_ngrams"), F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )


# quality_gate rule table: (name, fail-predicate builder over the joined
# quality_features × repetition_stats row). Names are emitted in this
# fixed order so the reasons CSV is deterministic.
QUALITY_RULES: list[tuple[str, "object"]] = [
    ("too_short", lambda: F.col("q_tokens") < F.lit(10)),
    ("too_long", lambda: F.col("q_tokens") > F.lit(5000)),
    ("low_stopword", lambda: F.col("q_stopword_ratio") < F.lit(0.01)),
    ("high_punct", lambda: F.col("q_punct_ratio") > F.lit(0.30)),
    ("top_ngram_heavy", lambda: F.col("top_ngram_frac") > F.lit(0.10)),
    ("dup_ngram_heavy", lambda: F.col("dup_ngram_frac") > F.lit(0.09)),
]


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
) -> DataFrame:
    """RefinedWeb/Gopher-style rule-cascade document filter: evaluate
    every rule in `QUALITY_RULES` over the length/stopword/punctuation
    signals (`quality_features`) joined with the repetition signals
    (`repetition_stats`), and report per doc which rules failed.

    Output: (id, keep, reasons) — `reasons` is a comma-joined string of
    failed rule names in table order ('' when keep=true). A string, not
    an array, so the result hashes identically through any SQL oracle.

    Scale: quality_features is a narrow map fused into ONE scan-side
    projection; the only wide op is the shared n-gram mode aggregate
    (`_ngram_mode_agg`, doc_id-keyed), joined back once. The rule
    cascade itself is a pure projection — at 100 TB the gate is one
    narrow scan + one aggregation pass, and `keep` lands in parquet
    min/max stats so downstream scans prune dropped docs for free.
    """
    from entity_resolution__spark.operators.textstats import quality_features

    q = quality_features(
        df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)),
        text_col=text_col,
    ).select(id_col, "q_tokens", "q_stopword_ratio", "q_punct_ratio")
    ga = _ngram_mode_agg(df, ngram_n, id_col, text_col)
    joined = q.join(ga, id_col, "left").select(
        id_col, "q_tokens", "q_stopword_ratio", "q_punct_ratio", *_mode_frac_cols()
    )
    reasons = F.concat_ws(
        ",",
        *[
            F.when(pred(), F.lit(name)).otherwise(F.lit(None))
            for name, pred in QUALITY_RULES
        ],
    )
    return joined.select(
        F.col(id_col),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


# 16^15 — the KMV hash coordinate is the first 15 hex digits of md5,
# an exact integer < 2^60 on both engines; dividing by this constant
# maps it into [0, 1). 15 digits (not 16) so the integer stays well
# inside BIGINT range for DuckDB's ('0x…')::BIGINT parse.
_KMV_SCALE = float(16**15)


def kmv_distinct(
    df: DataFrame,
    value_col: str = "value",
    group_col: str | None = None,
    k: int = 64,
    n_salts: int = 64,
) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002):
    keep the k smallest md5 hashes of the distinct values; estimate
    |distinct| = (k−1)/h_(k) where h_(k) is the k-th smallest hash
    mapped into [0,1). Deterministic — md5, no RNG — so the estimate is
    bit-reproducible on any engine / partitioning / retry, unlike
    HLL-based approx_count_distinct whose register layout is
    engine-specific.

    Output: one row per group: (group?, k_used, kmv_frac, n_distinct_est)
    — when the group has fewer than k distinct values the sketch IS the
    value set and the estimate is exact (= k_used).

    Scale: bottom-k is an algebraic (mergeable) aggregate. Phase 1
    computes a per-(group, salt) bottom-k with collect_list state
    bounded by distinct/n_salts; phase 2 merges the ≤ k·n_salts
    survivors per group. No window over a whole group's hash stream, no
    driver state; raise n_salts with the data so phase-1 state stays
    executor-sized.
    """
    groups = [group_col] if group_col else []
    h = F.lower(F.md5(F.col(value_col).cast("string")))
    distinct_h = df.select(*groups, h.alias("h")).distinct()
    bottom_k = F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs")
    phase1 = (
        distinct_h.groupBy(
            *groups,
            (
                F.conv(F.substring("h", 25, 4), 16, 10).cast("long") % n_salts
            ).alias("_salt"),
        )
        .agg(bottom_k)
        .select(*groups, F.explode("hs").alias("h"))
    )
    # the global (ungrouped) aggregate emits one row even over empty
    # input — a (k_used=0, null, null) sketch; drop it (grouped mode
    # never produces empty groups)
    merged = phase1.groupBy(*groups).agg(bottom_k).filter(F.size("hs") > 0)
    kth = F.element_at("hs", F.size("hs"))
    # string → long → double, NOT string → double: DuckDB's oracle path
    # is ('0x'||hex)::BIGINT::DOUBLE, and long→double rounding is the
    # IEEE step both engines share for the 60-bit integer.
    frac = (
        F.conv(F.substring(kth, 1, 15), 16, 10).cast("long").cast("double")
        / F.lit(_KMV_SCALE)
    )
    k_used = F.size("hs")
    return merged.select(
        *groups,
        k_used.cast("long").alias("k_used"),
        F.round(frac, 9).alias("kmv_frac"),
        F.round(
            F.when(k_used < k, k_used.cast("double")).otherwise(
                F.lit(float(k - 1)) / frac
            ),
            6,
        ).alias("n_distinct_est"),
    )


def sequential_poisson_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling: the k items (per group) with the
    smallest priority xi = u_i / w_i, where u_i is the md5-derived
    uniform of the item's id. Sequential Poisson Sampling (Ohlsson,
    1998) — an approximate probability-proportional-to-size design used
    for exactly this shape of corpus subsampling ("sample documents
    proportional to token count").

    Engine-portable BY CONSTRUCTION, unlike Exp(w)-key A-ES sampling:
    u_i = (first 15 md5 hex digits as int) / 2^60 is exact binary
    arithmetic, and xi = u_i / w_i is ONE IEEE division (correctly
    rounded everywhere) — no pow/log whose last-ulp differences across
    libm implementations could flip a rank. Ranks tie-break on id, so
    the selected set is a pure function of (ids, weights, k).

    Scale shape: one window top-k per group (rank + filter ⇒ Spark's
    TakeOrdered-style partial top-k per partition before the exchange);
    no RNG state, no driver pass. Re-running on any partitioning or
    engine reproduces the same sample — the same reproducibility
    contract as hash_stratified_sample, extended to weights.
    """
    from pyspark.sql.window import Window

    if k <= 0:
        raise ValueError(f"sequential_poisson_sample: k must be > 0, got {k}")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")  # string → long → double: both hops exactly
        .cast("double")  # mirror DuckDB's ('0x'||hex)::BIGINT::DOUBLE
        / F.lit(float(1 << 60))
    )
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w > 0).withColumn("xi", u / w)
    part = Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ranked = keyed.withColumn(
        "rk", F.row_number().over(part.orderBy(F.col("xi").asc(), F.col(id_col).asc()))
    )
    return ranked.filter(F.col("rk") <= k).drop("rk")
