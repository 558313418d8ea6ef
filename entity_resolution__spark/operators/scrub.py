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
