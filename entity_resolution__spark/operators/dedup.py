"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash banding, SimHash, and n-gram Jaccard
near-dup — each over a (doc_id, text) table. Hash primitives are md5 /
xxhash64-free where DuckDB-oracle parity matters: md5 hex strings order
identically everywhere, so MinHash here is "min of md5(token ⊕ seed)"
— portable, deterministic, and still a uniform random permutation per
seed. The ER pipeline's high-performance numpy MinHash lives in
operators/blocking.py; this module favors oracle-checkable portability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_resolution__spark.operators.textstats import tokens_col


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicates by md5(text): keep min id per digest, count dupes.

    A single hash-shuffle groupBy; at 100 TB this is the cheapest dedup
    pass (map-side partial agg on the digest)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_md5(tokens: Column, seed: int) -> Column:
    """Portable MinHash: min md5 hex of (seed:token) over distinct tokens."""
    return F.array_min(
        F.transform(
            F.array_distinct(tokens),
            lambda t: F.md5(F.concat(F.lit(f"{seed}:"), t)),
        )
    )


def minhash_signature(df: DataFrame, n_hashes: int = 8, text_col: str = "text") -> DataFrame:
    toks = tokens_col(F.col(text_col))
    cols = [minhash_md5(toks, s).alias(f"mh_{s}") for s in range(n_hashes)]
    return df.select("*", *cols)


def minhash_buckets(
    df: DataFrame, n_hashes: int = 8, band_size: int = 2, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding on the md5 MinHash: bucket = md5(band signature).
    Docs sharing a bucket are near-dup candidates."""
    sig = minhash_signature(df, n_hashes, text_col)
    bands = []
    for b in range(0, n_hashes, band_size):
        parts = [F.col(f"mh_{s}") for s in range(b, b + band_size)]
        bands.append(
            F.struct(
                F.lit(b // band_size).alias("band"),
                F.md5(F.concat_ws("|", *parts)).alias("bucket"),
            )
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over distinct tokens via xxhash64 bit votes.

    For each bit position, the majority vote of token-hash bits. Stays
    entirely in Catalyst: aggregate over the token array accumulating 64
    counters, then reassemble. Near-dup candidates = equal band slices.
    """
    toks = F.array_distinct(tokens)
    n = F.size(toks)
    # counters: array of 64 ints, counter[i] += bit_i(hash(tok)).
    # shift amounts must be Python ints (the fn signature), so the 64
    # per-bit expressions are generated in a Python loop, not a lambda.
    counters = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1).cast("long"))
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(
            F.element_at(counters, i + 1) * 2 >= n,
            F.lit(1 << i).cast("long") if i < 63 else F.lit(-(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        sim = sim.bitwiseOR(bit)
    return sim


def ngram_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set of the normalized token stream."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block: Column | None = None,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard ≥ threshold. Pairs come from
    a blocking column (default: first token) — never the full cross join.
    """
    b = block if block is not None else F.try_element_at(tokens_col(F.col(text_col)), F.lit(1))
    base = df.select(
        F.col(id_col).alias("id"),
        b.alias("bk"),
        ngram_shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.col("bk").isNotNull())
    # CPU-heavy per-pair arrays: force the join across all cores — a
    # small single-file scan would otherwise run the whole block join in
    # one task (broadcast join keeps the scan's partitioning)
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "bk"
    )
    l, r = base.alias("l"), base.alias("r")
    pairs = l.join(r, "bk").filter(F.col("l.id") < F.col("r.id"))
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        pairs.select(
            F.col("l.id").alias("id_left"),
            F.col("r.id").alias("id_right"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .dropDuplicates(["id_left", "id_right"])
    )
