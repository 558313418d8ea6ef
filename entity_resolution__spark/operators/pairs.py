"""Candidate-pair generation from blocking keys, skew-aware.

Within-block self-join with canonical ordering (id_left < id_right)
replaces the reference's per-row top-k neighbor emit
(/root/reference/scripts/run_blocking.py:42-57) + canonicalize/dedup
(/root/reference/scripts/make_candidate_pairs.py:38-46).

Skew (north_rule "salted block keys"): a hot key of size n makes the
naive self-join emit n² rows through one shuffle partition. `candidate_
pairs` therefore (1) drops blocks larger than `max_block` (they are
stopword-grade keys carrying no signal — same spirit as the reference's
max_df=0.9 cutoff at scripts/run_blocking.py:19), and (2) for remaining
blocks over `salt_threshold` splits members into S salted sub-blocks and
enumerates sub-block PAIRS (i ≤ j) so every original pair appears in
exactly one (key, salt_i, salt_j) task — the triangle join. AQE's
skew-join split is the backstop for residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_sizes(blocks: DataFrame) -> DataFrame:
    return blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("block_size"))


def candidate_pairs(
    blocks: DataFrame,
    max_block: int = 2000,
    salt_threshold: int = 200,
    n_salts: int = 8,
) -> DataFrame:
    """blocks(conv_id, block_key) → (id_left, id_right) canonical, deduped.

    A pair sharing several keys is emitted once (dropDuplicates on the
    pair). Salting: members of big blocks get salt = pmod(xxhash64(id),
    S); pair tasks enumerate (salt_i, salt_j) with i ≤ j via a small
    cross of the salt range, keeping the per-task row count ~(n/S)².
    """
    spark = blocks.sparkSession
    sized = blocks.join(F.broadcast(block_sizes(blocks)), "block_key").filter(
        F.col("block_size") <= max_block
    )

    small = sized.filter(F.col("block_size") <= salt_threshold).select(
        "block_key", "conv_id"
    )
    big = sized.filter(F.col("block_size") > salt_threshold).select(
        "block_key", "conv_id"
    )

    l, r = small.alias("l"), small.alias("r")
    pairs_small = l.join(r, "block_key").filter(F.col("l.conv_id") < F.col("r.conv_id"))
    pairs_small = pairs_small.select(
        F.col("l.conv_id").alias("id_left"),
        F.col("r.conv_id").alias("id_right"),
        "block_key",
    )

    # triangle join for hot blocks
    salted = big.withColumn("salt", F.pmod(F.xxhash64("conv_id"), F.lit(n_salts)))
    salt_pairs = spark.range(n_salts).select(F.col("id").alias("si")).crossJoin(
        spark.range(n_salts).select(F.col("id").alias("sj"))
    ).filter(F.col("si") <= F.col("sj"))
    lhs = salted.join(
        F.broadcast(salt_pairs), salted["salt"] == F.col("si")
    ).select("block_key", "conv_id", "si", "sj")
    rhs = salted.select(
        F.col("block_key").alias("block_key_r"),
        F.col("conv_id").alias("conv_id_r"),
        F.col("salt").alias("salt_r"),
    )
    pairs_big = lhs.join(
        rhs,
        (F.col("block_key") == F.col("block_key_r"))
        & (F.col("sj") == F.col("salt_r")),
    ).filter(
        # same-salt task handles its own triangle; cross-salt tasks take all
        F.when(
            F.col("si") == F.col("sj"), F.col("conv_id") < F.col("conv_id_r")
        ).otherwise(F.col("conv_id") != F.col("conv_id_r"))
    )
    pairs_big = pairs_big.select(
        F.least("conv_id", "conv_id_r").alias("id_left"),
        F.greatest("conv_id", "conv_id_r").alias("id_right"),
        "block_key",
    )

    return (
        pairs_small.unionByName(pairs_big)
        .dropDuplicates(["id_left", "id_right"])
        .select("id_left", "id_right", "block_key")
    )


def collapse_undirected_max(
    scored: DataFrame,
    left: str = "id_left",
    right: str = "id_right",
    value: str = "prob_match",
) -> DataFrame:
    """Undirected max-collapse: (a,b)/(b,a) duplicates keep the max value
    (reference scripts/run_blocking.py:59-67 sort+group-first idiom →
    one groupBy(max), no sort)."""
    other = [c for c in scored.columns if c not in (left, right)]
    return (
        scored.select(
            F.least(left, right).alias(left),
            F.greatest(left, right).alias(right),
            *other,
        )
        .groupBy(left, right)
        .agg(F.max(value).alias(value))
    )


def attach_pair_payload(
    pairs: DataFrame, conv: DataFrame, cols: list[str], broadcast_dim: bool = False
) -> DataFrame:
    """Join conversation payload columns onto both sides of each pair.

    The reference does this with two driver-side dict lookups
    (/root/reference/scripts/run_blocking.py:71-76); here it is two hash
    joins (broadcast when the conversations table is dimension-sized,
    shuffle hash join keyed on conv_id otherwise — never a driver map).
    """
    payload = conv.select("conv_id", *cols)
    if broadcast_dim:
        payload = F.broadcast(payload)
    else:
        # payload rows carry token/role arrays — broadcasting them makes
        # the driver build a huge relation single-threaded (measured
        # ~60s serial on a 76k-conversation table). Shuffle-hash join
        # keeps both sides distributed and skips the sort.
        payload = payload.hint("shuffle_hash")
    left = payload.select(
        F.col("conv_id").alias("id_left"),
        *[F.col(c).alias(f"{c}_l") for c in cols],
    )
    right = payload.select(
        F.col("conv_id").alias("id_right"),
        *[F.col(c).alias(f"{c}_r") for c in cols],
    )
    return pairs.join(left, "id_left").join(right, "id_right")
