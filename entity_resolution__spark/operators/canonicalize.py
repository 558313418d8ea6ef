"""Canonicalize transcripts: one row per conversation, turns ordered.

The graft invariant (BASELINE.json.input_hint): per-turn text equality
under STABLE turn ordering — input rows arrive shuffled; ordering must be
recovered from turn_idx, never from input order. The reference's analog
is the single `affil1` string per entity id
(/root/reference/src/common_methods.py:21-34); here the entity is a
conversation and its text is the ordered concatenation of turn texts.

Implementation note (scale): one groupBy(conv_id) with
sort_array(collect_list(struct(...))) — a single shuffle keyed on
conv_id, map-side partial aggregation, no window. A Window.partitionBy
(conv_id).orderBy(turn_idx) would shuffle identically but adds a sort
per partition AND a second pass to collapse rows; the struct-sort form
sorts only within each conversation's collected list. Conversations are
bounded (≤ hundreds of turns) so the per-group list is tiny; there is no
per-key skew beyond that bound at 10^12 turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution__spark.functions.normalize import norm_and_tokens, token_set


def canonicalize(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → CONVERSATIONS.

    sort_array on struct(turn_idx, ...) sorts lexicographically by the
    first field — turn_idx — giving the stable turn ordering; ties cannot
    occur (turn_idx unique per conv_id).
    """
    turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx"),
                F.col("text"),
                F.col("role"),
                # null tool → '' sentinel so the array slot is preserved
                F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
            )
        )
    )
    spark = transcripts.sparkSession
    conv = (
        transcripts.repartition(
            # tokenize/normalize UDFs downstream are CPU-bound on small
            # bytes: pre-shuffling on conv_id at full core-count keeps
            # AQE from coalescing the UDF stage to few tasks (the groupBy
            # reuses this partitioning, so no extra shuffle is added)
            spark.sparkContext.defaultParallelism,
            "conv_id",
        )
        .groupBy("conv_id")
        .agg(turns.alias("turns"))
        .select(
            "conv_id",
            F.size("turns").cast("int").alias("n_turns"),
            F.col("turns.text").alias("turn_texts"),
            F.col("turns.role").alias("roles"),
            F.col("turns.tool").alias("tools"),
            F.array_join(F.col("turns.text"), " ").alias("full_text"),
        )
    )
    conv = (
        conv.withColumn("_nt", norm_and_tokens(F.col("full_text")))
        .withColumn("norm_text", F.col("_nt.norm_text"))
        .withColumn("tokens", F.col("_nt.tokens"))
        .drop("_nt")
    )
    return conv.withColumn("token_set", token_set(F.col("tokens")))
