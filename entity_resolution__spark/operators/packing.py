"""Sequence packing for training-data pipelines (concat-and-chunk).

Pretraining dataloaders concatenate documents into a token stream per
shard and slice fixed `seq_len` windows off it (GPT-style packing —
documents may CROSS window boundaries). The operator computes, fully
declaratively, where every document lands in that layout:

  shard     — hash bucket (the unit of concatenation; a worker's stream)
  offset    — the document's start position in its shard's token stream
  bin_start — first seq_len window the document touches
  bin_end   — last window it touches (== bin_start when it fits in one)

One hash shuffle on the shard key + one running-sum window per shard —
no UDF, no driver state; at 100 TB the shard count is chosen so each
shard's stream fits a task (AQE splits stragglers). Deterministic:
the within-shard order is the sort on the id column, so the layout is
reproducible run-to-run and engine-to-engine (the DuckDB oracle
recomputes it exactly).

The reference has no packing stage (its corpus is one CSV of short
strings); this extends the engine's training-data family (dedup /
quality / token-budget) per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entity_resolution__spark.operators.textstats import bpe_ish_count


def pack_documents(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
    shard: Column | None = None,
) -> DataFrame:
    """(doc_id, shard, n_tokens, offset, bin_start, bin_end) per doc.

    `token_count` defaults to the BPE-ish counter (regex token classes);
    `shard` defaults to pmod(xxhash64(id), n_shards) — pass a portable
    expression (e.g. id % n_shards) when an external system must
    reproduce the layout. Zero-token documents occupy no stream space:
    they are pinned to bin_end = bin_start at their offset."""
    n_tok = (token_count if token_count is not None else bpe_ish_count(F.col(text_col)))
    shard_expr = (
        shard
        if shard is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    base = df.select(
        F.col(id_col),
        shard_expr.cast("long").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    offset = (cum - F.col("n_tokens")).alias("offset")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        offset,
        F.floor((cum - F.col("n_tokens")) / seq_len).cast("long").alias("bin_start"),
        F.when(F.col("n_tokens") > 0, F.floor((cum - 1) / seq_len))
        .otherwise(F.floor((cum - F.col("n_tokens")) / seq_len))
        .cast("long")
        .alias("bin_end"),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard packing summary: documents, token totals, windows used
    (= ceil(stream length / seq_len)), and fill ratio of the last-window
    padding model — the numbers a dataloader capacity plan needs."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / F.lit(seq_len)).cast("long").alias("n_windows"),
        )
        .withColumn(
            "fill_ratio",
            F.round(
                F.col("total_tokens")
                / (F.col("n_windows") * F.lit(seq_len)).cast("double"),
                6,
            ),
        )
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
    range_shard: Column | None = None,
) -> DataFrame:
    """Data-mixing sampler: take documents per group (in id order) until
    the group's TOKEN budget is reached — how a pretraining mixture
    ("20M tokens of en, 8M of de, …") is materialized from a corpus.

    Deterministic take rule: a document is kept iff the group's running
    token total BEFORE it is still under the budget — so the document
    that crosses the boundary is included (budgets are floors, the
    standard mixture semantics) and the selection is reproducible under
    any shuffle. Groups without a budget contribute nothing.

    Scale: the default path runs ONE running-sum window partitioned by
    the group — groups are few (languages/sources), so at 10¹² docs a
    whole group would land on one task. Pass `range_shard` — any
    expression MONOTONE in the id within each group (e.g.
    `doc_id // 10**7` for dense int ids, a date bucket for time-ordered
    ids) — to switch to the two-phase prefix-sum form: per-(group,
    shard) token sums (a small aggregate) give each shard its broadcast
    prefix offset, and the running sum runs per (group, shard) — every
    window partition is shard-bounded. Results are IDENTICAL (the
    prefix decomposition of the same running sum; parity-tested).

    Returns (id, group, n_tokens, cum_tokens) for the kept documents.
    """
    n_tok = (
        token_count if token_count is not None else bpe_ish_count(F.col(text_col))
    )
    bmap = F.create_map(
        *[x for k, v in sorted(budgets.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    budget = F.coalesce(bmap[F.col(group_col)], F.lit(0)).cast("long")
    cols = [
        F.col(id_col),
        F.col(group_col),
        n_tok.cast("long").alias("n_tokens"),
    ]
    if range_shard is None:
        w = (
            Window.partitionBy(group_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        base = df.select(*cols).withColumn(
            "cum_tokens", F.sum("n_tokens").over(w)
        )
    else:
        base = df.select(*cols, range_shard.cast("long").alias("_shard"))
        shard_sums = base.groupBy(group_col, "_shard").agg(
            F.sum("n_tokens").alias("_shard_tokens")
        )
        w_sh = (
            Window.partitionBy(group_col)
            .orderBy("_shard")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        prefixes = shard_sums.withColumn(
            "_prefix", F.sum("_shard_tokens").over(w_sh) - F.col("_shard_tokens")
        ).select(group_col, "_shard", "_prefix")
        w_in = (
            Window.partitionBy(group_col, "_shard")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        base = (
            base.join(F.broadcast(prefixes), [group_col, "_shard"])
            .withColumn(
                "cum_tokens", F.col("_prefix") + F.sum("n_tokens").over(w_in)
            )
            .select(id_col, group_col, "n_tokens", "cum_tokens")
        )
    return base.filter((F.col("cum_tokens") - F.col("n_tokens")) < budget)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / long-context
    pretraining splitter): chunk i covers tokens
    [i·stride, i·stride + chunk_tokens) with stride = chunk_tokens −
    overlap; the last chunk may be short; a doc with no tokens yields no
    chunks. Chunk text is the space-join of the NORMALIZED token stream
    (the engine's [a-z0-9]+ tokens — chunking is a token-space
    operation; callers needing original spans keep offsets instead).

    Pure Catalyst (sequence + explode + slice), no shuffle at all — at
    100 TB this fuses into the scan projection and the row count fans
    out ~n_tokens/stride per doc, exactly the partition shape a
    downstream embedder wants.

    Output: (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    from entity_resolution__spark.operators.textstats import tokens_col

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor(
            (F.greatest(n - chunk_tokens, F.lit(0)) + (stride - 1)) / stride
        ).cast("int")
        + 1
    )
    base = df.select(F.col(id_col), toks.alias("_toks"), n_chunks.alias("_k"))
    return (
        base.filter(F.col("_k") > 0)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("_k") - 1)).alias("chunk_id"),
            "_toks",
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(
                F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
            ).alias("_c"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_c").cast("long").alias("n_chunk_tokens"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )
