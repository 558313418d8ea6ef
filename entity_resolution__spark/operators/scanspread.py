"""Adaptive scan parallelization for narrow-input, compute-heavy plans.

A single-row-group parquet file scans as ONE task no matter how it is
split by bytes (row groups are the split unit), so every expensive
projection planned into the scan stage — tokenization, n-gram shingles,
per-row md5, decimal casts — runs serially (guide §2.5 input skew /
§6 input splits). The testdata tables are exactly this shape, and any
modest-sized single parquet written by pandas is too.

`spread_scan` repartitions the RAW rows across the session's cores
BEFORE such projections, but only when the scan's actual parallelism is
well under the core count — on a properly-split production table it is
a no-op, so plans stay shuffle-free at scale while small/skewed inputs
parallelize. Hash-partitioning on a provided key column keeps the
exchange deterministic (round-robin would add the sort-before-
repartition pass); results of any downstream aggregation/join are
partitioning-invariant, so query semantics are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition `df` to the default parallelism iff its current plan
    would execute in fewer than half that many tasks. Pass the table's
    id column(s) as `key_cols` for a sort-free deterministic exchange;
    with no columns, falls back to round-robin."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n * 2 >= par:
        return df
    if key_cols:
        return df.repartition(par, *key_cols)
    return df.repartition(par)
