"""Table profiling: the "ANALYZE TABLE"-style one-pass column summary
an engine owes its operators (reference has no profiling surface; this
is the engine-side utility the blocking/count tooling implies,
cf. /root/reference/src/blocking/visualize_k_value_for_blocking.py
computing ad-hoc column stats driver-side).

One DataFrame aggregation computes (rows, nulls, exact distinct) for
every column in a single logical pass; Spark expands the multi-distinct
aggregate into one Expand + partial aggs (still one scan of the table).
The k·3 scalars collect to the driver (K-row aggregate — the allowed
collect shape) and reshape to one row per column so downstream tooling
can join/filter on column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame) -> DataFrame:
    """df → (column, n_rows, n_nulls, n_distinct) per column.

    n_distinct is EXACT (count_distinct, null excluded) — profiling
    feeds dedup/blocking decisions where HLL's ±2% and engine-specific
    registers would make the profile non-reproducible; the cost is the
    expanded aggregate, paid once per profile run."""
    cols = df.columns
    if not cols:
        raise ValueError("profile_table: dataframe has no columns")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nul_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dis_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = [
        (c, int(row["_rows"]), int(row[f"_nul_{c}"]), int(row[f"_dis_{c}"]))
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows long, n_nulls long, n_distinct long"
    )
