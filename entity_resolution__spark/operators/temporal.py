"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference engine is a batch entity-resolution pipeline with no
temporal operators; these are part of the training-data-pipeline family
this repo adds as first-class components (aligning event streams to
decision points, windowed context attachment for conversation turns).

Both are built so the 100 TB plan is the plan you'd want:

* ``asof_join`` does NOT join at all — it unions the two sides and takes
  one window pass per key (one shuffle on the key, linear work, no
  candidate blow-up). This is the classic scalable as-of formulation
  (union + last-non-null-over-ordered-window); a sort-merge band join
  would shuffle both sides anyway and then pay an O(n·m) merge within
  tied keys.
* ``range_join`` avoids the cartesian-with-filter trap: each side is
  bucketed into time bins sized to the window span, so a left row can
  only meet right rows in O(1) bins and the match becomes an equi-join
  on (key, bin) with the exact predicate applied after. Residual hot
  (key, bin) buckets are AQE skew-join territory (enabled in
  session.get_spark); the equi-join keeps them bounded by true temporal
  locality instead of the full key history.

Determinism: tie-breaks are explicit (caller-supplied tiebreak column),
so results are engine-reproducible and the DuckDB oracles in
__spark_entry__ pin them hash-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Integer epoch micros; parquet TIMESTAMP_NTZ needs an explicit
    cast (session TZ is pinned UTC in session.get_spark, so the NTZ →
    instant interpretation is deterministic)."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For every left row, attach the nearest right row per key.

    ``backward``: the right row with the greatest ``right_ts`` that is
    <= ``left_ts`` (most recent prior observation). ``forward``: the
    smallest ``right_ts`` >= ``left_ts``. Both inclusive. Unmatched left
    rows keep nulls. ``tolerance_sec`` bounds the match distance.

    Plan: union both sides tagged with a side bit, one window per key
    ordered by (ts, side, tiebreak), ``last``/``first`` over a single
    STRUCT of the right payload — one shuffle, zero joins, and every
    matched column is guaranteed to come from the SAME right row (per
    -column last() could mix rows when a payload column is null).

    Ties on ``right_ts`` within a key are broken by ``tiebreak``
    (greatest wins for backward, least for forward); without one the
    winner among exact-duplicate timestamps is unspecified — pass it
    whenever the right side is not unique per (key, ts).

    Scale: work and shuffle are O(|left| + |right|), partitioned by
    ``on``. A pathologically hot key serializes into one task — bound
    it upstream (e.g. sub-key by coarse time bucket when a single key
    can exceed a task's memory; events-per-user here is naturally
    bounded).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # round-6 ADVICE: the tiebreak is compared through a long cast — a
    # string/float column would silently become NULL and degrade the
    # documented deterministic tie order; reject it loudly instead. The
    # internal working columns are likewise reserved, not silently
    # shadowed.
    if tiebreak is not None:
        from pyspark.sql import types as T

        dt = right.schema[tiebreak].dataType
        if not isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise TypeError(
                f"asof_join: tiebreak column {tiebreak!r} must be an "
                f"integral type, got {dt.simpleString()}"
            )
    reserved = {"_t", "_side", "_tb", "_payload", "_m"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(
            f"asof_join: input columns collide with internal names {sorted(clash)}"
        )
    right_cols = list(right_cols or [c for c in right.columns if c not in on])
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols

    carry = [F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    # left rows sort AFTER right rows at equal ts for backward (so an
    # equal-ts right row is inside the frame => inclusive), BEFORE for
    # forward — encoded purely in the side bit
    left_side, right_side = (1, 0) if direction == "backward" else (0, 1)
    tb = F.col(tiebreak) if tiebreak else F.lit(0)

    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_t"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        # a TRUE null struct (when(False, ...)), not a struct of null
        # fields — last(ignorenulls) must skip left rows entirely, and a
        # non-null struct with null members would not be skipped
        F.when(
            F.lit(False),
            F.struct(
                *[
                    F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
                    for c in right_cols
                ]
            ),
        ).alias("_payload"),
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(right_side).alias("_side"),
        tb.cast("long").alias("_tb"),
        F.struct(*carry).alias("_payload"),
    ).select(*lt.columns)

    both = lt.unionByName(rt)
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_payload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("_payload", ignorenulls=True).over(w)

    out = both.withColumn("_m", matched).filter(F.col("_side") == left_side)
    if tolerance_sec is not None:
        tol_us = int(round(tolerance_sec * 1_000_000))
        gap = _us(F.col(f"_m.{right_ts}{suffix}")) - _us(F.col("_t"))
        in_tol = (
            (gap >= -tol_us) & (gap <= 0)
            if direction == "backward"
            else (gap >= 0) & (gap <= tol_us)
        )
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: float = 0.0,
    upper_sec: float = 0.0,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with equal keys and
    ``right_ts`` in [``left_ts + lower_sec``, ``left_ts + upper_sec``]
    (inclusive both ends).

    Plan: integer-microsecond time bins of width (upper-lower) — a left
    row's window spans at most 2 bins, a right row lands in exactly 1 —
    so the candidate set comes from an equi-join on (*on, bin) and the
    exact interval predicate filters after. No cartesian, no
    theta-join; candidate volume is bounded by rows per (key, 2·span)
    instead of rows per key. Comparisons are integer micros on both
    sides (and in the DuckDB oracle), so boundary inclusion is exact —
    no float-epoch edge cases.

    Output: key columns once, every non-key left column prefixed
    ``left_prefix``, every non-key right column prefixed
    ``right_prefix``.
    """
    if upper_sec < lower_sec:
        raise ValueError("upper_sec must be >= lower_sec")
    lo_us = int(round(lower_sec * 1_000_000))
    hi_us = int(round(upper_sec * 1_000_000))
    width = max(hi_us - lo_us, 1)

    lkeep = [c for c in left.columns if c not in on]
    rkeep = [c for c in right.columns if c not in on]

    lt = left.select(
        *[F.col(c) for c in on],
        _us(F.col(left_ts)).alias("_lt"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in lkeep],
    )
    rt = right.select(
        *[F.col(c) for c in on],
        _us(F.col(right_ts)).alias("_rt"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rkeep],
    )
    # floor-div bins; window [lt+lo, lt+hi] covers sequence(bin(lt+lo),
    # bin(lt+hi)) — at width = span that is <= 2 bins per left row
    lt = lt.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((F.col("_lt") + F.lit(lo_us)) / F.lit(width)),
                F.floor((F.col("_lt") + F.lit(hi_us)) / F.lit(width)),
            )
        ),
    )
    rt = rt.withColumn("_bin", F.floor(F.col("_rt") / F.lit(width)))
    joined = lt.join(rt, [*on, "_bin"]).filter(
        (F.col("_rt") >= F.col("_lt") + F.lit(lo_us))
        & (F.col("_rt") <= F.col("_lt") + F.lit(hi_us))
    )
    return joined.select(
        *[F.col(c) for c in on],
        *[F.col(f"{left_prefix}{c}") for c in lkeep],
        *[F.col(f"{right_prefix}{c}") for c in rkeep],
    )
