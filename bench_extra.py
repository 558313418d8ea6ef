"""Extra benchmarks for optimization work (guide §1.4): per-query
noop-sink isolation + .explain("formatted") capture, independent of the
frozen bench.py. Never used by the driver; cite numbers in
OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py --reps 3 [--plans-dir plans/r07 --suffix before] \
      [--queries q1,q2,...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from entity_resolution__spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "pricing_summary", "top_revenue", "window_order_rank", "events_hourly",
    "tokenize_stats", "exact_dedup", "minhash_signature",
    "ngram_neardup_pairs", "lang_quality", "embedding_topk", "knn_join",
    "simhash", "cc_clusters", "cohort_clusters", "quality_gate",
    "contamination", "kmv_distinct",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default="/tmp/bench_extra.json")
    ap.add_argument("--no-neardup-reset", action="store_true",
                    help="keep the shared neardup cache between reps "
                    "(bench.py semantics: first toucher pays)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    spark = get_spark(
        "bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    queries = entrymod.queries()

    # same warmup as bench.py: codegen + Python worker spinup
    queries["tokenize_stats"](spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x * 1.0

    spark.range(100_000).repartition(cpus).select(
        F.sum(_warm(F.col("id").cast("double")))
    ).collect()

    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        walls = []
        for rep in range(args.reps):
            # bench.py parity: each rep starts from the cache state the
            # driver's per-query loop sees (pre-existing keys stay)
            if not args.no_neardup_reset and name in (
                "ngram_neardup_pairs",
            ):
                getattr(entrymod, "_NEARDUP_CACHE", {}).clear()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"walls": walls, "min": min(walls)}
        print(f"  {name}: {walls}", file=sys.stderr, flush=True)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)

    out = {
        "sf_dir": sf_dir, "cpus": cpus, "reps": args.reps,
        "results": results,
        "total_min": round(sum(r["min"] for r in results.values()), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["min"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
