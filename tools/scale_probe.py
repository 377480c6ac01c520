"""Scale-up probe — reproduces the README "Measured scaling" numbers.

Builds an N× replica of the sf0.1 fact tables (key-shifted unions,
written with real split counts) in /tmp, runs headline queries warm at
both scales, and prints the ratio. Validates that plans parallelize
instead of degrading: ratios near 1.0 mean fixed per-query overhead
still dominates; ratios near N would flag a serial bottleneck.

Usage: python tools/scale_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_homework_spark import queries as Q  # noqa: E402
from kafka_streams_homework_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "price_alerts_priced",
    "windowed_sum",
    "price_alerts",
    "q3_shipping_priority",
    "q5_local_supplier",
    # §7 pipeline ops over the replicated documents corpus
    "lm_score",
    "pii_scrub",
    "stratified_sample",
    "token_count",
    "dedup_ngram_jaccard",
    # round-2 second wave
    "lm_score_bigram",
    "decontaminate",
    "repetition_score",
    "q18_large_orders",
    "windowed_distinct",
    "distinct_rollup_hll",
    # round-2 third wave
    "q8_market_share",
    "q21_waiting_orders",
    "bm25_rank",
    "cdc_chunks",
    "quantile_rollup_hist",
    "merge_apply_cdc",
]

FACT_KEYS = {
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
}


def replicate(spark, sf_dir: str, base: str, n: int) -> None:
    os.makedirs(base, exist_ok=True)
    for t, key in FACT_KEYS.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * 10_000_000)) for i in range(n)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{base}/{t}.parquet")
    for t in (
        "customer part orders supplier nation region embeddings".split()
    ):
        os.makedirs(f"{base}/{t}.parquet", exist_ok=True)
        shutil.copyfile(
            f"{sf_dir}/{t}.parquet", f"{base}/{t}.parquet/part-0.parquet"
        )


def warm_time(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).count()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    base = f"/tmp/scale_probe_{n}x"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, sf_dir, base, n)
    reg = Q.queries()
    try:
        print(f"{'query':28} {'1x':>7} {n}x{'':>5} ratio")
        for name in HEADLINE:
            t1 = warm_time(reg[name], spark, sf_dir)
            tn = warm_time(reg[name], spark, base)
            print(f"{name:28} {t1:7.2f} {tn:7.2f} {tn / t1:6.2f}")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
