"""Data-layout management — pay the write once, skip the shuffle/scan
forever.

At 100 TB the dominant costs are (a) re-shuffling fact tables for
every join/agg on the same key and (b) scanning rows a query never
needed. Both are LAYOUT problems, solved at write time:

- ``write_bucketed``: hash-bucket + sort the table on its hot key
  (Spark bucketed table, Hive-compatible). Any later join or
  aggregation keyed on the bucket columns reuses the stored
  partitioning — zero Exchange in the plan (asserted in
  tests/test_plans.py). This is the batch twin of the reference's
  co-partitioned-topic requirement: Kafka Streams joins demand the
  topics be partitioned alike (the GlobalKTable in
  dsl/PriceAlertsApp.java:91-95 exists to dodge exactly that); here
  the engine materializes the co-partitioning once.

- ``write_clustered``: range-cluster the files on (typically) a
  (key, time) prefix — repartitionByRange + sortWithinPartitions, a
  single-dimension Z-order stand-in built from Spark primitives. Each
  parquet file then covers a narrow slice of the cluster columns, so
  its footer min/max stats (zone maps) let selective scans skip whole
  files/row-groups. Unlike partitionBy it never creates small files
  for high-cardinality keys — cardinality-proof.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a bucketed, bucket-sorted managed table.

    `buckets` should be sized so one bucket of the LARGEST co-located
    table fits an executor core's working memory at target scale
    (bytes / buckets ≈ 128-512 MB); co-joining tables must use the
    same bucket count and key to join shuffle-free.
    """
    writer = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-cluster into `n_files` sorted parquet files.

    repartitionByRange samples the cluster columns and assigns each
    output file a disjoint range; sortWithinPartitions orders rows
    inside the file so row-group min/max stats are tight. Scans
    filtering on a cluster-column prefix then skip non-overlapping
    files entirely (parquet footer pruning) — no partition directories
    needed, no small-file explosion at high key cardinality.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative ints in [0, 2^bits).

    Bit j of x lands at position 2j, bit j of y at 2j+1 — pure
    shift/and/or expressions, fully inside whole-stage codegen (the
    expression tree is wide but constant-folded per row; no Python).
    """
    z = F.lit(0).cast("long")
    for j in range(bits):
        xbit = F.shiftright(x.cast("long"), j).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), j).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * j)).bitwiseOR(
            F.shiftleft(ybit, 2 * j + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 10,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """2-D Z-order layout: cluster files along a Morton curve so scans
    filtering on EITHER (or both) of two columns skip files from
    parquet footer min/max stats.

    ``write_clustered`` (lexicographic range-cluster) prunes only on
    the leading column: file ranges of the second column span the full
    domain. Interleaving the bits of both dimensions keeps each file's
    bounding box small in BOTH — the standard multi-dimensional
    clustering trick (Delta/Iceberg OPTIMIZE ZORDER BY) built from
    Spark primitives: scale to 2^bits ranks, Morton-interleave,
    repartitionByRange + sort on the z-value, drop the helper column.

    Dimension scaling uses global min/max from one bounded agg (two
    scalar rows to the driver — same footprint class as the k-means
    centroid collect, documented acceptable). At 100 TB the write is
    one range-shuffle of the fact table — paid once, amortized over
    every later 2-D selective scan.
    """
    lo_x, hi_x, lo_y, hi_y = (
        df.agg(
            F.min(col_x).cast("double"),
            F.max(col_x).cast("double"),
            F.min(col_y).cast("double"),
            F.max(col_y).cast("double"),
        ).first()
    )
    top = (1 << bits) - 1

    def scaled(c: str, lo: float, hi: float) -> Column:
        span = (hi - lo) or 1.0
        return (
            (F.col(c).cast("double") - F.lit(lo)) * top / F.lit(span)
        ).cast("long")

    z = zvalue(scaled(col_x, lo_x, hi_x), scaled(col_y, lo_y, hi_y), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
