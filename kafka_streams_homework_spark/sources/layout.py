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

from pyspark.sql import DataFrame, SparkSession


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


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
