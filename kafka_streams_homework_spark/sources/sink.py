"""Sinks.

Reference: Kafka sink via ``.to(RESULT_TOPIC, Produced.with(...))``
(``dsl/PriceAlertsApp.java:134``) / ``topology.addSink``
(``processor/PriceAlertsApp.java:126-131``). Batch twin: parquet write;
streaming twin lives in ``streaming/`` (``writeStream``).

Scale note: writers run one task per partition — repartition before
write to control file count/size; never coalesce(1) a big result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_and_read_back(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    """Round-trip a result through the parquet sink (proves S5/S6)."""
    write_parquet(df, path)
    return spark.read.parquet(path)
