"""Structured Streaming pipelines — streaming parity for the reference.

The reference's runtime semantics fork (SURVEY.md §2.5):

- DSL variant: windowed KTable emits ON UPDATE (no suppress(),
  dsl/PriceAlertsApp.java:110-116) → ``outputMode("update")``.
- Processor variant: emits each window ONCE when closed, then deletes
  state (PurchaseQuantityAlertTrasformer.java:56-90) →
  ``withWatermark(...)`` + ``outputMode("append")`` (watermark GC
  replaces the manual range-scan-and-delete).
- Exact wall-clock-timer emission (punctuator, transformer:33) →
  stateful.windowed_sum_stateful (applyInPandasWithState).
"""

from kafka_streams_homework_spark.streaming.joins import interval_join_streams
from kafka_streams_homework_spark.streaming.price_alerts import (
    dedup_stream,
    latest_by_key_stream,
    price_alerts_stream,
    run_append,
    run_replace,
    run_to_memory,
    run_upsert,
    windowed_distinct_stream,
)
from kafka_streams_homework_spark.streaming.stateful import (
    windowed_sum_punctuated,
    windowed_sum_stateful,
)

__all__ = [
    "dedup_stream",
    "interval_join_streams",
    "latest_by_key_stream",
    "price_alerts_stream",
    "run_append",
    "run_replace",
    "run_to_memory",
    "run_upsert",
    "windowed_distinct_stream",
    "windowed_sum_punctuated",
    "windowed_sum_stateful",
]
