"""Stream-stream joins (north-star extension, SURVEY §7).

The reference joins a stream only against a GlobalKTable (dsl/
PriceAlertsApp.java:98-103); Kafka Streams' KStream-KStream windowed
join has no counterpart there. Structured Streaming expresses it as a
watermarked interval join: both sides declare watermarks, the join
condition carries a time band on both event-time columns, and Spark
GCs join state once the watermark passes a row's band — bounded state
on unbounded streams.

Scale: both sides shuffle on the equi key (co-partitioned state store
per key, same as Kafka Streams' windowed join); state per key is
bounded by the band width + watermark delay. The batch twin is
operators.relational.interval_join (oracle-checked in the registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "10 minutes",
    left_watermark: str = "2 minutes",
    right_watermark: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events landing in [left_ts, left_ts + upper].

    The attribution-window shape (impression → click within N minutes).
    Both watermarks are mandatory — they are what lets Spark drop join
    state; without them inner stream-stream joins would buffer forever.
    ``how`` may be 'inner' or the outer variants Spark supports for
    interval joins ('leftOuter', 'rightOuter', 'fullOuter') — outer
    rows emit only once the watermark proves no match can arrive.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
