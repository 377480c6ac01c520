"""Custom stateful operator on the Spark 4 transformWithStateInPandas API.

Second implementation of the reference's hand-built processor
(processor/PurchaseQuantityAlertTrasformer.java:21-122) — same
semantics as streaming/stateful.py (applyInPandasWithState), but on the
modern StatefulProcessor API, which maps the reference's constructs
1:1:

- RocksDB store keyed by ``windowStartMillis ++ productId``
  (transformer:103-121) → ``MapState[start_ms -> total]`` per group key
  (the group key IS the productId part; Spark shards it);
- ``context.schedule(ONE_MINUTE, ...)`` punctuator (transformer:33) →
  ``handle.registerTimer(window_end)`` with ``timeMode="eventTime"``,
  fired via ``handleExpiredTimer`` — per-window timers instead of a
  global wall-clock scan;
- emit-over-threshold + delete (transformer:63-88) → emit in the timer
  handler, then ``removeKey`` (state GC).

Event-time timers fire off the watermark, so tests are deterministic
(the wall-clock variant is the same code with timeMode="processingTime").

Runtime dependency note: transformWithStateInPandas drives its Python
worker over a protobuf channel — ``google.protobuf`` must be installed
on workers. This container lacks it, so the pytest case auto-skips and
``streaming/stateful.py`` (applyInPandasWithState — no protobuf
dependency) remains the CI-verified stateful path; both implement the
same semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.stateful_processor import ExpiredTimerInfo, TimerValues

from kafka_streams_homework_spark.streaming.stateful import OUTPUT_SCHEMA, WINDOW_MS


class WindowedAlertProcessor(StatefulProcessor):
    """Per-key windowed SUM with emit-once-on-close + state GC."""

    def __init__(self, threshold: float = 150.0, window_ms: int = WINDOW_MS):
        self._threshold = threshold
        self._window_ms = window_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._wins = handle.getMapState("wins", "start_ms long", "total double")

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        # per-record state mutation (transformer:37-50): floor ts to the
        # window, add to the running sum, arm a timer at window end
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            win = ts_ms - (ts_ms % self._window_ms)
            for w, v in zip(win, pdf["value"].to_numpy()):
                w = int(w)
                prev = self._wins.getValue((w,)) if self._wins.containsKey((w,)) else None
                total = (prev[0] if prev else 0.0) + float(v)
                self._wins.updateValue((w,), (total,))
                self._handle.registerTimer(w + self._window_ms)
        return iter([])

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # punctuator twin (transformer:56-90): emit the closed window if
        # over threshold, then delete its state
        end_ms = expiredTimerInfo.getExpiryTimeInMs()
        start_ms = end_ms - self._window_ms
        if not self._wins.containsKey((start_ms,)):
            return iter([])
        total = round(self._wins.getValue((start_ms,))[0], 2)
        self._wins.removeKey((start_ms,))
        if total > self._threshold:
            return iter(
                [
                    pd.DataFrame(
                        {
                            "alert_key": [str(key[0])],
                            "window_start_ms": [start_ms],
                            "total_sum_per_minute": [total],
                        }
                    )
                ]
            )
        return iter([])

    def close(self) -> None:
        pass


def windowed_sum_stateful_v2(
    events_stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 150.0,
    watermark_delay: str = "2 minutes",
    window_ms: int = WINDOW_MS,
) -> DataFrame:
    """Reference Processor-variant semantics via transformWithStateInPandas."""
    stream = events_stream.select(key_col, ts_col, value_col).withWatermark(
        ts_col, watermark_delay
    )
    return stream.groupBy(key_col).transformWithStateInPandas(
        WindowedAlertProcessor(threshold, window_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
