"""Custom stateful operator — parity with the reference's Processor API.

The reference's ``PurchaseQuantityAlertTrasformer`` (processor/
PurchaseQuantityAlertTrasformer.java:21-122) is a hand-built stateful
operator: per-record state mutation (running sum per (window, key),
:37-50), a timer (punctuator, :33), emission of closed windows over a
threshold (:56-84) and state GC (:85-89).

Spark twin: ``applyInPandasWithState`` — grouped state + timeouts.
This module implements the *event-time* variant (deterministic,
watermark-driven — the semantics the engine documents as primary);
the reference's wall-clock punctuator corresponds to
``GroupStateTimeout.ProcessingTimeTimeout`` with the same handler
logic (flip ``timeout`` to use it; non-deterministic in tests, so the
event-time path is what CI drives).

State schema: parallel arrays (window_start_ms[], sum[]) per key —
the exact information content of the reference's RocksDB store keyed
by ``windowStartMillis ++ productId`` (transformer:103-121), held
per-group by Spark's state store instead of byte-concatenated keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("alert_key", StringType()),
        StructField("window_start_ms", LongType()),
        StructField("total_sum_per_minute", DoubleType()),
    ]
)

STATE_SCHEMA = "starts array<long>, sums array<double>"

WINDOW_MS = 60_000


def _make_handler(threshold: float, window_ms: int):
    def handler(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # load state (parallel arrays -> dict)
        sums: dict[int, float] = {}
        if state.exists:
            starts, vals = state.get
            sums = dict(zip(starts, vals))

        # per-record state mutation (transformer:37-50): floor ts to
        # window, running sum per window
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            win = ts_ms - (ts_ms % window_ms)
            for w, v in zip(win, pdf["value"].to_numpy()):
                sums[int(w)] = sums.get(int(w), 0.0) + float(v)

        # emission: closed windows (end <= watermark), over threshold —
        # the punctuator's range scan (transformer:56-84); GC emitted
        # windows (transformer:85-87)
        wm = state.getCurrentWatermarkMs()
        closed = sorted(w for w in sums if w + window_ms <= wm)
        out = [
            (str(key[0]), w, round(sums[w], 2))
            for w in closed
            if round(sums[w], 2) > threshold
        ]
        for w in closed:
            del sums[w]

        if sums:
            state.update((list(sums.keys()), list(sums.values())))
            # wake up when the earliest open window can close
            state.setTimeoutTimestamp(min(sums) + window_ms)
        elif state.exists:
            state.remove()

        if out:
            yield pd.DataFrame(
                out, columns=["alert_key", "window_start_ms", "total_sum_per_minute"]
            )

    return handler


def windowed_sum_stateful(
    events_stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 150.0,
    watermark_delay: str = "2 minutes",
    window_ms: int = WINDOW_MS,
) -> DataFrame:
    """Reference Processor-variant semantics as a custom stateful op.

    Emits each (key, window) at most once — when the watermark closes
    the window — then deletes its state. Alerts only (sum > threshold),
    exactly like sendAlerts (transformer:63-84).
    """
    stream = events_stream.select(key_col, ts_col, value_col).withWatermark(
        ts_col, watermark_delay
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        _make_handler(threshold, window_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
