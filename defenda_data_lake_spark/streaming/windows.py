"""Event-time streaming operators over the normalized event stream.

The reference has no streaming SQL at all (queries are batch-on-files,
SURVEY.md §2B) — these operators are the engine's extension surface:
the same hourly-grain analytics the reference runs in Athena, available
continuously with bounded state.

* ``windowed_severity_counts`` — tumbling event-time windows with a
  watermark: the canonical "events per severity per 5 minutes" feed.
  State is bounded by the watermark delay; late events beyond it drop.
* ``SessionState``/``sessionize`` — a custom stateful operator via
  ``applyInPandasWithState``: per-source session tracking with an
  inactivity gap, the standard shape for security-event correlation
  (N failed logins in a session, etc.).  This is the pattern SURVEY.md
  §2B marks "available free if extended" — implemented here because
  the Presto surface cannot express it at all.

Scale notes: both operators shuffle once on their grouping key; state
lives in the state store partitioned the same way, so a 1000-executor
cluster splits both compute and state linearly.  Watermarks bound state
size; the sessionizer additionally times out idle state via
``GroupStateTimeout.EventTimeTimeout``.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_severity_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts by severity over the event-time column
    (``utctimestamp`` parsed to timestamp).  Works identically on batch
    and streaming DataFrames."""
    ts = F.to_timestamp(F.col("utctimestamp"))
    df = events.withColumn("event_time", ts)
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark_delay)
    return (
        df.groupBy(F.window("event_time", window_duration), F.col("severity"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "severity",
            "n_events",
        )
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_high_severity", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_high", T.LongType()),
    ]
)


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min inactivity gap


def _empty_sessions() -> pd.DataFrame:
    return pd.DataFrame(
        columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
    ).astype(
        {
            "source": "object",
            "session_start": "datetime64[ns]",
            "session_end": "datetime64[ns]",
            "n_events": "int64",
            "n_high_severity": "int64",
        }
    )


def _session_row(key, start_us, end_us, n_events, n_high) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "source": [key],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n_events],
            "n_high_severity": [n_high],
        }
    )


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-source inactivity-gap sessionizer.

    New events either extend the open session or — when they arrive more
    than the gap after its end — close it (emit) and open a new one.
    An idle open session is closed by the event-time timeout once the
    watermark passes ``end + gap``."""
    if state.hasTimedOut:
        start_us, end_us, n_events, n_high = state.get
        state.remove()
        yield _session_row(key[0], start_us, end_us, n_events, n_high)
        return

    rows = pd.concat(list(batches), ignore_index=True)
    times = pd.to_datetime(rows["utctimestamp"], utc=True, format="ISO8601")
    rows = rows.assign(
        _us=times.astype("int64") // 1000,
        _high=rows["severity"].str.upper().isin(["ERROR", "CRITICAL", "WARNING"]),
    ).sort_values("_us")

    closed: list[pd.DataFrame] = []
    if state.exists:
        start_us, end_us, n_events, n_high = state.get
    else:
        first = int(rows["_us"].iloc[0])
        start_us, end_us, n_events, n_high = first, first, 0, 0

    for us, high in zip(rows["_us"], rows["_high"]):
        us = int(us)
        if n_events > 0 and us - end_us > SESSION_GAP_US:
            closed.append(_session_row(key[0], start_us, end_us, n_events, n_high))
            start_us, n_events, n_high = us, 0, 0
        start_us = min(start_us, us)
        end_us = max(end_us, us) if n_events > 0 else us
        n_events += 1
        n_high += int(high)

    state.update((start_us, end_us, n_events, n_high))
    # close the remaining open session once the watermark passes end+gap.
    # Clamp to just above the current watermark: with a watermark delay
    # larger than the session gap, a late event can put end+gap BEHIND
    # the watermark, and an at-or-behind timeout raises and kills the
    # streaming query.
    timeout_ms = (end_us + SESSION_GAP_US) // 1000
    watermark_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, watermark_ms + 1))
    yield pd.concat(closed, ignore_index=True) if closed else _empty_sessions()


def sessionize(
    events: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Custom stateful streaming operator: per-source sessions with a
    30-minute inactivity gap via ``applyInPandasWithState``."""
    ts = F.to_timestamp(F.col("utctimestamp"))
    return (
        events.withColumn("event_time", ts)
        .withWatermark("event_time", watermark_delay)
        .groupBy("source")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_interval_enrich(
    facts: DataFrame,
    context: DataFrame,
    key: str,
    fact_ts: str = "ts",
    ctx_ts: str = "ts",
    max_lag_seconds: int = 300,
    watermark_seconds: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM interval enrichment: join each fact event to the
    context events of the same ``key`` that happened in the preceding
    ``max_lag_seconds`` — "attach the login that preceded this API
    call", the streaming twin of the batch as-of/range join family
    (``operators/asof.py``, q16/q29).

    Both sides carry a ``watermark_seconds`` event-time watermark, and
    the join condition bounds context time into
    ``[fact_ts - max_lag, fact_ts]`` — the time bound is what lets
    Spark EXPIRE buffered state: without it a stream-stream join
    buffers both sides forever (state grows with the stream; the time
    bound caps it at watermark + lag horizons per side).

    ``how='leftOuter'`` emits unmatched facts too — but only after the
    watermark passes (the engine must be sure no match can still
    arrive), so outer results trail by the watermark delay; ``inner``
    emits as soon as both sides are present.

    Scale: state is hash-partitioned by the join key like any
    stream-stream join; per-key state is bounded by the lag horizon,
    so total state is O(rate x (lag + watermark)), independent of
    stream length.  Returns fact columns (prefixed ``f_``) + matched
    context columns (prefixed ``c_``)."""
    if max_lag_seconds <= 0 or watermark_seconds < 0:
        raise ValueError(
            f"need max_lag_seconds > 0 and watermark_seconds >= 0; got "
            f"{max_lag_seconds}/{watermark_seconds}"
        )
    f = facts.select(
        [F.col(c).alias(f"f_{c}") for c in facts.columns]
    ).withWatermark(f"f_{fact_ts}", f"{watermark_seconds} seconds")
    c = context.select(
        [F.col(col).alias(f"c_{col}") for col in context.columns]
    ).withWatermark(f"c_{ctx_ts}", f"{watermark_seconds} seconds")
    cond = (
        (F.col(f"f_{key}") == F.col(f"c_{key}"))
        & (F.col(f"c_{ctx_ts}") <= F.col(f"f_{fact_ts}"))
        & (
            F.col(f"c_{ctx_ts}")
            >= F.col(f"f_{fact_ts}")
            - F.expr(f"INTERVAL {int(max_lag_seconds)} SECONDS")
        )
    )
    return f.join(c, cond, how)
