"""Windowed streaming aggregation with late-data handling.

The reference has no stream operators (its crawl loop is a polling batch
driver, crawler/main.go:451-515) — this module is part of the
training-data-pipeline surface: continuous event telemetry (ingest counters,
crawl rates — what the reference logs per iteration at crawler/main.go:504-513)
as a Structured Streaming query with a watermark for late events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """(window, event_type) → count + Σvalue; watermark bounds state for late
    rows. Works identically on a batch or streaming DataFrame (plan parity)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
SESSION_STATE = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),   # epoch seconds
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("session_no", T.LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_s: int = 1800, watermark: str = "0 seconds",
                      retention_s: int | None = None) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): per-user
    gap sessionization with state carried across micro-batches. A session
    closes when a later event arrives more than gap_s after it (emitted with
    the same (user_id, session_no, n_events, total_value) row the batch
    sessionizer produces) or when event-time timeout fires; the still-open
    session per user lives in the state store.

    After a timeout emission the state is NOT dropped: a sentinel row
    (n_events=0) keeps the per-user session counter so a returning user
    continues at session_no+1 instead of duplicating already-emitted keys.
    The sentinel itself expires after retention_s (default 10×gap_s) so state
    stays bounded to recently-active users; a user returning after retention
    restarts numbering at 0 (documented trade-off: bounded state vs forever-
    monotone counters — pick retention accordingly).

    Batch parity holds for event streams ordered across micro-batches (each
    batch is sorted internally). A cross-batch LATE event joins the open
    session without rewinding its frontier (max(last_ts, t)) — the closest
    append-mode semantics to the batch result, since already-emitted
    sessions cannot be retracted; set a real watermark to bound how late
    that can happen.

    Scale posture: state is one tiny row per RECENTLY-ACTIVE user, keyed state
    store partitioning = groupBy(user_id) shuffle; per-batch work is
    vectorized pandas over that user's Arrow rows."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    retention = retention_s if retention_s is not None else 10 * gap_s
    if retention <= gap_s:
        raise ValueError("retention_s must exceed gap_s (sentinel outlives the session timeout)")

    def _set_timeout(state, target_ms: int):
        # EventTimeTimeout requires a timestamp strictly above the watermark
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(target_ms), wm + 1))

    def fn(key, pdfs, state: "GroupState"):
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, n, tv, sno = state.get
            if n == 0:
                state.remove()  # sentinel expired → forget the user entirely
                return
            # close the open session, keep the counter in a sentinel
            state.update((float(last_ts), 0, 0.0, int(sno) + 1))
            _set_timeout(state, (last_ts + retention) * 1000)
            yield pd.DataFrame(
                [{"user_id": user_id, "session_no": sno, "n_events": n, "total_value": tv}]
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts = rows["ts"].astype("int64").to_numpy() / 1e9  # epoch seconds
        val = rows["value"].to_numpy()
        if state.exists:
            last_ts, n, tv, sno = state.get
            if n == 0:
                last_ts = None  # sentinel: counter only, no open session
        else:
            last_ts, n, tv, sno = None, 0, 0.0, 0
        out = []
        for t, v in zip(ts, val):
            if last_ts is not None and t - last_ts > gap_s:
                out.append({"user_id": user_id, "session_no": sno,
                            "n_events": n, "total_value": tv})
                sno += 1
                n, tv = 0, 0.0
            # frontier never rewinds: a CROSS-BATCH late event (t < last_ts;
            # applyInPandasWithState does not watermark-filter input rows)
            # joins the open session, but moving last_ts backwards would
            # make the NEXT on-time event measure its gap from the stale
            # timestamp and split a session the batch sessionizer (which
            # sees the stream fully ordered) keeps together
            last_ts = t if last_ts is None else max(last_ts, t)
            n += 1
            tv += float(v)
        state.update((float(last_ts), int(n), float(tv), int(sno)))
        _set_timeout(state, (last_ts + gap_s) * 1000)
        yield pd.DataFrame(out, columns=["user_id", "session_no", "n_events", "total_value"])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(fn, SESSION_OUT, SESSION_STATE, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )


def stream_event_counts(spark: SparkSession, events_dir: str, checkpoint_dir: str, queryName: str = "event_counts"):
    """File-source streaming variant writing to an in-memory sink (tests/demo);
    production swaps source/sink for kafka/parquet without touching the agg."""
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = windowed_event_counts(src)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
