"""Event sessionization — gap-based session assignment over the events
table, the event-time analog of the corpus operators (usage analytics /
interaction-log curation for training data).

Semantics (matches Spark's native session_window, verified by
cross-validation test): two consecutive events of the same key belong
to one session iff the gap between them is AT MOST `gap_seconds` —
an event landing exactly on the previous session's end extends it; a
session's end is last_ts + gap.
`sessionize` derives this portably (lag + running sum — the same SQL
runs on DuckDB for the oracle), and tests cross-validate it against
F.session_window so the batch derivation and the streaming-native
operator provably agree.

Scale: the window partitions by the session key (user) — per-user event
counts are bounded in practice, so no hot-reducer risk of the kind a
global sort would have; the two windows share one (user, ts) sort, and
the session aggregate is a map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_session_id(events: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", gap_seconds: int = 1800) -> DataFrame:
    """Assign `session_seq` (0-based per user) to every event: a new
    session starts when the gap from the previous event EXCEEDS gap
    (native session_window boundary semantics: equal-to-gap merges)."""
    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(user_col).orderBy(ts)
    prev = F.lag(ts).over(w)
    # gap math on INTEGER microseconds (unix_micros), never float
    # seconds: exact at any precision and bit-identical across engines
    # (DuckDB epoch_us) for the oracle
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev) > gap_seconds * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    seq = F.sum(new_sess).over(
        Window.partitionBy(user_col).orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)) - 1
    return events.withColumn("session_seq", seq.cast("int"))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               value_col: str = "value") -> DataFrame:
    """Per-session aggregate: (user, session_seq, session_start,
    session_end, n_events, sum_value). session_end = last event + gap,
    matching session_window's window.end. value_col names the summed
    measure (output column stays `sum_value`)."""
    ts = F.col(ts_col).cast("timestamp")
    marked = with_session_id(events.withColumn(ts_col, ts), user_col,
                             ts_col, gap_seconds)
    return (marked.groupBy(user_col, "session_seq")
            .agg(F.min(ts_col).alias("session_start"),
                 F.timestamp_micros(
                     F.unix_micros(F.max(ts_col)) + gap_seconds * 1_000_000)
                 .alias("session_end"),
                 F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value")))


def session_window_counts(events: DataFrame, user_col: str = "user_id",
                          ts_col: str = "ts", gap: str = "30 minutes",
                          value_col: str = "value") -> DataFrame:
    """The same aggregate via Spark's NATIVE session_window — works on a
    batch DataFrame and, with a watermark, on a stream (state evicted
    past the watermark; the streaming path for this operator). Returns
    the same columns as sessionize() minus session_seq.

    The cast projection is SKIPPED when ts_col is already a timestamp:
    replacing a watermarked column with an expression (even an identity
    cast) drops the watermark tag, and the downstream streaming
    aggregate then rejects append mode."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if not isinstance(events.schema[ts_col].dataType,
                      (TimestampType, TimestampNTZType)):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (events
            .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(user_col, F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))
