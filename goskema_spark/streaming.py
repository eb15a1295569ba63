"""Structured Streaming surface.

goskema's "streaming" is incremental token parsing of one document
(reference README.md:281-308, dsl/object_stream.go) — NOT event-time
stream processing. The distributed analog the north star asks for is:
validate micro-batches of an unbounded corpus stream and maintain
event-time windowed aggregates with late-data handling.

Two pieces:

  validate_stream  readStream -> foreachBatch(batch validator) — the
                   whole batch check set (row pass + referential) runs
                   per micro-batch; violations/ledger rows append to
                   sinks. Uniqueness within a micro-batch is exact;
                   global streaming uniqueness would need state
                   (dropDuplicates withWatermark) and is exposed via
                   `dedup_stream`.
  windowed_counts  watermarked tumbling-window aggregation (late rows
                   beyond the watermark are dropped by Spark's state
                   eviction — the streaming analog of the drift
                   histogram).
  dedup_stream     watermarked streaming dropDuplicates on doc_id —
                   streaming uniqueness enforcement.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

from goskema_spark.runner import validate
from goskema_spark.schema import TableSchema


def validate_stream(
    stream_df: DataFrame,
    schema: TableSchema,
    row_id,
    dims: Optional[dict] = None,
    on_batch: Optional[Callable] = None,
    violations_sink: Optional[str] = None,
    checkpoint: Optional[str] = None,
):
    """Attach the batch validator to a streaming DataFrame via
    foreachBatch. Returns the DataStreamWriter (caller starts it with
    .trigger(...).start() or availableNow)."""

    def process(batch_df: DataFrame, batch_id: int):
        res = validate(batch_df, schema, row_id, dims=dims)
        # try/finally: a schema with a broadcast="auto" unique key persists
        # a dup-key probe relation per batch — without the release a
        # long-running stream grows executor caches without bound
        try:
            viols = res.violations.withColumn("batch_id", F.lit(batch_id)) \
                .withColumn("params", F.to_json("params"))
            if violations_sink:
                # exactly-once under micro-batch REPLAY: foreachBatch is
                # at-least-once, so a retried batch re-runs process() with
                # the same batch_id — dynamic overwrite of the batch_id
                # partition REPLACES that batch's rows instead of appending
                # duplicates (same protocol as the batch ledger,
                # ledger.run_with_ledger's violations write)
                (viols.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id")
                 .parquet(violations_sink))
            if on_batch is not None:
                on_batch(res, batch_id)
        finally:
            res.unpersist()

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def windowed_counts(stream_df: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type", window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — late data beyond
    `watermark` is dropped, state is evicted (bounded memory at scale)."""
    # watermarks need TIMESTAMP (with tz); parquet TIMESTAMP_NTZ is cast
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n", "sum_value")
    )


def streaming_unique_violations(stream_df: DataFrame, key_col: str = "doc_id",
                                ordinal_col: str = "_ord") -> DataFrame:
    """CROSS-micro-batch uniqueness with first-occurrence attribution —
    the custom stateful operator (applyInPandasWithState) extending
    rules.UniqueBy (reference rules/rules.go:104-137) to unbounded
    streams. Per-batch validate() only sees duplicates WITHIN one
    micro-batch and dedup_stream silently drops rows; this keeps
    (first_ordinal, count) state per key and EMITS a `uniqueness`
    violation row for every non-first occurrence, whichever micro-batch
    it arrives in.

    Attribution semantics: `first` is the FIRST-SEEN ordinal (the
    minimum of the key's first micro-batch; never lowered afterwards) —
    identical to the batch result when ordinals arrive non-decreasing
    (the normal append-log case). A late-arriving smaller ordinal is
    itself flagged against the stored first (deterministic, documented
    divergence from a global batch sort — exact late handling would
    need per-key ordinal retention, unbounded state).

    State: ONE long per distinct key — bounded by the key cardinality,
    the same footprint class as dropDuplicates state. Output mode
    'update' (violations append-only per trigger)."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_t = T.StructType([
        T.StructField(key_col, T.StringType()),
        T.StructField("dup_ord", T.LongType()),
        T.StructField("first_ord", T.LongType()),
        T.StructField("code", T.StringType()),
    ])
    state_t = T.StructType([T.StructField("first", T.LongType())])

    def track(key, pdfs, state):
        import pandas as pd

        ords = []
        for pdf in pdfs:
            ords.extend(int(o) for o in pdf[ordinal_col].dropna())
        ords.sort()
        first = state.get[0] if state.exists else None
        rows = []
        for o in ords:
            if first is None:
                first = o
            elif o != first:
                rows.append((key[0], o, first, "uniqueness"))
        if first is not None:  # all-null ordinals: nothing to remember
            state.update((first,))
        yield pd.DataFrame(rows, columns=[key_col, "dup_ord", "first_ord", "code"])

    return (stream_df
            .select(F.col(key_col).cast("string").alias(key_col),
                    F.col(ordinal_col))
            .filter(F.col(key_col).isNotNull())
            .groupBy(key_col)
            .applyInPandasWithState(track, out_t, state_t, "update",
                                    GroupStateTimeout.NoTimeout))


def dedup_stream(stream_df: DataFrame, key: str = "doc_id",
                 ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming uniqueness: exactly-once KEYS within the watermark
    horizon — dropDuplicatesWithinWatermark dedups on the key alone
    (state evicted past the watermark, so memory stays bounded), unlike
    dropDuplicates([key, ts]) which would pass the same doc_id through
    whenever the timestamp differs."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    wm = stream_df.withWatermark(ts_col, watermark)
    return wm.dropDuplicatesWithinWatermark([key])
