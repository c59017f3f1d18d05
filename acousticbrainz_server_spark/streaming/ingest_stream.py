"""Streaming ingest + streaming stats (SURVEY.md §2.11).

The reference has no true stream processing — it polls every 30 s
(hl_extractor/hl_calc.py:22, dataset_eval/evaluate.py:22) and discovers work
with anti-joins/keyset cursors.  Structured Streaming with
``trigger(availableNow=True)`` reproduces those semantics exactly (at-least-
once micro-batches, resumable via checkpoint), and the 1-day stats rollup
becomes a watermarked tumbling window.

``submitted`` is ingest time (no late-data policy exists in the reference),
so the watermark is a formality that bounds state — at 100 TB it is what lets
the daily aggregation state be dropped instead of growing forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.ingest import ingest_lowlevel_batch
from ..schemas import LOWLEVEL_DOC

RAW_SUBMISSION_SCHEMA = T.StructType(
    [
        T.StructField("gid", T.StringType()),
        T.StructField("gid_type", T.StringType()),
        T.StructField("submitted", T.TimestampType()),
        T.StructField("data", LOWLEVEL_DOC),
    ]
)


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_duplicate_submissions: int = 10,
) -> StreamingQuery:
    """File-source streaming ingest: each micro-batch runs the full batch
    ingest pipeline (validate → dedup → offsets) against the CURRENT output
    table state, then appends — the streaming form of the reference's
    per-POST transaction, with cross-batch dedup/offset continuity provided
    by the anti-join against what is already written."""
    raw = spark.readStream.schema(RAW_SUBMISSION_SCHEMA).json(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        try:
            existing = batch_df.sparkSession.read.parquet(output_dir)
            existing_ll = existing.select("gid", "submission_offset")
            existing_sha = existing.select("data_sha256")
        except Exception:
            existing_ll = existing_sha = None
        res = ingest_lowlevel_batch(
            batch_df, existing_ll, existing_sha, max_duplicate_submissions=max_duplicate_submissions
        )
        res.accepted.write.mode("append").parquet(output_dir)

    return (
        raw.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_daily_counts(submissions: DataFrame, watermark: str = "1 day") -> DataFrame:
    """A8 as a streaming tumbling window: per-day submission counts split by
    lossless, state bounded by the watermark."""
    return (
        submissions.withWatermark("submitted", watermark)
        .groupBy(F.window("submitted", "1 day").alias("day_window"), "lossless")
        .agg(F.count(F.lit(1)).alias("n_submissions"))
        .select(
            F.col("day_window.start").alias("day"),
            "lossless",
            "n_submissions",
        )
    )


def streaming_dedup(submissions: DataFrame, watermark: str = "1 day") -> DataFrame:
    """E2 as streaming stateful dedup on the content hash
    (dropDuplicates within the watermark horizon)."""
    return submissions.withWatermark("submitted", watermark).dropDuplicates(["data_sha256"])


def streaming_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a broadcast
    dimension.  The static side is planned as a broadcast per micro-batch —
    no stream-side shuffle, no state store (contrast stream-stream joins,
    which buffer both sides in state).  The dimension is re-resolved per
    batch, so slowly-changing dims pick up updates between batches."""
    return stream.join(F.broadcast(dim), on, how)


def streaming_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization as a streaming session window — the streaming
    twin of the batch ``sessionize_events`` query (plans/relational.py).

    ``F.session_window`` keeps one open window per key in the state store,
    merging events that arrive within ``gap`` of the window and emitting the
    session when the watermark passes its close.  State is O(open sessions),
    bounded by the watermark horizon — never O(history).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------------------
# W1 as a CUSTOM STATEFUL operator: per-gid offset counter across micro-batches
# --------------------------------------------------------------------------------------
def assign_offsets_stateful(
    submissions: DataFrame,
    key_col: str = "gid",
    order_col: str | list[str] = "submitted",
) -> DataFrame:
    """Streaming ``submission_offset`` assignment (db/data.py:273-288) as an
    ``applyInPandasWithState`` operator: keyed state = the count of offsets
    already handed out for the gid, carried across micro-batches via the
    checkpoint — no re-read of the output table per batch (contrast
    ``stream_ingest``'s anti-join form; this is the low-latency path).

    State is one int per gid; at 100 TB of history the state store holds one
    row per DISTINCT recording, and the per-batch shuffle is only on the
    incoming micro-batch (grouped by gid), never the accumulated table.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    out_schema = T.StructType(
        submissions.schema.fields + [T.StructField("submission_offset", T.IntegerType())]
    )
    state_schema = T.StructType([T.StructField("n_assigned", T.IntegerType())])
    cols = [f.name for f in out_schema.fields]

    def assign(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        batch = batch.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        batch["submission_offset"] = range(n, n + len(batch))
        state.update((n + len(batch),))
        yield batch[cols]

    return submissions.groupBy(key_col).applyInPandasWithState(
        assign, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_ingest_stateful(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
) -> StreamingQuery:
    """File-source ingest with the stateful offset operator in the streaming
    plan (state restored from the checkpoint on every restart)."""
    raw = spark.readStream.schema(schema or RAW_SUBMISSION_SCHEMA).json(input_dir)
    assigned = assign_offsets_stateful(raw)
    return (
        assigned.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def assign_offsets_tws(
    submissions: DataFrame,
    key_col: str = "gid",
    order_col: str | list[str] = "submitted",
) -> DataFrame:
    """The same per-key offset counter as :func:`assign_offsets_stateful`,
    expressed in Spark 4's ``transformWithStateInPandas`` — the
    StatefulProcessor API that replaces ``applyInPandasWithState`` (typed
    state handles, timers, TTL).  The engine carries BOTH forms: the old
    API for parity with existing deployments, this one as the forward
    path.  State is a single-int ValueState per key; per-batch work is one
    sort + range assignment over the micro-batch's rows for that key.

    ENVIRONMENT-LIMITED: the TWS state server speaks protobuf and this
    container's google.protobuf install is broken (cannot pip install), so
    the operator is exercised by a skip-gated pytest rather than an
    oracle-gated registry query — the same stance as the Essentia binary
    and media codecs (README "Environment-limited operators").
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    out_schema = T.StructType(
        submissions.schema.fields + [T.StructField("submission_offset", T.IntegerType())]
    )
    cols = [f.name for f in out_schema.fields]

    class OffsetProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_assigned", "n_assigned INT")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
            batch["submission_offset"] = range(n, n + len(batch))
            self._n.update((n + len(batch),))
            yield batch[cols]

        def close(self) -> None:
            pass

    return submissions.groupBy(key_col).transformWithStateInPandas(
        OffsetProcessor(), out_schema, "Append", "None"
    )
