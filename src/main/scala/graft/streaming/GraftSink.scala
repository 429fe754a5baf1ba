package graft.streaming

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming ingestion into Graft tables (SURVEY.md §2.8, W9; reference
  * docs/11-multi-engine-compatibility.md:44-52, docs/12:211-236).
  *
  * The reference's streaming model is continuous small-batch appends — each
  * micro-batch is one atomic Iceberg commit ("each DML = one commit",
  * docs/08:154). Structured Streaming's `foreachBatch` maps onto that
  * exactly: the sink below turns every micro-batch into one `table.append`
  * snapshot, giving exactly-once-per-batch table commits with streaming
  * file sizes governed by the table's TARGET_FILE_SIZE property
  * (docs/02:84-87 recommends 64-128 MB for streaming ingest).
  */
object GraftSink {

  /** Attach a Graft-table sink to a streaming DataFrame. Caller starts it:
    * {{{
    * GraftSink.appendTo(table, spark, stream, sinkId = "orders-ingest")
    *   .trigger(Trigger.ProcessingTime("30 seconds"))
    *   .start()
    * }}}
    * Commits carry `statementId = <sinkId>-batch-<id>`, so a micro-batch
    * replayed by checkpoint recovery is a no-op (exactly-once into the
    * table). `sinkId` must be stable across restarts AND unique per sink —
    * use the checkpoint location (or a name derived from it); two streams
    * writing the same table with the same sinkId would wrongly dedupe.
    */
  def appendTo(table: GraftTable, spark: SparkSession, stream: DataFrame,
               sinkId: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      table.append(spark, batch, statementId = Some(s"$sinkId-batch-$batchId"))
      ()
    }

  /** Drain all currently-available input into the table (test/backfill mode):
    * one commit per micro-batch, returns after the last batch. The
    * checkpoint path doubles as the sink identity.
    */
  def ingestAvailable(table: GraftTable, spark: SparkSession, stream: DataFrame,
                      checkpoint: String): StreamingQuery = {
    val q = appendTo(table, spark, stream, sinkId = checkpoint)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
    q
  }

  /** Bounded-state streaming dedup ingest (W9 + X1 composed, the 100 TB-safe
    * shape): drain `stage` into the table with cross-batch exact dedup on
    * `keyCol`, holding a key's state only until the watermark passes its
    * event time + `delay` — state scales with the EVENT-TIME HORIZON, not
    * with stream history, which is what lets the same pipeline ingest an
    * unbounded stream. The g_stream_dedup_watermark gate and ScaleSmoke
    * contract 9 both run THIS helper (the smoke certifies shipped code).
    *
    * `tsCol` arrives as TIMESTAMP_NTZ in the fixture tables; watermarks
    * need an instant column, so it is cast through TIMESTAMP (UTC session
    * — identical instants) and back for the sink.
    */
  def dedupIngestWithinWatermark(table: GraftTable, spark: SparkSession,
                                 schema: org.apache.spark.sql.types.StructType,
                                 stage: String, checkpoint: String,
                                 delay: String, keyCol: String = "event_id",
                                 tsCol: String = "ts",
                                 maxFilesPerTrigger: Int = 2): StreamingQuery = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(stage)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCol)
      .withColumn(tsCol, col(tsCol).cast("timestamp_ntz"))
    ingestAvailable(table, spark, stream, checkpoint)
  }

  /** Incremental bronze→silver transform keyed on a high-watermark column
    * (docs/12:94-104). Exact-once under replays because the watermark is
    * read from the committed target snapshot.
    *
    * Boundary semantics: without `boundaryKeys`, rows STRICTLY newer than
    * the target's max are returned — a source row landing LATER with a
    * watermark EQUAL to an already-synced max is missed, so this mode
    * requires the watermark column to be strictly increasing in arrival
    * order. When late same-valued arrivals are possible, pass
    * `boundaryKeys` (key columns preserved into the target): the boundary
    * value is re-read inclusively and already-ingested keys are
    * anti-joined away — exact, and the re-scan is bounded to rows AT the
    * boundary value, not the table. NULL-watermark rows are always
    * excluded (they cannot participate in watermark ordering; previously
    * they were ingested on the FIRST sync but silently dropped on every
    * later one — same row, arrival-time-dependent fate).
    */
  def incrementalNewRows(spark: SparkSession, source: DataFrame,
                         target: GraftTable, watermarkCol: String,
                         boundaryKeys: Seq[String] = Nil): DataFrame = {
    val wmRow = target.toDF(spark).agg(max(col(watermarkCol)).as("wm")).head()
    val nonNull = source.filter(col(watermarkCol).isNotNull)
    if (wmRow.isNullAt(0)) nonNull
    else if (boundaryKeys.isEmpty) nonNull.filter(col(watermarkCol) > lit(wmRow.get(0)))
    else {
      val wm = lit(wmRow.get(0))
      val seen = target.toDF(spark).filter(col(watermarkCol) === wm)
        .select(boundaryKeys.map(col): _*)
      nonNull.filter(col(watermarkCol) >= wm)
        .join(seen, boundaryKeys, "left_anti")
    }
  }
}
