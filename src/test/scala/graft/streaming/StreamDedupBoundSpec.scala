package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The 100 TB-safe streaming dedup: dropDuplicatesWithinWatermark keeps a
  * key's state only until the watermark passes its event time + delay.
  * This spec proves BOTH sides of the contract the g_stream_dedup_watermark
  * gate relies on: duplicates within the bound are dropped, and state is
  * EVICTED past the bound (row count shrinks; an expired key re-admits).
  */
class StreamDedupBoundSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark: in-bound dup dropped, state evicted past bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val stream = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = stream.writeStream
      .format("memory").queryName("dedup_wm").outputMode("append").start()
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      // batch 1: ids 1,2 plus an immediate duplicate of 1 -> dup dropped
      input.addData((1L, t("10:00")), (2L, t("10:00")), (1L, t("10:01")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 2)

      // batch 2: another in-bound duplicate of 1 -> still dropped
      input.addData((1L, t("10:05")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 2)
      val stateFull = q.lastProgress.stateOperators.head.numRowsTotal

      // batches 3+4: watermark advances far past 10:00+10min -> ids 1,2 evicted
      input.addData((3L, t("12:00")))
      q.processAllAvailable()
      input.addData((4L, t("12:01")))
      q.processAllAvailable()
      val stateAfter = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateAfter < stateFull + 2, // ids 1,2 gone though 3,4 were added
        s"state must evict expired keys: before=$stateFull after=$stateAfter")

      // batch 5: id 1 BEYOND the bound re-admits -> bounded state means
      // dedup is scoped to the event-time window, by design
      input.addData((1L, t("12:02")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").filter($"id" === 1L).count() == 2,
        "a key past its watermark bound must be re-admitted (state was freed)")
    } finally q.stop()
  }
}
