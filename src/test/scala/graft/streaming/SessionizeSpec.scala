package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Custom per-key streaming state via flatMapGroupsWithState: gap-based
  * sessions close either by a later event beyond the gap or by event-time
  * timeout once the watermark passes last-event + gap.
  */
class SessionizeSpec extends SparkSpec {

  test("gap sessionization: event-closed and timeout-flushed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 30L * 60 * 1000 // 30 min

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("userId", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]

    val q = Sessionize.sessions(events, gapMs).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      // batch 1: user 1 has three events within the gap; user 2 one event
      input.addData((1L, t("10:00")), (1L, t("10:05")), (1L, t("10:10")), (2L, t("10:00")))
      q.processAllAvailable()
      assert(spark.table("sess").isEmpty, "no session should close yet")

      // batch 2: user 1 reappears 110 min later -> session 1 closes by event
      input.addData((1L, t("12:00")))
      q.processAllAvailable()

      // batches 3+4: watermark carriers -> idle sessions flush by timeout
      input.addData((3L, t("15:00")))
      q.processAllAvailable()
      input.addData((3L, t("15:01")))
      q.processAllAvailable()

      val out = spark.table("sess").as[Sessionize.Session].collect()
        .map(s => (s.userId, s.startMs, s.endMs, s.events)).toSet
      val ms = (hhmm: String) => t(hhmm).getTime
      assert(out == Set(
        (1L, ms("10:00"), ms("10:10"), 3),  // closed by the 12:00 event
        (2L, ms("10:00"), ms("10:00"), 1),  // idle, flushed by timeout
        (1L, ms("12:00"), ms("12:00"), 1)), // flushed by timeout
        s"got $out")
    } finally q.stop()
  }
}
