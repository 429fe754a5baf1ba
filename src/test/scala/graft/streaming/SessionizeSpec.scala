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
        (1L, ms("10:00"), ms("10:10"), 3),  // closed once the watermark passed
        (2L, ms("10:00"), ms("10:00"), 1),  // idle, flushed by timeout
        (1L, ms("12:00"), ms("12:00"), 1)), // flushed by timeout
        s"got $out")
    } finally q.stop()
  }

  test("late-but-valid out-of-order events merge backwards or form earlier sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 5L * 60 * 1000 // 5 min

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    // 1h watermark delay: events up to an hour late are still valid
    val events = input.toDF().toDF("userId", "ts")
      .withWatermark("ts", "1 hour")
      .as[Sessionize.Event]
    val q = Sessionize.sessions(events, gapMs).writeStream
      .format("memory").queryName("sess_ooo").outputMode("append").start()
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val ms = (hhmm: String) => t(hhmm).getTime
    try {
      // batch 1: open session at 12:00
      input.addData((1L, t("12:00")))
      q.processAllAvailable()
      // batch 2: two LATE events — 11:57 belongs to the 12:00 session
      // (within gap, start must move DOWN); 11:30 is its own earlier
      // session (25 min > gap before it). The old single-open-session fold
      // merged BOTH into [start=12:00], corrupting boundaries and counts.
      input.addData((1L, t("11:57")), (1L, t("11:30")))
      q.processAllAvailable()
      // watermark carriers so everything flushes (wm = 16:01 - 1h = 15:01)
      input.addData((9L, t("16:00")))
      q.processAllAvailable()
      input.addData((9L, t("16:01")))
      q.processAllAvailable()
      val out = spark.table("sess_ooo").as[Sessionize.Session].collect()
        .filter(_.userId == 1L).map(s => (s.startMs, s.endMs, s.events)).toSet
      assert(out == Set(
        (ms("11:30"), ms("11:30"), 1),
        (ms("11:57"), ms("12:00"), 2)),
        s"got $out")
    } finally q.stop()
  }

  test("property: streaming sessions == batch fold under random batch splits + jitter") {
    // the batch fold (sort everything, one pass) is the oracle; streaming
    // must produce the IDENTICAL session set no matter how events are cut
    // into micro-batches or locally reordered within the watermark bound
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 120L * 1000 // 2 min
    val rnd = new scala.util.Random(20260813L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 09:00:00").getTime

    for (trial <- 1 to 3) {
      // ~40 events over 3 users, clustered so sessions of several events
      // form; jitter keeps some events out of order but within the 10-min
      // watermark allowance
      val events = (1 to 40).map { i =>
        val user = 1L + rnd.nextInt(3)
        val cluster = rnd.nextInt(4) * (20 * 60 * 1000L) // four far-apart anchors
        val offset = rnd.nextInt(5) * 30 * 1000L         // in-session spread
        (user, new java.sql.Timestamp(base + cluster + offset))
      }
      val expected = Sessionize
        .sessionsBatch(events.toDF("userId", "ts").as[Sessionize.Event], gapMs)
        .collect().map(s => (s.userId, s.startMs, s.endMs, s.events)).toSet

      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val stream = input.toDF().toDF("userId", "ts")
        .withWatermark("ts", "10 minutes")
        .as[Sessionize.Event]
      val name = s"sess_prop_$trial"
      val q = Sessionize.sessions(stream, gapMs).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        // random batch cuts over a ROUGHLY time-ordered feed (sorted, then
        // local swaps within the watermark bound — arbitrary splits of a
        // fully shuffled feed would legitimately drop below-watermark rows)
        val feed = events.sortBy(_._2.getTime).toArray
        for (i <- feed.indices; j = i + rnd.nextInt(3))
          if (j < feed.length && math.abs(feed(i)._2.getTime - feed(j)._2.getTime) < 5 * 60 * 1000L) {
            val t = feed(i); feed(i) = feed(j); feed(j) = t
          }
        var rest = feed.toSeq
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(7)
          input.addData(rest.take(n))
          q.processAllAvailable()
          rest = rest.drop(n)
        }
        // watermark carriers flush every remaining open session
        input.addData((99L, new java.sql.Timestamp(base + 9 * 3600 * 1000L)))
        q.processAllAvailable()
        input.addData((99L, new java.sql.Timestamp(base + 9 * 3600 * 1000L + 1000)))
        q.processAllAvailable()
        val got = spark.table(name).as[Sessionize.Session].collect()
          .filter(_.userId != 99L).map(s => (s.userId, s.startMs, s.endMs, s.events)).toSet
        assert(got == expected,
          s"trial $trial: streaming ${got.toList.sorted} != batch ${expected.toList.sorted}")
      } finally q.stop()
    }
  }
}
