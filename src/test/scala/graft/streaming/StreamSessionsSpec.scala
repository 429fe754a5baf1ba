package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native session_window semantics the g_stream_sessions gate
  * and its oracle rely on: (1) the merge boundary is INCLUSIVE — a gap
  * of exactly 30 minutes still merges (windows merge when next.start <=
  * prev.end), so a new session starts iff gap > 30 min, the same strict
  * boundary sessionRollup/Sessionize implement; (2) the native
  * aggregation must reproduce sessionRollup's per-user rollup on the
  * real fixture — a cross-operator check between session_window and the
  * flatMapGroupsWithState-based Sessionize it shares semantics with —
  * including a PLANTED exactly-30-min tie, which both operators merge
  * (inclusive boundaries on both sides).
  */
class StreamSessionsSpec extends SparkSpec {

  private def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("session_window boundary: an exactly-30-min gap still MERGES") {
    import spark.implicits._
    val df = Seq(
      (1L, t("10:00")), (1L, t("10:30")),  // gap == 30 min -> merges: 1 session
      (2L, t("10:00")), (2L, t("10:29")),  // gap < 30 min  -> 1 session
      (3L, t("10:00")), (3L, t("10:31"))   // gap > 30 min  -> 2 sessions
    ).toDF("user_id", "ts")
    val got = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("evs"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), s"got $got")
    // and Sessionize agrees ON THE TIE: it extends a session when
    // ts - last <= gap, the same inclusive boundary — so the two
    // operators agree even at exactly-30-min gaps, user 1 included
    val rollup = graft.queries.Extensions
      .sessionRollup(spark, df, gapMs = 30L * 60 * 1000)
      .select("user_id", "n_sessions")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rollup == got, s"Sessionize diverged at the tie: $rollup vs $got")
  }

  test("batch session_window rollup equals sessionRollup on the tie-free fixture") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, d)
    // Defense-in-depth, NOT an agreement precondition: both operators
    // merge an exactly-30-min tie (session_window inclusively per the
    // test above; Sessionize extends on ts - last <= gap), so they agree
    // at ties too — the planted-tie assertion above proves it. This
    // check just records that the REAL fixture happens to be tie-free,
    // so a future fixture regeneration that lands ties is surfaced here
    // rather than silently changing what the cross-check exercises.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val ties = ev
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull &&
        col("ts").cast("timestamp").cast("long") -
          col("prev").cast("timestamp").cast("long") === 1800L)
      .count()
    assert(ties == 0L, s"fixture has $ties exact 30-min ties; agreement check is vacuous")

    val native = ev
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("evs"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max(col("evs")).as("max_session_events"),
        sum(col("evs")).as("total_events"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rollup = graft.queries.Extensions
      .sessionRollup(spark, ev, gapMs = 30L * 60 * 1000)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(native.toSeq == rollup.toSeq,
      s"native ${native.take(5).toSeq}... vs rollup ${rollup.take(5).toSeq}...")
  }
}
