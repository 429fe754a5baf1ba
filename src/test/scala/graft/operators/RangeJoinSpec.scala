package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Point-in-interval semantics pinned on hand-built frames: half-open
  * [start, end) boundaries, bin-crossing intervals, overlapping intervals
  * emit one row each, NULL/inverted windows and NULL-ts points match
  * nothing, the per-interval explosion cap fails loudly — plus the plan
  * contract (a hash join on (key, bin), never a nested-loop inequality
  * join) and a brute-force random agreement check.
  */
class RangeJoinSpec extends SparkSpec {

  private val W = 1000000L // 1s bins for the hand-built frames

  private def frames() = {
    import spark.implicits._
    val points = Seq(
      (1L, "a", 1000000L),  // == start of a@[1s,3s): inclusive
      (2L, "a", 2400000L),  // inside both a13 and a2: overlap fan-out
      (7L, "a", 2999999L),  // last µs inside a@[1s,3s)
      (3L, "a", 3000000L),  // == end: excluded
      (4L, "a", 500000L),   // before every window
      (5L, "b", 1500000L),  // key isolation: b has its own window
      (6L, "c", 1500000L))  // key with no intervals
      .toDF("id", "k", "us")
      .withColumn("t", timestamp_micros(col("us")))
    val intervals = Seq(
      ("a", 1000000L, 3000000L, "a13"),   // crosses bins 1 and 2
      ("a", 2000000L, 2500000L, "a2"),    // overlaps a13 inside bin 2
      ("b", 1000000L, 2000000L, "b12"),
      ("b", 5000000L, 5000000L, "empty"), // end == start: matches nothing
      ("b", 9000000L, 8000000L, "inv"))   // inverted: matches nothing
      .toDF("k", "s_us", "e_us", "tag")
      .select(col("k"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"), col("tag"))
    (points, intervals)
  }

  test("half-open boundaries, bin crossing, overlap fan-out, key isolation") {
    val (points, intervals) = frames()
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
        binWidthMicros = W)
      .select("id", "iv_tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "a13"),             // start inclusive
      (2L, "a13"), (2L, "a2"), // overlapping windows both match
      (7L, "a13"),             // last µs before the exclusive end
      (5L, "b12")))            // 3 excluded at end; 4 before; 6 keyless
  }

  test("interval and point columns surface; NULL-ts points match nothing") {
    import spark.implicits._
    val (points, intervals) = frames()
    val out = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      binWidthMicros = W, prefix = "w_")
    assert(out.columns.toSeq == Seq("k", "id", "us", "t", "w_s", "w_e", "w_tag"))
    val nullPts = Seq((9L, "a")).toDF("id", "k")
      .withColumn("us", lit(null).cast("long"))
      .withColumn("t", timestamp_micros(col("us")))
    assert(RangeJoin.pointInInterval(nullPts, intervals, "k", "t", "s", "e",
      binWidthMicros = W).count() == 0)
  }

  test("per-interval bin explosion past the cap fails loudly") {
    val (points, intervals) = frames()
    val wide = intervals.limit(1)
      .withColumn("e", timestamp_micros(lit(3600L * 1000000L)))
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, wide, "k", "t", "s", "e",
        binWidthMicros = W, maxBinsPerInterval = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("spans more than 100 bins")),
      s"expected the loud cap message, got: ${messages(ex).mkString(" | ")}")
  }

  test("reserved/colliding column names are refused") {
    val (points, intervals) = frames()
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("_rj_x", lit(1)),
        intervals, "k", "t", "s", "e")
    }
    intercept[IllegalArgumentException] {
      // interval column "tag" would surface as iv_tag == existing point col
      RangeJoin.pointInInterval(points.withColumn("iv_tag", lit(1)),
        intervals, "k", "t", "s", "e")
    }
  }

  test("plan: hash join on (key, bin), never a nested-loop inequality join") {
    val (points, intervals) = frames()
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      binWidthMicros = W).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated into a nested loop:\n$plan")
    assert(plan.contains("_rj_bin"), s"expected the bin column in the join key:\n$plan")
  }

  test("far-future timestamps bin exactly (no double rounding past 2^53)") {
    import spark.implicits._
    // 9999-12-30T00:00:00Z in epoch micros — far past 2^53, where double
    // division would round; an exact hour-bin boundary by construction
    val b = 253402128000000000L
    val hour = 3600L * 1000000L
    val points = Seq(
      (1L, b),            // == start: inclusive
      (2L, b - 1L),       // 1µs before: out
      (3L, b + 2 * hour - 1L), // last µs inside
      (4L, b + 2 * hour)) // == end: out
      .toDF("id", "us")
      .select(col("id"), lit("k").as("k"), timestamp_micros(col("us")).as("t"))
    val intervals = Seq((b, b + 2 * hour)).toDF("s_us", "e_us")
      .select(lit("k").as("k"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"), lit("far").as("tag"))
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("agrees with a brute-force inequality scan on random data") {
    val rnd = new scala.util.Random(17)
    import spark.implicits._
    val pointRows = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(100).toLong * 250000L))
    val ivRows = (1 to 60).map { i =>
      val s = rnd.nextInt(100).toLong * 250000L
      (s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(8).toLong * 250000L, i.toLong)
    }
    val points = pointRows.toDF("id", "k", "us")
      .withColumn("t", timestamp_micros(col("us")))
    val intervals = ivRows.toDF("k", "s_us", "e_us", "iv_id")
      .select(col("k"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"), col("iv_id"))
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
        binWidthMicros = W)
      .select("id", "iv_iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (id, pk, pus) <- pointRows
      (ik, sus, eus, ivId) <- ivRows
      if pk == ik && pus >= sus && pus < eus
    } yield (id, ivId)).toSet
    assert(got == expect)
  }
}
