package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-fill semantics pinned on hand-built series: zero-fill on the shared
  * calendar, LOCF across gaps (NULL before the first observation), per-key
  * isolation, the bounds contract, and the span cap's loud failure.
  */
class GapFillSpec extends SparkSpec {

  private def frames() = {
    import spark.implicits._
    val daily = Seq(
      ("a", "2024-01-02", 5L),
      ("a", "2024-01-04", 7L), // gap at 01-03
      ("b", "2024-01-05", 2L)) // nothing before 01-05
      .toDF("k", "day", "n")
      .select(col("k"), col("day").cast("date").as("day"), col("n"))
    val bounds = Seq(("2024-01-01", "2024-01-05")).toDF("d0", "d1")
      .select(col("d0").cast("date").as("d0"), col("d1").cast("date").as("d1"))
    (daily, bounds)
  }

  test("zero-fill, LOCF across gaps, NULL before first observation, per-key calendar") {
    val (daily, bounds) = frames()
    val got = GapFill.fillDaily(daily, bounds, Seq("k"), "day", "n")
      .select(col("k"), col("day").cast("string"), col("n"), col("n_locf"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == Set(
      ("a", "2024-01-01", 0L, None),      // before first observation
      ("a", "2024-01-02", 5L, Some(5L)),
      ("a", "2024-01-03", 0L, Some(5L)),  // gap: zero + carried 5
      ("a", "2024-01-04", 7L, Some(7L)),
      ("a", "2024-01-05", 0L, Some(7L)),  // trailing gap carries forward
      ("b", "2024-01-01", 0L, None),
      ("b", "2024-01-02", 0L, None),
      ("b", "2024-01-03", 0L, None),
      ("b", "2024-01-04", 0L, None),
      ("b", "2024-01-05", 2L, Some(2L))))
  }

  test("bounds contract and span cap fail loudly") {
    import spark.implicits._
    val (daily, bounds) = frames()
    intercept[IllegalArgumentException] {
      GapFill.fillDaily(daily, bounds.withColumnRenamed("d1", "hi"),
        Seq("k"), "day", "n")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val century = Seq(("1970-01-01", "2224-01-01")).toDF("d0", "d1")
      .select(col("d0").cast("date").as("d0"), col("d1").cast("date").as("d1"))
    val ex = intercept[Exception] {
      GapFill.fillDaily(daily, century, Seq("k"), "day", "n", maxSpanDays = 365).count()
    }
    assert(messages(ex).exists(_.contains("calendar span outside [1, 365] days")),
      s"expected the loud span message, got: ${messages(ex).mkString(" | ")}")
    // inverted bounds (the epoch-zero-sentinel shape) must fail loudly too —
    // Spark's sequence() would otherwise generate a DESCENDING calendar
    val inverted = Seq(("2024-06-01", "1970-01-01")).toDF("d0", "d1")
      .select(col("d0").cast("date").as("d0"), col("d1").cast("date").as("d1"))
    val ex2 = intercept[Exception] {
      GapFill.fillDaily(daily, inverted, Seq("k"), "day", "n").count()
    }
    assert(messages(ex2).exists(_.contains("calendar span outside")),
      s"expected the loud span message for inverted bounds, got: ${messages(ex2).mkString(" | ")}")
  }

  test("plan: calendar from a broadcast 1-row bound; LOCF window is keyed") {
    val (daily, bounds) = frames()
    val plan = GapFill.fillDaily(daily, bounds, Seq("k"), "day", "n")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected the 1-row bounds broadcast:\n$plan")
    assert(plan.contains("windowspecdefinition(k"), s"LOCF window not keyed:\n$plan")
  }
}
