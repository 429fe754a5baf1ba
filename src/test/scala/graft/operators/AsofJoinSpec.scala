package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AS-OF semantics pinned on hand-built frames: inclusive same-instant
  * match, NULL padding when nothing precedes, latest-of-several wins,
  * per-key isolation — plus the plan contract (a window carry-forward,
  * never a nested-loop inequality join).
  */
class AsofJoinSpec extends SparkSpec {

  private def frames() = {
    import spark.implicits._
    // left: (id, k, t); right: (k, t, v)
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
      (4L, "b", 10L), (5L, "c", 10L)).toDF("id", "k", "t")
    val right = Seq(
      ("a", 10L, "a@10"), ("a", 15L, "a@15"), ("a", 7L, "a@7"),
      ("b", 11L, "b@11")).toDF("k", "t", "v")
    (left, right)
  }

  test("inclusive match, latest-prior wins, null when nothing precedes, per-key isolation") {
    val (left, right) = frames()
    val got = AsofJoin.asofJoin(left, right, "k", "t", "t")
      .select("id", "asof_t", "asof_v").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, Some(10L), Some("a@10")), // same instant matches (inclusive)
      (2L, Some(15L), Some("a@15")), // latest of several priors
      (3L, None, None),              // nothing precedes t=5
      (4L, None, None),              // b@11 is in the future
      (5L, None, None)))             // key c has no right rows at all
  }

  test("left columns pass through untouched; right payload is prefixed") {
    val (left, right) = frames()
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", prefix = "m_")
    assert(out.columns.toSeq == Seq("id", "k", "t", "m_t", "m_v"))
    assert(out.count() == 5)
  }

  test("null-ts right rows are dropped; reserved column names are refused") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val right = Seq(("a", Option.empty[Long], "ghost"), ("a", Some(4L), "real"))
      .toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "t")
      .select("asof_v").head.getString(0)
    assert(got == "real", "a NULL-ts right row must not carry forward")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left.withColumn("_asof_x", lit(1)), right, "k", "t", "t")
    }
  }

  test("plan: one window carry-forward, no nested-loop inequality join") {
    val (left, right) = frames()
    val plan = AsofJoin.asofJoin(left, right, "k", "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asof degenerated into a nested loop:\n$plan")
    assert(plan.contains("Window"), s"expected the window carry-forward:\n$plan")
    // the window partitions by the key — never a global single-partition sort
    assert("Window .*partitionBy".r.findAllIn(plan).isEmpty ||
      plan.contains("windowspecdefinition(k"), s"window not keyed:\n$plan")
  }

  test("agrees with a brute-force per-row scan on random data") {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    val leftRows = (1 to 200).map(i => (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(50).toLong))
    val rightRows = (1 to 100).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(50).toLong, i.toLong))
      // contract: unique (key, ts) on the right
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "t")
      .select("id", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expect = leftRows.map { case (id, k, t) =>
      id -> rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got == expect)
  }
}
