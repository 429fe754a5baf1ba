package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pair-verification joins must DEGRADE, not die, past the broadcast
  * budget: below `graft.pairs.broadcast-max-rows` the candidate set is
  * force-broadcast (the fast path), above it the same joins run
  * stats-planned — and the results must be identical on both sides of the
  * threshold (the threshold is a physical-plan decision, never a semantic
  * one). Mirrors the MOR read path's delete-bytes fallback discipline.
  */
class PairBudgetSpec extends SparkSpec {

  // a corpus with planted near-dup pairs: every 5th doc re-appears with one
  // token changed, so the minhash buckets nominate real candidates
  private def corpus() = {
    import spark.implicits._
    val base = (1L to 40L).map(i => (i, s"alpha bravo charlie delta echo f$i golf hotel"))
    val dups = (1L to 40L).filter(_ % 5 == 0)
      .map(i => (i + 1000L, s"alpha bravo charlie delta echo f$i golf INDIA"))
    (base ++ dups).toDF("doc_id", "text")
  }

  private def runFamily(): (Set[(Long, Long)], Set[(Long, Long, Long)]) = {
    val docs = corpus()
    val jac = Extensions.pairJaccard(docs, Extensions.neardupCandidatePairs(docs))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edit = Extensions.pairEditDistance(docs, Extensions.neardupCandidatePairs(docs))
      .select("doc_a", "doc_b", "edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    (jac, edit)
  }

  test("planted-oversize pair set: identical results both sides of the budget") {
    val (jacFast, editFast) = runFamily()
    assert(jacFast.nonEmpty && editFast.nonEmpty, "fixture planted no candidates")
    // budget 0: EVERY candidate set is over budget — the forced-broadcast
    // hint disappears and (with auto-broadcast also off, as it would be for
    // a genuinely oversized set) the joins plan shuffled
    spark.conf.set("graft.pairs.broadcast-max-rows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (jacSlow, editSlow) = runFamily()
      assert(jacSlow == jacFast, "jaccard verification diverged past the budget")
      assert(editSlow == editFast, "edit verification diverged past the budget")
    } finally {
      spark.conf.unset("graft.pairs.broadcast-max-rows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("the fallback PLAN is shuffled; the fast path broadcasts") {
    val docs = corpus()
    def planOf() = Extensions
      .pairJaccard(docs, Extensions.neardupCandidatePairs(docs))
      .queryExecution.executedPlan.toString
    assert(planOf().contains("BroadcastHashJoin"),
      s"fast path lost the broadcast:\n${planOf()}")
    spark.conf.set("graft.pairs.broadcast-max-rows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf()
      assert(!p.contains("BroadcastHashJoin"),
        s"over-budget pair set still forced a broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled join under fallback:\n$p")
    } finally {
      spark.conf.unset("graft.pairs.broadcast-max-rows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("x_containment gate result is invariant to the budget") {
    val d = "/root/testdata/sf0.001"
    val gate = Extensions.entries.find(_._1 == "x_containment").get._2
    val fast = gate(spark, d).collect().map(_.toString).toSet
    spark.conf.set("graft.pairs.broadcast-max-rows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val slow = gate(spark, d).collect().map(_.toString).toSet
      assert(slow == fast, "containment diverged past the budget")
    } finally {
      spark.conf.unset("graft.pairs.broadcast-max-rows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
