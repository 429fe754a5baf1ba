package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** DSv2 runtime filtering (r14 verdict #3): a broadcast join's dim keys
  * prune a bucket-partitioned Graft fact scan AT EXECUTION TIME inside one
  * plan — Spark's dynamic-pruning subquery calls the SPJ scan's
  * SupportsRuntimeFiltering.filter with the collected build-side keys, and
  * the scan empties every bucket those keys cannot hash into. No extra
  * driver job, no eager collect (the scanWithRuntimeFilter API twin does
  * that); observability lands in QUERY_HISTORY as a `runtime-in` row.
  */
class DppSpec extends SparkSpec {

  private def allPlans(plan: SparkPlan): Seq[SparkPlan] =
    plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .flatMap(p => p +: p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan })

  // shared by both tests and evaluated on first use, so either test runs
  // standalone (r15 self-review: the second test must not depend on the
  // first's side effects)
  private lazy val fixtureReady: Unit = {
    spark.conf.set("spark.sql.catalog.dpp", classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.dpp.warehouse", tempWarehouse())
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql(
      "CREATE TABLE dpp.db.fact (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(16, k))")
    spark.sql(
      "INSERT INTO dpp.db.fact SELECT id % 400 AS k, CAST(id AS DOUBLE) AS v " +
        "FROM range(0, 20000)")
    spark.range(0, 400).selectExpr("id AS k", "concat('d', id) AS name")
      .createOrReplaceTempView("dpp_dim")
  }

  test("broadcast-join dim keys prune the fact scan at execution time") {
    fixtureReady
    graft.table.QueryHistory.clear()
    // the selective filter sits on a NON-join dim column: nothing is
    // statically inferrable onto the fact key, so only the runtime filter
    // can prune the fact read — the exact scenario DPP exists for
    val q = spark.sql(
      """SELECT f.k, count(*) AS n, sum(f.v) AS sv
        |FROM dpp.db.fact f JOIN dpp_dim d ON f.k = d.k
        |WHERE d.name IN ('d3', 'd7', 'd11')
        |GROUP BY f.k ORDER BY f.k""".stripMargin)
    val rows = q.collect()
    // correctness: identical to the unfiltered-scan answer
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 7L, 11L))
    assert(rows.map(_.getLong(1)).forall(_ == 50L),
      s"each key appears 20000/400 = 50 times: ${rows.mkString(",")}")
    // the runtime-filter subquery must sit in the EXECUTED DSv2 plan
    val plans = allPlans(q.queryExecution.executedPlan)
    assert(plans.exists(_.toString.contains("dynamicpruning")),
      s"no dynamic-pruning runtime filter in:\n${q.queryExecution.executedPlan}")
    assert(plans.exists(_.toString.contains("graft-spj")),
      s"fact scan must be the DSv2 batch scan:\n${q.queryExecution.executedPlan}")
    // and the scan must have recorded an execution-time prune: 3 keys hash
    // into <= 3 of 16 buckets
    val rf = graft.table.QueryHistory.all
      .filter(m => m.table == "db.fact" && m.predicate.startsWith("runtime-in"))
    assert(rf.nonEmpty, "the scan must record its runtime-filter prune")
    val m = rf.last
    assert(m.filesTotal > 1 && m.filesScanned < m.filesTotal,
      s"runtime filter must prune files: ${m.filesScanned}/${m.filesTotal}")
    assert(m.partitionsScanned <= 3,
      s"3 keys hash into <= 3 buckets: ${m.partitionsScanned}/${m.partitionsTotal}")
  }

  test("runtime-filtered result matches the unfiltered plan row for row") {
    fixtureReady
    // guard against over-pruning: disable DPP, re-run, compare — the
    // conf restore sits in a finally so a failure cannot leak a
    // DPP-disabled session into later suites
    val q =
      """SELECT f.k, count(*) AS n, sum(f.v) AS sv
        |FROM dpp.db.fact f JOIN dpp_dim d ON f.k = d.k
        |WHERE d.k % 97 = 5
        |GROUP BY f.k ORDER BY f.k""".stripMargin
    val withDpp = spark.sql(q).collect()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val without =
      try spark.sql(q).collect()
      finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    assert(withDpp.toSeq == without.toSeq)
  }
}
