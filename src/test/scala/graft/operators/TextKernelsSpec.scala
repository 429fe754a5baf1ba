package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-compat proof for the round-10 fused text kernels: TokenShingles and
  * ShingleSliceMinima must equal the interpreted HOF constructions they
  * replace on the REAL corpus and on adversarial strings — the oracles
  * mirror the HOF arithmetic, so any divergence is a wrong answer, not a
  * perf trade.
  */
class TextKernelsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // the pre-kernel constructions, verbatim
  private def hofShingles(text: org.apache.spark.sql.Column, k: Int) = {
    val t = graft.functions.TextFunctions.tokens(text)
    when(size(t) < k, array())
      .otherwise(transform(sequence(lit(1), size(t) - (k - 1)),
        i => array_join(slice(t, i, lit(k)), " ")))
  }
  private def hofSliceMinima(items: org.apache.spark.sql.Column, n: Int) = {
    val hashOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (n * 8 <= 32) t => md5(t)
      else t => concat(md5(t), md5(concat(t, lit("#"))))
    aggregate(
      transform(array_distinct(items), hashOf),
      array(Seq.fill(n)(lit("g")): _*),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(n - 1)), i => h.substr(i * 8 + 1, lit(8))),
        (a, s) => least(a, s)))
  }

  private def adversarial = {
    import spark.implicits._
    Seq("", " ", "a", "a b", "a  b\t c\nd", "tok tok tok tok",
      "éclair café 中文 token", "  leading and trailing  ",
      "one-token").toDF("text")
  }

  test("TokenShingles equals the HOF shingle construction (corpus + adversarial)") {
    for (k <- Seq(1, 2, 3, 5); df <- Seq(
        graft.queries.Tables.documents(spark, d).select("text"), adversarial)) {
      val diff = df.select(
          graft.functions.TextFunctions.shingles(col("text"), k).as("kern"),
          hofShingles(col("text"), k).as("hof"))
        .filter(not(col("kern") <=> col("hof")))
        .count()
      assert(diff == 0, s"k=$k: $diff rows diverged from the HOF shingles")
    }
  }

  test("ShingleSliceMinima equals the HOF distinct→hash→fold (both digest widths)") {
    for ((k, n) <- Seq((2, 6), (2, 4), (3, 8), (5, 2));
         df <- Seq(graft.queries.Tables.documents(spark, d).select("text"),
           adversarial)) {
      val kern = org.apache.spark.sql.GraftSqlShim.column(ShingleSliceMinima(
        org.apache.spark.sql.GraftSqlShim.expression(
          graft.functions.TextFunctions.tokens(col("text"))), k, n, 8))
      val diff = df.select(kern.as("kern"),
          hofSliceMinima(hofShingles(col("text"), k), n).as("hof"))
        .filter(not(col("kern") <=> col("hof")))
        .count()
      assert(diff == 0, s"k=$k n=$n: $diff rows diverged from the HOF minima")
    }
  }

  test("kernels stay inside whole-stage codegen (no UDF, no interpreted eval boundary)") {
    val df = graft.queries.Tables.documents(spark, d)
      .select(graft.functions.TextFunctions.shingles(col("text"), 2).as("sh"),
        graft.functions.TextFunctions.shingleBandMinima(col("text"), 2, 2, 3).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF leaked into the kernel path:\n$plan")
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"),
      s"no codegen span around the kernels:\n$plan")
  }
}
