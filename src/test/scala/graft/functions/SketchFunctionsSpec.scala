package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchFunctionsSpec extends SparkSpec {

  test("kmv estimate is exact below k and within KMV error above it") {
    import spark.implicits._
    // 40 distinct values, k = 256: small-range rule returns the exact count
    val small = (1 to 200).map(i => i % 40).toDF("v")
    val smallEst = SketchFunctions.kmvEstimate(
      SketchFunctions.kmvSketch(small, col("v"), 256), 256).head()
    assert(smallEst.getInt(0) == 40 && smallEst.getLong(2) == 40L)

    // 20_000 distinct values, k = 256: KMV standard error is ~1/sqrt(k-2)
    // ≈ 6.3%; assert a generous 4-sigma band (the estimate is
    // deterministic, so this is a fixed fact about md5, not a flaky bound)
    val big = (1 to 20000).toDF("v")
    val est = SketchFunctions.kmvEstimate(
      SketchFunctions.kmvSketch(big, col("v"), 256), 256).head().getLong(2)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"estimate $est vs 20000")
  }

  test("kmv merge law: merged partial sketches == whole-set sketch") {
    import spark.implicits._
    val all = (1 to 5000).toDF("v")
    val k = 128
    val whole = SketchFunctions.kmvSketch(all, col("v"), k)
    val parts = (0 until 4).map { p =>
      SketchFunctions.kmvSketch(all.filter(col("v") % 4 === p), col("v"), k)
    }
    val merged = SketchFunctions.kmvMerge(parts, k)
    assert(whole.collect().map(_.getLong(0)).toSeq ==
      merged.collect().map(_.getLong(0)).toSeq)
    // duplicate-heavy input: sketch state is still the k distinct minima
    val dup = all.union(all).union(all)
    assert(SketchFunctions.kmvSketch(dup, col("v"), k).collect().map(_.getLong(0)).toSeq ==
      whole.collect().map(_.getLong(0)).toSeq)
    // zero partials is a caller mistake and says so (not reduce's
    // "empty.reduceLeft")
    val e = intercept[IllegalArgumentException](SketchFunctions.kmvMerge(Seq.empty, k))
    assert(e.getMessage.contains("at least one"), e.getMessage)
  }

  test("kmvSketchByGroup: per-group state is k, estimates match flat sketches") {
    import spark.implicits._
    // group A: 5000 distinct (sketched), group B: 30 distinct (exact by
    // the small-range rule) — one pass covers both regimes
    val df = ((1 to 5000).map(("A", _)) ++ (1 to 30).map(("B", _)))
      .toDF("g", "v")
    val k = 128
    val got = SketchFunctions.kmvSketchByGroup(df, col("g"), col("v"), k)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("B")._1 == 30 && got("B")._3 == 30L) // exact below k
    assert(got("A")._1 == k)
    // the per-group sketch of A must equal the flat sketch of A's values
    val flat = SketchFunctions.kmvEstimate(
      SketchFunctions.kmvSketch(df.filter($"g" === "A"), col("v"), k), k).head()
    assert(got("A")._2 == flat.getLong(1) && got("A")._3 == flat.getLong(2))
    // duplicates don't change the state
    val got2 = SketchFunctions.kmvSketchByGroup(df.union(df), col("g"), col("v"), k)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got2("A") == got("A")._2)
  }

  test("kmv ignores NULL inputs (countDistinct semantics, cross-engine order safety)") {
    import spark.implicits._
    val vals = (1 to 500).map(i => Some(i)) ++ Seq.fill(10)(Option.empty[Int])
    val df = vals.toDF("v")
    val k = 64
    val withNulls = SketchFunctions.kmvSketch(df, col("v"), k).collect().map(_.getLong(0))
    val without = SketchFunctions.kmvSketch(df.filter($"v".isNotNull), col("v"), k)
      .collect().map(_.getLong(0))
    assert(withNulls.toSeq == without.toSeq, "NULLs must not enter the sketch")
    // per-group: a group whose values are ALL null sketches to no row
    val g = Seq(("a", Some(1)), ("a", Some(2)), ("b", Option.empty[Int])).toDF("g", "v")
    val rows = SketchFunctions.kmvSketchByGroup(g, col("g"), col("v"), k).collect()
    assert(rows.map(_.getString(0)).toSet == Set("a"))
    assert(rows.head.getLong(3) == 2L) // exact below k, nulls ignored
  }

  test("kmv plan: partial-distinct + TakeOrderedAndProject, no global sort") {
    import spark.implicits._
    val df = (1 to 1000).toDF("v").repartition(8)
    val sketch = SketchFunctions.kmvSketch(df, col("v"), 64)
    val plan = sketch.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"k-min must plan TakeOrderedAndProject (per-task top-k):\n$plan")
    assert(plan.contains("partial_") || plan.contains("HashAggregate"),
      s"distinct must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("SortExec"), s"no global sort:\n$plan")
  }
}
