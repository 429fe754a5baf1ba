package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class ScaleFunctionsSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("k", LongType), StructField("id", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType)))

  test("sampledQuantiles: near the exact quantiles, invariant to partitioning") {
    import spark.implicits._
    // values 1..20000 (uniform): exact p-quantile is p * 20000
    val df = (1 to 20000).map(_.toLong).toDF("v")
    val ps = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)
    val got = ScaleFunctions.sampledQuantiles(df, col("v"), col("v"), "08", ps)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 3)
    val n = got("p50")._2
    assert(n > 400 && n < 800, s"8/256 of 20000 should sample ~625 rows, got $n")
    // rank-space error of nearest-rank-of-sample is a few /sqrt(n): allow 4
    ps.foreach { case (label, p) =>
      val est = got(label)._1.toDouble / 20000.0
      assert(math.abs(est - p) < 4.0 / math.sqrt(n.toDouble),
        s"$label: estimated rank $est vs $p (n=$n)")
    }
    // pure row functions + integer positions: repartitioning can't move it
    val re = ScaleFunctions.sampledQuantiles(df.repartition(17), col("v"), col("v"), "08", ps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ps.foreach { case (label, _) => assert(re(label) == got(label)._1) }
    // NULL values are excluded (engines disagree on where NULL sorts; a
    // kept NULL would shift every rank and can surface as the "quantile")
    val withNulls = df.select(when(col("v") % 97 === 0, lit(null)).otherwise(col("v")).as("v0"),
      col("v"))
    val nn = ScaleFunctions.sampledQuantiles(withNulls, col("v0"), col("v"), "08", ps)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(nn.length == 3 && nn.forall(_._2.isDefined), s"no NULL quantile: $nn")
    // invalid sample ceils are rejected, not silently degenerate: "" keeps
    // no rows (0-row result), anything above "ff" keeps EVERY row (the
    // whole corpus through one sort task), uppercase never matches md5 hex
    for (bad <- Seq("", "zz", "0F"))
      intercept[IllegalArgumentException](
        ScaleFunctions.sampledQuantiles(df, col("v"), col("v"), bad, ps))
    // the sample-volume cap is self-enforcing: a cap below the actual
    // sample size fails loudly BEFORE any sort, naming both numbers, so a
    // careless rate cannot degenerate into a single-task corpus sort
    val boom = intercept[IllegalArgumentException](
      ScaleFunctions.sampledQuantiles(df, col("v"), col("v"), "08", ps, Some(10L))
        .collect())
    assert(boom.getMessage.contains("sample cap"), boom.getMessage)
    // an adequate explicit cap returns the identical picks
    val capped = ScaleFunctions.sampledQuantiles(df, col("v"), col("v"), "08", ps, Some(20000L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ps.foreach { case (label, _) => assert(capped(label) == got(label)._1) }
  }

  test("groupedQuantiles: per-group == global restricted to the group; capped; invariant") {
    import spark.implicits._
    // two groups with different spreads: a uniform 1..10000 and a shifted
    // 50001..60000 — per-group picks must equal running the GLOBAL operator
    // on each group alone (same sample, same ranks)
    val df = ((1 to 10000).map(v => ("a", v.toLong)) ++
      (50001 to 60000).map(v => ("b", v.toLong))).toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    val got = ScaleFunctions.groupedQuantiles(df, col("g"), col("v"), col("v"), "20", ps)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.size == 4)
    for (g <- Seq("a", "b")) {
      val alone = ScaleFunctions.sampledQuantiles(
        df.filter(col("g") === g), col("v"), col("v"), "20", ps)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      ps.foreach { case (label, _) =>
        assert(got((g, label)) == alone(label), s"group $g $label") }
    }
    // repartitioning cannot move a pick (pure row functions + ranks)
    val re = ScaleFunctions.groupedQuantiles(
      df.repartition(17), col("g"), col("v"), col("v"), "20", ps)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(re == got)
    // the per-group cap guards the WORST group, not the total
    val boom = intercept[IllegalArgumentException](
      ScaleFunctions.groupedQuantiles(df, col("g"), col("v"), col("v"), "20", ps,
        maxSamplePerGroup = Some(10L)))
    assert(boom.getMessage.contains("per-group sample cap"), boom.getMessage)
  }

  test("salted join refuses small-side-preserving join types") {
    import spark.implicits._
    val large = Seq((1L, 10L)).toDF("k", "id")
    val small = Seq((1L, "x")).toDF("k", "name")
    // the replicated small side would emit saltFactor null-padded rows per
    // unmatched key under right/full outer — refuse instead of corrupting
    for (bad <- Seq("right", "full", "full_outer", "right_outer"))
      intercept[IllegalArgumentException](
        ScaleFunctions.saltedJoin(large, small, "k", col("id"), 4, bad))
    // the supported family still works
    assert(ScaleFunctions.saltedJoin(large, small, "k", col("id"), 4, "left").count() == 1)
  }

  test("salted join == plain join (inner and left), including skewed keys") {
    // key 1 is 90% of the fact side — the classic skew shape
    val fact = spark.createDataFrame(
      ((1 to 90).map(i => Row(1L, i.toLong)) ++ (1 to 10).map(i => Row(2L, (100 + i).toLong))).asJava,
      factSchema)
    val dim = spark.createDataFrame(
      Seq(Row(1L, "hot"), Row(3L, "unmatched")).asJava, dimSchema)

    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt)
        .select("k", "id", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      val salted = ScaleFunctions.saltedJoin(fact, dim, "k", col("id"), 8, jt)
        .select("k", "id", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(salted == plain, s"join type $jt")
    }
  }

  test("approx distinct lands within rsd of exact") {
    val df = spark.range(0, 20000).select((col("id") % 5000).as("v"))
    val approx = df.agg(ScaleFunctions.approxDistinct(col("v"), 0.02)).head.getLong(0)
    assert(math.abs(approx - 5000) < 5000 * 0.1, s"approx=$approx")
  }

  test("hash sample is deterministic and roughly proportional") {
    val df = spark.range(0, 10000).toDF("id")
    val a = ScaleFunctions.hashSample(df, col("id"), 0.25).count()
    val b = ScaleFunctions.hashSample(df, col("id"), 0.25).count()
    assert(a == b) // repeatable
    assert(a > 2000 && a < 3000, s"got $a of 10000 at fraction 0.25")
  }

  test("CTAS: create-table-as-select lands data as the first snapshot") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val df = spark.range(0, 100).select(col("id"), (col("id") % 3).cast("string").as("g"))
    val t = cat.createTableAs(spark, "db.ctas", df)
    assert(t.toDF(spark).count() == 100)
    assert(t.meta.snapshots.size == 1)
    assert(t.meta.snapshots.head.operation == "append")
  }
}
