package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.TableProperties
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** S15 runtime-filter join pruning: the dim side's distinct keys become an
  * IN file-pruning predicate on the fact scan (composing with the bloom
  * plane), with a sound fallback to an unpruned scan when the dim side
  * exceeds the key budget.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType)))

  private def fixture() = {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.fact", factSchema)
    t.setProperty(TableProperties.BloomColumns, "id")
    // interleaved ids: every file spans the range, only blooms can skip
    val rows = (0 until 400).map(i => Row(((i * 37) % 400).toLong, i.toLong))
    t.append(spark, spark.createDataFrame(rows.asJava, factSchema).repartition(8, col("id")))
    t
  }

  test("selective dim prunes fact files and keeps the join exact") {
    val t = fixture()
    val dim = spark.createDataFrame(
      Seq(Row(3L, "a"), Row(250L, "b"), Row(9999L, "miss")).asJava, dimSchema)
    val sc = t.scanWithRuntimeFilter(dim, "k", "id")
    val joined = sc.toDF(spark).join(dim, col("id") === col("k")).collect()
    assert(joined.length == 2)
    assert(sc.metrics.filesScanned < sc.metrics.filesTotal,
      s"expected file skipping, got ${sc.metrics.filesScanned}/${sc.metrics.filesTotal}")
  }

  test("oversized dim falls back to an unpruned scan, still correct") {
    val t = fixture()
    val dim = spark.createDataFrame(
      (0 until 50).map(i => Row(i.toLong, s"n$i")).asJava, dimSchema)
    val sc = t.scanWithRuntimeFilter(dim, "k", "id", maxKeys = 10)
    assert(sc.metrics.filesScanned == sc.metrics.filesTotal, "budget exceeded: no filter")
    assert(sc.toDF(spark).join(dim, col("id") === col("k")).count() == 50L)
  }

  test("cap boundary: exactly maxKeys still filters, one more falls back — both exact") {
    val t = fixture()
    def dimOf(n: Int) = spark.createDataFrame(
      (0 until n).map(i => Row(i.toLong, s"n$i")).asJava, dimSchema)
    // exactly at the cap: the IN predicate is pushed
    val atCap = t.scanWithRuntimeFilter(dimOf(10), "k", "id", maxKeys = 10)
    assert(atCap.predicates.nonEmpty, "at-cap dim must still push the key filter")
    assert(atCap.toDF(spark).join(dimOf(10), col("id") === col("k")).count() == 10L)
    // one past the cap: graceful unfiltered scan (the limit(maxKeys+1)
    // collect is the only driver-side materialization — bounded at 11 rows
    // here, never the full dim side)
    val overCap = t.scanWithRuntimeFilter(dimOf(11), "k", "id", maxKeys = 10)
    assert(overCap.predicates.isEmpty, "over-cap dim must not push a filter")
    assert(overCap.metrics.filesScanned == overCap.metrics.filesTotal)
    assert(overCap.toDF(spark).join(dimOf(11), col("id") === col("k")).count() == 11L)
  }

  test("null dim keys are dropped from the pushed filter") {
    val t = fixture()
    val dim = spark.createDataFrame(
      Seq(Row(7L, "a"), Row(null, "n")).asJava, dimSchema)
    val sc = t.scanWithRuntimeFilter(dim, "k", "id")
    assert(sc.toDF(spark).join(dim, col("id") === col("k")).count() == 1L)
  }
}
