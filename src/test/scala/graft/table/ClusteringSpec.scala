package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** D12 CLUSTER BY + M5 clustering information (reference docs/09:156-168,
  * docs/07:164-172): range-clustered rewrites tighten per-file min/max
  * bounds, measured by the bound-overlap metric and by pruning metrics.
  */
class ClusteringSpec extends SparkSpec {

  private def mk(n: Int) = spark.createDataFrame(
    // interleaved ids so unclustered files all span the full range
    (0 until n).map(i => Row(((i * 37) % n).toLong, s"row$i")).asJava,
    StructType(Seq(StructField("id", LongType), StructField("name", StringType))))

  test("CLUSTER BY compaction tightens bounds and enables range pruning") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.clu", mk(0).schema)
    // 4 appends of interleaved ids -> every file spans ~[0, 400)
    (0 until 4).foreach(_ => t.append(spark, mk(400)))

    val before = t.clusteringInformation(spark, "id").agg(max("overlap_ratio")).head.getDouble(0)
    assert(before > 0.9, s"unclustered files should overlap heavily, got $before")
    val scanBefore = t.scan(graft.format.Predicate.Lt("id", 50L))
    assert(scanBefore.metrics.filesScanned == scanBefore.metrics.filesTotal,
      "no pruning possible when every file spans the full range")

    t.setProperty("cluster-by", "id")
    t.compact(spark, targetFileSizeBytes = Some(8 * 1024))

    val after = t.clusteringInformation(spark, "id").agg(max("overlap_ratio")).head.getDouble(0)
    assert(after < before, s"clustered overlap $after !< unclustered $before")
    val scanAfter = t.scan(graft.format.Predicate.Lt("id", 50L))
    assert(scanAfter.metrics.filesTotal > 1)
    assert(scanAfter.metrics.filesScanned < scanAfter.metrics.filesTotal,
      "range-clustered files must prune on a range predicate")
    assert(scanAfter.toDF(spark).count() == 4 * 50)
  }

  private def mk2d(n: Int) = spark.createDataFrame(
    // x and y independent and interleaved: a linear sort on x leaves every
    // file spanning the full y range
    (0 until n).map(i => Row(((i * 37) % n).toLong, ((i * 101) % n).toLong, i.toLong)).asJava,
    StructType(Seq(StructField("x", LongType), StructField("y", LongType),
      StructField("v", LongType))))

  test("zorder clustering prunes range scans on BOTH dimensions; linear only the first") {
    def build(strategy: String): GraftTable = {
      val cat = new GraftCatalog(tempWarehouse())
      val t = cat.createTable(s"db.z_$strategy", mk2d(0).schema)
      t.setProperty("cluster-by", "x,y")
      t.setProperty("write.cluster-strategy", strategy)
      t.setProperty("write.target-file-size-bytes", (16 * 1024).toString)
      t.setProperty("write.estimated-row-size-bytes", "128")
      t.append(spark, mk2d(4096))
      t
    }
    def prunes(t: GraftTable, p: graft.format.Predicate): Boolean = {
      val sc = t.scan(p)
      sc.metrics.filesTotal > 1 && sc.metrics.filesScanned < sc.metrics.filesTotal
    }
    val lin = build("linear")
    val zor = build("zorder")
    import graft.format.Predicate._
    assert(prunes(lin, Lt("x", 512L)), "linear prunes its first cluster key")
    assert(!prunes(lin, Lt("y", 512L)), "linear cannot prune the second key")
    assert(prunes(zor, Lt("x", 512L)), "zorder prunes dim 1")
    assert(prunes(zor, Lt("y", 512L)), "zorder prunes dim 2")
    // identical contents regardless of layout
    assert(zor.toDF(spark).agg(sum("v"), count(lit(1))).head() ==
      lin.toDF(spark).agg(sum("v"), count(lit(1))).head())
  }

  test("zorder supports string/date/timestamp keys and null values") {
    val cat = new GraftCatalog(tempWarehouse())
    val df = spark.createDataFrame(
      (0 until 600).map { i =>
        val s = if (i % 97 == 0) null else f"k${(i * 37) % 600}%04d"
        Row(s, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays((i * 13) % 300)),
          i.toLong)
      }.asJava,
      StructType(Seq(StructField("name", StringType), StructField("d", DateType),
        StructField("v", LongType))))
    val t = cat.createTable("db.z_str", df.schema)
    t.setProperty("cluster-by", "name,d")
    t.setProperty("write.cluster-strategy", "zorder")
    t.append(spark, df)
    assert(t.toDF(spark).count() == 600)
    assert(t.toDF(spark).filter(col("name").isNull).count() == 7)
    val sc = t.scan(graft.format.Predicate.Lt("d", java.time.LocalDate.of(2024, 3, 1)))
    assert(sc.toDF(spark).count() ==
      df.filter(col("d") < lit(java.sql.Date.valueOf("2024-03-01"))).count())
  }

  test("zorder rejects unsupported shapes") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.z_bad", mk2d(0).schema)
    t.setProperty("cluster-by", "x")
    t.setProperty("write.cluster-strategy", "zorder")
    intercept[RuntimeException] { t.append(spark, mk2d(10)) }
  }
}
