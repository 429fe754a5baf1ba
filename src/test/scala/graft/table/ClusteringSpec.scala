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
}
