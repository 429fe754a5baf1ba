package graft.io

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Predicate
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class ParquetStatsSpec extends SparkSpec {

  test("string bounds truncate to 16 chars, upper bound stays an upper bound") {
    val (lo, hi) = ParquetStats.truncateBounds(StringType,
      Some("a" * 40), Some(("z" * 20) + "tail"))
    assert(lo.contains("a" * 16))
    val h = hi.get.asInstanceOf[String]
    assert(h.length <= 16)
    assert(h > "z" * 20, "truncated upper bound must still dominate the real max")
    // short strings untouched
    assert(ParquetStats.truncateBounds(StringType, Some("ab"), Some("cd")) ==
      (Some("ab"), Some("cd")))
    // non-strings untouched
    assert(ParquetStats.truncateBounds(LongType, Some(1L), Some(2L)) == (Some(1L), Some(2L)))
  }

  test("pruning stays sound with truncated long-string bounds end-to-end") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("body", StringType)))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.longstr", schema)
    val mk = (rows: Seq[(Long, String)]) => spark.createDataFrame(
      rows.map { case (a, b) => Row(a, b) }.asJava, schema)
    t.append(spark, mk(Seq((1L, "alpha " * 10), (2L, "beta " * 10))))   // a*/b* prefixes
    t.append(spark, mk(Seq((3L, "yankee " * 10), (4L, "zulu " * 10)))) // y*/z* prefixes

    // bounds in manifests are truncated
    val stats = t.scan().dataFiles.flatMap(_.stats.values)
    assert(stats.flatMap(_.min).forall(_.length <= 17))
    assert(stats.flatMap(_.max).forall(_.length <= 17))

    // equality on a long literal still finds its row AND prunes the other file
    val sc = t.scan(Predicate.Eq("body", "zulu " * 10))
    assert(sc.toDF(spark).count() == 1)
    assert(sc.metrics.filesScanned < sc.metrics.filesTotal)

    // range + prefix predicates remain sound
    assert(t.scan(Predicate.StartsWith("body", "alpha")).toDF(spark).count() == 1)
    assert(t.scan(Predicate.Gt("body", "m")).toDF(spark).count() == 2)
  }
}
