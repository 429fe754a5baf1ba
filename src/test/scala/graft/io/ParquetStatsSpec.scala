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

  test("string pruning is sound for supplementary characters (UTF-8 vs UTF-16 order)") {
    // U+1F600 (surrogate pair) sorts BELOW U+FF61 in UTF-16 code units but
    // ABOVE it in UTF-8 bytes — parquet bounds use byte order, so a UTF-16
    // comparator would prune a file that contains the matching row.
    val emoji = new String(Character.toChars(0x1F600))
    val halfwidth = "｡"
    assert(emoji.compareTo(halfwidth) < 0, "test premise: UTF-16 orders differently")
    assert(graft.format.Canonical.compare(emoji, halfwidth) > 0, "canonical = byte order")

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.uni", schema)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1L, halfwidth), Row(2L, emoji)).asJava, schema))
    for (needle <- Seq(halfwidth, emoji)) {
      val got = t.scan(Predicate.Eq("s", needle)).toDF(spark).count()
      assert(got == 1, s"lost row for ${needle.codePoints().toArray.toSeq}")
    }
    assert(t.scan(Predicate.Gt("s", halfwidth)).toDF(spark).count() == 1) // the emoji row
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
