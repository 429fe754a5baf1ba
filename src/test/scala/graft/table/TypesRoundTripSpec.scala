package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Predicate
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Every primitive type of the reference's type system (SURVEY §1.3 /
  * docs/06:96-118) through the full table lifecycle: append with footer
  * stats, stats-based pruning, DML, read-back equality. Exercises the
  * ParquetStats decode paths (INT32/INT64/DOUBLE/BOOLEAN/BINARY/decimal)
  * and Canonical's per-type ordering.
  */
class TypesRoundTripSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("b", BooleanType),
    StructField("i", IntegerType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("dec", DecimalType(12, 2)),
    StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("arr", ArrayType(LongType)),
    StructField("m", MapType(StringType, LongType)),
    StructField("st", StructType(Seq(StructField("x", LongType))))))

  private def row(i: Int): Row = Row(
    i.toLong, i % 2 == 0, i, i.toFloat / 2, i.toDouble * 1.5,
    new java.math.BigDecimal(s"$i.25"),
    java.sql.Date.valueOf(f"2024-01-${(i % 27) + 1}%02d"),
    java.sql.Timestamp.valueOf(f"2024-01-${(i % 27) + 1}%02d 10:00:00"),
    f"str-$i%03d",
    Array[Byte](i.toByte, (i + 1).toByte),
    Seq(i.toLong, i + 1L), Map("k" -> i.toLong), Row(i.toLong))

  test("all reference types survive append -> stats -> prune -> DML -> scan") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.types", schema)
    val df1 = spark.createDataFrame((1 to 10).map(row).asJava, schema)
    val df2 = spark.createDataFrame((11 to 20).map(row).asJava, schema)
    t.append(spark, df1)
    t.append(spark, df2)
    assert(t.toDF(spark).count() == 20)

    // stats exist for every supported-canonical column
    val stats = t.scan().dataFiles.head.stats
    val idOf = (n: String) => graft.format.GraftSchema.fieldId(t.schema(n))
    for (c <- Seq("id", "b", "i", "dec", "dt", "ts", "s"))
      assert(stats.contains(idOf(c)), s"no stats for $c")
    // complex/binary types carry no stats (sound: never pruned); neither do
    // float/double — parquet footer min/max exclude NaN, which the engine
    // orders above all values, so FP bounds would prune unsoundly
    for (c <- Seq("arr", "m", "st", "f", "d"))
      assert(!stats.contains(idOf(c)), s"unexpected stats for $c")

    // pruning on each stat-bearing type drops the non-matching file
    def prunes(p: Predicate, expect: Int): Unit = {
      val sc = t.scan(p)
      assert(sc.toDF(spark).count() == expect, s"$p wrong rows")
      assert(sc.metrics.filesScanned < sc.metrics.filesTotal, s"$p did not prune")
    }
    prunes(Predicate.LtEq("id", 5L), 5)
    prunes(Predicate.Eq("dec", new java.math.BigDecimal("3.25")), 1)
    prunes(Predicate.GtEq("ts", java.sql.Timestamp.valueOf("2024-01-15 00:00:00")), 7)
    prunes(Predicate.Eq("s", "str-017"), 1)

    // DML over the typed table
    t.delete(spark, Seq(Predicate.Eq("b", true)))
    assert(t.toDF(spark).count() == 10)
    val back = t.toDF(spark).orderBy("id").collect()
    assert(back.head.getSeq[Long](10) == Seq(1L, 2L))
    assert(back.head.getAs[Map[String, Long]]("m") == Map("k" -> 1L))
    assert(back.head.getStruct(12).getLong(0) == 1L)
    assert(back.head.getAs[Array[Byte]]("bin").toSeq == Seq(1.toByte, 2.toByte))
    assert(back.head.getDecimal(5).toPlainString == "1.25")
  }
}
