package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import scala.jdk.CollectionConverters._

/** Schema evolution by stable column IDs — reproduces the reference's v1→v4
  * walkthrough (docs/06-schema-evolution.md:75-90) and the promotion
  * allow/deny matrix (docs/06:138-151).
  */
class EvolutionSpec extends SparkSpec {

  private def mk(rows: Seq[(Int, String)]): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      rows.map { case (a, b) => Row(a, b) }.asJava,
      StructType(Seq(StructField("id", IntegerType), StructField("name", StringType))))

  test("v1→v4 walkthrough: files written under every schema version stay readable") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev", mk(Nil).schema)
    t.append(spark, mk(Seq((1, "one"))))          // schema v0: (id int, name string)
    t.widenColumn("id", LongType)                 // v1: id -> long
    t.renameColumn("name", "label")               // v2: name -> label (same ID)
    t.addColumn("score", DoubleType)              // v3: new column, new ID
    val df2 = spark.createDataFrame(
      Seq(Row(2L, "two", 0.5)).asJava,
      StructType(Seq(StructField("id", LongType), StructField("label", StringType),
        StructField("score", DoubleType))))
    t.append(spark, df2)
    val out = t.toDF(spark).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getString(1)).toSeq == Seq("one", "two")) // old file resolved by ID
    assert(out(0).isNullAt(2) && out(1).getDouble(2) == 0.5)   // pre-add file reads NULL
  }

  test("dropped column IDs are retired, data no longer projected, old files readable") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev_drop", mk(Nil).schema)
    t.append(spark, mk(Seq((1, "one"), (2, "two"))))
    t.dropColumn("name")
    assert(t.toDF(spark).columns.toSeq == Seq("id"))
    assert(t.toDF(spark).count() == 2)
    // re-adding a column with the same NAME gets a NEW ID: old values stay dead
    t.addColumn("name", StringType)
    val out = t.toDF(spark).orderBy("id").collect()
    assert(out.forall(_.isNullAt(1)), "resurrected dropped column data — ID reuse bug")
  }

  test("promotion matrix: widenings allowed, narrowings rejected (docs/06:138-151)") {
    val e = new GraftCatalog(tempWarehouse())
      .createTable("db.ev_promo", StructType(Seq(
        StructField("i", IntegerType), StructField("l", LongType),
        StructField("f", FloatType), StructField("d", DecimalType(10, 2)))))
    assert(e.canPromote(IntegerType, LongType))
    assert(e.canPromote(FloatType, DoubleType))
    assert(e.canPromote(DecimalType(10, 2), DecimalType(18, 2)))
    assert(!e.canPromote(LongType, IntegerType))
    assert(!e.canPromote(DoubleType, FloatType))
    assert(!e.canPromote(DecimalType(18, 2), DecimalType(10, 2)))
    assert(!e.canPromote(DecimalType(10, 2), DecimalType(18, 4))) // scale change denied
    assert(!e.canPromote(StringType, LongType))
    intercept[IllegalArgumentException](e.widenColumn("l", IntegerType))
  }

  test("rename keeps filters working on renamed columns over old files") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev_ren", mk(Nil).schema)
    t.append(spark, mk(Seq((1, "apple"), (2, "banana"))))
    t.renameColumn("name", "fruit")
    val got = t.toDF(spark).filter(col("fruit") === "apple").collect()
    assert(got.length == 1 && got(0).getInt(0) == 1)
  }
}
