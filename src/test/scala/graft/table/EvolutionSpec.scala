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

  test("partition evolution: old and new spec epochs coexist and both prune (docs/07:117-129)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("day", StringType),
      StructField("kind", StringType)))
    val mkE = (rows: Seq[(Long, String, String)]) => spark.createDataFrame(
      rows.map { case (a, b, c) => Row(a, b, c) }.asJava, schema)
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.pevo", schema,
      partitionBy = Seq("day" -> graft.format.Transform.Identity))
    t.append(spark, mkE(Seq((1L, "d1", "x"), (2L, "d2", "y"))))
    t.evolvePartitionSpec(Seq("kind" -> graft.format.Transform.Identity))
    t.append(spark, mkE(Seq((3L, "d3", "x"), (4L, "d4", "y"))))

    assert(t.toDF(spark).count() == 4) // both epochs scan together
    assert(t.meta.specs.size == 2 && t.meta.defaultSpecId == 1)

    // old-epoch files prune by day partition; new-epoch by day STATS
    val byDay = t.scan(graft.format.Predicate.Eq("day", "d1"))
    assert(byDay.toDF(spark).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(byDay.metrics.filesScanned < byDay.metrics.filesTotal)

    // new-epoch files prune by kind partition; old-epoch by kind stats
    val byKind = t.scan(graft.format.Predicate.Eq("kind", "x"))
    assert(byKind.toDF(spark).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(byKind.metrics.filesScanned < byKind.metrics.filesTotal)
  }

  test("rename keeps filters working on renamed columns over old files") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev_ren", mk(Nil).schema)
    t.append(spark, mk(Seq((1, "apple"), (2, "banana"))))
    t.renameColumn("name", "fruit")
    val got = t.toDF(spark).filter(col("fruit") === "apple").collect()
    assert(got.length == 1 && got(0).getInt(0) == 1)
  }

  test("nested evolution: add/rename/widen/drop struct subfields by ID (docs/06:114-118)") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("meta", StructType(Seq(
        StructField("uid", IntegerType), StructField("etype", StringType),
        StructField("tmp", DoubleType))))))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev_nested", schema)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1, Row(10, "click", 0.5)), Row(2, Row(20, "view", 1.5)), Row(3, null)).asJava,
      t.meta.currentSchema))

    t.dropColumn("meta.tmp")
    t.renameColumn("meta.uid", "user")
    t.widenColumn("meta.user", LongType)
    t.addColumn("meta.note", StringType)

    val v2Schema = t.meta.currentSchema
    assert(v2Schema("meta").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("user", "etype", "note"))
    t.append(spark, spark.createDataFrame(
      Seq(Row(4, Row(40L, "buy", "b2"))).asJava, v2Schema))

    val out = t.toDF(spark)
      .select(col("id"), col("meta.user"), col("meta.etype"), col("meta.note"))
      .orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq == Seq(10L, 20L, -1L, 40L),
      "old files must resolve renamed+widened subfield by ID")
    assert(out(0).isNullAt(3) && out(3).getString(3) == "b2", "pre-add subfield reads NULL")
    assert(t.toDF(spark).filter(col("id") === 3).select("meta").head().isNullAt(0),
      "a NULL struct must stay NULL through nested resolution")
    // re-adding a dropped subfield name gets a NEW ID: old tmp values stay dead
    t.addColumn("meta.tmp", DoubleType)
    val resurrect = t.toDF(spark).filter(col("id") === 1).select("meta.tmp").head()
    assert(resurrect.isNullAt(0), "resurrected dropped subfield data — nested ID reuse bug")
  }

  test("top-level columns with literal dots in the name still evolve (literal-first)") {
    val dotted = StructType(Seq(
      StructField("id", IntegerType), StructField("a.b", StringType)))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev_dot", dotted)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1, "x")).asJava, t.meta.currentSchema))
    t.renameColumn("a.b", "ab")            // literal name, not path a->b
    assert(t.meta.currentSchema.fieldNames.toSeq == Seq("id", "ab"))
    t.addColumn("c.d", StringType)         // no struct 'c' -> literal add
    assert(t.meta.currentSchema.fieldNames.contains("c.d"))
    t.dropColumn("c.d")
    assert(!t.meta.currentSchema.fieldNames.contains("c.d"))
    assert(t.toDF(spark).select("ab").head().getString(0) == "x")
  }

  test("nested evolution inside array elements and map values") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", IntegerType)))))))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ev_arr", schema)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1, Seq(Row("a", 1), Row("b", 2))), Row(2, null)).asJava,
      t.meta.currentSchema))
    t.renameColumn("tags.v", "weight")
    t.widenColumn("tags.weight", LongType)
    t.addColumn("tags.src", StringType)
    t.append(spark, spark.createDataFrame(
      Seq(Row(3, Seq(Row("c", 3L, "s2")))).asJava, t.meta.currentSchema))
    val out = t.toDF(spark)
      .select(col("id"), expr("aggregate(tags, 0L, (acc, x) -> acc + x.weight)").as("w"),
        expr("size(filter(tags, x -> x.src IS NOT NULL))").as("with_src"))
      .orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq == Seq(3L, -1L, 3L))
    assert(out.map(r => if (r.isNullAt(2)) -1 else r.getInt(2)).toSeq == Seq(0, -1, 1),
      "array-element subfield added later must read NULL in old files")
  }
}
