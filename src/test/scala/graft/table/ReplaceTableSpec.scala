package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Transform
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** CREATE OR REPLACE ICEBERG TABLE (docs/01:182): identity + history
  * preserved, one CAS commit, fresh field ids, time travel across the
  * replace reads the OLD schema's data.
  */
class ReplaceTableSpec extends SparkSpec {

  private def mkDf(rows: Seq[(Long, String, Double)]) =
    spark.createDataFrame(
      rows.map { case (a, b, c) => Row(a, b, c) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("cat", StringType),
        StructField("v", DoubleType))))

  test("API replace: new schema/spec live, old snapshot time-travelable") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.t", mkDf(Nil).schema)
    t.append(spark, mkDf(Seq((1L, "a", 1.0), (2L, "b", 2.0))))
    val preSnap = t.meta.currentSnapshotId.get
    val uuidBefore = t.meta.tableUuid

    val newSchema = StructType(Seq(
      StructField("k", LongType), StructField("label", StringType)))
    cat.replaceTable("db.t", newSchema, Seq("label" -> Transform.Identity))

    val t2 = cat.loadTable("db.t")
    assert(t2.meta.tableUuid == uuidBefore, "replace preserves table identity")
    assert(t2.schema.fieldNames.toSeq == Seq("k", "label"))
    assert(t2.toDF(spark).count() == 0, "plain replace starts empty")
    assert(t2.meta.defaultSpec.fields.map(_.name) == Seq("label"))
    assert(t2.meta.snapshots.map(_.operation) == Seq("append", "replace"))
    // field ids are fresh: old column ids never resurface in the new schema
    val oldIds = t.meta.schemas.values.head.fields
      .map(graft.format.GraftSchema.fieldId).toSet
    val newIds = t2.schema.fields.map(graft.format.GraftSchema.fieldId).toSet
    assert(oldIds.intersect(newIds).isEmpty)

    // time travel to the pre-replace snapshot: old schema, old rows
    val old = t2.atSnapshot(preSnap).toDF(spark)
    assert(old.schema.fieldNames.toSeq == Seq("id", "cat", "v"))
    assert(old.count() == 2)

    // the replaced table accepts new-schema writes and partitions by label
    t2.append(spark, spark.createDataFrame(
      Seq(Row(10L, "x"), Row(11L, "y")).asJava, newSchema))
    assert(t2.toDF(spark).count() == 2)
    assert(t2.scan(graft.format.Predicate.Eq("label", "x")).dataFiles.size == 1)
  }

  test("replace on a missing table creates it; data variant lands in the replace commit") {
    val cat = new GraftCatalog(tempWarehouse())
    val schema = mkDf(Nil).schema
    cat.replaceTable("db.fresh", schema) // create path
    assert(cat.tableExists("db.fresh"))
    // replace WITH data: one commit, content swapped
    cat.replaceTable("db.fresh", schema,
      spark = Some(spark), data = Some(mkDf(Seq((5L, "z", 9.9)))))
    val t = cat.loadTable("db.fresh")
    assert(t.toDF(spark).collect().map(_.getLong(0)).toSeq == Seq(5L))
    assert(t.meta.snapshots.map(_.operation) == Seq("replace"))
  }

  test("SQL CREATE OR REPLACE goes through the staging catalog atomically") {
    val wh = tempWarehouse()
    spark.conf.set("spark.sql.catalog.rt",
      classOf[graft.sources.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.rt.warehouse", wh)
    spark.sql("CREATE TABLE rt.db.s (id BIGINT, cat STRING, v DOUBLE)")
    mkDf(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
      .createOrReplaceTempView("src_rows")
    spark.sql("INSERT INTO rt.db.s SELECT * FROM src_rows")

    // plain DDL replace
    spark.sql("CREATE OR REPLACE TABLE rt.db.s (k BIGINT, label STRING)")
    assert(spark.table("rt.db.s").schema.fieldNames.toSeq == Seq("k", "label"))
    assert(spark.table("rt.db.s").count() == 0)

    // RTAS replace: data + schema swap in one commit; history intact
    spark.sql("""CREATE OR REPLACE TABLE rt.db.s PARTITIONED BY (cat) AS
      |SELECT id, cat FROM src_rows WHERE cat = 'a'""".stripMargin)
    assert(spark.table("rt.db.s").count() == 2)
    val t = new GraftCatalog(wh).loadTable("db.s")
    assert(t.meta.snapshots.map(_.operation) == Seq("append", "replace", "replace"))
    // VERSION AS OF the first snapshot reads the original 3-col shape
    val old = spark.sql("SELECT * FROM rt.db.s VERSION AS OF 1")
    assert(old.schema.fieldNames.toSeq == Seq("id", "cat", "v"))
    assert(old.count() == 3)
    // a failed REPLACE must leave the live table untouched (staged commit)
    intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE rt.db.s PARTITIONED BY (nope) AS SELECT id FROM src_rows"))
    assert(spark.table("rt.db.s").count() == 2, "failed replace left table intact")
  }
}
