package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Predicate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, types: Seq[String]): DataFrame =
    (0 until n).map(i => (i.toLong, types(i % types.size), (i % 50) + 0.25)).toDF("id", "k", "v")

  private def fullAgg(t: GraftTable): Seq[(String, Long, BigDecimal)] =
    t.toDF(spark).groupBy("k")
      .agg(count(lit(1)).as("c"), sum(col("v").cast("decimal(18,2)")).as("s"))
      .orderBy("k").as[(String, Long, BigDecimal)].collect().toSeq

  private def mvRows(mv: GraftTable): Seq[(String, Long, BigDecimal)] =
    mv.toDF(spark).select(col("k"), col("cnt"), col("sum_v").cast("decimal(18,2)"))
      .orderBy("k").as[(String, Long, BigDecimal)].collect().toSeq

  test("incremental refresh matches full recompute across append/delete/update mix") {
    val cat = new GraftCatalog(tempWarehouse())
    val base = cat.createTable("db.base", rows(1, Seq("a")).schema)
    base.append(spark, rows(300, Seq("a", "b", "c")))
    val mv = MaterializedView.create(spark, cat, "db.mv", base, Seq("k"), Seq("v"))
    assert(mvRows(mv) == fullAgg(base))

    base.append(spark, rows(100, Seq("b", "c", "d")).withColumn("id", col("id") + 1000))
    val r1 = MaterializedView.refresh(spark, mv, base)
    assert(r1.mode == "incremental" && r1.deltaRows == 100)
    assert(mvRows(mv) == fullAgg(base))

    base.delete(spark, Seq(Predicate.Lt("id", 50L)))
    base.update(spark, Map("v" -> (col("v") * 2)), Seq(Predicate.Eq("k", "b")))
    val r2 = MaterializedView.refresh(spark, mv, base)
    assert(r2.mode == "incremental")
    assert(mvRows(mv) == fullAgg(base))
  }

  test("group netting to zero rows is removed from the view") {
    val cat = new GraftCatalog(tempWarehouse())
    val base = cat.createTable("db.base0", rows(1, Seq("a")).schema)
    base.append(spark, rows(90, Seq("a", "b", "c")))
    val mv = MaterializedView.create(spark, cat, "db.mv0", base, Seq("k"), Seq("v"))
    base.delete(spark, Seq(Predicate.Eq("k", "b")))
    val r = MaterializedView.refresh(spark, mv, base)
    assert(r.mode == "incremental")
    assert(mvRows(mv).map(_._1) == Seq("a", "c"))
    assert(mvRows(mv) == fullAgg(base))
  }

  test("refresh with no base change is a noop; repeated refresh is idempotent") {
    val cat = new GraftCatalog(tempWarehouse())
    val base = cat.createTable("db.base1", rows(1, Seq("a")).schema)
    base.append(spark, rows(60, Seq("a", "b")))
    val mv = MaterializedView.create(spark, cat, "db.mv1", base, Seq("k"), Seq("v"))
    assert(MaterializedView.refresh(spark, mv, base).mode == "noop")
    base.append(spark, rows(30, Seq("a")))
    assert(MaterializedView.refresh(spark, mv, base).mode == "incremental")
    assert(MaterializedView.refresh(spark, mv, base).mode == "noop")
    assert(mvRows(mv) == fullAgg(base))
  }

  test("expired base snapshot falls back to a full rebuild") {
    val cat = new GraftCatalog(tempWarehouse())
    val base = cat.createTable("db.base2", rows(1, Seq("a")).schema,
      properties = Map(graft.format.TableProperties.RetentionDays -> "0"))
    base.append(spark, rows(60, Seq("a", "b")))
    val mv = MaterializedView.create(spark, cat, "db.mv2", base, Seq("k"), Seq("v"))
    base.append(spark, rows(40, Seq("b", "c")))
    base.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    val r = MaterializedView.refresh(spark, mv, base)
    assert(r.mode == "full")
    assert(mvRows(mv) == fullAgg(base))
    // and the rebuild re-anchors: the next refresh is incremental again
    base.append(spark, rows(10, Seq("c")).withColumn("id", col("id") + 5000))
    val r2 = MaterializedView.refresh(spark, mv, base)
    assert(r2.mode == "incremental" && mvRows(mv) == fullAgg(base))
  }

  test("null group keys are excluded from the view, never duplicated") {
    val cat = new GraftCatalog(tempWarehouse())
    val df = Seq((1L, "a", 1.5), (2L, null.asInstanceOf[String], 2.5), (3L, "a", 3.0))
      .toDF("id", "k", "v")
    val base = cat.createTable("db.base3", df.schema)
    base.append(spark, df)
    val mv = MaterializedView.create(spark, cat, "db.mv3", base, Seq("k"), Seq("v"))
    assert(mvRows(mv).map(_._1) == Seq("a"))
    base.append(spark, Seq((4L, null.asInstanceOf[String], 9.0), (5L, "a", 1.0)).toDF("id", "k", "v"))
    assert(MaterializedView.refresh(spark, mv, base).mode == "incremental")
    assert(mvRows(mv).map(_._1) == Seq("a"))
    assert(mvRows(mv).head._2 == 3L)
  }
}
