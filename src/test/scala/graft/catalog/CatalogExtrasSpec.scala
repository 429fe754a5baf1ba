package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class CatalogExtrasSpec extends SparkSpec {

  private def mkDf(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (a, b) => Row(a, b) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("tier", StringType))))

  test("stored view: UNION ALL hot+cold (docs/12:168-172)") {
    val cat = new GraftCatalog(tempWarehouse())
    val hot = cat.createTable("db.hot", mkDf(Nil).schema)
    val cold = cat.createTable("db.cold", mkDf(Nil).schema)
    hot.append(spark, mkDf(Seq((1L, "hot"))))
    cold.append(spark, mkDf(Seq((2L, "cold"), (3L, "cold"))))
    val views = new GraftViews(cat)
    views.createView("db.all_tiers",
      "SELECT * FROM hot UNION ALL SELECT * FROM cold", Seq("db.hot", "db.cold"))
    assert(views.view(spark, "db.all_tiers").count() == 3)
    // views read current state: new commits are visible on next materialization
    hot.append(spark, mkDf(Seq((4L, "hot"))))
    assert(views.view(spark, "db.all_tiers").count() == 4)
  }

  test("catalog router: namespaces resolve to linked catalogs (docs/04:95-110)") {
    val main = new GraftCatalog(tempWarehouse())
    val external = new GraftCatalog(tempWarehouse())
    external.createTable("ext.t", mkDf(Nil).schema).append(spark, mkDf(Seq((1L, "x"))))
    main.createTable("db.t", mkDf(Nil).schema)
    val router = new CatalogRouter(main)
    router.linkNamespace("ext", external)
    assert(router.loadTable("ext.t").toDF(spark).count() == 1)
    assert(router.loadTable("db.t").toDF(spark).count() == 0)
  }

  test("task registry: suspend/resume/execute semantics (docs/10:174-183)") {
    val reg = new TaskRegistry
    var runs = 0
    reg.createTask("db.compact_task", "USING CRON 0 2 * * *") { runs += 1 }
    assert(reg.runDue().isEmpty)      // created suspended (reference default)
    reg.execute("db.compact_task")    // manual EXECUTE ignores suspension
    assert(runs == 1)
    reg.resume("db.compact_task")
    assert(reg.runDue() == Seq("db.compact_task") && runs == 2)
    reg.suspend("db.compact_task")
    assert(reg.runDue().isEmpty && runs == 2)
  }

  test("result cache: identical plans hit the same cached result (docs/09:88)") {
    val cache = new ResultCache
    val path = tempWarehouse() + "/t.parquet"
    mkDf(Seq((1L, "a"), (2L, "b"))).write.parquet(path)
    val df1 = spark.read.parquet(path).filter("id > 0")
    val df2 = spark.read.parquet(path).filter("id > 0")
    cache.cached(df1)
    cache.cached(df2)
    assert(cache.size == 1) // same canonical plan -> one entry
    cache.clear()
    assert(cache.size == 0)
  }

  test("external volume + BASE_LOCATION create (docs/01:174-205)") {
    val cat = new GraftCatalog(tempWarehouse())
    val vol = tempWarehouse()
    cat.createExternalVolume("lake", vol)
    val t = cat.createTable("db.ext_t", mkDf(Nil).schema,
      externalVolume = Some("lake"), baseLocation = Some("events/raw"))
    t.append(spark, mkDf(Seq((1L, "v"))))
    assert(t.location.startsWith(vol))
    assert(cat.loadTable("db.ext_t").toDF(spark).count() == 1)
  }
}
