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

  test("task schedule parse: cron fields, names, steps, ranges, intervals") {
    import java.time.Instant
    val daily = TaskSchedule.parse("USING CRON 0 2 * * * America/Los_Angeles")
      .asInstanceOf[TaskSchedule.Cron]
    assert(daily.minutes == Set(0) && daily.hours == Set(2))
    assert(daily.zone.getId == "America/Los_Angeles")
    val weekly = TaskSchedule.parse("using cron 30 1-3 * JAN,JUL SUN")
      .asInstanceOf[TaskSchedule.Cron]
    assert(weekly.hours == Set(1, 2, 3) && weekly.months == Set(1, 7) &&
      weekly.dow == Set(0))
    val step = TaskSchedule.parse("USING CRON */15 * * * 7")
      .asInstanceOf[TaskSchedule.Cron]
    assert(step.minutes == Set(0, 15, 30, 45) && step.dow == Set(0)) // 7 = Sunday
    assert(TaskSchedule.parse("10 MINUTES") == TaskSchedule.EveryMinutes(10))
    intercept[RuntimeException](TaskSchedule.parse("whenever"))
    intercept[RuntimeException](TaskSchedule.parse("USING CRON 61 * * * *"))

    // dow ranges ending in Sunday (7, SUN, or a 5-0 descending form) span
    // through the top of the week instead of expanding empty
    def dowOf(s: String) = TaskSchedule.parse(s).asInstanceOf[TaskSchedule.Cron].dow
    assert(dowOf("USING CRON 0 0 * * 5-7") == Set(5, 6, 0))
    assert(dowOf("USING CRON 0 0 * * FRI-SUN") == Set(5, 6, 0))
    assert(dowOf("USING CRON 0 0 * * 0-7") == Set(0, 1, 2, 3, 4, 5, 6))
    assert(dowOf("USING CRON 0 0 * * WED-SAT") == Set(3, 4, 5, 6))
    // anchored steps span vixie's 0-7 dow field: '5/2' = Fri+Sun(7→0),
    // '7/2' = Sunday only (not an empty 7-to-6 range)
    assert(dowOf("USING CRON 0 0 * * 7/2") == Set(0))
    assert(dowOf("USING CRON 0 0 * * 5/2") == Set(5, 0))
    intercept[RuntimeException](TaskSchedule.parse("USING CRON 0 0 * * SAT-WED"))

    // nextFire: strictly after, hour/day skipping, timezone honored
    val t0 = Instant.parse("2024-03-15T12:34:56Z")
    val utcDaily = TaskSchedule.parse("USING CRON 0 2 * * * UTC")
    assert(utcDaily.nextFire(t0, t0) == Instant.parse("2024-03-16T02:00:00Z"))
    val onFire = Instant.parse("2024-03-16T02:00:00Z")
    assert(utcDaily.nextFire(t0, onFire) == Instant.parse("2024-03-17T02:00:00Z"))
    // vixie OR: dom and dow both restricted -> either matches
    val both = TaskSchedule.parse("USING CRON 0 0 1 * MON")
    assert(both.nextFire(t0, t0) == Instant.parse("2024-03-18T00:00:00Z")) // Monday before the 1st
    // vixie: a step field `*/2` still counts as unrestricted (`*`-prefixed),
    // so dom `*/2` + dow MON means Mondays-on-odd-days (AND), not OR
    val stepAnd = TaskSchedule.parse("USING CRON 0 0 */2 * MON")
      .asInstanceOf[TaskSchedule.Cron]
    assert(stepAnd.domStar && !stepAnd.dowStar)
    // 2024-03-15 Fri -> next Monday on an odd day-of-month: Mar 25
    assert(stepAnd.nextFire(t0, t0) == Instant.parse("2024-03-25T00:00:00Z"))
  }

  test("SQL task bodies split on statement boundaries, quote-aware") {
    import TaskRegistry.splitSqlBody
    assert(splitSqlBody("SELECT 1") == Seq("SELECT 1"))
    assert(splitSqlBody(
      "BEGIN INSERT INTO t VALUES (';'); DELETE FROM t WHERE x = 'a;b'; END") ==
      Seq("INSERT INTO t VALUES (';')", "DELETE FROM t WHERE x = 'a;b'"))
    assert(splitSqlBody("begin select 1; select 2; end;") ==
      Seq("select 1", "select 2"))
    assert(splitSqlBody("SELECT 'BEGIN fine END'") == Seq("SELECT 'BEGIN fine END'"))
    assert(splitSqlBody("SELECT 'it''s'") == Seq("SELECT 'it''s'"))
    // END must be word-bounded: a BEGIN body ending in 'trend' is malformed,
    // not silently truncated by 3 chars
    intercept[IllegalArgumentException](splitSqlBody("BEGIN SELECT trend"))
    intercept[IllegalArgumentException](splitSqlBody("BEGIN SELECT 1; SELECT 2"))
    // BEGIN TRANSACTION / BEGIN WORK / "BEGIN;" are transaction STATEMENTS,
    // not block openers — they split normally and need no END
    assert(splitSqlBody("BEGIN TRANSACTION; DELETE FROM t WHERE x; COMMIT") ==
      Seq("BEGIN TRANSACTION", "DELETE FROM t WHERE x", "COMMIT"))
    assert(splitSqlBody("begin work; select 1; commit") ==
      Seq("begin work", "select 1", "commit"))
    assert(splitSqlBody("BEGIN; SELECT 1; COMMIT") ==
      Seq("BEGIN", "SELECT 1", "COMMIT"))
    // whitespace before the txn-statement terminator still counts...
    assert(splitSqlBody("BEGIN ; SELECT 1; COMMIT") ==
      Seq("BEGIN", "SELECT 1", "COMMIT"))
    assert(splitSqlBody("BEGIN\n  TRANSACTION; SELECT 1; COMMIT") ==
      Seq("BEGIN\n  TRANSACTION", "SELECT 1", "COMMIT"))
    // ...but a WORD continuing TRANSACTION/WORK is not the txn statement
    // (block parse → must end with END), and bare BEGIN + statements stays
    // a block opener (Snowflake scripting semantics), so no END = error
    intercept[IllegalArgumentException](splitSqlBody("BEGIN WORKLOAD; X"))
    intercept[IllegalArgumentException](splitSqlBody("BEGIN\nSELECT 1;\nCOMMIT"))
    // `;` inside -- comments and "quoted" identifiers is not a boundary
    assert(splitSqlBody("SELECT 1 -- trailing; note\n; SELECT 2") ==
      Seq("SELECT 1 -- trailing; note", "SELECT 2"))
    assert(splitSqlBody("SELECT \"a;b\" FROM t; SELECT 2") ==
      Seq("SELECT \"a;b\" FROM t", "SELECT 2"))
  }

  test("task history records fires immediately, including FAILED runs") {
    import java.time.Instant
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    val reg = new TaskRegistry(t0)
    var okRuns = 0
    reg.createTask("a.ok", "30 MINUTES") { okRuns += 1 }
    reg.createTask("b.boom", "60 MINUTES") { sys.error("task body failed") }
    reg.resume("a.ok"); reg.resume("b.boom")
    // fires: a@00:30, a@01:00, b@01:00 (tie by name) -> b throws mid-advance
    intercept[RuntimeException](reg.advanceTo(t0.plusSeconds(7200)))
    val hist = reg.historyWithState
    assert(hist == Seq(
      ("a.ok", t0.plusSeconds(1800), "SUCCEEDED"),
      ("a.ok", t0.plusSeconds(3600), "SUCCEEDED"),
      ("b.boom", t0.plusSeconds(3600), "FAILED")))
    assert(okRuns == 2)
    // the failed fire is consumed (nextFire advanced), so resuming the
    // advance does not re-run it in a catch-up storm
    intercept[RuntimeException](reg.advanceTo(t0.plusSeconds(7200)))
    assert(reg.historyWithState.count(_._1 == "b.boom") == 2) // 01:00 + 02:00, each once
  }

  test("task dispatcher: virtual clock fires in order, anchors at resume") {
    import java.time.Instant
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    val reg = new TaskRegistry(t0)
    val log = scala.collection.mutable.ArrayBuffer[String]()
    reg.createTask("a.hourly", "USING CRON 0 * * * * UTC") { log += "hourly" }
    reg.createTask("b.fast", "20 MINUTE") { log += "fast" }
    reg.resume("a.hourly"); reg.resume("b.fast")
    val fired = reg.advanceTo(t0.plusSeconds(3600))
    // 20-min interval anchored at resume: 00:20, 00:40, 01:00; cron at 01:00.
    // The 01:00 tie breaks by name: a.hourly before b.fast.
    assert(fired.map(_._1) == Seq("b.fast", "b.fast", "a.hourly", "b.fast"))
    assert(fired.map(_._2) == Seq(1200L, 2400L, 3600L, 3600L).map(t0.plusSeconds))
    // suspension stops fires; resume re-anchors the interval (no catch-up)
    reg.suspend("b.fast")
    assert(reg.advanceTo(t0.plusSeconds(5400)).map(_._1) == Seq())
    reg.resume("b.fast") // at 01:30 -> re-anchored: next fires 01:50, 02:10
    val more = reg.advanceTo(t0.plusSeconds(7200))
    assert(more == Seq(("b.fast", t0.plusSeconds(6600)),
                       ("a.hourly", t0.plusSeconds(7200))))
    assert(reg.history.size == fired.size + more.size)
    intercept[IllegalArgumentException](reg.advanceTo(t0)) // clock never reverses
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

  test("result cache: FIFO-bounded, superseded entries unpersist") {
    val cache = new ResultCache(maxEntries = 2)
    val path = tempWarehouse() + "/t.parquet"
    mkDf(Seq((1L, "a"), (2L, "b"), (3L, "c"))).write.parquet(path)
    val dfs = (1 to 3).map(i => spark.read.parquet(path).filter(s"id >= $i"))
    dfs.foreach(cache.cached)
    assert(cache.size == 2, "third insert must evict the first")
    // the evicted plan misses (re-persists), the retained ones hit
    cache.cached(spark.read.parquet(path).filter("id >= 1"))
    assert(cache.size == 2)
    cache.clear()
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
