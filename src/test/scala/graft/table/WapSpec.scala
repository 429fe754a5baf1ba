package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Write-audit-publish over branch refs: staged commits are invisible on
  * main, auditable via the branch, publish is a fast-forward, and a
  * diverged main refuses the publish instead of silently dropping commits.
  */
class WapSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType)))

  private def mk(from: Int, n: Int) = spark.createDataFrame(
    (from until from + n).map(i => Row(i.toLong, s"t$i")).asJava, schema)

  test("branch reads use the table's CURRENT schema after metadata-only evolution") {
    // branch commits advance only their ref, never currentSnapshotId — a
    // branch-head scan must not be misread as time travel, or an ADD
    // COLUMN landed after the branch commit is invisible to branch readers
    // (Iceberg rule: branch reads use current schema; tags pin snapshots)
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wap_evolve", schema)
    t.append(spark, mk(0, 4))
    t.appendToBranch(spark, mk(10, 3), "dev")
    t.addColumn("note", StringType)
    val branch = t.atRef("dev").toDF(spark)
    assert(branch.columns.contains("note"), "branch read must see the live schema")
    assert(branch.count() == 7 && branch.filter(branch("note").isNotNull).count() == 0)
    // a ref pinned to a HISTORICAL main snapshot stays a snapshot-schema
    // pin (only a pin at the live head resolves to the live schema)
    t.setRef("pin", t.meta.currentSnapshotId.get)
    t.addColumn("later", StringType)
    // advance main past the pin (append under the evolved live schema)
    t.append(spark, mk(20, 2)
      .withColumn("note", org.apache.spark.sql.functions.lit("n"))
      .withColumn("later", org.apache.spark.sql.functions.lit("l")))
    assert(!t.atRef("pin").toDF(spark).columns.contains("later"),
      "tag-style refs keep the pinned snapshot's schema")
  }

  test("branch-ness is a property of the ref, not the snapshot it points at") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wap_reftype", schema)
    t.append(spark, mk(0, 3))
    val head = t.meta.currentSnapshotId.get
    // the natural create-branch gesture: a BRANCH ref at main's head —
    // must follow the live schema even though the snapshot is main history
    t.setRef("dev2", head, isBranch = true)
    // ...while a TAG at the very same snapshot stays a snapshot-schema pin
    t.setRef("pin2", head)
    t.addColumn("note", StringType)
    assert(t.atRef("dev2").toDF(spark).columns.contains("note"),
      "a setRef-created branch must see metadata-only evolution")
    assert(!t.atRef("pin2").toDF(spark).columns.contains("note"),
      "a tag at the same snapshot keeps the pinned schema")
    // tags are immutable: appends and publish through them are refused
    intercept[IllegalArgumentException](t.appendToBranch(spark, mk(10, 1), "pin2"))
    intercept[IllegalArgumentException](t.publish("pin2"))
  }

  test("CREATE OR REPLACE demotes surviving branches to tags (no all-NULL reads)") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wap_replace", schema)
    t.append(spark, mk(0, 4))
    t.appendToBranch(spark, mk(10, 3), "audit")
    // replace mints a fresh field-id space; a branch still tracking the
    // live schema would resolve every pre-replace file to NULLs
    t.replaceWith(StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val r = t.meta.refs("audit")
    assert(!r.isBranch, "replace must demote surviving branches to tags")
    val audit = t.atRef("audit").toDF(spark)
    assert(audit.columns.toSeq == Seq("id", "tag"), "tag reads its pinned schema")
    assert(audit.count() == 7 && audit.filter(audit("tag").isNotNull).count() == 7,
      "pre-replace branch data stays fully readable — never NULLed out")
    intercept[IllegalArgumentException](t.appendToBranch(spark, mk(20, 1), "audit"))
  }

  test("stage on branch, audit, fast-forward publish") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wap", schema)
    t.append(spark, mk(0, 10))
    t.appendToBranch(spark, mk(10, 5), "audit")

    assert(t.toDF(spark).count() == 10, "staged rows must be invisible on main")
    assert(t.atRef("audit").toDF(spark).count() == 15, "branch sees staged rows")
    // a second staged batch stacks on the branch head
    t.appendToBranch(spark, mk(15, 5), "audit")
    assert(t.atRef("audit").toDF(spark).count() == 20)
    assert(t.toDF(spark).count() == 10)

    val head = t.meta.refs("audit").snapshotId
    t.publish("audit")
    assert(t.toDF(spark).count() == 20)
    // publish is metadata-only: the branch snapshots ARE main's history now,
    // and the ref is gone — published chains must not stay pinned as GC roots
    assert(t.meta.currentSnapshotId.contains(head))
    assert(!t.meta.refs.contains("audit"))
  }

  test("re-staging a published branch name forks from the NEW main head") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wapr", schema)
    t.append(spark, mk(0, 10))
    t.appendToBranch(spark, mk(10, 5), "audit")
    t.publish("audit")
    t.append(spark, mk(100, 3)) // main advances after the publish
    // the dropped ref means this stages on top of main's CURRENT head —
    // with a stale surviving ref this would fork pre-advance and the
    // second publish would be refused
    t.appendToBranch(spark, mk(200, 2), "audit")
    assert(t.atRef("audit").toDF(spark).count() == 20)
    t.publish("audit")
    assert(t.toDF(spark).count() == 20)
  }

  test("dropRef abandons staged work; expiry then reclaims the chain") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wapx", schema)
    t.append(spark, mk(0, 10))
    t.appendToBranch(spark, mk(10, 5), "audit")
    t.dropRef("audit")
    assert(!t.meta.refs.contains("audit"))
    intercept[RuntimeException](t.atRef("audit"))
    t.append(spark, mk(100, 3)) // expiry always keeps the newest snapshot
    val (removed, _) = t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed == 2, "un-rooted branch chain + old main snapshot expire")
    assert(t.toDF(spark).count() == 13, "main unaffected by the abandoned branch")
    intercept[RuntimeException](t.dropRef("nope"))
  }

  test("publish refuses when main diverged past the fork point") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wapd", schema)
    t.append(spark, mk(0, 10))
    t.appendToBranch(spark, mk(10, 5), "audit")
    t.append(spark, mk(100, 3)) // main advances independently
    val e = intercept[IllegalArgumentException](t.publish("audit"))
    assert(e.getMessage.contains("fast-forward"))
    assert(t.toDF(spark).count() == 13, "failed publish must not change main")
  }

  test("timestamp travel on main cannot see staged branch commits") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wapt", schema)
    t.append(spark, mk(0, 10))
    Thread.sleep(5)
    t.appendToBranch(spark, mk(10, 5), "audit")
    Thread.sleep(5)
    // "now" is after the staged commit; main readers must still see only 10
    assert(t.asOf(System.currentTimeMillis()).toDF(spark).count() == 10,
      "staged rows leaked through timestamp time travel")
    t.publish("audit")
    assert(t.asOf(System.currentTimeMillis()).toDF(spark).count() == 15,
      "published branch commits are main history for timestamp travel")
  }

  test("publish still works after expiry removed nothing from the staged chain") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wape", schema)
    t.append(spark, mk(0, 10))
    t.appendToBranch(spark, mk(10, 5), "audit")
    t.appendToBranch(spark, mk(15, 5), "audit") // two-link branch chain
    // aggressive expiry: intermediate branch commits must be kept, or the
    // publish ancestor walk breaks mid-chain
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    t.publish("audit")
    assert(t.toDF(spark).count() == 20)
  }

  test("publish is reachable from SQL: CALL system.publish") {
    val wh = tempWarehouse()
    spark.conf.set("spark.sql.catalog.gwap", classOf[graft.sources.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwap.warehouse", wh)
    spark.sql("CREATE TABLE gwap.db.t (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO gwap.db.t VALUES (1, 'a'), (2, 'b')")
    new GraftCatalog(wh).loadTable("db.t").appendToBranch(spark, mk(10, 3), "audit")
    assert(spark.sql("SELECT count(*) FROM gwap.db.t").head.getLong(0) == 2,
      "staged rows must stay invisible to SQL readers")
    val out = spark.sql("CALL gwap.system.publish(table => 'db.t', branch => 'audit')")
    assert(out.columns.toSeq == Seq("current_snapshot_id"))
    assert(spark.sql("SELECT count(*) FROM gwap.db.t").head.getLong(0) == 5)
  }

  test("concurrent branch commits retry under OCC; main stays independent") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wapc", schema)
    t.append(spark, mk(0, 10))
    // pin the fork point: without this, whether the racing main append
    // lands before or after the first branch commit would change the
    // branch's base (10 vs 15 rows) and make the assertion timing-dependent
    t.setRef("audit", t.meta.currentSnapshotId.get, isBranch = true)
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(3)
    // two writers race on the same branch ref, one on main — all must land
    val tasks = Seq(
      () => t.appendToBranch(spark, mk(100, 5), "audit"),
      () => t.appendToBranch(spark, mk(200, 5), "audit"),
      () => t.append(spark, mk(300, 5)))
    val futures = tasks.map(f => pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = f()
    }))
    futures.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(t.toDF(spark).count() == 15, "main = initial 10 + its own append")
    assert(t.atRef("audit").toDF(spark).count() == 20,
      "branch = fork base 10 + BOTH staged batches (OCC retry, no lost update)")
  }

  test("branch commits survive snapshot expiry (refs are GC roots)") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.wapg", schema)
    t.append(spark, mk(0, 10))
    t.appendToBranch(spark, mk(10, 5), "audit")
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(t.atRef("audit").toDF(spark).count() == 15)
  }
}
