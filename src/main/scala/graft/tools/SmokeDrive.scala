package graft.tools

import graft.catalog.GraftCatalog
import graft.format.{Predicate, Transform}
import graft.table.QueryHistory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end smoke driver over the public API: builds a Graft table from the
  * sf0.001 events parquet, exercises append / delete / update / merge /
  * time-travel / schema evolution / MOR / compaction / metadata tables, and
  * prints observable results at each step. Run:
  *   sbt "runMain graft.tools.SmokeDrive"
  */
object SmokeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    println(s"warehouse: $wh")
    val cat = new GraftCatalog(wh)
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")

    // D2: partitioned create (hidden partitioning: day(ts))
    val t = cat.createTable("db.events", events.schema,
      partitionBy = Seq("ts" -> Transform.Day, "event_type" -> Transform.Identity))
    // W1 append
    t.append(spark, events)
    println(s"rows after append: ${t.toDF(spark).count()} (expect 1000)")

    // S2/S3 pruning: filter on source column ts -> day partitions pruned
    QueryHistory.clear()
    val day1 = t.toDF(spark, Predicate.GtEq("ts", java.sql.Timestamp.valueOf("2024-01-15 00:00:00")),
      Predicate.Lt("ts", java.sql.Timestamp.valueOf("2024-01-16 00:00:00")))
    println(s"rows on 2024-01-15: ${day1.count()}")
    val met = QueryHistory.all.last
    println(s"pruning: files ${met.filesScanned}/${met.filesTotal}, manifests ${met.manifestsScanned}/${met.manifestsTotal}")

    // W3 COW delete
    t.delete(spark, Seq(Predicate.Eq("event_type", "click")))
    println(s"rows after COW delete of clicks: ${t.toDF(spark).count()}")
    println(s"clicks remaining: ${t.toDF(spark).filter(col("event_type") === "click").count()} (expect 0)")

    // W6 update
    t.update(spark, Map("value" -> (col("value") * 2)), Seq(Predicate.Eq("event_type", "view")))
    println(s"sum(value) views after 2x update: ${t.toDF(spark).filter(col("event_type") === "view").agg(sum("value")).head.getDouble(0)}")

    // time travel S8/S11
    val snaps = t.meta.snapshots
    println(s"snapshots: ${snaps.map(s => s"${s.snapshotId}:${s.operation}").mkString(", ")}")
    val afterAppend = t.atSnapshot(snaps.head.snapshotId).toDF(spark).count()
    println(s"time travel to first snapshot: $afterAppend rows (expect 1000)")

    // W7 merge: upsert aggregated daily counts into a second table
    val gold = cat.createTable("db.gold",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("day", org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType))))
    val agg = t.toDF(spark).groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    gold.append(spark, agg.limit(10)) // seed partial
    gold.merge(spark, agg, Seq("day" -> "day", "event_type" -> "event_type"),
      whenMatchedUpdate = Map("cnt" -> col("s.cnt")))
    println(s"gold rows after merge: ${gold.toDF(spark).count()} vs agg rows ${agg.count()}")

    // schema evolution D6-D9
    t.addColumn("note", org.apache.spark.sql.types.StringType)
    t.renameColumn("value", "amount")
    t.widenColumn("user_id", org.apache.spark.sql.types.LongType)
    val evolved = t.toDF(spark)
    println(s"evolved schema: ${evolved.columns.mkString(",")}")
    println(s"old files readable post-evolution: ${evolved.count()} rows; null notes: ${evolved.filter(col("note").isNull).count()}")

    // MOR delete W4 + S4
    t.setProperty("enable-iceberg-merge-on-read", "true")
    val before = t.toDF(spark).count()
    t.delete(spark, Seq(Predicate.Eq("event_type", "purchase")))
    val after = t.toDF(spark).count()
    println(s"MOR delete purchases: $before -> $after; delete files: ${t.scan().deleteFiles.size}")

    // O1 compaction folds MOR deletes
    t.compact(spark)
    println(s"after compact: ${t.toDF(spark).count()} rows; delete files now: ${t.scan().deleteFiles.size}")
    println(s"health: ${t.health()}")

    // metadata tables M1/M3
    println("snapshotsDF:")
    t.snapshotsDF(spark).select("snapshot_id", "operation").show(100, false)
    println(s"filesDF count: ${t.filesDF(spark).count()}")

    // rollback + refs
    t.setRef("pre-compact", snaps.head.snapshotId)
    println(s"ref read: ${t.atRef("pre-compact").toDF(spark).count()} (expect 1000)")

    // D15 views, D4/D5 routing, D16 tasks, S7 cache
    val views = new graft.catalog.GraftViews(cat)
    views.createView("db.gold_view", "SELECT count(*) AS n FROM gold", Seq("db.gold"))
    println(s"view rows: ${views.view(spark, "db.gold_view").head.getLong(0)} (expect ${gold.toDF(spark).count()})")
    val router = new graft.catalog.CatalogRouter(cat)
    val ext = new graft.catalog.GraftCatalog(java.nio.file.Files.createTempDirectory("graft-ext").toString)
    router.linkNamespace("ext", ext)
    ext.createTable("ext.mirror", gold.schema).append(spark, gold.toDF(spark))
    println(s"routed ext.mirror rows: ${router.loadTable("ext.mirror").toDF(spark).count()}")
    val reg = new graft.catalog.TaskRegistry
    reg.createTask("db.maint", "USING CRON 0 2 * * *") { t.maintain(spark); () }
    reg.execute("db.maint")
    println(s"task executed; table still has ${t.toDF(spark).count()} rows")
    val cacheApi = new graft.catalog.ResultCache
    cacheApi.cached(t.toDF(spark).filter(col("event_type") === "view"))
    cacheApi.cached(t.toDF(spark).filter(col("event_type") === "view"))
    println(s"result cache entries: ${cacheApi.size} (expect 1)")

    // functions surface: dedup signatures + similarity search
    import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val sigCounts = docs.select(
      countDistinct(TF.fingerprint(col("text"))).as("fp"),
      countDistinct(TF.bagOfWordsSignature(col("text"))).as("bow"),
      countDistinct(TF.minhashSignature(col("text"))).as("mh")).head
    println(s"distinct signatures fp/bow/mh: ${sigCounts.getLong(0)}/${sigCounts.getLong(1)}/${sigCounts.getLong(2)} of ${docs.count()}")
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val top3 = VF.bruteForceTopK(emb.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 3)
      .select("vec_id").collect().map(_.getLong(0)).mkString(",")
    println(s"top-3 neighbors of vec 0: $top3")
    val centroids = emb.orderBy("vec_id").limit(4).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    val ivf3 = VF.ivfTopK(emb.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 3,
      centroids, nprobe = 4).select("vec_id").collect().map(_.getLong(0)).mkString(",")
    println(s"IVF(full-probe) top-3: $ivf3 (expect $top3)")

    // partition evolution: new default spec, both epochs scan together
    val evo = cat.createTableAs(spark, "db.events_pevo",
      events.limit(200), partitionBy = Seq("ts" -> Transform.Day))
    evo.evolvePartitionSpec(Seq("event_type" -> Transform.Identity))
    evo.append(spark, events.limit(300).except(events.limit(200)))
    println(s"partition evolution: ${evo.toDF(spark).count()} rows across ${evo.meta.specs.size} specs")

    // incremental consumption: snapshot-diff changelog
    val firstSnap = evo.meta.snapshots.head.snapshotId
    val changed = graft.streaming.GraftStreamSource.changesSince(spark, evo, Some(firstSnap)).count()
    println(s"changesSince(first snapshot): $changed rows (expect 100)")

    // DataSource integration: spark.read/write.format("graft")
    gold.toDF(spark).write.format("graft").option("warehouse", wh).option("table", "db.gold_copy").save()
    val viaSource = spark.read.format("graft")
      .option("warehouse", wh).option("table", "db.gold_copy").load()
      .filter(col("cnt") > 0).count()
    println(s"format(graft) round trip: $viaSource rows with cnt>0")

    // CTAS + scale helpers: salted skew join and approx-distinct
    val ctas = cat.createTableAs(spark, "db.events_ctas", t.toDF(spark).limit(100))
    println(s"CTAS table rows: ${ctas.toDF(spark).count()} (expect 100)")
    import graft.functions.ScaleFunctions
    val dim = t.toDF(spark).select(col("event_type")).distinct()
      .withColumn("label", concat(lit("type:"), col("event_type")))
    val salted = ScaleFunctions.saltedJoin(t.toDF(spark), dim, "event_type", col("event_id"), 8)
    println(s"salted join rows: ${salted.count()} (expect ${t.toDF(spark).count()})")
    val ad = t.toDF(spark).agg(ScaleFunctions.approxDistinct(col("user_id"))).head.getLong(0)
    println(s"approx distinct users: $ad")

    // SQL surface: register the namespace, query with spark.sql
    cat.registerAll(spark, "db")
    val sqlN = spark.sql("SELECT count(*) AS n FROM gold").head.getLong(0)
    println(s"spark.sql over registered graft table: $sqlN rows (expect ${gold.toDF(spark).count()})")

    // multimodal blob pipeline through a Graft table round trip
    val staged = graft.operators.Multimodal.ingest(docs.limit(50), "text", "text/plain")
      .select(col("doc_id"), col("media.blob").as("blob"), col("media.meta").as("meta"), col("decoded"))
    val mediaT = cat.createTable("db.media", staged.schema)
    mediaT.append(spark, staged)
    val mm = mediaT.toDF(spark).agg(count(lit(1)), sum(col("meta.byte_len"))).head
    println(s"multimodal blobs stored: ${mm.getLong(0)} rows, ${mm.getLong(1)} bytes")

    // driver contract: entry() must return >0 rows on sf0.001
    println(s"entry rows: ${graft.SparkEntry.entry(spark).count()} (expect >0)")

    spark.stop()
    println("SMOKE OK")
  }
}
