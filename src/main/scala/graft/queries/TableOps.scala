package graft.queries

import graft.catalog.GraftCatalog
import graft.format.{Predicate, Transform}
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.LocalDateTime

/** The Graft-table capability surface (SURVEY.md §2.1-§2.6, §2.8) exercised
  * end-to-end as oracle-checkable queries: each entry builds a fresh Graft
  * table from the raw parquet test data, applies table operations (append /
  * DELETE / UPDATE / MERGE / time travel / rollback / MOR / compaction /
  * schema evolution / streaming ingest), and returns the final table state —
  * whose contents a plain-SQL oracle over the same raw parquet reproduces.
  *
  * Every table is built in a fresh temp warehouse per invocation, so queries
  * are independent and re-runnable.
  */
object TableOps {

  private[queries] val Split = LocalDateTime.of(2024, 1, 15, 0, 0) // mid-range of events.ts

  /** Every temp warehouse/stage a query creates, so a long-lived driver
    * (Bench's retry pass in particular — ADVICE r9: a polluted-pass retry
    * re-runs every table-building query and used to DOUBLE the leaked disk
    * on exactly the stressed hosts that trigger retries) can reclaim them
    * between queries instead of leaking one directory per fixture build.
    */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[(java.nio.file.Path, Int)]()

  private[graft] def newTempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add((p, 0))
    p.toString
  }

  /** A temp dir EXCLUDED from [[reclaimTempDirs]] — for per-JVM shared
    * state that must outlive any one query (the graft_sql warehouse: the
    * DSv2 catalog plugin reads its path once per session, so reclaiming it
    * mid-run would both orphan the re-created directory from the registry
    * and delete live namespace state under a cached catalog). Bounded: one
    * per JVM, not one per query.
    */
  private[graft] def newPinnedTempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Recursively delete every registered temp dir. Safe only once the
    * DataFrames built over them are fully consumed (Bench/Verify call this
    * AFTER the query's action completes).
    */
  private[graft] def reclaimTempDirs(): Int = {
    var n = 0
    // a dir that fails to delete (a still-flushing checkpoint under a
    // concurrent writer) is RE-ENQUEUED for the next reclaim pass rather
    // than dropped — dropping it leaked exactly on the stressed hosts the
    // reclaim targets. Bounded at 3 attempts so a permanently-undeletable
    // path cannot grow the queue forever; retries collect locally and
    // re-enqueue after the drain (re-adding mid-drain would loop this pass).
    val retry = scala.collection.mutable.ListBuffer[(java.nio.file.Path, Int)]()
    var e = tempDirs.poll()
    while (e != null) {
      val (p, attempts) = e
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
          finally walk.close()
        }
        n += 1
      } catch {
        // best-effort reclaim: Files.walk traversal failures surface as
        // UncheckedIOException (a RuntimeException) — a concurrent writer
        // (e.g. a failed gate's still-flushing stream checkpoint) must not
        // abort the whole Bench/Verify run
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          if (attempts < 3) retry += ((p, attempts + 1))
      }
      e = tempDirs.poll()
    }
    retry.foreach(tempDirs.add)
    n
  }

  /** Binpack-compact a live state table and return the two proof flags
    * every durable-state gate certifies in-gate: (files strictly
    * decreased, zero rows lost). One helper so the proof ritual cannot
    * drift per gate — five gates certify it and every future persisted
    * state must too.
    */
  private[graft] def compactionProof(s: SparkSession, t: GraftTable): (Boolean, Boolean) = {
    val filesBefore = t.scan().dataFiles.size
    val rowsBefore = t.toDF(s).count()
    t.compact(s)
    (t.scan().dataFiles.size < filesBefore, t.toDF(s).count() == rowsBefore)
  }

  private[queries] def newCatalog(): GraftCatalog = {
    new GraftCatalog(newTempDir("graft-wh"))
  }

  /** Run `body` with the session shuffle-partition count — the knob that
    * also sizes every stateful stream's STATE partitioning — scoped to
    * `n`, restored afterwards. Stateful operators checkpoint one state
    * store per partition per batch (a stream-stream join keeps four), so
    * the session's 32 partitions turn a 100k-row streaming fixture into
    * hundreds of store snapshots of pure fixed overhead; the state
    * partition count is a per-query deployment knob at any scale. The
    * restore happens after `body` COMPLETES — callers must run their
    * stream to termination inside it, because micro-batches plan
    * asynchronously against the live session value.
    */
  private[graft] def withStatePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try { s.conf.set("spark.sql.shuffle.partitions", n.toString); body }
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** events table partitioned with hidden partitioning day(ts) + identity
    * (reference docs/07-partitioning.md:59-69, the docs' running example).
    */
  private[queries] def eventsTable(s: SparkSession, d: String,
                          partitioned: Boolean = true,
                          props: Map[String, String] = Map.empty): GraftTable =
    FixtureClock.timed {
      val df = Tables.events(s, d)
      val cat = newCatalog()
      val t = cat.createTable("db.events", df.schema,
        partitionBy = if (partitioned) Seq("ts" -> Transform.Day, "event_type" -> Transform.Identity) else Nil,
        properties = props)
      t.append(s, df)
      t
    }

  private[queries] def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  private[queries] def aggByType(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type")

  private[queries] val aggByTypeSqlFrom =
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM %s GROUP BY 1 ORDER BY 1""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // D2 + W1 + S1: create partitioned table, append, full snapshot scan.
    ("g_create_append_scan",
      (s: SparkSession, d: String) => aggByType(eventsTable(s, d).toDF(s)),
      aggByTypeSqlFrom.format("events")),

    // S2 + S3: hidden-partition pruning — filter on the SOURCE column ts;
    // the planner derives day(ts) partition values and reads only that day's
    // files (docs/07:25-40, docs/09:17-44). `pruned` certifies it actually
    // skipped files, not just filtered rows.
    ("g_partition_pruned_scan",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d)
        val sc = t.scan(
          Predicate.GtEq("ts", LocalDateTime.of(2024, 1, 15, 0, 0)),
          Predicate.Lt("ts", LocalDateTime.of(2024, 1, 16, 0, 0)))
        val m = sc.metrics
        aggByType(sc.toDF(s)).withColumn("pruned", lit(m.filesScanned < m.filesTotal))
      },
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  true AS pruned
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // W3: copy-on-write DELETE (docs/08:99-110) — only candidate files are
    // rewritten; survivors carried forward by manifest reference.
    ("g_cow_delete",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d)
        t.delete(s, Seq(Predicate.Eq("event_type", "click")))
        aggByType(t.toDF(s))
      },
      aggByTypeSqlFrom.format("(SELECT * FROM events WHERE event_type <> 'click')")),

    // W6: UPDATE ... SET ... WHERE (docs/08:119-130).
    ("g_update",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d)
        t.update(s, Map("value" -> (col("value") * 2)), Seq(Predicate.Eq("event_type", "view")))
        aggByType(t.toDF(s))
      },
      aggByTypeSqlFrom.format(
        "(SELECT event_id, ts, user_id, event_type, CASE WHEN event_type = 'view' THEN value * 2 ELSE value END AS value, props FROM events)")),

    // W7 + Q12: MERGE INTO — the docs/12:107-126 silver→gold upsert. The
    // target is seeded with zeroed counts for the first half of the month;
    // the MERGE updates those and inserts the rest; final state == the full
    // aggregate, proving both branches fired.
    ("g_merge_upsert",
      (s: SparkSession, d: String) => {
        val e = Tables.events(s, d)
        val agg = e.groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"))
        val cat = newCatalog()
        val gold = cat.createTable("db.gold", StructType(Seq(
          StructField("day", DateType), StructField("event_type", StringType),
          StructField("cnt", LongType), StructField("total", DoubleType))))
        val seed = agg.filter(col("day") < lit("2024-01-15"))
          .withColumn("cnt", lit(0L)).withColumn("total", lit(0.0))
        gold.append(s, seed)
        gold.merge(s, agg, Seq("day" -> "day", "event_type" -> "event_type"),
          whenMatchedUpdate = Map("cnt" -> col("s.cnt"), "total" -> col("s.total")))
        gold.toDF(s).orderBy("day", "event_type")
      },
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // W7 through S4: MERGE reading a MOR table with outstanding position
    // deletes — the rewrite must see delete-merged rows (docs/08:104-116),
    // fold them, and upsert on top.
    ("g_merge_over_mor",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d, partitioned = false,
          props = Map("enable-iceberg-merge-on-read" -> "true"))
        t.delete(s, Seq(Predicate.Eq("event_type", "error"))) // MOR position deletes
        val source = Tables.events(s, d)
          .filter(col("event_type") === "signup")
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), (col("value") * 0 + 1.0).as("value"), col("props"))
        t.merge(s, source, Seq("event_id" -> "event_id"),
          whenMatchedUpdate = Map("value" -> col("s.value")),
          insertWhenNotMatched = false)
        aggByType(t.toDF(s))
      },
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN 1.0 ELSE value END AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // S8/S11: time travel — two appends, read the FIRST snapshot
    // (docs/05:60-80); the second append must be invisible.
    ("g_time_travel",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val t = cat.createTable("db.events_tt", df.schema)
        t.append(s, df.filter(col("ts") < lit(Split)))
        val snap1 = t.meta.currentSnapshotId.get
        t.append(s, df.filter(col("ts") >= lit(Split)))
        aggByType(t.atSnapshot(snap1).toDF(s))
      },
      aggByTypeSqlFrom.format("(SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15')")),

    // S11: ROLLBACK — delete then roll back to the pre-delete snapshot; the
    // table reads as if the delete never happened (docs/05:151-160), while
    // history keeps all three commits.
    ("g_rollback",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d)
        val before = t.meta.currentSnapshotId.get
        t.delete(s, Seq(Predicate.Eq("event_type", "click")))
        t.rollbackTo(before)
        aggByType(t.toDF(s))
          .withColumn("commit_count", lit(t.meta.snapshots.size.toLong))
      },
      aggByTypeSqlFrom.format("events")
        .replace("AS sum_value", "AS sum_value,\n  CAST(3 AS BIGINT) AS commit_count")),

    // W4 + S4: merge-on-read DELETE — position-delete files are written and
    // anti-joined at read (docs/08:104-116); `used_delete_files` certifies
    // the MOR path (not a COW rewrite) served the query.
    ("g_mor_delete",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d, props = Map("enable-iceberg-merge-on-read" -> "true"))
        t.delete(s, Seq(Predicate.Eq("event_type", "purchase")))
        val sc = t.scan()
        aggByType(sc.toDF(s)).withColumn("used_delete_files", lit(sc.deleteFiles.nonEmpty))
      },
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  true AS used_delete_files
        |FROM events WHERE event_type <> 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // O1: compaction — many small appends + MOR deletes fold into few
    // target-size files (docs/10:20-49); contents identical, delete files
    // gone, file count reduced.
    ("g_compact",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val t = cat.createTable("db.events_c", df.schema,
          properties = Map("enable-iceberg-merge-on-read" -> "true"))
        (0 until 3).foreach(i => t.append(s, df.filter(col("event_id") % 3 === i)))
        t.delete(s, Seq(Predicate.Eq("event_type", "click")))
        val filesBefore = t.scan().dataFiles.size
        t.compact(s, targetFileSizeBytes = Some(128L * 1024 * 1024))
        val after = t.scan()
        aggByType(after.toDF(s))
          .withColumn("files_reduced", lit(after.dataFiles.size < filesBefore))
          .withColumn("deletes_folded", lit(after.deleteFiles.isEmpty))
      },
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  true AS files_reduced, true AS deletes_folded
        |FROM events WHERE event_type <> 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // D6-D9: schema evolution — widen + rename + add, all metadata-only;
    // files written under the old schema stay readable by column-ID
    // resolution (docs/06:75-90).
    ("g_schema_evolution",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id").cast("int").as("user_id"),
            col("event_type"), col("value"))
        val cat = newCatalog()
        val t = cat.createTable("db.events_ev", df.schema)
        t.append(s, df.filter(col("ts") < lit(Split)))
        t.widenColumn("user_id", LongType)     // int -> long (docs/06:46-51)
        t.renameColumn("value", "amount")      // ID stable (docs/06:40-42)
        t.addColumn("note", StringType)        // new ID; old files read NULL
        val batch2 = df.filter(col("ts") >= lit(Split))
          .withColumnRenamed("value", "amount")
          .withColumn("user_id", col("user_id").cast("long"))
          .withColumn("note", lit("b2"))
        t.append(s, batch2)
        t.toDF(s)
          .groupBy(coalesce(col("note"), lit("pre-evolution")).as("note"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"),
            dsum(col("amount")).as("amount_sum"))
          .orderBy("note")
      },
      """SELECT CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'pre-evolution' ELSE 'b2' END AS note,
        |  count(*) AS n, count(DISTINCT user_id) AS users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // D6-D9 nested (docs/06:114-118): the same evolution surface INSIDE a
    // struct column — drop/rename/widen/add subfields by stable ID; files
    // written under the old nested shape are re-projected on read.
    ("g_nested_evolution",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
          .select(col("event_id"), col("ts"),
            struct(col("user_id").cast("int").as("uid"), col("event_type").as("etype"),
              col("value").as("tmp")).as("meta"))
        val cat = newCatalog()
        val t = cat.createTable("db.events_nested", df.schema)
        t.append(s, df.filter(col("ts") < lit(Split)))
        t.dropColumn("meta.tmp")              // nested drop: ID retired
        t.renameColumn("meta.uid", "user")    // nested rename: ID stable
        t.widenColumn("meta.user", LongType)  // nested widen: int -> long
        t.addColumn("meta.note", StringType)  // nested add: fresh ID
        val batch2 = Tables.events(s, d).filter(col("ts") >= lit(Split))
          .select(col("event_id"), col("ts"),
            struct(col("user_id").as("user"), col("event_type").as("etype"),
              lit("b2").as("note")).as("meta"))
        t.append(s, batch2)
        t.toDF(s)
          .groupBy(coalesce(col("meta.note"), lit("pre-evolution")).as("note"))
          .agg(count(lit(1)).as("n"), countDistinct(col("meta.user")).as("users"),
            countDistinct(col("meta.etype")).as("types"))
          .orderBy("note")
      },
      """SELECT CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'pre-evolution' ELSE 'b2' END AS note,
        |  count(*) AS n, count(DISTINCT user_id) AS users,
        |  count(DISTINCT event_type) AS types
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // TIME type (docs/06's type matrix): stored as Iceberg's physical
    // encoding — INT64 micros since midnight with a logical-type annotation
    // (Spark 4.1's native TimeType cannot do parquet IO) — with codegen'd
    // extraction/format helpers. The oracle recomputes micros-of-day from
    // the raw timestamps.
    ("g_time_type",
      (s: SparkSession, d: String) => {
        import graft.functions.TimeFunctions
        val df = Tables.events(s, d).select(col("event_id"),
          TimeFunctions.timeOfDayMicros(col("ts")).as("tod"))
        val cat = newCatalog()
        val t = cat.createTable("db.events_time", StructType(Seq(
          StructField("event_id", LongType), TimeFunctions.timeField("tod"))))
        t.append(s, df)
        val isTime = TimeFunctions.isTimeField(t.meta.currentSchema("tod"))
        t.toDF(s)
          .groupBy(TimeFunctions.hourOfTime(col("tod")).as("hr"))
          .agg(count(lit(1)).as("n"), min(col("tod")).as("min_tod"),
            max(col("tod")).as("max_tod"))
          .withColumn("min_str", TimeFunctions.timeToString(col("min_tod")))
          .withColumn("time_typed", lit(isTime))
          .orderBy("hr")
      },
      """SELECT CAST(date_part('hour', ts) AS BIGINT) AS hr, count(*) AS n,
        |  min((date_part('hour', ts)*3600 + date_part('minute', ts)*60 + date_part('second', ts))*1000000) AS min_tod,
        |  max((date_part('hour', ts)*3600 + date_part('minute', ts)*60 + date_part('second', ts))*1000000) AS max_tod,
        |  printf('%02d:%02d:%02d',
        |    min((date_part('hour', ts)*3600 + date_part('minute', ts)*60 + date_part('second', ts))*1000000) // 3600000000,
        |    min((date_part('hour', ts)*3600 + date_part('minute', ts)*60 + date_part('second', ts))*1000000) % 3600000000 // 60000000,
        |    min((date_part('hour', ts)*3600 + date_part('minute', ts)*60 + date_part('second', ts))*1000000) % 60000000 // 1000000) AS min_str,
        |  true AS time_typed
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // CDF changelog (docs/05 snapshot diff + docs/12 incremental patterns,
    // completed to delete-aware): exact row-level inserts AND deletes
    // between snapshots; common files under an unchanged delete set are
    // skipped, so the diff is O(changed data).
    ("g_changelog",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val t = cat.createTable("db.events_cdf", df.schema)
        t.append(s, df.filter(col("ts") < lit(Split)))
        val s1 = t.meta.currentSnapshotId.get
        t.append(s, df.filter(col("ts") >= lit(Split)))
        t.delete(s, Seq(Predicate.Eq("event_type", "click")))
        graft.streaming.GraftStreamSource.changelog(s, t, Some(s1))
          .groupBy(col("_change_type"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("_change_type", "event_type")
      },
      """SELECT 'delete' AS _change_type, event_type, count(*) AS n
        |FROM events WHERE ts < TIMESTAMP '2024-01-15' AND event_type = 'click'
        |GROUP BY 2
        |UNION ALL
        |SELECT 'insert', event_type, count(*)
        |FROM events WHERE ts >= TIMESTAMP '2024-01-15' AND event_type <> 'click'
        |GROUP BY 2
        |ORDER BY 1, 2""".stripMargin),

    // Incremental materialized view (docs/12's silver→gold aggregate made
    // continuous): the view MERGEs the signed per-group delta from the exact
    // CDF changelog — O(changed data), never a base rescan. `incremental`
    // certifies the refresh path ran AND consumed fewer rows than the base
    // holds. The 'click' group nets to zero rows and must vanish.
    ("g_incremental_mv",
      (s: SparkSession, d: String) => {
        import graft.table.MaterializedView
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val base = cat.createTable("db.events_mvb", df.schema)
        base.append(s, df.filter(col("ts") < lit(Split)))
        val mv = MaterializedView.create(s, cat, "db.events_by_type",
          base, Seq("event_type"), Seq("value"))
        base.append(s, df.filter(col("ts") >= lit(Split)))
        base.delete(s, Seq(Predicate.Eq("event_type", "click")))
        val res = MaterializedView.refresh(s, mv, base)
        val baseRows = base.scan().metrics.rowsInScannedFiles
        mv.toDF(s)
          .select(col("event_type"), col("cnt"),
            col("sum_value").cast("double").as("sum_value"))
          .withColumn("incremental",
            lit(res.mode == "incremental" && res.deltaRows > 0 && res.deltaRows < baseRows))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  true AS incremental
        |FROM events WHERE event_type <> 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // M1: snapshot history as a table (docs/05:75-80) — operations and
    // running totals for an append→delete sequence.
    ("g_snapshot_history",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d)
        t.delete(s, Seq(Predicate.Eq("event_type", "click")))
        t.snapshotsDF(s)
          .select(col("snapshot_id").as("seq"), col("operation"),
            element_at(col("summary"), "total-records").cast("long").as("total_records"))
          .orderBy("seq")
      },
      """SELECT CAST(1 AS BIGINT) AS seq, 'append' AS operation,
        |  (SELECT count(*) FROM events) AS total_records
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'delete',
        |  (SELECT count(*) FROM events WHERE event_type <> 'click')
        |ORDER BY 1""".stripMargin),

    // W9: streaming ingestion — Structured Streaming foreachBatch append,
    // each micro-batch one Iceberg-style commit (docs/11:44-52, docs/08:154).
    ("g_stream_ingest",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val stage = TableOps.newTempDir("graft-stream")
        val t = FixtureClock.timed { // staging I/O is fixture, not query
          df.repartition(4).write.mode("overwrite").parquet(stage)
          newCatalog().createTable("db.events_stream", df.schema)
        }
        withStatePartitions(s, 8) {
          val stream = s.readStream.schema(df.schema).option("maxFilesPerTrigger", 2).parquet(stage)
          graft.streaming.GraftSink.ingestAvailable(t, s, stream, s"$stage-ckpt")
        }
        aggByType(t.toDF(s))
          .withColumn("multi_commit", lit(t.meta.snapshots.size > 1))
      },
      aggByTypeSqlFrom.format("events")
        .replace("AS sum_value", "AS sum_value,\n  true AS multi_commit")),

    // W9 + X1 composed: streaming ingest with EXACT cross-batch dedup — the
    // stage holds two full copies of the source, the stream drops duplicate
    // event_ids across micro-batches (keyed state), and the Graft table
    // ends with exactly one copy of every event. At scale the state is one
    // compact key per event per partition; with event-time bounds the same
    // pipeline swaps in dropDuplicatesWithinWatermark to cap it.
    ("g_stream_dedup",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val stage = TableOps.newTempDir("graft-sdedup")
        val t = FixtureClock.timed { // staging I/O is fixture, not query
          df.repartition(3).write.mode("overwrite").parquet(stage)
          df.repartition(2).write.mode("append").parquet(stage) // second full copy
          newCatalog().createTable("db.events_dedup", df.schema)
        }
        withStatePartitions(s, 8) {
          val stream = s.readStream.schema(df.schema).option("maxFilesPerTrigger", 2)
            .parquet(stage).dropDuplicates("event_id")
          graft.streaming.GraftSink.ingestAvailable(t, s, stream, s"$stage-ckpt")
        }
        aggByType(t.toDF(s))
          .withColumn("multi_commit", lit(t.meta.snapshots.size > 1))
      },
      aggByTypeSqlFrom.format("events")
        .replace("AS sum_value", "AS sum_value,\n  true AS multi_commit")),

    // W9 + X1, 100 TB-safe variant: cross-batch dedup with BOUNDED state —
    // dropDuplicatesWithinWatermark holds a key only until the watermark
    // passes its event time + delay, so state is capped by the event-time
    // bound instead of growing one entry per key forever (the exact-dedup
    // scale flag from the round-6 verdict). The delay here exceeds the
    // fixture's full ts span, so the two interleaved copies dedup exactly
    // and the result is deterministic; StreamDedupBoundSpec proves the
    // eviction side (state shrinks, expired keys re-admit).
    ("g_stream_dedup_watermark",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val stage = TableOps.newTempDir("graft-sdedupwm")
        val t = FixtureClock.timed { // staging I/O is fixture, not query
          df.repartition(3).write.mode("overwrite").parquet(stage)
          df.repartition(2).write.mode("append").parquet(stage) // second full copy
          newCatalog().createTable("db.events_dedup_wm", df.schema)
        }
        withStatePartitions(s, 8) {
          graft.streaming.GraftSink.dedupIngestWithinWatermark(
            t, s, df.schema, stage, s"$stage-ckpt",
            delay = "90 days") // > fixture span: no late drops
        }
        aggByType(t.toDF(s))
          .withColumn("multi_commit", lit(t.meta.snapshots.size > 1))
      },
      aggByTypeSqlFrom.format("events")
        .replace("AS sum_value", "AS sum_value,\n  true AS multi_commit"))
  )
}
