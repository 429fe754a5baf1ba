package graft.queries

import graft.format.{Predicate, TableProperties, Transform}
import graft.queries.TableOps.{aggByType, aggByTypeSqlFrom, eventsTable, newCatalog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated governance / metadata-inspection operators (SURVEY.md §2:
  * D1, D5, D10, D13, D14, M4, M5, T3) — the operators previously proven
  * only by ScalaTest, each rendered as a `queries()` entry whose invariants
  * a plain-SQL DuckDB oracle reproduces (round-6 verdict, Next-round #1).
  */
object GovernanceOps {

  /** THE warehouse of the session-cached 'graft_sql' catalog — must be the
    * same object [[MaintenanceOps]] registers: the plugin reads its
    * warehouse conf once, so two files pinning different warehouses under
    * one catalog name would make direct GraftCatalog(sqlWarehouse) reads
    * here order-dependent (whichever query registered first wins).
    */
  private def sqlWarehouse: String = MaintenanceOps.sqlWarehouse

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // D13 + M4: DESCRIBE / SHOW TABLES through the DSv2 catalog (the
    // reference's DESCRIBE ICEBERG TABLE, docs/03:163-168) plus
    // SYSTEM$GET_ICEBERG_TABLE_INFORMATION (docs/03:170-171). The DESCRIBE
    // rows (columns + hidden-partition spec) are the payload; the table-
    // information call is folded in as invariant flags: status=success,
    // a pinned snapshot, and a metadata pointer at v2 (create + 1 insert).
    ("g_describe",
      (s: SparkSession, d: String) => {
        MaintenanceOps.registerSqlCatalog(s)
        val tbl = s"ev_${java.util.UUID.randomUUID().toString.take(8)}"
        FixtureClock.timed {
          Tables.events(s, d).createOrReplaceTempView("events_src")
          // namespace via SQL DDL (docs/04:32): the fixture's database is
          // created through SupportsNamespaces, not as a side effect
          s.sql("CREATE DATABASE IF NOT EXISTS graft_sql.meta_db")
          s.sql(s"""CREATE TABLE graft_sql.meta_db.$tbl (
            |  event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,
            |  event_type STRING, value DOUBLE, props STRING)
            |PARTITIONED BY (days(ts), event_type)""".stripMargin)
          s.sql(s"INSERT INTO graft_sql.meta_db.$tbl SELECT * FROM events_src")
        }
        val shown = s.sql("SHOW TABLES IN graft_sql.meta_db")
            .filter(col("tableName") === tbl).count() == 1 &&
          s.sql("SHOW DATABASES IN graft_sql")
            .filter(col("namespace") === "meta_db").count() == 1
        val info = new graft.catalog.GraftCatalog(sqlWarehouse)
          .loadTable(s"meta_db.$tbl").tableInformation
        s.sql(s"DESCRIBE TABLE graft_sql.meta_db.$tbl")
          .filter(col("col_name") =!= "" && !col("col_name").startsWith("#"))
          .select(col("col_name"), col("data_type"),
            lit(shown).as("in_show_tables"),
            lit(info("status")).as("info_status"),
            lit(info("snapshotId").nonEmpty).as("snapshot_pinned"),
            lit(info("metadataLocation").endsWith("/v2.metadata.json"))
              .as("metadata_at_v2"))
          .orderBy("col_name")
      },
      """SELECT * FROM (VALUES
        |  ('Part 0', 'days(ts)'), ('Part 1', 'event_type'),
        |  ('event_id', 'bigint'), ('event_type', 'string'),
        |  ('props', 'string'), ('ts', 'timestamp_ntz'),
        |  ('user_id', 'bigint'), ('value', 'double'))
        |  AS t(col_name, data_type)
        |CROSS JOIN (SELECT true AS in_show_tables, 'success' AS info_status,
        |  true AS snapshot_pinned, true AS metadata_at_v2)
        |ORDER BY col_name""".stripMargin),

    // docs/01:182 CREATE OR REPLACE ICEBERG TABLE, as SQL through the
    // staging catalog (atomic RTAS: schema + spec + data swap in ONE CAS
    // commit — no intermediate empty table). Identity and history are
    // preserved: VERSION AS OF the pre-replace snapshot still reads the old
    // 3-column data, while the live table has the new 2-column shape; the
    // old state expires later via normal snapshot retention.
    ("g_replace_table",
      (s: SparkSession, d: String) => {
        MaintenanceOps.registerSqlCatalog(s)
        val tbl = s"rp_${java.util.UUID.randomUUID().toString.take(8)}"
        FixtureClock.timed {
          Tables.events(s, d).createOrReplaceTempView("events_src")
          s.sql(s"""CREATE TABLE graft_sql.db.$tbl (
            |  event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
          s.sql(s"INSERT INTO graft_sql.db.$tbl " +
            "SELECT event_id, event_type, value FROM events_src")
        }
        s.sql(s"""CREATE OR REPLACE TABLE graft_sql.db.$tbl
          |PARTITIONED BY (event_type) AS
          |SELECT event_id, event_type FROM events_src
          |WHERE event_type <> 'click'""".stripMargin)
        val pre = s.sql(s"SELECT count(*) AS c FROM graft_sql.db.$tbl VERSION AS OF 1")
          .head.getLong(0)
        val t = new graft.catalog.GraftCatalog(sqlWarehouse).loadTable(s"db.$tbl")
        val historyKept = t.meta.snapshots.size == 2 &&
          t.meta.snapshots.last.operation == "replace" &&
          t.schema.fieldNames.toSeq == Seq("event_id", "event_type")
        s.sql(s"SELECT event_type, count(*) AS n FROM graft_sql.db.$tbl GROUP BY event_type")
          .withColumn("prereplace_rows", lit(pre))
          .withColumn("history_kept", lit(historyKept))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*) AS n,
        |  (SELECT count(*) FROM events) AS prereplace_rows,
        |  true AS history_kept
        |FROM events WHERE event_type <> 'click' GROUP BY 1 ORDER BY 1""".stripMargin),

    // D10: DATA_RETENTION_TIME_IN_DAYS (docs/05:88-95): three appends make
    // three snapshots; retention 0 + EXPIRE keeps only the current one.
    // Data is untouched — retention governs history, not live rows.
    ("g_retention",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val t = FixtureClock.timed {
          val t0 = cat.createTable("db.ev_ret", df.schema)
          (0 until 3).foreach(i => t0.append(s, df.filter(col("event_id") % 3 === i)))
          t0
        }
        val before = t.meta.snapshots.size.toLong
        t.setProperty(TableProperties.RetentionDays, "0")
        t.expirePerRetention()
        val after = t.meta.snapshots.size.toLong
        aggByType(t.toDF(s))
          .withColumn("snapshots_before", lit(before))
          .withColumn("snapshots_after", lit(after))
      },
      aggByTypeSqlFrom.format("events").replace("AS sum_value",
        "AS sum_value,\n  CAST(3 AS BIGINT) AS snapshots_before," +
          "\n  CAST(1 AS BIGINT) AS snapshots_after")),

    // T3: snapshot isolation (docs/08:30-49): a scan opened before a DELETE
    // keeps reading its pinned snapshot; a fresh scan sees the new state.
    ("g_isolation",
      (s: SparkSession, d: String) => {
        val t = eventsTable(s, d)
        val pinned = t.scan() // binds to the pre-delete snapshot
        t.delete(s, Seq(Predicate.Eq("event_type", "click")))
        s.range(1).select(
          lit(pinned.toDF(s).count()).as("pinned_rows"),
          lit(t.toDF(s).count()).as("current_rows"))
      },
      """SELECT (SELECT count(*) FROM events) AS pinned_rows,
        |  (SELECT count(*) FROM events WHERE event_type <> 'click') AS current_rows""".stripMargin),

    // M5: SYSTEM$CLUSTERING_INFORMATION (docs/07:164-172). Two appends split
    // on the event_id midpoint: within each identity partition that yields
    // exactly two files (the writer range-shuffles on the partition key, so
    // one append = one file per partition) with DISJOINT event_id ranges
    // (overlap 0.0 = well-clustered) but OVERLAPPING user_id ranges
    // (overlap 1.0 = interleaved) — both ends of the quality metric.
    ("g_clustering_info",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val t = FixtureClock.timed {
          val t0 = cat.createTable("db.ev_ci", df.schema,
            partitionBy = Seq("event_type" -> Transform.Identity))
          // split at each TYPE's own midpoint, not the global one: a type
          // whose ids happen to sit entirely on one side of the global
          // midpoint would get file_count=1 and break the pinned oracle —
          // the per-type midpoint guarantees two non-empty, RANGE-DISJOINT
          // halves for any type with >= 2 distinct ids, at any scale
          // one aggregation pass, collected (a handful of event types):
          // each append then filters with a literal-backed expression
          // instead of re-running the midpoint agg + join per append
          val mids = df.groupBy("event_type")
            .agg(((min("event_id") + max("event_id")) / 2).as("_mid"))
            .collect().map(r => r.getString(0) -> r.getDouble(1))
          val midExpr = mids.foldLeft(lit(Double.NaN)) { case (e, (k, v)) =>
            when(col("event_type") === k, lit(v)).otherwise(e)
          }
          t0.append(s, df.filter(col("event_id") < midExpr))
          t0.append(s, df.filter(col("event_id") >= midExpr))
          t0
        }
        val byId = t.clusteringInformation(s, "event_id").select(
          element_at(col("partition"), "event_type").as("partition_value"),
          col("file_count"), col("total_records"),
          col("overlap_ratio").as("overlap_event_id"))
        val byUser = t.clusteringInformation(s, "user_id").select(
          element_at(col("partition"), "event_type").as("partition_value"),
          col("overlap_ratio").as("overlap_user_id"))
        byId.join(byUser, "partition_value").orderBy("partition_value")
      },
      """SELECT event_type AS partition_value, 2 AS file_count,
        |  count(*) AS total_records, CAST(0.0 AS DOUBLE) AS overlap_event_id,
        |  CAST(1.0 AS DOUBLE) AS overlap_user_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // D1: external volumes (docs/01:174-205): table data lands under the
    // volume's base path + BASE_LOCATION, not the catalog warehouse, and a
    // catalog reload still resolves and reads it.
    ("g_external_volume",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat = newCatalog()
        val vol = graft.queries.TableOps.newTempDir("graft-vol")
        cat.createExternalVolume("lake", vol)
        val t = FixtureClock.timed {
          val t0 = cat.createTable("db.ev_vol", df.schema,
            externalVolume = Some("lake"), baseLocation = Some("events/raw"))
          t0.append(s, df)
          t0
        }
        val reloaded = cat.loadTable("db.ev_vol")
        val locationOk = t.location.startsWith(vol) &&
          t.location.endsWith("events/raw") && reloaded.location == t.location
        aggByType(reloaded.toDF(s)).withColumn("location_ok", lit(locationOk))
      },
      aggByTypeSqlFrom.format("events").replace("AS sum_value",
        "AS sum_value,\n  true AS location_ok")),

    // D5: catalog-linked databases (docs/04:95-110): the `ext` namespace is
    // linked to a second catalog; the router resolves ext.* there and
    // default.* in the main catalog, and both read back correctly.
    ("g_linked_database",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val main = newCatalog()
        val external = newCatalog()
        val router = new graft.catalog.CatalogRouter(main)
        router.linkNamespace("ext", external)
        FixtureClock.timed {
          external.createTable("ext.events_linked", df.schema).append(s, df)
          main.createTable("db.events_local", df.schema)
            .append(s, df.filter(col("event_type") === "click"))
        }
        val routedOk =
          router.catalogFor("ext.events_linked").warehouse == external.warehouse &&
          router.catalogFor("db.events_local").warehouse == main.warehouse &&
          router.listLinked == Map("ext" -> external.warehouse)
        val localClicks = router.loadTable("db.events_local").toDF(s).count()
        aggByType(router.loadTable("ext.events_linked").toDF(s))
          .withColumn("routed_ok", lit(routedOk))
          .withColumn("local_clicks", lit(localClicks))
      },
      aggByTypeSqlFrom.format("events").replace("AS sum_value",
        "AS sum_value,\n  true AS routed_ok,\n  (SELECT count(*) FROM events " +
          "WHERE event_type = 'click') AS local_clicks")),

    // D4 (GLUE variant, docs/04:60-78): the AWS-Glue-contract integration
    // end-to-end — signed JSON-RPC discovery, GetTable returning a
    // metadata POINTER, client plans the read from shared storage at that
    // pointer (MOR deletes applied). Mirrors g_rest_catalog for the second
    // external-catalog protocol the reference documents.
    ("g_glue_catalog",
      (s: SparkSession, d: String) => {
        // the shared constant, not a string literal: a drifted spelling
        // would silently degrade the delete to COW and this gate would
        // keep passing while no longer exercising the MOR export path
        val t = eventsTable(s, d, partitioned = false,
          props = Map(graft.format.TableProperties.MergeOnRead -> "true"))
        t.delete(s, Seq(Predicate.Eq("event_type", "click"))) // MOR deletes
        val server = new graft.interop.GlueCatalog.Server(
          t.catalog, s, "123456789", "AKIDGRAFT", "s3cret").start()
        try {
          val client = new graft.interop.GlueCatalog.Client(
            server.uri, "123456789", "AKIDGRAFT", "s3cret")
          val discovered = client.tables("db")
          aggByType(client.readTable(s, "db", "events"))
            .withColumn("discovered", lit(discovered == Seq("events")))
        } finally server.stop()
      },
      aggByTypeSqlFrom.format("events")
        .replace("FROM events",
          ",\n  true AS discovered\nFROM events WHERE event_type <> 'click'")),

    // D14: ALTER ... REFRESH (docs/11:174-183): a second catalog instance
    // (an "external writer") appends behind the first's back; REFRESH
    // re-reads the pointer and the first handle sees the new version and
    // the new rows — the external-catalog pointer-chase, on a filesystem.
    ("g_refresh",
      (s: SparkSession, d: String) => {
        val df = Tables.events(s, d)
        val cat1 = newCatalog()
        val t1 = FixtureClock.timed {
          val t0 = cat1.createTable("db.ev_refresh", df.schema)
          t0.append(s, df.filter(col("event_id") % 2 === 0))
          t0
        }
        val vBefore = cat1.refresh("db.ev_refresh")
        // external writer: a separate catalog instance on the same warehouse
        val cat2 = new graft.catalog.GraftCatalog(cat1.warehouse)
        cat2.loadTable("db.ev_refresh")
          .append(s, df.filter(col("event_id") % 2 === 1))
        // REGRESS the version-hint cache to the pre-append version — the
        // external writer "crashed before advancing the hint". A stateless
        // handle re-reading the pointer would make a hint-trusting refresh
        // look correct by accident; with the hint stale, both the refreshed
        // version AND the row-complete read below are TRUE certifications
        // of the probe-past-the-hint machinery (docs/11:174-183).
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(t1.location, "metadata", "version-hint.text"),
          vBefore.toString)
        val vAfter = cat1.refresh("db.ev_refresh")
        aggByType(t1.toDF(s))
          .withColumn("version_advanced", lit(vAfter == vBefore + 1))
      },
      aggByTypeSqlFrom.format("events").replace("AS sum_value",
        "AS sum_value,\n  true AS version_advanced"))
  )
}
