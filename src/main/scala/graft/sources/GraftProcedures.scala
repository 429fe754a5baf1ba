package graft.sources

import graft.catalog.GraftCatalog
import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The SQL maintenance surface (reference docs/03-metadata-management.md:
  * 173-206, docs/10-table-maintenance.md): the reference specifies compaction,
  * snapshot expiry, manifest rewrite and orphan cleanup as SQL statements
  * (`ALTER ICEBERG TABLE ... COMPACT`, `EXPIRE SNAPSHOTS`); Spark's idiomatic
  * equivalent is the DSv2 procedure surface (SPARK-44167), so every
  * maintenance operator is callable as
  *
  *   CALL graft.system.compact(table => 'db.t', target_file_size_bytes => ...)
  *
  * Each procedure returns a small summary relation (a [[LocalScan]] — the
  * result is driver-side metadata, never data-scale).
  */
object GraftProcedures {

  private val Namespace = Array("system")

  private def strParam(name: String, comment: String) =
    ProcedureParameter.in(name, StringType).comment(comment).build()
  private def optLong(name: String, comment: String) =
    ProcedureParameter.in(name, LongType).defaultValue("CAST(NULL AS BIGINT)")
      .comment(comment).build()
  private def optInt(name: String, default: String, comment: String) =
    ProcedureParameter.in(name, IntegerType).defaultValue(default).comment(comment).build()
  private def optBool(name: String, default: String, comment: String) =
    ProcedureParameter.in(name, BooleanType).defaultValue(default).comment(comment).build()

  private val healthSchema = StructType(Seq(
    StructField("data_files", LongType), StructField("avg_file_size_bytes", LongType),
    StructField("snapshots", IntegerType), StructField("manifests", IntegerType),
    StructField("delete_files", LongType), StructField("total_records", LongType)))

  private def healthRow(t: GraftTable): Row = {
    val h = t.health()
    Row(h.dataFileCount, h.avgFileSizeBytes, h.snapshotCount, h.manifestCount,
      h.deleteFileCount, h.totalRecords)
  }

  /** name -> (parameters, output schema, implementation). */
  private def defs(cat: GraftCatalog): Map[String, (Seq[ProcedureParameter], StructType, InternalRow => Seq[Row])] = {
    def table(in: InternalRow): GraftTable = cat.loadTable(in.getUTF8String(0).toString)
    Map(
      "compact" -> ((
        Seq(strParam("table", "table name, e.g. db.events"),
          optLong("target_file_size_bytes", "target size; default: table property or 128 MiB")),
        StructType(Seq(StructField("files_before", IntegerType),
          StructField("files_after", IntegerType), StructField("deletes_folded", BooleanType))),
        (in: InternalRow) => {
          val t = table(in)
          val before = t.scan()
          val target = if (in.isNullAt(1)) None else Some(in.getLong(1))
          t.compact(SparkSession.active, target)
          val after = t.scan()
          Seq(Row(before.dataFiles.size, after.dataFiles.size, after.deleteFiles.isEmpty))
        })),
      "expire_snapshots" -> ((
        Seq(strParam("table", "table name"),
          optLong("older_than_ms", "cutoff; default: the table's retention property"),
          optInt("retain_last", "1", "always keep the newest N snapshots")),
        StructType(Seq(StructField("removed_snapshots", IntegerType),
          StructField("removed_files", IntegerType))),
        (in: InternalRow) => {
          val t = table(in)
          // omitted older_than_ms falls back to the retention property's
          // cutoff; retain_last is honored either way (previously silently
          // dropped on the default path)
          val cutoff =
            if (in.isNullAt(1)) {
              val days = t.meta.property(
                graft.format.TableProperties.RetentionDays, "1").toDouble
              System.currentTimeMillis() - (days * 86400000L).toLong
            } else in.getLong(1)
          val (snaps, files) = t.expireSnapshots(cutoff, math.max(1, in.getInt(2)))
          Seq(Row(snaps, files))
        })),
      "rewrite_manifests" -> ((
        Seq(strParam("table", "table name"),
          optInt("max_entries_per_manifest", "5000", "chunk size, partition-clustered")),
        StructType(Seq(StructField("manifests_before", IntegerType),
          StructField("manifests_after", IntegerType))),
        (in: InternalRow) => {
          val t = table(in)
          val before = t.health().manifestCount
          t.rewriteManifests(maxEntriesPerManifest = in.getInt(1))
          Seq(Row(before, cat.loadTable(t.name).health().manifestCount))
        })),
      "remove_orphan_files" -> ((
        Seq(strParam("table", "table name"),
          optLong("older_than_ms", "cutoff; default now-24h (in-flight write safety window)")),
        StructType(Seq(StructField("orphans_removed", IntegerType))),
        (in: InternalRow) => {
          val t = table(in)
          val removed = if (in.isNullAt(1)) t.removeOrphanFiles()
            else t.removeOrphanFiles(in.getLong(1))
          Seq(Row(removed.size))
        })),
      "rollback" -> ((
        Seq(strParam("table", "table name"), optLong("snapshot_id", "snapshot to roll back to")),
        StructType(Seq(StructField("current_snapshot_id", LongType))),
        (in: InternalRow) => {
          val t = table(in)
          require(!in.isNullAt(1), "rollback requires snapshot_id")
          Seq(Row(t.rollbackTo(in.getLong(1)).snapshotId))
        })),
      "cherrypick" -> ((
        Seq(strParam("table", "table name"), optLong("snapshot_id", "snapshot to re-apply")),
        StructType(Seq(StructField("current_snapshot_id", LongType))),
        (in: InternalRow) => {
          val t = table(in)
          require(!in.isNullAt(1), "cherrypick requires snapshot_id")
          Seq(Row(t.cherryPick(in.getLong(1)).snapshotId))
        })),
      "publish" -> ((
        Seq(strParam("table", "table name"), strParam("branch", "staged branch to fast-forward")),
        StructType(Seq(StructField("current_snapshot_id", LongType))),
        (in: InternalRow) => {
          val t = table(in)
          val next = t.publish(in.getUTF8String(1).toString)
          Seq(Row(next.currentSnapshotId.getOrElse(-1L)))
        })),
      "set_ref" -> ((
        Seq(strParam("table", "table name"), strParam("ref", "branch/tag name"),
          optLong("snapshot_id", "target snapshot"),
          optBool("is_branch", "false",
            "true = movable branch head (publishable, live-schema reads); " +
              "false = immutable tag pin")),
        StructType(Seq(StructField("ref", StringType), StructField("snapshot_id", LongType),
          StructField("is_branch", BooleanType))),
        (in: InternalRow) => {
          val t = table(in)
          require(!in.isNullAt(2), "set_ref requires snapshot_id")
          val name = in.getUTF8String(1).toString
          val isBranch = !in.isNullAt(3) && in.getBoolean(3)
          t.setRef(name, in.getLong(2), isBranch)
          Seq(Row(name, in.getLong(2), isBranch))
        })),
      "drop_ref" -> ((
        Seq(strParam("table", "table name"), strParam("ref", "branch/tag name to drop")),
        StructType(Seq(StructField("ref", StringType))),
        (in: InternalRow) => {
          val t = table(in)
          val name = in.getUTF8String(1).toString
          t.dropRef(name)
          Seq(Row(name))
        })),
      // The SQL task surface (docs/10:174-183 CREATE TASK ... SCHEDULE=...
      // AS <sql>; ALTER TASK ... RESUME; docs/12:174-186's archival task).
      // Tasks live on the catalog's registry and fire under its virtual
      // clock via advance_tasks — deterministic, schedule-ordered dispatch.
      "create_task" -> ((
        Seq(strParam("name", "task name"),
          strParam("schedule", "'USING CRON m h dom mon dow [tz]' or 'N MINUTE'"),
          strParam("body", "SQL body: one statement or BEGIN s1; s2; END")),
        StructType(Seq(StructField("name", StringType), StructField("suspended", BooleanType))),
        (in: InternalRow) => {
          val n = in.getUTF8String(0).toString
          cat.taskRegistry.createSqlTask(n,
            in.getUTF8String(1).toString, in.getUTF8String(2).toString)
          Seq(Row(n, true)) // created SUSPENDED, the reference default
        })),
      "alter_task" -> ((
        Seq(strParam("name", "task name"), strParam("action", "RESUME or SUSPEND")),
        StructType(Seq(StructField("name", StringType), StructField("suspended", BooleanType))),
        (in: InternalRow) => {
          val n = in.getUTF8String(0).toString
          val suspended = in.getUTF8String(1).toString.toUpperCase match {
            case "RESUME"  => cat.taskRegistry.resume(n); false
            case "SUSPEND" => cat.taskRegistry.suspend(n); true
            case other     => sys.error(s"alter_task action must be RESUME or SUSPEND, got '$other'")
          }
          Seq(Row(n, suspended))
        })),
      "execute_task" -> ((
        Seq(strParam("name", "task name (manual trigger, ignores suspension)")),
        StructType(Seq(StructField("name", StringType))),
        (in: InternalRow) => {
          val n = in.getUTF8String(0).toString
          cat.taskRegistry.execute(n)
          Seq(Row(n))
        })),
      "advance_tasks" -> ((
        Seq(optLong("to_ms", "advance the virtual clock to this epoch-millis"),
          optLong("by_ms", "or advance it by this many millis from its current position")),
        StructType(Seq(StructField("task_name", StringType), StructField("fired_at_ms", LongType))),
        (in: InternalRow) => {
          val reg = cat.taskRegistry
          val target = (in.isNullAt(0), in.isNullAt(1)) match {
            case (false, true) => java.time.Instant.ofEpochMilli(in.getLong(0))
            case (true, false) => reg.now.plusMillis(in.getLong(1))
            case _ => sys.error("advance_tasks requires exactly one of to_ms, by_ms")
          }
          reg.advanceTo(target).map { case (n, at) => Row(n, at.toEpochMilli) }
        })),
      "task_history" -> ((
        Seq.empty[ProcedureParameter],
        StructType(Seq(StructField("task_name", StringType), StructField("fired_at_ms", LongType))),
        (_: InternalRow) =>
          cat.taskRegistry.history.map { case (n, at) => Row(n, at.toEpochMilli) })),
      "list_tasks" -> (( // SHOW TASKS
        Seq.empty[ProcedureParameter],
        StructType(Seq(StructField("name", StringType),
          StructField("schedule", StringType), StructField("suspended", BooleanType))),
        (_: InternalRow) =>
          cat.taskRegistry.list.map { case (n, sched, susp) => Row(n, sched, susp) })),
      "maintain" -> ((
        Seq(strParam("table", "table name")),
        healthSchema,
        (in: InternalRow) => { val t = table(in); t.maintain(SparkSession.active); Seq(healthRow(cat.loadTable(t.name))) })),
      "health" -> ((
        Seq(strParam("table", "table name")),
        healthSchema,
        (in: InternalRow) => Seq(healthRow(table(in)))))
    )
  }

  private val names = Seq("advance_tasks", "alter_task", "cherrypick", "compact",
    "create_task", "drop_ref", "execute_task", "expire_snapshots", "health",
    "list_tasks", "maintain", "publish", "remove_orphan_files",
    "rewrite_manifests", "rollback", "set_ref", "task_history")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Namespace))
      names.toArray.map(Identifier.of(Namespace, _))
    else Array.empty

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"unknown procedure namespace ${ident.namespace().mkString(".")} (use system)")
    val (params, out, run) = defs(cat).getOrElse(ident.name(),
      sys.error(s"unknown procedure ${ident.name()}"))
    val procName = ident.name()
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance procedure $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft maintenance procedure $procName"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val rows = run(input)
          java.util.Collections.singletonList[Scan](
            GraftProcedures.resultScan(out, rows)).iterator()
        }
      }
    }
  }

  /** A driver-side result relation: procedures and metadata tables return
    * metadata-scale rows, so a LocalScan (→ LocalTableScanExec) is the right
    * physical shape — no jobs, no shuffles.
    */
  def resultScan(schema: StructType, data: Seq[Row]): Scan = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val internal = data.map(r => conv(r).asInstanceOf[InternalRow]).toArray
    new LocalScan {
      override def rows(): Array[InternalRow] = internal
      override def readSchema(): StructType = schema
      override def description(): String = s"GraftLocalResult(${data.size} rows)"
    }
  }
}
