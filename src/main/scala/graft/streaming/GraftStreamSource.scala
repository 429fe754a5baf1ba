package graft.streaming

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental consumption FROM Graft tables (SURVEY §2.8: "incremental
  * transform ... or readStream over the table").
  *
  * Both APIs assume an append-only producer (the reference's streaming
  * model, docs/11:44-52): COW rewrites re-deliver rewritten rows because
  * immutable files are the unit of change. For tables that also run DML,
  * consume via [[GraftSink.incrementalNewRows]] (watermark semantics)
  * instead.
  */
object GraftStreamSource {

  /** Structured-Streaming source over a table's data directory: each new
    * data file becomes streamable input (file-source semantics, exactly-once
    * per checkpoint).
    *
    * LIMITS of directory watching (use [[changesSince]] when they matter):
    * files are observed at WRITE time, before the commit — rows from a
    * write whose commit ultimately fails CAS retry are still delivered; and
    * files are read under the CURRENT schema by name, so the stream must not
    * span schema evolution (no ID-based resolution on this path). MOR
    * position-delete files live outside data/ and are never picked up.
    */
  def appendsStream(spark: SparkSession, table: GraftTable): DataFrame =
    spark.readStream
      .schema(table.schema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(java.nio.file.Paths.get(table.location, "data").toString)

  /** Snapshot-diff changelog (batch): the rows of data files ADDED between
    * `fromSnapshotId` (exclusive; None = table creation) and `toSnapshotId`
    * (inclusive; None = current). The consumer-side watermark is a snapshot
    * ID — monotone, exact, and free, unlike timestamp watermarks.
    */
  def changesSince(spark: SparkSession, table: GraftTable,
                   fromSnapshotId: Option[Long],
                   toSnapshotId: Option[Long] = None): DataFrame = {
    val m = table.meta
    def filesAt(sid: Option[Long]): Seq[graft.format.DataFile] = sid match {
      case None => Nil
      case Some(id) =>
        val snap = m.snapshot(id).getOrElse(sys.error(s"snapshot $id not found (expired?)"))
        table.liveFiles(m, Some(snap))
    }
    val toSid = toSnapshotId.orElse(m.currentSnapshotId)
    val before = filesAt(fromSnapshotId).map(_.path).toSet
    val added = filesAt(toSid).filterNot(f => before.contains(f.path))
    val sc = new graft.table.GraftScan(table, m, toSid.flatMap(m.snapshot), Nil)
    sc.materialize(spark, added, Nil, withFileMeta = false)
  }
}
