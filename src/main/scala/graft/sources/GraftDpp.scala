package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, In => SourceIn}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import java.util.OptionalLong

import graft.format.{DataFile, GraftUtil, Predicate}
import graft.table.GraftScan

/** Generalized DSv2 runtime filtering (r15 verdict #1): execution-time
  * dynamic pruning for ANY Graft partition layout, not just the SPJ bucket
  * shape. The reference's flagship medallion pattern — a date- or
  * identity-partitioned fact joined to a selective dim
  * (docs/12-lakehouse-patterns.md:107-126) — needs the dim's join keys to
  * prune the fact read INSIDE the executing plan; the SPJ scan only serves
  * single-bucket tables, and the substituted native plan cannot receive
  * runtime filters at all (it is a plain parquet scan by execution time).
  *
  * This scan stays a real DSv2 Batch ([[GraftScanSubstitution]] leaves it
  * in place), reports every prunable column through `filterAttributes`,
  * and when Spark's dynamic-pruning subquery hands it the build side's
  * `In`/`EqualTo` keys it re-prunes the planned file list through the
  * native scan's OWN phase-2 rule ([[GraftScan.fileMayMatch]]) — so the
  * hidden-partition transforms (identity/day/month/year/hour/bucket/
  * truncate), the per-file min/max/null stats AND the equality-probe
  * blooms all participate, exactly as they do for static predicates.
  * Soundness never depends on the prune: Spark re-applies the join, and
  * `mayMatch` is the sound may-contain test the 800-case seeded property
  * pins (S3).
  *
  * Opt-in via `graft.dpp.enabled` (the `v2.bucketing.enabled` posture):
  * the default read path substitutes the native columnar plan, which is
  * the faster scan when no runtime filter applies; a selective-dim star
  * join flips the economics — at 100 TB, pruning 99% of a fact's files
  * beats any per-file decode advantage. Engages only when provably
  * equivalent to the native path (current snapshot, no position deletes,
  * all files under the current schema + spec — [[GraftSpj.planEligible]]);
  * everything else falls back to the substitution path. SPJ keeps
  * precedence: a bucket-SPJ-shaped table still reports
  * KeyGroupedPartitioning so co-bucketed joins stay exchange-free.
  */
object GraftDpp {
  def enabled(spark: SparkSession): Boolean =
    spark.conf.get("graft.dpp.enabled", "false").toBoolean
}

/** DSv2 Batch scan over one pinned Graft snapshot with generalized
  * execution-time runtime filtering — one [[GraftDppPartition]] per
  * surviving file (Spark schedules them independently; at 100 TB each is
  * one target-size parquet file).
  */
class GraftDppScan(
    val tbl: GraftSparkTable,
    val native: GraftScan,
    val files: Seq[DataFile],
    val pushed: Array[Filter],
    val required: StructType,
    location: String) extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-dpp ${tbl.name()} [${pushed.mkString(", ")}]"

  /** Files surviving the runtime filter; None until [[filter]] runs. */
  @volatile private var allowed: Option[Seq[DataFile]] = None

  /** Metrics staged by [[filter]], recorded by the first
    * [[planInputPartitions]] that follows (the [[GraftSpjScan]] discipline:
    * the ledger reflects reads that were actually planned, not filters AQE
    * then discarded).
    */
  private val pendingMetrics =
    new java.util.concurrent.atomic.AtomicReference[graft.table.ScanMetrics](null)

  /** Every top-level non-nested column of the PRUNED read schema is a
    * runtime-filter target (Spark resolves these against the scan
    * relation's output, so a projected-away column would fail analysis):
    * any of them may carry partition transforms, min/max stats or blooms
    * in some file, and [[GraftScan.fileMayMatch]] is sound ("maybe")
    * wherever a plane is absent — an unprunable column just keeps all
    * files. A join key is always in the read schema, so the medallion
    * fact-dim shapes are always served.
    */
  override def filterAttributes(): Array[NamedReference] =
    required.fields.collect {
      case f if !f.dataType.isInstanceOf[StructType] &&
        !f.dataType.isInstanceOf[ArrayType] &&
        !f.dataType.isInstanceOf[MapType] => Expressions.column(f.name)
    }

  override def filter(filters: Array[Filter]): Unit = {
    val preds = filters.flatMap(GraftRelation.toPredicate).toSeq
    if (preds.nonEmpty) {
      val p = Predicate.all(preds)
      // ONE keep rule: the planned partitions, the recorded metrics and the
      // reported statistics all derive from this list
      val kept = files.filter(f => native.fileMayMatch(f, p))
      allowed = Some(kept)
      val keyCount = filters.collect {
        case SourceIn(_, vs) => vs.length
        case _: EqualTo => 1
      }.sum
      val cols = filters.collect {
        case SourceIn(c, _) => c
        case EqualTo(c, _) => c
      }.distinct.mkString(",")
      val partsOf = (fs: Seq[DataFile]) => fs.map(_.partition).distinct.size.toLong
      pendingMetrics.set(graft.table.ScanMetrics(
        tbl.graftTable.name,
        tbl.graftTable.meta.currentSnapshotId.getOrElse(-1L),
        s"runtime-in($cols, $keyCount keys)",
        manifestsTotal = 0, manifestsScanned = 0,
        filesTotal = files.size.toLong, filesScanned = kept.size.toLong,
        partitionsTotal = partsOf(files),
        partitionsScanned = partsOf(kept),
        bytesTotal = files.map(_.fileSizeBytes).sum,
        bytesScanned = kept.map(_.fileSizeBytes).sum,
        rowsInScannedFiles = kept.map(_.recordCount).sum,
        timestampMs = System.currentTimeMillis()))
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    Option(pendingMetrics.getAndSet(null)).foreach(graft.table.QueryHistory.record)
    allowed.getOrElse(files).map(f =>
      GraftDppPartition(Seq((GraftUtil.resolve(location, f.path), f.fileSizeBytes)))
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftSpj.readerFactory(tbl.graftTable.schema, pushed, required)

  /** Post-filter size/rows from the manifests' own accounting — after a
    * runtime prune AQE sees the PRUNED size, so a fact cut to broadcast
    * scale can re-plan its next join as a broadcast.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val fs = allowed.getOrElse(files)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(fs.map(_.fileSizeBytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(fs.map(_.recordCount).sum)
  }
}

/** One file of the runtime-filtered scan. */
case class GraftDppPartition(files: Seq[(String, Long)]) extends GraftFilesPartition
