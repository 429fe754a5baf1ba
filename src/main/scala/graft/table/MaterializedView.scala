package graft.table

import graft.catalog.GraftCatalog
import graft.streaming.GraftStreamSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained materialized views (reference docs/12's
  * silver→gold aggregation pattern, docs/12-llm-pipelines.md:107-126, made
  * continuous): the view is an ordinary Graft table holding a group-by
  * aggregate of a base Graft table, plus bookkeeping properties that record
  * which base snapshot it reflects. A refresh consumes the EXACT row-level
  * changelog between that snapshot and the base's current one
  * ([[GraftStreamSource.changelog]]) and MERGEs the signed per-group delta
  * into the view.
  *
  * Scale shape: refresh cost is O(changed data) + O(touched groups) — the
  * changelog skips data files common to both snapshots, the delta aggregate
  * is map-side combined on the group keys, and the MERGE's key-set pruning
  * rewrites only the view files holding touched groups. A 100 TB base table
  * with a one-day delta refreshes by reading one day, never the table.
  *
  * Supported aggregates are the self-invertible ones — COUNT(*) and SUM —
  * which admit exact retraction under deletes (a MIN/MAX view cannot be
  * maintained incrementally under deletes without re-reading the group, so
  * we refuse rather than silently full-refresh). Sums run through
  * DECIMAL(18,2), so retraction is exact and order-independent (double
  * addition is neither). Group keys must be non-null (grouping rows with a
  * NULL key would not equality-match in the refresh MERGE); null-keyed base
  * rows are excluded from the view, matching the MERGE join semantics.
  */
object MaterializedView {

  val GroupByProp = "graft.mv.group-by"
  val SumColsProp = "graft.mv.sum-columns"
  val BaseSnapshotProp = "graft.mv.base-snapshot-id"
  val CountCol = "cnt"

  /** `mode`: "incremental" | "full" (base snapshot no longer available) |
    * "noop" (already current). `deltaRows`: changelog rows consumed —
    * the certificate that the refresh read O(changed data).
    */
  case class RefreshResult(mode: String, deltaRows: Long, baseSnapshotId: Option[Long])

  private def sumAlias(c: String) = s"sum_$c"

  private def dec(c: Column) = c.cast("decimal(18,2)")

  /** The full aggregate of `df` in the view's schema (used for the initial
    * build and the full-refresh fallback).
    */
  private def fullAggregate(df: DataFrame, groupBy: Seq[String], sums: Seq[String]): DataFrame =
    df.na.drop("any", groupBy)
      .groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as(CountCol), sums.map(c => sum(dec(col(c))).as(sumAlias(c))): _*)

  /** Build the view table `name` = SELECT groupBy..., count(*), sum(sums...)
    * FROM base, and record the base snapshot it reflects.
    */
  def create(spark: SparkSession, cat: GraftCatalog, name: String, base: GraftTable,
             groupBy: Seq[String], sums: Seq[String]): GraftTable = {
    require(groupBy.nonEmpty, "materialized view needs at least one group key")
    val baseSchema = base.schema
    (groupBy ++ sums).foreach(c => require(baseSchema.fieldNames.contains(c),
      s"column $c not in base table ${base.name}"))
    val full = fullAggregate(base.toDF(spark), groupBy, sums)
    val mv = cat.createTable(name, full.schema, properties = Map(
      GroupByProp -> groupBy.mkString(","),
      SumColsProp -> sums.mkString(","),
      BaseSnapshotProp -> base.meta.currentSnapshotId.map(_.toString).getOrElse("")))
    mv.append(spark, full)
    mv
  }

  /** Advance the view to the base table's current snapshot. Incremental when
    * the recorded base snapshot still exists (the overwhelmingly common case);
    * falls back to a full rebuild when it was expired out of history.
    */
  def refresh(spark: SparkSession, mv: GraftTable, base: GraftTable): RefreshResult = {
    val props = mv.properties
    val groupBy = props.getOrElse(GroupByProp,
      sys.error(s"${mv.name} is not a materialized view (missing $GroupByProp)"))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sums = props.getOrElse(SumColsProp, "").split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val lastSnap = props.get(BaseSnapshotProp).filter(_.nonEmpty).map(_.toLong)
    val cur = base.meta.currentSnapshotId
    if (cur == lastSnap) return RefreshResult("noop", 0L, cur)

    val delta =
      try Some(GraftStreamSource.changelog(spark, base, lastSnap).cache())
      catch { case e: RuntimeException if e.getMessage != null &&
        e.getMessage.contains("not found") => None }

    delta match {
      case None => // base snapshot expired: rebuild from the current snapshot
        mv.overwrite(spark, fullAggregate(base.toDF(spark), groupBy, sums))
        mv.setProperty(BaseSnapshotProp, cur.map(_.toString).getOrElse(""))
        RefreshResult("full", 0L, cur)

      case Some(d) =>
        try {
          val deltaRows = d.count()
          if (deltaRows > 0) {
            val insert = col("_change_type") === "insert"
            val sign = when(insert, lit(1L)).otherwise(lit(-1L))
            val dAgg = d.na.drop("any", groupBy)
              .groupBy(groupBy.map(col): _*)
              .agg(sum(sign).as("_d_cnt"),
                sums.map(c =>
                  sum(when(insert, dec(col(c))).otherwise(-dec(col(c)))).as(s"_d_$c")): _*)
            // Groups netting to zero rows vanish (matched delete). A
            // not-matched group's delta can only contain inserts (deletes
            // retract rows that existed at the last refresh, and those
            // groups are in the view), so inserted groups always start with
            // _d_cnt > 0 — no zero-count group can ever be created.
            mv.merge(spark, dAgg,
              onKeys = groupBy.map(k => k -> k),
              whenMatchedUpdate =
                Map(CountCol -> (col(s"t.$CountCol") + col("s._d_cnt"))) ++
                  sums.map(c => sumAlias(c) ->
                    (coalesce(col(s"t.${sumAlias(c)}"), lit(0)) + coalesce(col(s"_d_$c"), lit(0)))).toMap,
              whenMatchedDelete = Some(col(s"t.$CountCol") + col("s._d_cnt") === 0),
              whenNotMatchedInsert = Some(
                groupBy.map(k => k -> col(s"s.$k")).toMap ++
                  Map(CountCol -> col("s._d_cnt")) ++
                  sums.map(c => sumAlias(c) -> coalesce(col(s"_d_$c"), lit(0))).toMap))
          }
          mv.setProperty(BaseSnapshotProp, cur.map(_.toString).getOrElse(""))
          RefreshResult("incremental", deltaRows, cur)
        } finally d.unpersist()
    }
  }
}
