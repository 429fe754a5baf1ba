package graft.sources

import graft.catalog.GraftCatalog
import graft.format.Predicate
import graft.table.{GraftScan, GraftTable}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Spark DataSource integration for Graft tables:
  *
  * {{{
  * spark.read.format("graft")
  *   .option("warehouse", "/wh").option("table", "db.events")
  *   .option("snapshotId", "3")          // optional time travel
  *   .option("asOfTimestampMs", "...")   // optional time travel
  *   .load()
  * df.write.format("graft").mode("append")
  *   .option("warehouse", "/wh").option("table", "db.events").save()
  * }}}
  *
  * The read path implements `PrunedFilteredScan`: Spark pushes column
  * pruning + `sources.Filter`s here, the filters translate to Graft
  * [[Predicate]]s, and the scan goes through the normal two-phase
  * manifest/file pruning before reading parquet — so `spark.read` and SQL
  * over it (`createOrReplaceTempView`) get the same planning I/O profile as
  * the native `GraftTable.scan` API. Unconvertible filters are simply not
  * pushed; Spark re-applies every filter on top, so this is always sound.
  */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def load(parameters: Map[String, String]): GraftTable = {
    val wh = parameters.getOrElse("warehouse", sys.error("option 'warehouse' is required"))
    val name = parameters.getOrElse("table", sys.error("option 'table' is required"))
    new GraftCatalog(wh).loadTable(name)
  }

  override def createRelation(ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    // reads through this relation get rewritten to the native scan plan
    // (vectorized parquet + codegen) by the substitution rule
    GraftExtensions.install(ctx.sparkSession)
    GraftRelation(ctx, load(parameters), parameters)
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val wh = parameters.getOrElse("warehouse", sys.error("option 'warehouse' is required"))
    val name = parameters.getOrElse("table", sys.error("option 'table' is required"))
    val cat = new GraftCatalog(wh)
    val spark = ctx.sparkSession
    val table =
      if (!cat.tableExists(name)) cat.createTableAs(spark, name, data)
      else mode match {
        case SaveMode.Append => val t = cat.loadTable(name); t.append(spark, data); t
        case SaveMode.Overwrite => val t = cat.loadTable(name); t.overwrite(spark, data); t
        case SaveMode.ErrorIfExists => sys.error(s"table $name already exists")
        case SaveMode.Ignore => cat.loadTable(name)
      }
    GraftRelation(ctx, table, parameters)
  }
}

case class GraftRelation(ctx: SQLContext, table: GraftTable,
                         parameters: Map[String, String])
    extends BaseRelation with PrunedFilteredScan with TableScan {

  override def sqlContext: SQLContext = ctx
  private def spark: SparkSession = ctx.sparkSession

  /** Time-travel-pinned scan; also the entry point for the optimizer
    * substitution that replaces this relation with the native plan.
    */
  def pinnedScan(preds: Seq[Predicate]): GraftScan =
    (parameters.get("snapshotId"), parameters.get("asOfTimestampMs"),
      parameters.get("ref")) match {
      case (Some(sid), _, _) => table.atSnapshot(sid.toLong, preds: _*)
      case (_, Some(ts), _) => table.asOf(ts.toLong, preds: _*)
      case (_, _, Some(r)) => table.atRef(r, preds: _*)
      case _ => table.scan(preds: _*)
    }

  // Scans resolve rows to the PINNED snapshot's schema by column ID (see
  // GraftScan.readResolved) — the table as of then, which may predate a
  // CREATE OR REPLACE; unpinned reads use the current schema.
  override def schema: StructType = pinnedScan(Nil).scanSchema

  override def buildScan(): RDD[Row] = buildScan(schema.fieldNames, Array.empty)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val preds = filters.flatMap(GraftRelation.toPredicate)
    val df0 = pinnedScan(preds.toSeq).toDF(spark)
    // empty requiredColumns = a column-free query (COUNT(*)): project to
    // ZERO columns so the scan decodes nothing, instead of every column
    val df = df0.select(requiredColumns.map(org.apache.spark.sql.functions.col): _*)
    df.rdd
  }
}

object GraftRelation {
  /** Translate Spark source filters into Graft predicates; None = cannot
    * push (Spark still applies the filter post-scan — soundness preserved).
    */
  def toPredicate(f: Filter): Option[Predicate] = f match {
    case EqualTo(c, v) => Some(Predicate.Eq(c, v))
    case GreaterThan(c, v) => Some(Predicate.Gt(c, v))
    case GreaterThanOrEqual(c, v) => Some(Predicate.GtEq(c, v))
    case LessThan(c, v) => Some(Predicate.Lt(c, v))
    case LessThanOrEqual(c, v) => Some(Predicate.LtEq(c, v))
    case In(c, vs) => Some(Predicate.In(c, vs.toSeq))
    case IsNull(c) => Some(Predicate.IsNull(c))
    case IsNotNull(c) => Some(Predicate.NotNull(c))
    case StringStartsWith(c, p) => Some(Predicate.StartsWith(c, p))
    case And(l, r) => (toPredicate(l), toPredicate(r)) match {
      case (Some(a), Some(b)) => Some(Predicate.And(a, b))
      case (a, b) => a.orElse(b) // half-pushable AND is still sound
    }
    case Or(l, r) => for (a <- toPredicate(l); b <- toPredicate(r))
      yield Predicate.Or(a, b)
    case _ => None
  }
}
