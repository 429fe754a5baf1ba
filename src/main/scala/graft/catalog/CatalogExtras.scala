package graft.catalog

import graft.format.GraftUtil
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Stored views over Graft tables (SURVEY §2.1 D15; reference docs/12:168-172
  * — the UNION ALL hot+cold view). A view is persisted SQL text plus the
  * Graft tables it references; materialization registers each referenced
  * table's current snapshot as a temp view and runs the SQL, so the view
  * always reads freshly-committed state.
  */
class GraftViews(catalog: GraftCatalog) {

  private def viewPath(name: String) =
    Paths.get(catalog.warehouse, name.split('.') :+ "view.sql": _*)

  def createView(name: String, sqlText: String, references: Seq[String]): Unit = {
    val body = references.mkString(",") + "\n" + sqlText
    GraftUtil.writeStringAtomic(viewPath(name), body)
  }

  def viewExists(name: String): Boolean = Files.exists(viewPath(name))

  def dropView(name: String): Unit = Files.deleteIfExists(viewPath(name))

  /** Materialize: register referenced tables under their short names, run SQL. */
  def view(spark: SparkSession, name: String): DataFrame = {
    val body = GraftUtil.readString(viewPath(name))
    val (refLine, sql) = body.span(_ != '\n')
    val refs = refLine.split(',').map(_.trim).filter(_.nonEmpty)
    refs.foreach { tableName =>
      val short = tableName.split('.').last
      catalog.loadTable(tableName).toDF(spark).createOrReplaceTempView(short)
    }
    spark.sql(sql.trim)
  }
}

/** Namespace → catalog routing (SURVEY §2.1 D4/D5: catalog integrations and
  * catalog-linked databases, reference docs/04:60-110). A router resolves
  * `namespace.table` against whichever catalog the namespace is linked to —
  * the multi-catalog pattern of docs/11:53-87.
  */
class CatalogRouter(default: GraftCatalog) {
  private val routes = new ConcurrentHashMap[String, GraftCatalog]()

  /** CREATE CATALOG INTEGRATION + catalog-linked database. */
  def linkNamespace(namespace: String, catalog: GraftCatalog): Unit =
    routes.put(namespace, catalog)

  def catalogFor(name: String): GraftCatalog = {
    val ns = name.split('.').dropRight(1).mkString(".")
    Option(routes.get(ns)).getOrElse(default)
  }

  def loadTable(name: String): graft.table.GraftTable = catalogFor(name).loadTable(name)

  def listLinked: Map[String, String] =
    routes.asScala.map { case (ns, cat) => ns -> cat.warehouse }.toMap
}

/** Scheduled-task registry (SURVEY §2.1 D16; reference docs/10:174-183,
  * docs/12:174-186). Scheduling itself is out of scope (the reference
  * delegates it to the warehouse scheduler) — this registry stores the task
  * body + schedule + suspended flag and lets callers run due tasks.
  */
class TaskRegistry {
  final case class Task(name: String, schedule: String, body: () => Unit,
                        suspended: Boolean = true)
  private val tasks = new ConcurrentHashMap[String, Task]()

  def createTask(name: String, schedule: String)(body: => Unit): Unit =
    tasks.put(name, Task(name, schedule, () => body))

  /** ALTER TASK ... RESUME / SUSPEND. */
  def resume(name: String): Unit =
    tasks.computeIfPresent(name, (_, t) => t.copy(suspended = false))
  def suspend(name: String): Unit =
    tasks.computeIfPresent(name, (_, t) => t.copy(suspended = true))

  /** EXECUTE TASK — runs regardless of suspension (manual trigger). */
  def execute(name: String): Unit =
    Option(tasks.get(name)).getOrElse(sys.error(s"unknown task $name")).body()

  /** Run every non-suspended task (a scheduler tick). */
  def runDue(): Seq[String] = {
    val due = tasks.asScala.values.filter(!_.suspended).toSeq
    due.foreach(_.body())
    due.map(_.name)
  }

  def list: Seq[(String, String, Boolean)] =
    tasks.asScala.values.map(t => (t.name, t.schedule, t.suspended)).toSeq.sortBy(_._1)
}

/** Result caching (SURVEY §2.4 S7; reference docs/01:163, docs/09:88):
  * repeated identical queries are served from a cached materialization keyed
  * by the optimized logical plan. Entries are pinned with `persist()`; the
  * caller owns invalidation (`clear`).
  */
class ResultCache {
  private val cache = new java.util.concurrent.CopyOnWriteArrayList[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]()

  /** Serve `df` from cache when an entry's optimized plan `sameResult`s it
    * (Catalyst's semantic plan equality — exprId/layout insensitive).
    */
  def cached(df: DataFrame): DataFrame = synchronized {
    val plan = df.queryExecution.optimizedPlan
    cache.asScala.find(_._1.sameResult(plan)) match {
      case Some((_, hit)) => hit
      case None =>
        df.persist()
        // store the POST-persist optimized plan: Spark's CacheManager now
        // substitutes an InMemoryRelation, and later lookups of the same
        // query arrive with that substitution already applied.
        val stored = df.sparkSession.sessionState
          .executePlan(df.queryExecution.logical).optimizedPlan
        cache.add((stored, df)); df
    }
  }

  def size: Int = cache.size
  def clear(): Unit = synchronized {
    cache.asScala.foreach(_._2.unpersist()); cache.clear()
  }
}
