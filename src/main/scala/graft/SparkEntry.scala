package graft

import graft.queries.{Extensions, GovernanceOps, MaintenanceOps, Relational, TableOps, Tables}
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY §2): relational
  * (§2.7), Graft-table operations (§2.1-§2.6, §2.8) and LLM-pipeline
  * extensions (§2.9). Each `queries(name)` has a DuckDB-equivalent
  * `oracleSql(name)` over the same raw parquet tables; both sides follow the
  * determinism conventions documented in [[graft.queries.Relational]].
  */
object SparkEntry {

  private val all: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Relational.entries ++ TableOps.entries ++ MaintenanceOps.entries ++
      GovernanceOps.entries ++ Extensions.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's gold aggregate (docs/12:109-117) served from a Graft
    * table built + scanned through the full metadata/commit/scan stack.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val t = {
      val df = Tables.events(spark, d)
      val cat = new graft.catalog.GraftCatalog(
        java.nio.file.Files.createTempDirectory("graft-entry").toString)
      val tbl = cat.createTable("db.events", df.schema,
        partitionBy = Seq("ts" -> graft.format.Transform.Day))
      tbl.append(spark, df)
      tbl
    }
    t.toDF(spark)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("event_count"), countDistinct(col("user_id")).as("unique_users"))
      .orderBy("event_date", "event_type")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, sql) if sql != null => n -> sql }.toMap
}
