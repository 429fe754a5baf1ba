package graft.streaming

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Transform
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** The reference's flagship composite pipeline (docs/12-lakehouse-patterns.md:
  * 55-126): streaming ingest into bronze, incremental high-watermark
  * bronze→silver transform, aggregated silver→gold MERGE. Run twice to prove
  * incrementality and upsert idempotency.
  */
class MedallionSpec extends SparkSpec {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def batch(ids: Range, day: Int): DataFrame =
    spark.createDataFrame(ids.map { i =>
      Row(i.toLong, java.time.LocalDateTime.of(2024, 1, day, i % 24, 0),
        (i % 5).toLong, if (i % 2 == 0) "view" else "click", i.toDouble)
    }.asJava, eventSchema)

  test("bronze -> silver -> gold, incrementally, twice") {
    val cat = new GraftCatalog(tempWarehouse())
    val bronze = cat.createTable("lake.bronze", eventSchema,
      partitionBy = Seq("ts" -> Transform.Day))
    val silver = cat.createTable("lake.silver", eventSchema)
    val gold = cat.createTable("lake.gold", StructType(Seq(
      StructField("day", DateType), StructField("event_type", StringType),
      StructField("cnt", LongType))))

    def runPipeline(): Unit = {
      // bronze -> silver: only rows newer than silver's watermark (docs/12:94-104)
      val fresh = GraftSink.incrementalNewRows(spark, bronze.toDF(spark), silver, "ts")
        .filter(col("event_type").isin("view", "click")) // cleansing step
      silver.append(spark, fresh)
      // silver -> gold: aggregated MERGE upsert (docs/12:107-126)
      val agg = silver.toDF(spark)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      gold.merge(spark, agg, Seq("day" -> "day", "event_type" -> "event_type"),
        whenMatchedUpdate = Map("cnt" -> col("s.cnt")))
    }

    // day 1 arrives via streaming ingest
    val stage = java.nio.file.Files.createTempDirectory("medallion").toString
    batch(0 until 48, day = 1).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    GraftSink.ingestAvailable(bronze, spark, stream, s"$stage-ckpt")
    runPipeline()
    assert(silver.toDF(spark).count() == 48)
    val g1 = gold.toDF(spark).collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(g1 == Set(("2024-01-01", "view", 24L), ("2024-01-01", "click", 24L)))

    // day 2 arrives as a batch append; pipeline reruns incrementally
    bronze.append(spark, batch(100 until 130, day = 2))
    runPipeline()
    assert(silver.toDF(spark).count() == 78) // day-1 rows NOT re-ingested
    val g2 = gold.toDF(spark).collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(g2 == Set(
      ("2024-01-01", "view", 24L), ("2024-01-01", "click", 24L),
      ("2024-01-02", "view", 15L), ("2024-01-02", "click", 15L)))

    // bronze carries full history: one commit per micro-batch + one batch append
    assert(bronze.meta.snapshots.size >= 2)
  }

  test("incrementalNewRows boundary: same-valued stragglers recovered via boundaryKeys") {
    val cat = new GraftCatalog(tempWarehouse())
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType)))
    def rows(data: Seq[(Long, String)]) = spark.createDataFrame(
      data.map { case (i, s) => Row(i, java.sql.Timestamp.valueOf(s)) }.asJava, schema)
    val bronze = cat.createTable("lk.bz", schema)
    val silver = cat.createTable("lk.sv", schema)
    bronze.append(spark, rows(Seq(1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:00:05")))
    silver.append(spark, GraftSink.incrementalNewRows(spark, bronze.toDF(spark), silver, "ts"))
    assert(silver.toDF(spark).count() == 2)
    // a STRAGGLER lands with ts EQUAL to the already-synced max (10:00:05):
    // the strict > filter would silently lose it forever; boundaryKeys
    // re-reads the boundary value inclusively and anti-joins ingested ids
    bronze.append(spark, rows(Seq(3L -> "2024-01-01 10:00:05", 4L -> "2024-01-01 10:00:09")))
    val strict = GraftSink.incrementalNewRows(spark, bronze.toDF(spark), silver, "ts")
    assert(strict.collect().map(_.getLong(0)).toSet == Set(4L), "strict mode misses id=3")
    val exact = GraftSink.incrementalNewRows(spark, bronze.toDF(spark), silver, "ts",
      boundaryKeys = Seq("id"))
    assert(exact.collect().map(_.getLong(0)).toSet == Set(3L, 4L),
      "boundary mode recovers the equal-watermark straggler exactly once")
    silver.append(spark, exact)
    // idempotent: a rerun ingests nothing
    assert(GraftSink.incrementalNewRows(spark, bronze.toDF(spark), silver, "ts",
      boundaryKeys = Seq("id")).count() == 0)
    // NULL-watermark rows are consistently excluded (never the
    // first-sync-only ingestion of before)
    bronze.append(spark, spark.createDataFrame(
      Seq(Row(9L, null)).asJava, schema))
    assert(GraftSink.incrementalNewRows(spark, bronze.toDF(spark), silver, "ts",
      boundaryKeys = Seq("id")).count() == 0)
  }

  test("watermarked windowed aggregation over a stream (beyond-reference superset)") {
    val stage = java.nio.file.Files.createTempDirectory("winagg").toString
    batch(0 until 48, day = 3).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(eventSchema).parquet(stage)
    val windowed = stream
      .withColumn("ts", col("ts").cast("timestamp")) // watermarks need TIMESTAMP, not NTZ
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("win_counts").outputMode("complete")
      .option("checkpointLocation", s"$stage-ckpt")
      .start()
    q.awaitTermination()
    val rows = spark.sql("SELECT event_type, sum(n) FROM win_counts GROUP BY 1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("view" -> 24L, "click" -> 24L))
    assert(spark.sql("SELECT count(*) FROM win_counts").head.getLong(0) == 8) // 4 windows x 2 types
  }
}
