package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: per-batch duration breakdown for the streaming dedup
  * gates (g_stream_dedup / g_stream_dedup_watermark). Not part of the
  * declared surface.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("stream-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = graft.queries.Tables.events(spark, sfDir)
    val stage = java.nio.file.Files.createTempDirectory("graft-probe").toString
    df.repartition(3).write.mode("overwrite").parquet(stage)
    df.repartition(2).write.mode("append").parquet(stage)
    val cat = new graft.catalog.GraftCatalog(
      java.nio.file.Files.createTempDirectory("graft-probe-wh").toString)
    val t = cat.createTable("db.probe", df.schema)
    val stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 2)
      .parquet(stage)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "90 days")
      .dropDuplicatesWithinWatermark("event_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val t0 = System.nanoTime()
    val q = graft.streaming.GraftSink.ingestAvailable(t, spark, stream, s"$stage-ckpt")
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s, batches=${q.recentProgress.length}")
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
    }
    spark.stop()
  }
}
