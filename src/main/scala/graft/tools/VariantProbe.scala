package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off audit for the q14 variant-kernel cost (VERDICT r2 #2): times the
  * alternative JSON-extraction shapes over the same events table and prints
  * whether each stays inside WholeStageCodegen.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.VariantProbe"
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cached = sys.env.get("VARIANT_PROBE_CACHE").contains("1")
    val ev = if (cached) {
      val c = graft.queries.Tables.events(spark, d).cache(); c.count(); c
    } else graft.queries.Tables.events(spark, d)

    def probe(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      val c0 = System.nanoTime(); df.count()
      val cold = (System.nanoTime() - c0) / 1e9
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s cold=$cold%6.3f s  min=${ts.min}%6.3f s")
    }

    probe("variant_get(parse_json)") {
      ev.withColumn("k", variant_get(parse_json(col("props")), "$.k", "int"))
        .groupBy((col("k") % 10).as("k_mod")).agg(count(lit(1)).as("n"))
    }
    probe("get_json_object") {
      ev.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy((col("k") % 10).as("k_mod")).agg(count(lit(1)).as("n"))
    }
    probe("from_json(schema)") {
      ev.withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k"))
        .groupBy((col("k") % 10).as("k_mod")).agg(count(lit(1)).as("n"))
    }
    probe("variant stored then get") {
      // parse into variant once in a separate cached projection, then extract
      val v = ev.select(parse_json(col("props")).as("v"))
      v.select(variant_get(col("v"), "$.k", "int").as("k"))
        .groupBy((col("k") % 10).as("k_mod")).agg(count(lit(1)).as("n"))
    }
    spark.stop()
  }
}
