package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (`/root/testdata/sf*`).
  *
  * One quirk: `events.ts` is parquet TIMESTAMP(NANOS) (written by pandas),
  * which Spark's reader rejects outright. We read it via the documented
  * `spark.sql.legacy.parquet.nanosAsLong` escape hatch and convert
  * nanos -> micros with integer division (NOT double division — epoch-nanos
  * exceed 2^53 so a double round-trip would corrupt timestamps), landing on
  * TimestampNTZ to match DuckDB's naive-timestamp semantics in the oracle.
  */
object Tables {

  private val nanosTimestampCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosTimestampCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType =>
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")).cast(TimestampNTZType))
        case _ => d
      }
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
