package graft.functions

import graft.format.GraftSchema
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIME-without-timezone support (reference docs/06-schema-evolution.md's
  * type matrix: Iceberg `time` ↔ TIME).
  *
  * Spark 4.1's native TimeType is pre-GA plumbing — parquet IO and the
  * field-extraction functions both throw UNSUPPORTED_TIME_TYPE — so Graft
  * represents TIME the way Iceberg physically encodes it: an INT64 of
  * microseconds since midnight, annotated `graft.logical-type = time` in the
  * field metadata. The annotation survives schema evolution (field copies
  * keep metadata), travels through the metadata JSON, and drives the Iceberg
  * export to emit the real `time` type. All functions below are codegen'd
  * built-in compositions — no UDFs.
  */
object TimeFunctions {

  val MicrosPerSecond = 1000000L
  val MicrosPerDay: Long = 86400L * MicrosPerSecond

  /** A TIME column declaration for createTable. */
  def timeField(name: String): StructField =
    StructField(name, LongType, nullable = true,
      metadata = new MetadataBuilder()
        .putString(GraftSchema.LogicalTypeKey, "time").build())

  def isTimeField(f: StructField): Boolean =
    f.metadata.contains(GraftSchema.LogicalTypeKey) &&
      f.metadata.getString(GraftSchema.LogicalTypeKey) == "time" &&
      f.dataType == LongType

  /** A UUID column declaration (docs/06's type matrix: uuid ↔ VARCHAR(36),
    * which is also how the reference's engine stores it): a 36-char string
    * with the `uuid` logical annotation; the Iceberg export emits `uuid`.
    */
  def uuidField(name: String): StructField =
    StructField(name, StringType, nullable = true,
      metadata = new MetadataBuilder()
        .putString(GraftSchema.LogicalTypeKey, "uuid").build())

  /** Deterministic UUIDv4-shaped string from any column (md5-derived,
    * codegen'd) — the ingest-side generator for uuid columns.
    */
  def uuidFromBytes(c: Column): Column = {
    val h = md5(c.cast("binary"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4),
      concat(lit("4"), substring(h, 14, 3)),
      concat(lit("8"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** Time-of-day (whole-second resolution) of a timestamp. */
  def timeOfDayMicros(ts: Column): Column =
    ((hour(ts).cast("long") * 3600L + minute(ts).cast("long") * 60L +
      second(ts).cast("long")) * MicrosPerSecond).cast("long")

  /** Parse 'HH:mm:ss[.ffffff]' to micros since midnight (NULL on mismatch —
    * try_cast, not cast: under ANSI mode (Spark 4's default) a plain cast
    * of a non-numeric component would fail the whole query).
    */
  def timeFromString(s: Column): Column = {
    val parts = split(s, ":")
    def num(c: Column): Column = c.try_cast(LongType)
    val sec = split(try_element_at(parts, lit(3)), "\\.")
    val frac = coalesce(num(rpad(try_element_at(sec, lit(2)), 6, "0")), lit(0L))
    (num(try_element_at(parts, lit(1))) * 3600L * MicrosPerSecond +
      num(try_element_at(parts, lit(2))) * 60L * MicrosPerSecond +
      num(try_element_at(sec, lit(1))) * MicrosPerSecond + frac).cast("long")
  }

  /** Format micros since midnight as 'HH:mm:ss' (fraction dropped). */
  def timeToString(micros: Column): Column =
    format_string("%02d:%02d:%02d",
      hourOfTime(micros), minuteOfTime(micros), secondOfTime(micros))

  def hourOfTime(micros: Column): Column = (micros / (3600L * MicrosPerSecond)).cast("long")
  def minuteOfTime(micros: Column): Column =
    (micros % (3600L * MicrosPerSecond) / (60L * MicrosPerSecond)).cast("long")
  def secondOfTime(micros: Column): Column =
    (micros % (60L * MicrosPerSecond) / MicrosPerSecond).cast("long")
}
