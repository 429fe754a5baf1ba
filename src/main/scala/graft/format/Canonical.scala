package graft.format

import org.apache.spark.sql.types._
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Canonical driver-side value space used for file statistics and pruning.
  *
  * Every comparable Spark type maps onto one of a handful of canonical JVM
  * representations so that manifest min/max bounds (reference:
  * docs/03-metadata-management.md:96-133) and predicate literals can be
  * compared with one total ordering per logical type:
  *
  *   - integral types            -> Long
  *   - Float/Double              -> Double
  *   - Decimal                   -> BigDecimal
  *   - String                    -> String
  *   - Date                      -> Int (days since epoch)
  *   - Timestamp / TimestampNTZ  -> Long (micros since epoch, UTC)
  *   - Boolean                   -> Boolean
  *
  * Binary and complex types have no canonical form (no stats, never pruned —
  * conservative and sound).
  */
object Canonical {

  private val tsFmt = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  def supports(dt: DataType): Boolean = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
    case _: FloatType | _: DoubleType | _: DecimalType => true
    case _: StringType | _: DateType | _: TimestampType | _: TimestampNTZType | _: BooleanType => true
    case _ => false
  }

  /** Normalize an arbitrary user/Spark literal to the canonical space of `dt`.
    * Returns None for nulls, unsupported types, or UN-PARSEABLE values — a
    * malformed literal ("not-a-date" against a timestamp column) must make
    * pruning conservatively keep the file and let the exact row-level
    * filter decide, never crash the scan at plan time.
    */
  def of(dt: DataType, v: Any): Option[Any] = {
    if (v == null) return None
    try dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => Some(toLong(v))
      case _: FloatType | _: DoubleType => Some(toDouble(v))
      case d: DecimalType => Some(toBigDecimal(v))
      case _: StringType => Some(v.toString)
      case _: DateType => Some(toDays(v))
      case _: TimestampType | _: TimestampNTZType => Some(toMicros(v))
      case _: BooleanType => Some(v.asInstanceOf[Boolean])
      case _ => None
    } catch { case _: Exception => None }
  }

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case s: String => s.toLong
    case other => sys.error(s"cannot canonicalize $other as long")
  }

  private def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
    case other => sys.error(s"cannot canonicalize $other as double")
  }

  private def toBigDecimal(v: Any): BigDecimal = v match {
    case b: BigDecimal => b
    case b: java.math.BigDecimal => BigDecimal(b)
    case n: Number => BigDecimal(n.toString)
    case s: String => BigDecimal(s)
    case other => sys.error(s"cannot canonicalize $other as decimal")
  }

  def toDays(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: LocalDate => d.toEpochDay.toInt
    case i: Int => i
    case l: Long => l.toInt
    case s: String => LocalDate.parse(s).toEpochDay.toInt
    case t => toMicrosLdt(v).toLocalDate.toEpochDay.toInt
  }

  def toMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      // floorDiv: plain division truncates toward zero, which mis-converts
      // pre-epoch timestamps with fractional seconds (-0.5s would become +0.5s)
      Math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L
    case i: Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: LocalDateTime => l.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L +
      l.getNano / 1000L
    case d: LocalDate => d.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L
    case d: java.sql.Date => d.toLocalDate.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L
    case l: Long => l
    case s: String => toMicros(parseDateTime(s))
    case other => sys.error(s"cannot canonicalize $other as timestamp")
  }

  private def toMicrosLdt(v: Any): LocalDateTime =
    LocalDateTime.ofInstant(Instant.ofEpochSecond(toMicros(v) / 1000000L,
      (toMicros(v) % 1000000L) * 1000L), ZoneOffset.UTC)

  /** Canonical micros -> LocalDateTime in UTC (used by time transforms). */
  def microsToLdt(micros: Long): LocalDateTime = {
    val sec = Math.floorDiv(micros, 1000000L)
    val ns = Math.floorMod(micros, 1000000L) * 1000L
    LocalDateTime.ofInstant(Instant.ofEpochSecond(sec, ns), ZoneOffset.UTC)
  }

  private def parseDateTime(s: String): LocalDateTime = {
    val t = s.trim.replace(" ", "T")
    if (t.length == 10) LocalDate.parse(t).atStartOfDay
    else LocalDateTime.parse(t, tsFmt)
  }

  /** Serialize a canonical value for JSON manifests. */
  def toJsonString(dt: DataType, canonical: Any): String = canonical match {
    case b: BigDecimal => b.bigDecimal.toPlainString
    case other => other.toString
  }

  /** Parse a JSON-manifest string back to the canonical space of `dt`. */
  def fromJsonString(dt: DataType, s: String): Any = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => s.toLong
    case _: FloatType | _: DoubleType => s.toDouble
    case _: DecimalType => BigDecimal(s)
    case _: StringType => s
    case _: DateType => s.toInt
    case _: TimestampType | _: TimestampNTZType => s.toLong
    case _: BooleanType => s.toBoolean
    case other => sys.error(s"no canonical form for $other")
  }

  /** Total order within one canonical space.
    *
    * Strings compare by UNSIGNED UTF-8 BYTES, not Java's UTF-16 code units:
    * parquet writes string min/max under byte order, and the two orders
    * disagree for supplementary characters (e.g. U+1F600 sorts below U+FF61
    * in UTF-16 but above it in UTF-8) — comparing bounds under a different
    * order than the one they were computed in would make pruning UNSOUND.
    */
  def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Int, y: Long) => java.lang.Long.compare(x.toLong, y)
    case (x: Long, y: Int) => java.lang.Long.compare(x, y.toLong)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case (x: String, y: String) => compareUtf8(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => sys.error(s"incomparable canonical values: $a vs $b")
  }

  private def compareUtf8(x: String, y: String): Int = {
    // fast path: ASCII-only strings order identically under both schemes
    var i = 0
    val n = math.min(x.length, y.length)
    var ascii = true
    while (i < n && ascii) {
      val cx = x.charAt(i); val cy = y.charAt(i)
      if (cx < 0x80 && cy < 0x80) {
        if (cx != cy) return Character.compare(cx, cy)
        i += 1
      } else ascii = false
    }
    if (ascii) return Integer.compare(x.length, y.length)
    val bx = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val by = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var j = 0
    val m = math.min(bx.length, by.length)
    while (j < m) {
      val c = Integer.compare(bx(j) & 0xff, by(j) & 0xff)
      if (c != 0) return c
      j += 1
    }
    Integer.compare(bx.length, by.length)
  }
}
