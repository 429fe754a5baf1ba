package graft.format

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Hidden-partitioning transforms (reference: docs/07-partitioning.md:44-52,
  * docs/01-table-format-architecture.md:113-120).
  *
  * Each transform can be evaluated two ways:
  *   1. as a Spark `Column` at write time (derives the partition value), and
  *   2. driver-side on a canonical predicate literal at plan time, so query
  *      filters on the *source* column derive partition predicates — the
  *      essence of hidden partitioning (docs/07:25-40).
  *
  * Transform output space (for partition-tuple storage + comparison):
  *   identity -> source canonical space
  *   year     -> Long (the year number)
  *   month    -> String "yyyy-MM"   (lexicographically monotonic)
  *   day      -> String "yyyy-MM-dd"
  *   hour     -> String "yyyy-MM-dd-HH"
  *   bucket   -> Long in [0, n)     (murmur3, matches Spark's hash())
  *   truncate -> source space (string prefix / numeric floor)
  */
sealed trait Transform {
  def name: String
  /** Write-time partition-value derivation. */
  def toColumn(src: Column, srcType: DataType): Column
  /** Driver-side evaluation on a canonical value of the source type.
    * None = cannot evaluate (be conservative, never prune).
    */
  def apply(srcType: DataType, canonical: Any): Option[Any]
  /** Order-preserving in the source domain? (enables range derivation) */
  def monotonic: Boolean
  /** Parse a partition-directory string back into transform output space. */
  def parse(srcType: DataType, s: String): Any
  def resultType(srcType: DataType): DataType
}

object Transform {
  case object Identity extends Transform {
    val name = "identity"
    def toColumn(src: Column, srcType: DataType): Column = srcType match {
      // format timestamps explicitly so directory names are filesystem-safe
      // and round-trip deterministically
      case _: TimestampType | _: TimestampNTZType =>
        date_format(src, "yyyy-MM-dd'T'HH.mm.ss.SSSSSS")
      case _ => src
    }
    def apply(srcType: DataType, v: Any): Option[Any] = Some(v)
    val monotonic = true
    def parse(srcType: DataType, s: String): Any = srcType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => s.toLong
      case _: FloatType | _: DoubleType => s.toDouble
      case _: DecimalType => BigDecimal(s)
      case _: StringType => s
      case _: DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case _: TimestampType | _: TimestampNTZType =>
        Canonical.toMicros(java.time.LocalDateTime.parse(s,
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH.mm.ss.SSSSSS")))
      case _: BooleanType => s.toBoolean
      case other => s
    }
    // Output space == source canonical space for EVERY type. (Timestamps are
    // formatted only for the directory NAME; `parse` maps the name back to
    // canonical micros. resultType=StringType here once made stored bounds
    // Strings while predicates canonicalized to Long — an incomparable-values
    // crash on any filtered scan of an identity-timestamp partition.)
    def resultType(srcType: DataType): DataType = srcType
  }

  case object Year extends Transform {
    val name = "year"
    def toColumn(src: Column, srcType: DataType): Column = year(src).cast(LongType)
    def apply(srcType: DataType, v: Any): Option[Any] = srcType match {
      case _: DateType => Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).getYear.toLong)
      case _: TimestampType | _: TimestampNTZType =>
        Some(Canonical.microsToLdt(v.asInstanceOf[Long]).getYear.toLong)
      case _ => None
    }
    val monotonic = true
    def parse(srcType: DataType, s: String): Any = s.toLong
    def resultType(srcType: DataType): DataType = LongType
  }

  private def fmtTransform(nm: String, pattern: String, f: java.time.LocalDateTime => String) =
    new Transform {
      val name = nm
      def toColumn(src: Column, srcType: DataType): Column = date_format(src, pattern)
      def apply(srcType: DataType, v: Any): Option[Any] = srcType match {
        case _: DateType =>
          Some(f(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).atStartOfDay))
        case _: TimestampType | _: TimestampNTZType =>
          Some(f(Canonical.microsToLdt(v.asInstanceOf[Long])))
        case _ => None
      }
      val monotonic = true
      def parse(srcType: DataType, s: String): Any = s
      def resultType(srcType: DataType): DataType = StringType
    }

  private def p2(i: Int) = f"$i%02d"
  private def p4(i: Int) = f"$i%04d" // match date_format's yyyy padding (years < 1000)
  val Month: Transform = fmtTransform("month", "yyyy-MM",
    d => s"${p4(d.getYear)}-${p2(d.getMonthValue)}")
  val Day: Transform = fmtTransform("day", "yyyy-MM-dd",
    d => s"${p4(d.getYear)}-${p2(d.getMonthValue)}-${p2(d.getDayOfMonth)}")
  val Hour: Transform = fmtTransform("hour", "yyyy-MM-dd-HH",
    d => s"${p4(d.getYear)}-${p2(d.getMonthValue)}-${p2(d.getDayOfMonth)}-${p2(d.getHour)}")

  /** Bucket by murmur3 hash, consistent between the Spark-side `hash()`
    * function and the driver-side evaluation (both are Murmur3_x86_32 with
    * seed 42), so bucket pruning on equality predicates is exact.
    */
  case class Bucket(n: Int) extends Transform {
    val name = s"bucket[$n]"
    // NULL must land in the null partition, not bucket hash(null)%n —
    // Spark's hash(NULL) is the seed (42), which would record the file as
    // containsNull=false and let IS NULL predicates prune it unsoundly.
    def toColumn(src: Column, srcType: DataType): Column =
      when(src.isNotNull, pmod(hash(src), lit(n)).cast(LongType))
    def apply(srcType: DataType, v: Any): Option[Any] = {
      val h: Option[Int] = srcType match {
        case _: IntegerType | _: ShortType | _: ByteType =>
          Some(Murmur3_x86_32.hashInt(v.asInstanceOf[Long].toInt, 42))
        case _: LongType => Some(Murmur3_x86_32.hashLong(v.asInstanceOf[Long], 42))
        case _: DateType => Some(Murmur3_x86_32.hashInt(v.asInstanceOf[Int], 42))
        case _: TimestampType | _: TimestampNTZType =>
          Some(Murmur3_x86_32.hashLong(v.asInstanceOf[Long], 42))
        case _: StringType =>
          val u = UTF8String.fromString(v.asInstanceOf[String])
          Some(Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42))
        case _ => None
      }
      h.map(x => Math.floorMod(x, n).toLong)
    }
    val monotonic = false
    def parse(srcType: DataType, s: String): Any = s.toLong
    def resultType(srcType: DataType): DataType = LongType
  }

  /** Truncate: string prefix of width w, or numeric floor to a multiple of w
    * (docs/07:50-51).
    */
  case class Truncate(w: Int) extends Transform {
    val name = s"truncate[$w]"
    def toColumn(src: Column, srcType: DataType): Column = srcType match {
      case _: StringType => substring(src, 1, w)
      case _ => (src - pmod(src, lit(w))).cast(LongType)
    }
    def apply(srcType: DataType, v: Any): Option[Any] = srcType match {
      // count CODE POINTS like Spark's substring, not UTF-16 code units —
      // String.take would split/shorten differently on supplementary chars
      case _: StringType => Some(takeCodePoints(v.asInstanceOf[String], w))
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        val l = v.asInstanceOf[Long]; Some(l - Math.floorMod(l, w.toLong))
      case _ => None
    }
    val monotonic = true
    def parse(srcType: DataType, s: String): Any = srcType match {
      case _: StringType => s
      case _ => s.toLong
    }
    def resultType(srcType: DataType): DataType = srcType match {
      case _: StringType => StringType
      case _ => LongType
    }
  }

  private[format] def takeCodePoints(s: String, w: Int): String = {
    val end = s.offsetByCodePoints(0, math.min(w, s.codePointCount(0, s.length)))
    s.substring(0, end)
  }

  def fromString(s: String): Transform = s match {
    case "identity" => Identity
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case b if b.startsWith("bucket[") => Bucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
    case t if t.startsWith("truncate[") => Truncate(t.stripPrefix("truncate[").stripSuffix("]").toInt)
    case other => sys.error(s"unknown transform: $other")
  }
}
