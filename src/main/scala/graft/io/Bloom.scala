package graft.io

import graft.format.Canonical
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file, per-column bloom filters for equality file-skipping (reference
  * docs/09-query-performance.md's data-skipping story, extended to point
  * lookups): min/max bounds cannot prune an `=` probe that falls inside a
  * file's value range but between its actual values; a bloom filter can.
  * Sound by construction — bits are set from exactly the values present, so
  * a "definitely absent" answer is never wrong, and a saturated filter
  * (high-cardinality column in one file) merely degrades to "maybe".
  *
  * Representation: a bits/8-byte bitmap, base64 in the manifest (4096 bits
  * = ~700 JSON chars per column per file). Each value probes two positions
  * derived from ONE xxhash64 of the value's canonical string — the classic
  * (h1 + i·h2) double-hashing split of the 64-bit hash — so the executor
  * side is a single codegen'd hash call, and the driver side reproduces it
  * exactly by evaluating the SAME catalyst expressions (Cast to string,
  * then XxHash64) on the probe literal. The hash pair is bitmap-size-free;
  * positions are taken modulo the size of the bitmap being probed, so a
  * table whose `write.bloom-bits` changed over time stays consistent
  * per-file.
  *
  * Instant-timestamp columns hash through the session time zone on
  * executors and UTC on the driver; Graft already requires UTC sessions
  * wherever instants meet formatting (see GraftWriter's guard).
  */
object Bloom {

  val DefaultBits = 4096

  /** Executor-side: the two probe positions of `c` in a `bits`-bit bitmap.
    * NULLs yield NULL positions via the explicit guard — Spark's xxhash64
    * returns the SEED (42) for a NULL input, so without it every file
    * containing a null would set hash-42's bits and weaken the filter
    * (nulls are tracked by null-count, not bloom).
    */
  def positionColumns(c: Column, bits: Int): (Column, Column) = {
    val h = when(c.isNotNull, xxhash64(c.cast("string")))
    val h1 = pmod(h, lit(0x100000000L))
    val h2 = pmod(shiftright(h, 32), lit(0x100000000L))
    (pmod(h1, lit(bits.toLong)).cast("int"), pmod(h1 + h2, lit(bits.toLong)).cast("int"))
  }

  /** Driver-side twin of [[positionColumns]]: the (h1, h2) hash pair of a
    * probe value for a `dt`-typed column, from the same Cast+XxHash64
    * catalyst evaluation. None when the value cannot be represented
    * (null / unsupported type / conversion failure) — callers must not
    * prune then.
    */
  def hashPair(dt: DataType, value: Any): Option[(Long, Long)] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    external(dt, value).flatMap { ext =>
      val literal =
        try Literal.create(ext, dt)
        catch { case _: Exception => return None }
      val cast = Cast(literal, StringType, Some("UTC"))
      if (!cast.resolved) return None
      XxHash64(Seq(cast), 42L).eval() match {
        case l: java.lang.Long =>
          val h = l.longValue()
          Some((java.lang.Long.remainderUnsigned(h, 0x100000000L),
            java.lang.Long.remainderUnsigned(h >>> 32, 0x100000000L)))
        case _ => None
      }
    }
  }

  /** Reusable per-column hash evaluator for the DRIVER bloom-build hot
    * loop (r18 ADVICE): [[hashPair]] constructs and interpreted-evaluates
    * a fresh Literal+Cast+XxHash64 tree PER VALUE — near the driver-build
    * cutover (millions of values) the tree construction dominates the
    * hashing itself. This builds the SAME Cast→XxHash64 evaluation ONCE
    * over a bound one-slot row and feeds values through it, so each value
    * pays only the evaluation. Restricted to the exactly-representable
    * driver read set (GraftWriter.driverReadable — integrals, float,
    * double, string); bit-identity with [[hashPair]] and the executor
    * path is pinned by BloomDriverParitySpec. NOT thread-safe (mutable
    * row): build one per worker thread.
    */
  def hashPairEvaluator(dt: DataType): Any => Option[(Long, Long)] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, GenericInternalRow, XxHash64}
    val toInternal: Any => Any = dt match {
      case ByteType => v => v.asInstanceOf[Number].byteValue()
      case ShortType => v => v.asInstanceOf[Number].shortValue()
      case IntegerType => v => v.asInstanceOf[Number].intValue()
      case LongType => v => v.asInstanceOf[Number].longValue()
      case FloatType => v => v.asInstanceOf[Number].floatValue()
      case DoubleType => v => v.asInstanceOf[Number].doubleValue()
      case StringType =>
        v => org.apache.spark.unsafe.types.UTF8String.fromString(v.asInstanceOf[String])
      case other => sys.error(s"hashPairEvaluator: unsupported type $other")
    }
    val hash = XxHash64(
      Seq(Cast(BoundReference(0, dt, nullable = false), StringType, Some("UTC"))), 42L)
    val row = new GenericInternalRow(1)
    (v: Any) => {
      row.update(0, toInternal(v))
      hash.eval(row) match {
        case l: java.lang.Long =>
          val h = l.longValue()
          Some((java.lang.Long.remainderUnsigned(h, 0x100000000L),
            java.lang.Long.remainderUnsigned(h >>> 32, 0x100000000L)))
        case _ => None
      }
    }
  }

  /** Convert a raw predicate literal to the external JVM type
    * `Literal.create` expects for `dt`, via the canonical space (so e.g. an
    * Int probe against a LongType column still hashes as a long). Narrowing
    * a value outside the column type's domain may wrap, but such a probe
    * can never equal any stored value, so any bloom answer is sound.
    */
  private def external(dt: DataType, v: Any): Option[Any] =
    Canonical.of(dt, v).flatMap { c =>
      try {
        dt match {
          case ByteType => Some(c.asInstanceOf[Long].toByte)
          case ShortType => Some(c.asInstanceOf[Long].toShort)
          case IntegerType => Some(c.asInstanceOf[Long].toInt)
          case LongType => Some(c.asInstanceOf[Long])
          case FloatType => Some(c.asInstanceOf[Double].toFloat)
          case DoubleType => Some(c.asInstanceOf[Double])
          case _: DecimalType => Some(c.asInstanceOf[BigDecimal])
          case StringType => Some(c.asInstanceOf[String])
          case BooleanType => Some(c.asInstanceOf[Boolean])
          case DateType => Some(java.time.LocalDate.ofEpochDay(c.asInstanceOf[Int].toLong))
          case TimestampType =>
            val us = c.asInstanceOf[Long]
            Some(java.time.Instant.ofEpochSecond(
              Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
          case TimestampNTZType => Some(Canonical.microsToLdt(c.asInstanceOf[Long]))
          case _ => None
        }
      } catch { case _: Exception => None }
    }

  /** Bitmap from set positions, base64-encoded. */
  def encode(positions: Iterable[Int], bits: Int): String = {
    val bytes = new Array[Byte](bits / 8)
    positions.foreach { p => bytes(p >>> 3) = (bytes(p >>> 3) | (1 << (p & 7))).toByte }
    java.util.Base64.getEncoder.encodeToString(bytes)
  }

  /** Decoded bitmap, or None when the text is unusable (malformed/empty) —
    * callers treat None as "maybe" (cannot prune). Split from the probe so
    * a k-key runtime filter decodes each file's bitmap ONCE, not per key.
    */
  def decode(encoded: String): Option[Array[Byte]] =
    try {
      val b = java.util.Base64.getDecoder.decode(encoded)
      if (b.isEmpty) None else Some(b)
    } catch { case _: IllegalArgumentException => None }

  /** May the encoded filter contain a value with this hash pair? */
  def mayContain(encoded: String, hashes: (Long, Long)): Boolean =
    decode(encoded).forall(mayContainBits(_, hashes))

  /** [[mayContain]] over an already-decoded bitmap. [[decode]] never returns
    * an empty array, but this is callable on its own (e.g. a future caller
    * bypassing the scan-wide decode memo) — an empty bitmap answers the
    * sound "maybe" instead of dividing by zero (r17 ADVICE).
    */
  def mayContainBits(bytes: Array[Byte], hashes: (Long, Long)): Boolean = {
    if (bytes.isEmpty) return true
    val bits = bytes.length * 8
    val (h1, h2) = hashes
    Seq(h1 % bits, (h1 + h2) % bits).forall { pl =>
      val p = pl.toInt
      ((bytes(p >>> 3) >> (p & 7)) & 1) == 1
    }
  }
}
