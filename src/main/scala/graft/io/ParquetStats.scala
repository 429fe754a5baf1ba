package graft.io

import graft.format.{Canonical, ColStats, GraftSchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, DecimalLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Extracts per-file column statistics from parquet footers, driver-side.
  *
  * This fills the manifest's lower/upper bounds + null counts (reference:
  * docs/03-metadata-management.md:96-133) WITHOUT re-scanning the data we
  * just wrote — footers are a few KB per file, so collecting stats for a
  * commit is metadata-plane I/O, exactly the property the reference's
  * planning model depends on (docs/09-query-performance.md:5-14). An
  * alternative (a second Spark agg job over the new files) would read the
  * whole write back — unacceptable at 100 TB appends.
  *
  * Stats are stored in the canonical space of [[Canonical]], keyed by
  * column ID. Columns whose parquet stats are absent, truncated away, or of
  * an unsupported physical type simply get no bounds (never pruned — sound).
  */
object ParquetStats {

  /** @return (recordCount, fileSizeBytes, per-column-id stats) */
  def read(pathStr: String, writeSchema: StructType, conf: Configuration)
      : (Long, Long, Map[Int, ColStats]) = {
    val hpath = new HPath(pathStr)
    val fs = hpath.getFileSystem(conf)
    val size = fs.getFileStatus(hpath).getLen
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(hpath, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val nameToField = writeSchema.fields.map(f => f.name -> f).toMap

      // accumulate per top-level column across row groups
      var acc = Map.empty[String, (Option[Any], Option[Any], Option[Long])]
      var statless = Set.empty[String] // any row group missing stats poisons the column
      for (block <- blocks; cc <- block.getColumns.asScala) {
        val topName = cc.getPath.toArray.headOption.getOrElse("")
        if (cc.getPath.size == 1 && nameToField.contains(topName)) {
          val field = nameToField(topName)
          val st = cc.getStatistics
          if (st == null || st.isEmpty) statless += topName
          else {
            val nulls = if (st.isNumNullsSet) Some(st.getNumNulls) else None
            val bounds: Option[(Any, Any)] =
              if (!st.hasNonNullValue) None // all-null row group: no bounds contribution
              else decode(cc.getPrimitiveType.getPrimitiveTypeName,
                cc.getPrimitiveType.getLogicalTypeAnnotation, field.dataType, st)
            if (st.hasNonNullValue && bounds.isEmpty) statless += topName
            val (lo0, hi0, n0) = acc.getOrElse(topName,
              (None: Option[Any], None: Option[Any], Some(0L): Option[Long]))
            acc += topName -> (
              minOpt(lo0, bounds.map(_._1)),
              maxOpt(hi0, bounds.map(_._2)),
              for (a <- n0; b <- nulls) yield a + b)
          }
        }
      }

      val stats = acc.collect { case (name, (lo, hi, nulls)) if !statless.contains(name) =>
        val f = nameToField(name)
        val (lo2, hi2) = truncateBounds(f.dataType, lo, hi)
        GraftSchema.fieldId(f) -> ColStats(
          lo2.map(v => Canonical.toJsonString(f.dataType, v)),
          hi2.map(v => Canonical.toJsonString(f.dataType, v)),
          nulls)
      }
      (rows, size, stats)
    } finally reader.close()
  }

  /** Max stored length for string bounds (matches Iceberg's
    * write.metadata.metrics default of truncate(16)): manifests must stay
    * KB-sized even when columns hold document-length text, or the metadata
    * plane stops being cheap at scale. Truncation must stay SOUND:
    * lower bounds truncate down for free; upper bounds get their last kept
    * char incremented so the truncated value still upper-bounds the data.
    */
  private[graft] val MaxStringBound = 16

  private[io] def truncateBounds(dt: DataType, lo: Option[Any], hi: Option[Any])
      : (Option[Any], Option[Any]) = dt match {
    case _: StringType =>
      // Truncation is only performed on ASCII prefixes, where char-level
      // operations and the UTF-8 byte order used for pruning agree; bounds
      // with non-ASCII prefixes are stored in full (rare, still correct).
      def asciiPrefix(s: String): Boolean =
        s.length <= MaxStringBound || s.substring(0, MaxStringBound + 1).forall(_ < 0x7f)
      val lo2 = lo.map { v =>
        val s = v.asInstanceOf[String]
        if (s.length <= MaxStringBound || !asciiPrefix(s)) s
        else s.substring(0, MaxStringBound)
      }
      val hi2 = hi.map { v =>
        val s = v.asInstanceOf[String]
        if (s.length <= MaxStringBound || !asciiPrefix(s)) s
        else {
          // increment the last char that can be incremented; drop the rest
          val t = s.substring(0, MaxStringBound).toCharArray
          var i = t.length - 1
          while (i >= 0 && t(i) >= 0x7e) i -= 1
          if (i < 0) s // cannot form a sound truncated upper bound: keep full
          else new String(t, 0, i) + (t(i) + 1).toChar
        }
      }
      (lo2, hi2)
    case _ => (lo, hi)
  }

  private def minOpt(a: Option[Any], b: Option[Any]): Option[Any] = (a, b) match {
    case (Some(x), Some(y)) => Some(if (Canonical.compare(x, y) <= 0) x else y)
    case (x, None) => x
    case (None, y) => y
  }
  private def maxOpt(a: Option[Any], b: Option[Any]): Option[Any] = (a, b) match {
    case (Some(x), Some(y)) => Some(if (Canonical.compare(x, y) >= 0) x else y)
    case (x, None) => x
    case (None, y) => y
  }

  /** Decode a row group's (min, max) into the canonical space of the Spark
    * type, or None when the physical/logical combination is unsupported.
    */
  private def decode(prim: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
                     logical: LogicalTypeAnnotation,
                     sparkType: DataType,
                     st: org.apache.parquet.column.statistics.Statistics[_])
      : Option[(Any, Any)] = {
    (prim, sparkType) match {
      case (INT32, _: DateType) =>
        Some((st.genericGetMin.asInstanceOf[Int], st.genericGetMax.asInstanceOf[Int]))
      case (INT32, _: ByteType | _: ShortType | _: IntegerType) =>
        Some((st.genericGetMin.asInstanceOf[Int].toLong, st.genericGetMax.asInstanceOf[Int].toLong))
      case (INT64, _: LongType) =>
        Some((st.genericGetMin.asInstanceOf[Long], st.genericGetMax.asInstanceOf[Long]))
      case (INT64, _: TimestampType | _: TimestampNTZType) =>
        logical match {
          case t: TimestampLogicalTypeAnnotation =>
            val toMicros: Long => Long = t.getUnit match {
              case TimeUnit.MICROS => identity
              case TimeUnit.MILLIS => _ * 1000L
              // floorDiv, not /: truncation rounds pre-epoch bounds toward
              // zero i.e. UP, so a stored min could exceed an actual row
              // value — unsound pruning (same fix as Canonical.toMicros)
              case TimeUnit.NANOS => Math.floorDiv(_, 1000L)
            }
            Some((toMicros(st.genericGetMin.asInstanceOf[Long]),
              toMicros(st.genericGetMax.asInstanceOf[Long])))
          case _ => None
        }
      // Float/double: NO bounds, ever. Parquet footer min/max exclude NaN
      // (or are polluted by it depending on writer), while the engine orders
      // NaN above every value — a file [1.0, NaN] with stored max=1.0 would
      // be unsoundly pruned for `x > 5`. Iceberg tracks nan_value_counts for
      // this; we take the simpler sound position: FP columns are unprunable.
      case (FLOAT | DOUBLE, _) => None
      case (BOOLEAN, _: BooleanType) =>
        Some((st.genericGetMin.asInstanceOf[Boolean], st.genericGetMax.asInstanceOf[Boolean]))
      case (BINARY, _: StringType) =>
        logical match {
          case _: StringLogicalTypeAnnotation =>
            val min = new String(st.getMinBytes, java.nio.charset.StandardCharsets.UTF_8)
            val max = new String(st.getMaxBytes, java.nio.charset.StandardCharsets.UTF_8)
            Some((min, max))
          case _ => None
        }
      case (INT32 | INT64, d: DecimalType) =>
        logical match {
          case dec: DecimalLogicalTypeAnnotation =>
            val scale = dec.getScale
            def bd(v: Any): BigDecimal = BigDecimal(BigInt(v.asInstanceOf[Number].longValue()), scale)
            Some((bd(st.genericGetMin), bd(st.genericGetMax)))
          case _ => None
        }
      case (FIXED_LEN_BYTE_ARRAY | BINARY, d: DecimalType) =>
        logical match {
          case dec: DecimalLogicalTypeAnnotation =>
            val scale = dec.getScale
            def bd(bytes: Array[Byte]): BigDecimal = BigDecimal(BigInt(bytes), scale)
            Some((bd(st.getMinBytes), bd(st.getMaxBytes)))
          case _ => None
        }
      case _ => None
    }
  }
}
