package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image decode for the multimodal pipeline (SURVEY §2.9 X5) using the
  * JDK's built-in `javax.imageio` codecs (PNG/BMP/GIF/JPEG/WBMP readers ship
  * in java.desktop — no external libraries). Only the HEADER is parsed:
  * `ImageReader.getWidth/getHeight` read dimensions without decoding pixel
  * data, so at 100 TB this is a map-side metadata extraction whose cost is
  * bytes-sniffed, not bytes-decoded. Formats with no installed reader
  * return null — the caller routes those to [[Multimodal.stubDecode]] or an
  * external codec service (the declared-stub path for audio/video, whose
  * codecs the JDK does not ship).
  */
object ImageCodec {

  ImageIO.setUseCache(false) // no temp-file cache: blobs are in-memory

  /** Raster-size ceiling for FULL decode ([[decodeStatsRow]]): header-
    * claimed rasters above this are refused without allocating.
    */
  val MaxDecodePixels: Long = 128L * 1024 * 1024

  /** Decoded header contract: container format + dimensions + channels. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** Header-only decode; null when no installed reader claims the bytes.
    * Called from both the interpreted path and generated code (static
    * forwarder), once per row — allocation is one stream wrapper; the
    * ImageReader instances are pooled per format by ImageIO itself.
    */
  def decodeHeaderRow(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val fmt = r.getFormatName.toLowerCase
          val channels = {
            val types = r.getImageTypes(0)
            if (types.hasNext) types.next().getColorModel.getNumComponents else 3
          }
          new GenericInternalRow(
            Array[Any](UTF8String.fromString(fmt), w, h, channels))
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Exception => null } // corrupt header -> undecodable
  }

  /** Pixel-stats contract for REAL feature extraction: dimensions plus
    * exact per-channel pixel sums (integers — no float ever exists, so
    * cross-engine parity is exact).
    */
  val StatsSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** FULL pixel decode + per-channel sums — the real feature-extraction
    * step (channel means = sums / (w*h), done by the caller in whatever
    * precision it wants). Unlike [[decodeHeaderRow]] this pays the honest
    * cost of decoding sample data; at 100 TB that cost is the operator —
    * it stays map-side and shuffles nothing. Null when no reader claims
    * the bytes. Lossless containers (PNG/BMP) reproduce encoder pixels
    * bit-exactly; lossy/palettized ones (JPEG/GIF) decode but their sums
    * are codec-defined.
    */
  def decodeStatsRow(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val fmt = r.getFormatName.toLowerCase
          // decode-bomb guard: dimensions come from the HEADER (no pixel
          // allocation yet); a blob whose claimed raster exceeds the bound
          // (128M pixels ≈ 0.5 GB ARGB) is refused, not decoded — on an
          // untrusted 100 TB corpus one crafted header must not OOM an
          // executor. Routes to null like any other undecodable blob.
          if (r.getWidth(0).toLong * r.getHeight(0).toLong > MaxDecodePixels)
            return null
          val img = r.read(0)
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          new GenericInternalRow(
            Array[Any](UTF8String.fromString(fmt), w, h, sr, sg, sb))
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Exception => null }
  }

  /** Fixture-side encoder (tests + gate queries): a deterministic RGB
    * gradient at the requested dimensions, written through the same JDK
    * codec family the decoder reads.
    */
  def encodeImage(format: String, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17) & 0xFF) << 8 | (x & 0xFF))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no JDK writer for format $format")
    bos.toByteArray
  }
}

/** Catalyst expression: binary -> struct(format, width, height, channels),
  * null for undecodable bytes. Codegen-friendly: the generated code is one
  * static call, so the expression stays inside whole-stage codegen spans
  * (no UDF, no interpreted fallback on the hot path).
  */
case class DecodeImageHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ImageCodec.DecodedSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode_image"

  override def nullSafeEval(input: Any): Any =
    ImageCodec.decodeHeaderRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.ImageCodec.decodeHeaderRow($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodeImageHeader =
    copy(child = newChild)
}

/** Catalyst expression: binary -> struct(format, width, height, sum_r,
  * sum_g, sum_b) via FULL pixel decode — the real feature-extraction
  * kernel. Same codegen shape as the header decoder: one static call.
  */
case class DecodeImageStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ImageCodec.StatsSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_stats"

  override def nullSafeEval(input: Any): Any =
    ImageCodec.decodeStatsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.ImageCodec.decodeStatsRow($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodeImageStats =
    copy(child = newChild)
}
