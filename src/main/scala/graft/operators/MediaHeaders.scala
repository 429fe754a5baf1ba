package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.ByteArrayOutputStream

/** Pure-byte header parsing for the two containers the JDK ships no codec
  * for: MPEG audio (mp3) and MP4 (SURVEY §2.9 X5 — the last multimodal
  * stubs). No codec is NEEDED for metadata extraction: an MPEG frame
  * header is 4 bytes of public-spec bitfields (version / layer / bitrate
  * index / sample-rate index / channel mode), and an MP4 file is a walkable
  * tree of length-prefixed boxes (ftyp brand, moov/mvhd timescale+duration,
  * trak/tkhd track dimensions). Both parsers are deterministic integer
  * arithmetic over byte offsets — the same codegen'd-static-call shape as
  * [[ImageCodec.DecodeImageHeader]] — so at 100 TB this is a map-side
  * metadata sniff whose cost is bytes-read (a few hundred per blob), not
  * bytes-decoded. [[Multimodal.stubDecode]] remains only for operations
  * that genuinely require the (absent) codec: pixel/sample decode of these
  * containers.
  */
object MediaHeaders {

  // ---------------------------------------------------------------- MP3

  /** Decoded MPEG audio frame-header contract. `frame_bytes` is the
    * spec-defined frame length (so a scanner could stride frame-to-frame
    * without decoding); `version` is "mpeg1" / "mpeg2" / "mpeg2.5".
    */
  val Mp3Schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("layer", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("frame_bytes", IntegerType)))

  // Public bitrate tables (kbps), index 1..14; 0 = "free" and 15 = "bad"
  // are refused (a real scanner cannot stride on a free-format stream
  // without a second sync search). MPEG2 and MPEG2.5 share the low table;
  // MPEG2 Layer II and III share one table.
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  // Sample-rate tables, index 0..2 (3 = reserved).
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Syncsafe 28-bit size of an ID3v2 tag (each byte carries 7 bits). */
  private def id3Size(b: Array[Byte]): Int =
    ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) | ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)

  /** Header-only MPEG audio parse; null when the bytes carry no valid
    * frame header at the expected position (after any leading ID3v2 tag).
    * Called from both the interpreted path and generated code, once per
    * row. Strict single-position sync: a metadata extractor that scanned
    * forward for a sync word would happily "decode" arbitrary binary —
    * refusing non-frame-aligned bytes is what makes the null path a
    * meaningful undecodable signal.
    */
  def decodeMp3Row(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 4) return null
    var off = 0
    // Skip one leading ID3v2 tag: "ID3" + ver(2) + flags(1) + syncsafe(4).
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = id3Size(bytes)
      if (sz < 0 || 10L + sz + 4 > bytes.length) return null
      off = 10 + sz
    }
    val b0 = bytes(off) & 0xFF; val b1 = bytes(off + 1) & 0xFF
    val b2 = bytes(off + 2) & 0xFF; val b3 = bytes(off + 3) & 0xFF
    // 11-bit sync: 0xFF + top 3 bits of the next byte.
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return null
    val versionBits = (b1 >> 3) & 3 // 0 = 2.5, 1 = reserved, 2 = MPEG2, 3 = MPEG1
    val layerBits = (b1 >> 1) & 3 // 0 = reserved, 1 = III, 2 = II, 3 = I
    val brIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    val padding = (b2 >> 1) & 1
    val channelMode = (b3 >> 6) & 3 // 3 = mono
    if (versionBits == 1 || layerBits == 0 || srIdx == 3) return null
    if (brIdx == 0 || brIdx == 15) return null // free / bad
    val layer = 4 - layerBits // 1, 2, 3
    val version = versionBits match {
      case 3 => "mpeg1"
      case 2 => "mpeg2"
      case _ => "mpeg2.5"
    }
    val bitrate = (versionBits, layer) match {
      case (3, 1) => BrV1L1(brIdx)
      case (3, 2) => BrV1L2(brIdx)
      case (3, 3) => BrV1L3(brIdx)
      case (_, 1) => BrV2L1(brIdx)
      case _ => BrV2L23(brIdx)
    }
    val sampleRate = versionBits match {
      case 3 => SrV1(srIdx)
      case 2 => SrV2(srIdx)
      case _ => SrV25(srIdx)
    }
    val channels = if (channelMode == 3) 1 else 2
    // Spec frame lengths: Layer I counts 4-byte slots; Layers II/III count
    // bytes, with 72 (not 144) samples-per-bit for MPEG2/2.5 Layer III.
    val frameBytes = layer match {
      case 1 => (12 * bitrate * 1000 / sampleRate + padding) * 4
      case 2 => 144 * bitrate * 1000 / sampleRate + padding
      case _ =>
        val coef = if (versionBits == 3) 144 else 72
        coef * bitrate * 1000 / sampleRate + padding
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(version), layer, bitrate, sampleRate, channels, frameBytes))
  }

  /** Fixture-side encoder (tests + gate queries): one hand-assembled MPEG
    * frame — optional ID3v2 tag, the 4 header bytes, and a deterministic
    * filler payload out to the spec frame length. Headers are pure
    * bitfields, so the encoding is closed-form; the decoder reads back
    * exactly what the table lookup prescribes.
    */
  def encodeMp3(versionBits: Int, layerBits: Int, bitrateIdx: Int, srIdx: Int,
                channelMode: Int, padding: Int, id3Bytes: Int): Array[Byte] = {
    require(versionBits != 1 && layerBits != 0 && srIdx != 3, "reserved field")
    val out = new ByteArrayOutputStream()
    if (id3Bytes >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3Bytes >> 21) & 0x7F); out.write((id3Bytes >> 14) & 0x7F)
      out.write((id3Bytes >> 7) & 0x7F); out.write(id3Bytes & 0x7F)
      var i = 0
      while (i < id3Bytes) { out.write((i * 3) & 0x7F); i += 1 }
    }
    out.write(0xFF)
    out.write(0xE0 | (versionBits << 3) | (layerBits << 1) | 1) // CRC-free
    out.write((bitrateIdx << 4) | (srIdx << 2) | (padding << 1))
    out.write(channelMode << 6)
    // Deterministic filler to the frame length claimed by the header (the
    // parser never reads it; a frame-striding scanner would).
    val hdr = decodeMp3Row(out.toByteArray)
    if (hdr != null) {
      val fill = hdr.getInt(5) - 4
      var i = 0
      while (i < fill) { out.write((i * 5) & 0x7F); i += 1 }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- MP4

  /** Decoded MP4 contract: ftyp major brand, movie timescale + duration
    * (mvhd), first video-sized track's dimensions (tkhd 16.16 fixed-point,
    * integer part), and the track count.
    */
  val Mp4Schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_tracks", IntegerType)))

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def be64(b: Array[Byte], off: Int): Long = (be32(b, off) << 32) | be32(b, off + 4)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "ISO-8859-1")

  /** MP4 box walk; null when the bytes are not a box tree with an ftyp and
    * a moov/mvhd. Handles 64-bit largesize (size == 1) and to-end boxes
    * (size == 0); refuses malformed sizes instead of scanning forward —
    * the same strictness argument as the mp3 parser.
    */
  def decodeMp4Row(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 16) return null
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var width = -1
    var height = -1
    var nTracks = 0
    // Walk children of [start, end); returns false on malformed structure.
    def walk(start: Int, end: Int, depth: Int, parent: String): Boolean = {
      var off = start
      while (off < end) {
        if (off + 8 > end) return false
        var size = be32(bytes, off)
        val typ = boxType(bytes, off)
        var hdr = 8
        if (size == 1) {
          if (off + 16 > end) return false
          size = be64(bytes, off + 8)
          hdr = 16
        } else if (size == 0) size = end - off // box extends to container end
        if (size < hdr || off + size > end) return false
        val payload = off + hdr
        val payloadEnd = off + size.toInt
        (parent, typ) match {
          case ("", "ftyp") =>
            if (payloadEnd - payload < 8) return false
            brand = boxType(bytes, payload - 4) // major brand = first 4 payload bytes
          case ("", "moov") =>
            if (!walk(payload, payloadEnd, depth + 1, "moov")) return false
          case ("moov", "mvhd") =>
            if (payloadEnd - payload < 4) return false
            val v = bytes(payload) & 0xFF
            if (v == 1) {
              if (payloadEnd - payload < 32) return false
              timescale = be32(bytes, payload + 20)
              duration = be64(bytes, payload + 24)
            } else {
              if (payloadEnd - payload < 20) return false
              timescale = be32(bytes, payload + 12)
              duration = be32(bytes, payload + 16)
            }
          case ("moov", "trak") =>
            nTracks += 1
            if (!walk(payload, payloadEnd, depth + 1, "trak")) return false
          case ("trak", "tkhd") =>
            // guard the version byte itself: an empty-payload tkhd must not
            // read past its box (mid-tree it would read the NEXT box's first
            // byte as the version; as the last box it would throw)
            if (payloadEnd - payload >= 1) {
              val v = bytes(payload) & 0xFF
              val dimOff = if (v == 1) 88 else 76 // offset of width within payload
              if (payloadEnd - payload >= dimOff + 8) {
                val w = (be32(bytes, payload + dimOff) >> 16).toInt
                val h = (be32(bytes, payload + dimOff + 4) >> 16).toInt
                if (width < 0 && (w > 0 || h > 0)) { width = w; height = h }
              }
            }
          case _ => // unknown box: skip (forward compatibility is the format's design)
        }
        off += size.toInt
      }
      off == end
    }
    try {
      if (!walk(0, bytes.length, 0, "")) return null
      if (brand == null || timescale < 0) return null
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(brand), timescale, duration,
        if (width >= 0) width else null, if (width >= 0) height else null,
        nTracks))
    } catch { case _: Exception => null }
  }

  /** Fixture-side MP4 assembler: ftyp(brand) + moov(mvhd(timescale,
    * duration) + one tkhd-bearing trak per (w, h) pair). Box sizes are
    * closed-form, so the bytes are deterministic and the decoder's answer
    * is the constructor's arguments.
    */
  def encodeMp4(brand: String, timescale: Long, duration: Long,
                tracks: Seq[(Int, Int)]): Array[Byte] = {
    require(brand.length == 4, "brand is 4 chars")
    // mvhd is emitted as v0 and tkhd duration via w32: values past 2^32
    // would silently truncate and break the decode(encode(x)) == x fixture
    // invariant — refuse loudly instead
    require(timescale >= 0 && timescale <= 0xFFFFFFFFL,
      s"timescale $timescale does not fit mvhd v0's 32 bits")
    require(duration >= 0 && duration <= 0xFFFFFFFFL,
      s"duration $duration does not fit mvhd v0's 32 bits")
    // tkhd dims are 16.16 fixed-point: the integer part has 16 bits
    tracks.foreach { case (w, h) =>
      require(w >= 0 && w <= 0xFFFF && h >= 0 && h <= 0xFFFF,
        s"track dims ${w}x$h do not fit tkhd's 16.16 fixed-point")
    }
    val out = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def wtype(t: String): Unit = t.foreach(c => out.write(c.toInt))
    // ftyp: major brand + minor version + one compatible brand
    w32(20); wtype("ftyp"); wtype(brand); w32(0); wtype(brand)
    val tkhdSize = 92
    val trakSize = 8 + tkhdSize
    val mvhdSize = 108
    w32(8L + mvhdSize + tracks.size * trakSize); wtype("moov")
    // mvhd v0
    w32(mvhdSize); wtype("mvhd")
    w32(0) // version/flags
    w32(0); w32(0) // creation/modification
    w32(timescale); w32(duration)
    w32(0x00010000L); w32(0x01000000L) // rate 1.0, volume 1.0 + reserved
    w32(0); w32(0) // reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(w32) // unity matrix
    (0 until 6).foreach(_ => w32(0)) // pre_defined
    w32(tracks.size + 1L) // next_track_ID
    tracks.zipWithIndex.foreach { case ((tw, th), i) =>
      w32(trakSize); wtype("trak")
      w32(tkhdSize); wtype("tkhd")
      w32(7) // version 0, flags: enabled | in-movie | in-preview
      w32(0); w32(0) // creation/modification
      w32(i + 1L) // track_ID
      w32(0) // reserved
      w32(duration)
      w32(0); w32(0) // reserved
      w32(0) // layer + alternate_group
      w32(0) // volume + reserved
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(w32)
      w32(tw.toLong << 16); w32(th.toLong << 16) // 16.16 fixed
    }
    out.toByteArray
  }
}

/** Catalyst expression: binary -> struct(version, layer, bitrate_kbps,
  * sample_rate, channels, frame_bytes), null for bytes that carry no valid
  * MPEG frame header. One static call; stays inside whole-stage codegen.
  */
case class DecodeMp3Header(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = MediaHeaders.Mp3Schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode_mp3"
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.decodeMp3Row(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.MediaHeaders.decodeMp3Row($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): DecodeMp3Header =
    copy(child = newChild)
}

/** Catalyst expression: binary -> struct(brand, timescale, duration, width,
  * height, n_tracks), null for bytes that are not an ftyp+moov box tree.
  */
case class DecodeMp4Header(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = MediaHeaders.Mp4Schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode_mp4"
  override def nullSafeEval(input: Any): Any =
    MediaHeaders.decodeMp4Row(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.MediaHeaders.decodeMp4Row($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): DecodeMp4Header =
    copy(child = newChild)
}
