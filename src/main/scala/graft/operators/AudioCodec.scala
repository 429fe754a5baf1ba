package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio decode for the multimodal pipeline (SURVEY §2.9 X5), the
  * audio sibling of [[ImageCodec]]: the JDK's built-in `javax.sound.sampled`
  * file readers parse WAV/AIFF/AU container headers (java.desktop — no
  * external libraries). Header-only: `AudioSystem.getAudioFileFormat` reads
  * the format chunk without decoding sample data, so at 100 TB this is a
  * map-side metadata extraction whose cost is bytes-sniffed, not
  * bytes-decoded. Containers with no installed reader (mp3/ogg/mp4 — the
  * JDK ships none) return null and route to [[Multimodal.stubDecode]] or an
  * external codec service, the same declared-stub path video takes.
  */
object AudioCodec {

  /** Decoded header contract: container + PCM shape + stream length. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("frames", LongType)))

  /** Header-only decode; null when no installed reader claims the bytes.
    * Called from both the interpreted path and generated code (static
    * forwarder), once per row. ByteArrayInputStream supports mark/reset,
    * which the JDK readers require for format probing.
    */
  def decodeHeaderRow(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val aff: AudioFileFormat =
        AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val f = aff.getFormat
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(aff.getType.getExtension.toLowerCase),
        f.getSampleRate.round,
        f.getChannels,
        f.getSampleSizeInBits,
        aff.getFrameLength.toLong))
    } catch { case _: Exception => null } // no reader / corrupt header
  }

  /** Fixture-side encoder (tests + gate queries): deterministic 16-bit PCM
    * (a per-frame triangle ramp) written through the same JDK writer family
    * the decoder reads. Formats: "wav", "aiff", "au".
    */
  def encodeAudio(format: String, sampleRate: Int, channels: Int,
                  frames: Int): Array[Byte] = {
    val fileType = format.toLowerCase match {
      case "wav" => AudioFileFormat.Type.WAVE
      case "aiff" => AudioFileFormat.Type.AIFF
      case "au" => AudioFileFormat.Type.AU
      case other => sys.error(s"no JDK writer for audio format $other")
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, true)
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < pcm.length) { pcm(i) = ((i * 7) & 0x7F).toByte; i += 1 }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }
}

/** Catalyst expression: binary -> struct(format, sample_rate, channels,
  * bits, frames), null for undecodable bytes. Codegen-friendly: one static
  * call, stays inside whole-stage codegen spans (no UDF).
  */
case class DecodeAudioHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = AudioCodec.DecodedSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode_audio"

  override def nullSafeEval(input: Any): Any =
    AudioCodec.decodeHeaderRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.AudioCodec.decodeHeaderRow($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodeAudioHeader =
    copy(child = newChild)
}
