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

  /** PCM BYTE ceiling for FULL-sample fingerprinting: a header claiming
    * more is refused before allocation (the [[ImageCodec.MaxDecodePixels]]
    * decode-bomb discipline on the audio plane). A byte bound, not a
    * frame bound (r15 self-review): once 16-bit PCM was accepted, a
    * frame-count cap would have silently doubled the worst-case
    * allocation — the guard must bound frames × frame size.
    */
  val MaxFingerprintBytes: Long = 64L * 1024 * 1024

  /** 32-bit windowed-energy fingerprint over the FULL decoded PCM — the
    * audio twin of [[ImageCodec.dhashRow]]: split the clip into 33 windows
    * (floor boundaries w·N/33 — when 33 | N these are exact equal windows,
    * the closed-form-oracle shape), sum each window's samples, set bit w
    * iff sum(w+1) > sum(w). Like dHash it sees only the SIGN of
    * adjacent-window differences, so it is volume-offset-blind by design,
    * and a single-sample edit perturbs one window's sum — at most the 2
    * comparisons that touch it flip, so near-clones sit at hamming ≤ 2
    * while unrelated clips are ~16 apart (of 32).
    *
    * Two PCM shapes are accepted, both mono (r14 verdict #2 lifted the
    * 8-bit-only guard): 8-bit UNSIGNED (the WAV convention; summed as
    * 0..255) and 16-bit SIGNED (the real-world default; summed as signed
    * shorts decoded per the container's declared byte order, so the SAME
    * samples written as little-endian WAV and big-endian AIFF fingerprint
    * identically — the hash stays container-independent). The two widths
    * deliberately do NOT alias: they are different quantizations of
    * different sample domains, and the gates pin same-seed 8↔16 pairs
    * far apart. Everything else — other encodings (ULAW's log-compressed
    * bytes, 8-bit PCM_SIGNED's sign-wrapped ones), stereo, under-33-frame
    * clips, byte-bomb-guarded PCM sizes, undecodable bytes — returns null
    * and routes to quarantine / an external fingerprinter at ingest.
    * Map-side, bytes-decoded cost paid once at ingest.
    */
  /** Decoded mono PCM with a width/endianness-aware sample reader — the
    * ONE decode rule under [[fingerprintRow]] and
    * [[segmentFingerprintsRow]] (the guards cannot drift between the
    * global and segment fingerprints).
    */
  private final case class MonoPcm(n: Int, wide: Boolean, big: Boolean,
      pcm: Array[Byte]) {
    /** Sample x: unsigned byte (narrow) or signed short per the declared
      * byte order (wide — the high byte is sign-extended by the Byte→Int
      * promotion before the shift).
      */
    def sample(x: Int): Int =
      if (wide) {
        val lo = 2 * x
        if (big) (pcm(lo) << 8) | (pcm(lo + 1) & 0xFF)
        else (pcm(lo + 1) << 8) | (pcm(lo) & 0xFF)
      } else pcm(x) & 0xFF
  }

  /** Null unless the bytes decode to a supported mono PCM shape:
    * encoding AND width must pair up — 8-bit must be PCM_UNSIGNED (8-bit
    * AIFF is PCM_SIGNED with sign-wrapped bytes; fingerprinting those as
    * unsigned would make the hash CONTAINER-dependent) and 16-bit must
    * be PCM_SIGNED (the WAV/AIFF 16-bit convention). Bomb-guarded before
    * allocation.
    */
  private def decodeMonoPcm(bytes: Array[Byte]): MonoPcm = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val frames = ais.getFrameLength
        val bits = f.getSampleSizeInBits
        val wide = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED && bits == 16
        val narrow = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
        if (!(wide || narrow) || f.getChannels != 1 || frames < 1 ||
            frames * (if (wide) 2L else 1L) > MaxFingerprintBytes) null
        else {
          val n = frames.toInt
          val pcm = ais.readAllBytes()
          if (pcm.length < n * (if (wide) 2 else 1)) null
          else MonoPcm(n, wide, f.isBigEndian, pcm)
        }
      } finally ais.close()
    } catch { case _: Exception => null } // no reader / corrupt bytes
  }

  /** The 32-bit windowed-energy pack over samples [start, start + len):
    * 33 floor-boundary windows (w·len/33 — exact equal windows when
    * 33 | len), bit w set iff sum(w+1) > sum(w). Shared by the global
    * fingerprint (start 0, len n) and the per-segment fingerprints
    * (start s·L, len L) so the window formula cannot drift.
    */
  private def packWindows(p: MonoPcm, start: Int, len: Int): Long =
    packWindowsN(p, start, len, 33)

  /** [[packWindows]] generalized over the window count: nWin floor-boundary
    * window sums → nWin − 1 adjacent-sign bits. 33 windows is the classic
    * 32-bit fingerprint; 65 windows is the WIDE 64-bit segment fingerprint
    * (r17 — the band-space widening the contract-18b census priced: a
    * 64-bit hash splits into 4×16-bit bands, a 262,144-key space, so
    * bulk-regime per-file blooms stay selective where the 32-bit hash's
    * 1,024-key space saturates them). ONE window formula for every width.
    */
  private def packWindowsN(p: MonoPcm, start: Int, len: Int, nWin: Int): Long = {
    val sums = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      // boundary arithmetic in Long: (w+1)*len overflows Int from ~65M
      // samples, INSIDE the 64Mi guard's admitted range — negative
      // boundaries would zero the last window's sum
      val hi = start + ((w + 1).toLong * len / nWin).toInt
      var x = start + (w.toLong * len / nWin).toInt
      var acc = 0L
      while (x < hi) { acc += p.sample(x); x += 1 }
      sums(w) = acc
      w += 1
    }
    var h = 0L
    w = 0
    while (w < nWin - 1) {
      if (sums(w + 1) > sums(w)) h |= 1L << w
      w += 1
    }
    h
  }

  def fingerprintRow(bytes: Array[Byte]): java.lang.Long = {
    val p = decodeMonoPcm(bytes)
    if (p == null || p.n < 33) null
    else java.lang.Long.valueOf(packWindows(p, 0, p.n))
  }

  /** Per-segment hash contract for [[segmentFingerprintsRow]]. */
  val SegmentHashSchema: StructType = StructType(Seq(
    StructField("seg", IntegerType),
    StructField("h", LongType)))

  /** Per-SEGMENT windowed-energy fingerprints — the OFFSET-TOLERANT audio
    * fingerprint (r15, beyond the r14 asks): the clip splits into fixed
    * `segLen`-sample segments, each packed by the SAME 33-window rule as
    * the global fingerprint, and the clip's identity becomes the hash
    * SEQUENCE — exactly the video per-frame shape, so a clone with
    * leading/trailing whole segments cut is the bounded-containment
    * problem the trim machinery already solves on the segment axis (a
    * segment-aligned trim shifts the sequence without perturbing any
    * surviving segment's hash; sub-segment offsets need an overlapping/
    * aligned front-end and stay out of scope, documented). `segLen` must
    * be a positive multiple of 33 (exact equal windows — the closed-form
    * oracle shape); the trailing partial segment is dropped (its window
    * sums would depend on the trim remainder, breaking suffix identity).
    * Null for undecodable/unsupported bytes or clips under one segment.
    * Same decode rule and widths as [[fingerprintRow]] (shared
    * [[decodeMonoPcm]]). Map-side, bytes-decoded cost paid once at
    * ingest — downstream dedup joins carry (seg, BIGINT) rows only.
    */
  /** `phase` starts the segment grid at sample `phase` instead of 0 (the
    * SUB-SEGMENT offset tool, r15 verdict #4): fingerprinting a stream on
    * BOTH the 0-phase and the segLen/2-phase grids makes any trim that is
    * a multiple of segLen/2 land segment-aligned on one of them — the
    * containment rule then pairs the trimmed clone against the matching
    * phase with zero perturbed segments. Residual (< segLen/2, off-grid)
    * offsets still shift every window and stay a front-end's job,
    * documented at the gate. Samples [0, phase) and the trailing partial
    * segment are dropped (partial windows would depend on the remainder).
    */
  def segmentFingerprintsRow(bytes: Array[Byte], segLen: Int,
      phase: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (segLen < 33 || segLen % 33 != 0 || phase < 0 || phase >= segLen) return null
    val p = decodeMonoPcm(bytes)
    if (p == null || p.n - phase < segLen) return null
    val nSegs = (p.n - phase) / segLen
    val out = new Array[Any](nSegs)
    var s = 0
    while (s < nSegs) {
      out(s) = new GenericInternalRow(
        Array[Any](s, packWindows(p, phase + s * segLen, segLen)))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The phase-0 grid (the original single-grid surface). */
  def segmentFingerprintsRow(bytes: Array[Byte],
      segLen: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    segmentFingerprintsRow(bytes, segLen, 0)

  /** WIDE (64-bit) per-segment fingerprints (r17 — the contract-18b
    * band-space fix): each segment packs 65 windows into 64 adjacent-sign
    * bits via the SAME window formula ([[packWindowsN]]), so a 4×16-bit
    * banding gets a 262,144-key space and bulk-regime per-file blooms stay
    * selective where the 32-bit hash's 1,024-key ceiling saturates them.
    * `segLen` must be a positive multiple of 65 (exact 5-sample windows at
    * the canonical 325 — the closed-form-oracle shape); the narrow kernel
    * keeps its 33-window contract untouched, so every existing gate and
    * oracle is unaffected. Edits still flip ≤ 2 bits of one segment
    * (one window sum perturbed → its two comparisons).
    */
  def segmentFingerprintsWideRow(bytes: Array[Byte],
      segLen: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (segLen < 65 || segLen % 65 != 0) return null
    val p = decodeMonoPcm(bytes)
    if (p == null || p.n < segLen) return null
    val nSegs = p.n / segLen
    val out = new Array[Any](nSegs)
    var s = 0
    while (s < nSegs) {
      out(s) = new GenericInternalRow(
        Array[Any](s, packWindowsN(p, s * segLen, segLen, 65)))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ONSET-ALIGNED per-segment fingerprints (r16 verdict #4 — the
    * energy-alignment front-end for sub-half-grid trims): the segment grid
    * is anchored at the signal's ONSET — the first sample deviating from
    * the leading value by more than `tol` — instead of at index 0, so the
    * grid is a function of CONTENT, not of container position. A trim
    * that cuts only leading silence (or any uniform lead) moves the onset
    * by exactly the trimmed length and every segment boundary lands on
    * the SAME content positions: arbitrary off-grid lead trims (and any
    * trailing trim, which only drops tail segments) pair at hamming 0
    * through the unchanged containment rule. Trims that cut INTO the
    * signal body move the anchor with them and fall back to the
    * dual-phase 165-sample floor — the re-documented residual. Integer
    * arithmetic end to end, so the oracle recomputes the onset and every
    * window sum in closed form. Null when the signal never deviates
    * (nothing alignable) or no full segment follows the onset.
    */
  def segmentFingerprintsOnsetRow(bytes: Array[Byte], segLen: Int,
      tol: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (segLen < 33 || segLen % 33 != 0 || tol < 0) return null
    val p = decodeMonoPcm(bytes)
    if (p == null) return null
    val lead = p.sample(0)
    var onset = 1
    while (onset < p.n && math.abs(p.sample(onset) - lead) <= tol) onset += 1
    if (onset >= p.n || p.n - onset < segLen) return null
    val nSegs = (p.n - onset) / segLen
    val out = new Array[Any](nSegs)
    var s = 0
    while (s < nSegs) {
      out(s) = new GenericInternalRow(
        Array[Any](s, packWindows(p, onset + s * segLen, segLen)))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Fixture-side SEEDED 8-bit mono WAV with an optional planted
    * single-sample edit — the near-clone generator for audio-dedup gates,
    * the [[ImageCodec.encodeImageVariant]] discipline on the audio plane.
    * Sample n = (n·(13 + 7·seed) + 31) mod 256 (the seed scales the STEP:
    * the fingerprint is offset-blind, so an offset seed would alias every
    * clip); the edit replaces sample `editAt` with (s + 128) mod 256.
    * 8-bit unsigned PCM survives the WAV container byte-exactly, so every
    * decoded sample — and the fingerprint — has a closed form DuckDB can
    * evaluate without an audio library.
    */
  /** `sampleBase` renders samples [sampleBase, sampleBase + frames) of the
    * seed's infinite sample sequence instead of [0, frames) — the
    * TRIMMED-CLONE generator on the audio plane (r15, the
    * [[ImageCodec.encodeAnimatedGifVariant]] frameBase discipline): a clip
    * encoded with (frames − t·L, sampleBase = t0·L) is the base clip with
    * t0·L leading and (t − t0)·L trailing samples cut, sample-for-sample
    * byte-identical to the base's suffix on decode.
    */
  /** Fixture-side LEAD-SILENCE variant for the onset-aligned family: `lead`
    * samples of exact silence (128 — the 8-bit unsigned midpoint) followed
    * by samples [bodyBase, bodyBase + body) of the seed's gradient, with an
    * optional planted single-sample edit at BODY index `editAtBody`. The
    * gradient's first value is 31 (|31 − 128| = 97 clears any small onset
    * tolerance), so the onset sits exactly at index `lead` and every
    * decoded sample — and the onset itself — has a closed form.
    */
  def encodeAudioVariantLead(lead: Int, body: Int, seed: Int,
      editAtBody: Int = -1, bodyBase: Int = 0): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 8, 1, false, false)
    val pcm = new Array[Byte](lead + body)
    var x = 0
    while (x < lead) { pcm(x) = 128.toByte; x += 1 }
    var n = 0
    while (n < body) {
      val s0 = (((n.toLong + bodyBase) * (13 + 7 * seed) + 31) % 256).toInt
      pcm(lead + n) = (if (n == editAtBody) (s0 + 128) % 256 else s0).toByte
      n += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, (lead + body).toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def encodeAudioVariant(frames: Int, seed: Int, editAt: Int = -1,
      sampleBase: Int = 0): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 8, 1, false, false)
    val pcm = new Array[Byte](frames)
    var n = 0
    while (n < frames) {
      // mod in Long BEFORE narrowing: the product overflows Int for large
      // seeds/bases and a negative % would diverge from the oracle's
      val s0 = (((n.toLong + sampleBase) * (13 + 7 * seed) + 31) % 256).toInt
      pcm(n) = (if (n == editAt) (s0 + 128) % 256 else s0).toByte
      n += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Fixture-side SEEDED 16-bit signed mono clip with an optional planted
    * single-sample edit — [[encodeAudioVariant]]'s discipline on the wide
    * PCM plane (r14 verdict #2). Sample n derives from the unsigned
    * intermediate u(n) = (n·(13 + 7·seed)·193 + 31) mod 65536 as s = u −
    * 32768; the edit replaces u with (u + 32768) mod 65536 (the maximal
    * wraparound-safe half-range flip, scaled to 16 bits). The ·193 spread
    * keeps mod-2^16 wraparounds frequent so different seeds hash far
    * apart (the step-scaling rationale on the 8-bit encoder). 16-bit
    * signed PCM survives both containers byte-exactly — WAV stores it
    * little-endian, AIFF big-endian, SAME samples — so the cross-container
    * fingerprint identity is testable and every decoded sample has a
    * closed form DuckDB evaluates without an audio library.
    */
  def encodeAudioVariant16(format: String, frames: Int, seed: Int,
      editAt: Int = -1): Array[Byte] = {
    val (fileType, big) = format.toLowerCase match {
      case "wav" => (AudioFileFormat.Type.WAVE, false)
      case "aiff" => (AudioFileFormat.Type.AIFF, true)
      case other => sys.error(s"no 16-bit fixture writer for audio format $other")
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, big)
    val pcm = new Array[Byte](frames * 2)
    var n = 0
    while (n < frames) {
      val u0 = ((n.toLong * (13 + 7 * seed) * 193 + 31) % 65536).toInt
      val u = if (n == editAt) (u0 + 32768) % 65536 else u0
      val s = u - 32768
      if (big) { pcm(2 * n) = (s >> 8).toByte; pcm(2 * n + 1) = s.toByte }
      else { pcm(2 * n) = s.toByte; pcm(2 * n + 1) = (s >> 8).toByte }
      n += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
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

/** Catalyst expression: binary -> 32-bit windowed-energy audio fingerprint
  * (BIGINT), null for undecodable or unsupported inputs. One static call in
  * codegen, the [[ImageDhash]] shape on the audio plane.
  */
case class AudioFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_fingerprint"

  override def nullSafeEval(input: Any): Any =
    AudioCodec.fingerprintRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val boxed = ctx.freshName("afp")
      s"""
      java.lang.Long $boxed = graft.operators.AudioCodec.fingerprintRow($b);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.longValue(); }
    """
    })

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
    copy(child = newChild)
}

/** Catalyst expression: binary -> array<struct<seg int, h bigint>> of
  * per-segment windowed-energy fingerprints, null for undecodable or
  * under-one-segment inputs — the [[graft.operators.FrameDhashes]] shape
  * on the audio plane. One static call in codegen.
  */
case class AudioSegmentFingerprints(child: Expression, segLen: Int,
    phase: Int = 0) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(AudioCodec.SegmentHashSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_segments"

  override def nullSafeEval(input: Any): Any =
    AudioCodec.segmentFingerprintsRow(input.asInstanceOf[Array[Byte]], segLen, phase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.AudioCodec.segmentFingerprintsRow($b, $segLen, $phase);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioSegmentFingerprints =
    copy(child = newChild)
}

/** Wide (64-bit, 65-window) per-segment fingerprints
  * ([[AudioCodec.segmentFingerprintsWideRow]]) — codegen'd like its
  * 32-bit sibling.
  */
case class AudioSegmentFingerprintsWide(child: Expression, segLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(AudioCodec.SegmentHashSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_segments_wide"

  override def nullSafeEval(input: Any): Any =
    AudioCodec.segmentFingerprintsWideRow(input.asInstanceOf[Array[Byte]], segLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.AudioCodec.segmentFingerprintsWideRow($b, $segLen);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioSegmentFingerprintsWide =
    copy(child = newChild)
}

/** Onset-aligned per-segment fingerprints
  * ([[AudioCodec.segmentFingerprintsOnsetRow]]) — codegen'd like its
  * fixed-grid sibling; `tol` is the onset deviation threshold.
  */
case class AudioSegmentFingerprintsOnset(child: Expression, segLen: Int,
    tol: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(AudioCodec.SegmentHashSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_segments_onset"

  override def nullSafeEval(input: Any): Any =
    AudioCodec.segmentFingerprintsOnsetRow(input.asInstanceOf[Array[Byte]], segLen, tol)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.operators.AudioCodec.segmentFingerprintsOnsetRow($b, $segLen, $tol);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioSegmentFingerprintsOnset =
    copy(child = newChild)
}
