package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column pipeline (SURVEY.md §2.9 X5): images/audio/video travel
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract steps are exchangeable batch transforms over those
  * columns.
  *
  * IMAGE decode is REAL: [[decodeImage]] parses PNG/BMP/GIF/JPEG headers
  * through the JDK's `javax.imageio` ([[ImageCodec]]) — dimensions and
  * channel count without pixel decode. AUDIO container decode is REAL for
  * WAV/AIFF/AU: [[decodeAudio]] parses headers through the JDK's
  * `javax.sound.sampled` ([[AudioCodec]]) — sample rate / channels / bit
  * depth / frame count without sample decode. MP3 and MP4 header decode is
  * REAL too — [[decodeMp3]]/[[decodeMp4]] parse the public-spec byte
  * layouts directly ([[MediaHeaders]]), no codec required. Only operations
  * that genuinely need an absent codec (mp3/ogg SAMPLE decode, mp4/webm
  * FRAME decode) stay behind [[stubDecode]], a deterministic fake
  * with the real pipeline shape: same schema contract, same per-row batch
  * transform position a codec would occupy. Swapping one in means replacing ONE
  * Column expression; every upstream/downstream stage — blob storage in
  * Graft tables (binary is a first-class type, SURVEY §1.3), partitioning,
  * pruning, aggregation — is unchanged.
  */
object Multimodal {

  /** REAL image-header decode: binary -> struct(format, width, height,
    * channels), null when no JDK reader claims the bytes (route those to
    * [[stubDecode]] or an external codec). Header-only — cost is per-blob
    * metadata sniffing, not pixel decode; stays in whole-stage codegen.
    */
  def decodeImage(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(DecodeImageHeader(GraftSqlShim.expression(blob)))
  }

  /** REAL audio-header decode: binary -> struct(format, sample_rate,
    * channels, bits, frames), null when no JDK reader claims the bytes
    * (mp3 routes to [[decodeMp3]]; ogg to [[stubDecode]] or an external
    * codec). Header-only — format-chunk parse, no sample decode; stays in
    * whole-stage codegen.
    */
  def decodeAudio(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(DecodeAudioHeader(GraftSqlShim.expression(blob)))
  }

  /** REAL mp3 header decode — pure byte parsing, no codec needed: binary ->
    * struct(version, layer, bitrate_kbps, sample_rate, channels,
    * frame_bytes) from the MPEG frame-header bitfields (after any leading
    * ID3v2 tag), null for bytes with no valid frame header
    * ([[MediaHeaders.decodeMp3Row]]). Sample DECODE of mp3 still requires
    * a codec the JDK lacks — that step alone stays on [[stubDecode]].
    */
  def decodeMp3(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(DecodeMp3Header(GraftSqlShim.expression(blob)))
  }

  /** REAL mp4 header decode — pure byte parsing, no codec needed: binary ->
    * struct(brand, timescale, duration, width, height, n_tracks) from the
    * ftyp / moov / mvhd / trak / tkhd box walk, null for bytes that are
    * not an MP4 box tree ([[MediaHeaders.decodeMp4Row]]). Frame DECODE of
    * mp4/webm still requires a codec the JDK lacks — that step alone stays
    * on [[stubDecode]]/[[stubFrameSample]].
    */
  def decodeMp4(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(DecodeMp4Header(GraftSqlShim.expression(blob)))
  }

  /** REAL feature extraction: FULL pixel decode -> per-channel integer
    * sums (means = sums / (width*height) in caller-chosen precision; the
    * sums themselves are exact BIGINTs, so parity is bit-exact). This is
    * the step that pays bytes-decoded cost — the honest shape of feature
    * extraction at 100 TB; it stays map-side and shuffles nothing.
    */
  def imageStats(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(DecodeImageStats(GraftSqlShim.expression(blob)))
  }

  /** REAL resize: binary -> struct(width, height, sum_r, sum_g, sum_b,
    * blob) — nearest-neighbor downscale to `maxWidth` (aspect-preserving),
    * re-encoded as lossless PNG. Nearest-neighbor = integer pixel picks,
    * so the output is deterministic (interpolating kernels are
    * implementation-defined — the reason resize was a declared stub until
    * this variant). Null when no JDK reader claims the bytes.
    */
  def resizeImage(blob: Column, maxWidth: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(ResizeImage(GraftSqlShim.expression(blob), maxWidth))
  }

  /** REAL perceptual hash: binary -> 56-bit dHash (BIGINT), null for
    * undecodable or under-8px inputs ([[ImageCodec.dhashRow]]). The image
    * twin of the text MinHash signature: computed map-side at ingest,
    * banded for candidate pairs, verified by hamming distance — image
    * near-dup dedup without ever joining on pixels.
    */
  def imageDhash(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(ImageDhash(GraftSqlShim.expression(blob)))
  }

  /** REAL audio fingerprint: binary -> 32-bit windowed-energy hash
    * (BIGINT), null for undecodable/unsupported inputs
    * ([[AudioCodec.fingerprintRow]]). The audio twin of [[imageDhash]]:
    * computed map-side at ingest, banded for candidate pairs, verified by
    * hamming distance — audio near-dup dedup without shuffling samples.
    */
  def audioFingerprint(blob: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(AudioFingerprint(GraftSqlShim.expression(blob)))
  }

  /** Per-segment windowed-energy fingerprints (array of (seg, h)) — the
    * OFFSET-TOLERANT audio fingerprint ([[graft.operators.AudioCodec
    * .segmentFingerprintsRow]]); `segLen` must be a positive multiple
    * of 33.
    */
  def audioSegmentFingerprints(blob: Column, segLen: Int): Column =
    audioSegmentFingerprints(blob, segLen, 0)

  /** `phase` starts the grid at sample `phase` — the dual-phase
    * sub-segment-offset surface ([[graft.operators.AudioCodec
    * .segmentFingerprintsRow]]).
    */
  def audioSegmentFingerprints(blob: Column, segLen: Int, phase: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(AudioSegmentFingerprints(GraftSqlShim.expression(blob), segLen, phase))
  }

  /** WIDE (64-bit, 65-window) per-segment fingerprints — the band-space
    * widening for bulk-regime probe selectivity
    * ([[graft.operators.AudioCodec.segmentFingerprintsWideRow]]); `segLen`
    * must be a positive multiple of 65.
    */
  def audioSegmentFingerprintsWide(blob: Column, segLen: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(AudioSegmentFingerprintsWide(GraftSqlShim.expression(blob), segLen))
  }

  /** ONSET-ALIGNED per-segment fingerprints — the segment grid anchors at
    * the first sample deviating from the leading value by more than `tol`,
    * so off-grid trims confined to a uniform lead pair exactly
    * ([[graft.operators.AudioCodec.segmentFingerprintsOnsetRow]]).
    */
  def audioSegmentFingerprintsOnset(blob: Column, segLen: Int, tol: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(AudioSegmentFingerprintsOnset(GraftSqlShim.expression(blob), segLen, tol))
  }

  /** REAL frame sampling: binary -> array(struct(frame, width, height,
    * sum_r, sum_g, sum_b)) — decode every `stride`-th frame of a
    * multi-frame container. GIF is the JDK's multi-frame codec, standing
    * in for video containers (same operator shape: seek, decode, extract,
    * skip); single-frame formats yield one element.
    */
  def sampleFrames(blob: Column, stride: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(SampleFrames(GraftSqlShim.expression(blob), stride))
  }

  /** REAL video fingerprint: binary -> array(struct(frame, h)) — the
    * 56-bit dHash of every `stride`-th RENDERED frame of a multi-frame
    * container ([[ImageCodec.frameDhashRow]]: the [[sampleFrames]]
    * composite walk, so delta-coded GIFs hash the rendered frame, then
    * [[imageDhash]]'s grid hash per canvas). Near-clone clips differ in
    * ≤ 2 bits of one frame's hash; dedup joins carry only (frame, BIGINT)
    * rows — pixels never shuffle.
    */
  def frameDhashes(blob: Column, stride: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(FrameDhashes(GraftSqlShim.expression(blob), stride))
  }

  /** The typed metadata contract carried beside every blob. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("digest", StringType)))

  /** Wrap a source column as (blob, meta): the ingest step. */
  def asBlob(content: Column, mediaType: String): Column =
    struct(
      encode(content, "UTF-8").as("blob"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(content).cast("long").as("byte_len"),
        sha2(content, 256).as("digest")).as("meta"))

  /** STUB decode: deterministic fake features standing in for a codec.
    * Real implementation note: an image decoder would map blob -> struct
    * (width, height, channels, features array); this fake derives the same
    * shape from blob bytes so downstream stages are fully testable.
    */
  def stubDecode(blob: Column): Column = struct(
    (crc32(blob) % 1920).cast("int").as("width"),
    (crc32(blob) % 1080).cast("int").as("height"),
    lit(3).as("channels"),
    transform(sequence(lit(1), lit(8)),
      i => (crc32(blob) % (i * 255)).cast("float")).as("features"))

  /** Resize step over STUB-decoded metadata (for codecs the JDK lacks,
    * e.g. video): recompute metadata as a real resize would. The real
    * pixel path is [[resizeImage]].
    */
  def stubResize(decoded: Column, maxWidth: Int): Column = struct(
    least(decoded("width"), lit(maxWidth)).as("width"),
    when(decoded("width") > maxWidth,
      (decoded("height") * maxWidth / decoded("width")).cast("int"))
      .otherwise(decoded("height")).as("height"),
    decoded("channels").as("channels"),
    decoded("features").as("features"))

  /** Frame-sample step over STUB-decoded metadata (mp4/webm, no JDK
    * codec): pick every `stride`-th feature. The real multi-frame path is
    * [[sampleFrames]] (GIF).
    */
  def stubFrameSample(decoded: Column, stride: Int): Column =
    filter(decoded("features"), (_, i) => i % stride === 0)

  /** Full ingest pipeline over a text-ish source column: blob + meta +
    * decoded features, ready to append into a Graft table.
    */
  def ingest(df: DataFrame, contentCol: String, mediaType: String): DataFrame =
    df.withColumn("media", asBlob(col(contentCol), mediaType))
      .withColumn("decoded", stubDecode(col("media.blob")))

  /** Container-format detection by magic bytes — a REAL (non-stub) binary
    * operation: the first step of any multimodal ingest is routing blobs by
    * container before any codec runs. Pure codegen'd prefix compares; at
    * 100 TB this is a map-side classify with no shuffle.
    */
  def sniffFormat(blob: Column): Column = {
    def pfx(n: Int) = substring(blob, 1, n)
    when(pfx(4) === lit(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)), "png")
      .when(pfx(3) === lit(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "jpeg")
      // the two other JDK-decodable containers the real codecs champion —
      // without them every animated GIF (frameSampleRow's own format) and
      // BMP routed by this sniffer landed on the stub path as "unknown"
      .when(pfx(4) === lit("GIF8".getBytes("UTF-8")), "gif")
      .when(pfx(2) === lit("BM".getBytes("UTF-8")), "bmp")
      .when(pfx(4) === lit("RIFF".getBytes("UTF-8")), "riff")
      .when(pfx(4) === lit("%PDF".getBytes("UTF-8")), "pdf")
      .when(pfx(3) === lit("ID3".getBytes("UTF-8")), "mp3")
      // MP4's magic is positional, not a prefix: the first box's type at
      // bytes 5-8 (after its 4-byte size). Routed blobs land on decodeMp4.
      .when(substring(blob, 5, 4) === lit("ftyp".getBytes("UTF-8")), "mp4")
      .otherwise("unknown")
  }
}
