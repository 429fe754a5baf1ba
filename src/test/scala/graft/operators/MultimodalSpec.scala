package graft.operators

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Multimodal blobs survive the full Graft round trip: binary + struct
  * columns store, commit, scan, and aggregate like any other type.
  */
class MultimodalSpec extends SparkSpec {

  test("blob ingest -> Graft table -> scan preserves bytes, metadata and features") {
    val docs = spark.createDataFrame(
      Seq(Row(1L, "hello world"), Row(2L, "a much longer synthetic document body")).asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))

    val staged = Multimodal.ingest(docs, "text", "text/plain")
      .select(col("id"), col("media.blob").as("blob"),
        col("media.meta").as("meta"), col("decoded"))

    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.media", staged.schema)
    t.append(spark, staged)

    val back = t.toDF(spark).orderBy("id").collect()
    assert(back.length == 2)
    // bytes round-trip exactly
    assert(new String(back(0).getAs[Array[Byte]]("blob"), "UTF-8") == "hello world")
    // typed metadata survives
    val meta0 = back(0).getStruct(2)
    assert(meta0.getString(0) == "text/plain" && meta0.getLong(1) == 11L)
    assert(meta0.getString(2).length == 64) // sha256 hex
    // stub-decoded features have the codec pipeline shape
    val dec0 = back(0).getStruct(3)
    assert(dec0.getInt(0) >= 0 && dec0.getInt(0) < 1920)
    assert(dec0.getSeq[Float](3).length == 8)
    // downstream agg over blob metadata works like any column
    val total = t.toDF(spark).agg(sum(col("meta.byte_len"))).head.getLong(0)
    assert(total == 11L + 37L)
  }

  test("sniffFormat routes blobs by magic bytes (real binary op, no codec)") {
    val rows = Seq(
      Row(1L, Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 1.toByte)),
      Row(2L, Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)),
      Row(3L, "RIFFxxxxWAVE".getBytes("UTF-8")),
      Row(4L, "%PDF-1.7".getBytes("UTF-8")),
      Row(5L, "ID3".getBytes("UTF-8")),
      Row(6L, "plain text".getBytes("UTF-8")),
      Row(7L, Array(0x89.toByte)), // too short for any magic: unknown
      // the JDK-decodable containers the real codecs champion route too
      Row(8L, ImageCodec.encodeAnimatedGif(3, 3, 2)),
      Row(9L, ImageCodec.encodeImage("bmp", 3, 3)))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", LongType), StructField("blob", BinaryType))))
    val got = df.select(col("id"), Multimodal.sniffFormat(col("blob")).as("fmt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "pdf",
      5L -> "mp3", 6L -> "unknown", 7L -> "unknown", 8L -> "gif", 9L -> "bmp"))
  }

  test("decodeImage: real javax.imageio header decode for PNG/BMP/GIF/JPEG") {
    val rows = Seq(
      Row(1L, ImageCodec.encodeImage("png", 64, 48)),
      Row(2L, ImageCodec.encodeImage("bmp", 33, 21)),
      Row(3L, ImageCodec.encodeImage("gif", 17, 9)),
      Row(4L, ImageCodec.encodeImage("jpeg", 120, 80)),
      Row(5L, "definitely not an image".getBytes("UTF-8")),
      Row(6L, ImageCodec.encodeImage("png", 10, 10).take(8)), // truncated header
      Row(7L, null))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", LongType), StructField("blob", BinaryType))))
    val got = df.select(col("id"), Multimodal.decodeImage(col("blob")).as("dec"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getStruct(1)).map(d =>
          (d.getString(0), d.getInt(1), d.getInt(2), d.getInt(3)))).toMap
    assert(got(1L).contains(("png", 64, 48, 3)))
    assert(got(2L).contains(("bmp", 33, 21, 3)))
    assert(got(3L).contains(("gif", 17, 9, 3)))
    val jpeg = got(4L).get
    assert(jpeg._1.startsWith("jp") && jpeg._2 == 120 && jpeg._3 == 80)
    assert(got(5L).isEmpty && got(6L).isEmpty && got(7L).isEmpty)
  }

  test("decodeImage SQL twin produces the same plan shape (no UDF)") {
    graft.functions.SqlFunctions.install(spark)
    val df = spark.createDataFrame(
      Seq(Row(1L, ImageCodec.encodeImage("png", 32, 16))).asJava,
      StructType(Seq(StructField("id", LongType), StructField("blob", BinaryType))))
    df.createOrReplaceTempView("imgs")
    val viaSql = spark.sql(
      "SELECT graft_decode_image(blob).width AS w, graft_decode_image(blob).format AS f FROM imgs")
      .head()
    assert(viaSql.getInt(0) == 32 && viaSql.getString(1) == "png")
    // stays in whole-stage codegen: the decode sits inside a `*(n)` span
    // (range-backed plan; the input is guarded by a non-foldable condition
    // so constant folding cannot evaluate the decode at plan time)
    val blobCol = when(col("id") >= 0, lit(ImageCodec.encodeImage("png", 32, 16)))
    val exec = spark.range(1).select(Multimodal.decodeImage(blobCol)("width"))
    val plan = exec.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_decode_image"),
      s"decode must run inside a whole-stage-codegen project:\n$plan")
    assert(exec.head().getInt(0) == 32)
  }

  test("imageStats: full pixel decode sums channels exactly (lossless formats)") {
    def expected(w: Int, h: Int): (Long, Long) = {
      var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sg += (x * 31 + y * 17) & 0xFF; sb += x & 0xFF
      }
      (sg, sb)
    }
    Seq(("png", 16, 12), ("bmp", 33, 7)).foreach { case (fmt, w, h) =>
      val row = ImageCodec.decodeStatsRow(ImageCodec.encodeImage(fmt, w, h))
      assert(row != null)
      val (sg, sb) = expected(w, h)
      assert(row.getInt(1) == w && row.getInt(2) == h)
      assert(row.getLong(3) == 0L && row.getLong(4) == sg && row.getLong(5) == sb,
        s"$fmt ${w}x$h channel sums")
    }
    assert(ImageCodec.decodeStatsRow("not an image".getBytes) == null)
    assert(ImageCodec.decodeStatsRow(null) == null)
  }

  test("imageStats refuses decode bombs: giant header dims yield null, no allocation") {
    // hand-craft a valid PNG signature + IHDR claiming a 50000x50000
    // raster (~9.3 GB ARGB) with no pixel data behind it
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xFF).toByte, ((i >> 16) & 0xFF).toByte,
        ((i >> 8) & 0xFF).toByte, (i & 0xFF).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val payload = tag.getBytes("US-ASCII") ++ body
      val crc = new java.util.zip.CRC32(); crc.update(payload)
      be(body.length) ++ payload ++ be(crc.getValue.toInt)
    }
    val emptyDeflate = Array[Byte](0x78, 0x9C.toByte, 0x03, 0x00, 0x00, 0x00, 0x00, 0x01)
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", be(50000) ++ be(50000) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", emptyDeflate) ++ chunk("IEND", Array.empty)
    // header decode still reads the claimed dims (no pixel allocation)...
    val hdr = ImageCodec.decodeHeaderRow(bomb)
    assert(hdr != null && hdr.getInt(1) == 50000 && hdr.getInt(2) == 50000)
    // ...but every full-decode entrypoint refuses before allocating the
    // raster — frame sampling refuses the WHOLE blob, not just the frame
    // (a silently-shorter frame array would look like a short animation)
    assert(ImageCodec.decodeStatsRow(bomb) == null)
    assert(ImageCodec.resizeRow(bomb, 10) == null)
    assert(ImageCodec.frameSampleRow(bomb, 1) == null)
  }

  test("decodeAudio: real javax.sound.sampled header decode for WAV/AIFF/AU") {
    val rows = Seq(
      Row(1L, AudioCodec.encodeAudio("wav", 44100, 2, 1000)),
      Row(2L, AudioCodec.encodeAudio("aiff", 22050, 1, 500)),
      Row(3L, AudioCodec.encodeAudio("au", 8000, 1, 250)),
      Row(4L, "definitely not audio".getBytes("UTF-8")),
      Row(5L, AudioCodec.encodeAudio("wav", 44100, 2, 100).take(10)), // truncated
      Row(6L, null))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", LongType), StructField("blob", BinaryType))))
    val got = df.select(col("id"), Multimodal.decodeAudio(col("blob")).as("dec"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getStruct(1)).map(d =>
          (d.getString(0), d.getInt(1), d.getInt(2), d.getInt(3), d.getLong(4)))).toMap
    assert(got(1L).contains(("wav", 44100, 2, 16, 1000L)))
    assert(got(2L).contains(("aif", 22050, 1, 16, 500L)))
    assert(got(3L).contains(("au", 8000, 1, 16, 250L)))
    assert(got(4L).isEmpty && got(5L).isEmpty && got(6L).isEmpty)
  }

  test("decodeAudio SQL twin registered; image + audio decoders compose") {
    graft.functions.SqlFunctions.install(spark)
    val df = spark.createDataFrame(
      Seq(Row(1L, AudioCodec.encodeAudio("wav", 16000, 1, 320)),
        Row(2L, ImageCodec.encodeImage("png", 24, 12))).asJava,
      StructType(Seq(StructField("id", LongType), StructField("blob", BinaryType))))
    df.createOrReplaceTempView("clips")
    // one pass routes each blob to whichever decoder claims it
    val got = spark.sql(
      """SELECT id, graft_decode_audio(blob).sample_rate AS rate,
        |  graft_decode_image(blob).width AS w FROM clips ORDER BY id""".stripMargin)
      .collect()
    assert(got(0).getInt(1) == 16000 && got(0).isNullAt(2))
    assert(got(1).isNullAt(1) && got(1).getInt(2) == 24)
  }

  test("resizeImage: real nearest-neighbor downscale, exact sums, lossless round-trip") {
    // nearest-neighbor picks source pixel (x*W//w', y*H//h') — closed form
    def expected(sw: Int, sh: Int, dw: Int, dh: Int): (Long, Long) = {
      var sg = 0L; var sb = 0L
      for (y <- 0 until dh; x <- 0 until dw) {
        val sx = x * sw / dw; val sy = y * sh / dh
        sg += (sx * 31 + sy * 17) & 0xFF; sb += sx & 0xFF
      }
      (sg, sb)
    }
    Seq(("png", 20, 14), ("bmp", 37, 9)).foreach { case (fmt, w, h) =>
      val rz = ImageCodec.resizeRow(ImageCodec.encodeImage(fmt, w, h), 10)
      assert(rz != null)
      val dw = 10; val dh = math.max(1, h * 10 / w)
      val (sg, sb) = expected(w, h, dw, dh)
      assert(rz.getInt(0) == dw && rz.getInt(1) == dh)
      assert(rz.getLong(2) == 0L && rz.getLong(3) == sg && rz.getLong(4) == sb,
        s"$fmt ${w}x$h resized sums")
      // the re-encoded PNG blob carries the identical raster (lossless)
      val rt = ImageCodec.decodeStatsRow(rz.getBinary(5))
      assert(rt.getInt(1) == dw && rt.getInt(2) == dh &&
        rt.getLong(4) == sg && rt.getLong(5) == sb)
    }
    // within-bound images pass through un-resampled
    val same = ImageCodec.resizeRow(ImageCodec.encodeImage("png", 8, 6), 10)
    assert(same.getInt(0) == 8 && same.getInt(1) == 6)
    assert(ImageCodec.resizeRow("not an image".getBytes, 10) == null)
    assert(ImageCodec.resizeRow(null, 10) == null)
  }

  test("sampleFrames: real multi-frame GIF decode, stride picks, exact gray sums") {
    def expectedGray(w: Int, h: Int, f: Int): Long = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) s += (x * 31 + y * 17 + f * 7) & 0xFF
      s
    }
    val blob = ImageCodec.encodeAnimatedGif(19, 8, 5)
    val sampled = ImageCodec.frameSampleRow(blob, 2)
    assert(sampled.numElements() == 3) // frames 0, 2, 4 of 5
    (0 until 3).foreach { i =>
      val r = sampled.getStruct(i, 6)
      val f = r.getInt(0)
      assert(f == i * 2 && r.getInt(1) == 19 && r.getInt(2) == 8)
      val e = expectedGray(19, 8, f)
      assert(r.getLong(3) == e && r.getLong(4) == e && r.getLong(5) == e,
        s"frame $f gray sums")
    }
    // single-frame containers yield one element; stride beyond count too
    assert(ImageCodec.frameSampleRow(ImageCodec.encodeImage("png", 4, 4), 2)
      .numElements() == 1)
    assert(ImageCodec.frameSampleRow(blob, 10).numElements() == 1)
    assert(ImageCodec.frameSampleRow("not a gif".getBytes, 2) == null)
    // SQL twins run inside a plan (explode of the frame array is row-local)
    graft.functions.SqlFunctions.install(spark)
    val df = spark.createDataFrame(
      Seq(Row(1L, blob)).asJava,
      StructType(Seq(StructField("id", LongType), StructField("blob", BinaryType))))
    df.createOrReplaceTempView("vids")
    val rows = spark.sql(
      """SELECT id, f.frame, graft_resize_image(blob, 10).width AS rw
        |FROM vids LATERAL VIEW explode(graft_sample_frames(blob, 2)) AS f
        |ORDER BY f.frame""".stripMargin).collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(rows.head.getInt(2) == 10)
  }

  test("sampleFrames composites optimized GIFs: delta sub-frames render onto the canvas") {
    // real GIF optimizers store only the changed sub-raster per frame; the
    // sampler must report the RENDERED frame (composited canvas), not the
    // stored delta — a 4x3 delta at (2,1) must yield 19x8 frame stats
    def gray(w: Int, h: Int, f: Int): Long = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) s += (x * 31 + y * 17 + f * 7) & 0xFF
      s
    }
    val (w, h, subW, subH, offX, offY) = (19, 8, 4, 3, 2, 1)
    val blob = ImageCodec.encodeOptimizedGif(w, h, 3, subW, subH, offX, offY)
    val sampled = ImageCodec.frameSampleRow(blob, 1)
    assert(sampled.numElements() == 3)
    // frame 0: the full-screen gradient
    val r0 = sampled.getStruct(0, 6)
    assert(r0.getInt(1) == w && r0.getInt(2) == h)
    assert(r0.getLong(3) == gray(w, h, 0))
    // frames 1, 2: canvas = frame-0 gradient with the sub-rect REPLACED by
    // the delta raster (sub-raster coordinates restart at (0,0))
    def covered(f: Int): Long = {
      var s = 0L
      for (y <- offY until offY + subH; x <- offX until offX + subW)
        s += (x * 31 + y * 17) & 0xFF // frame-0 value being overwritten
      gray(w, h, 0) - s + gray(subW, subH, f)
    }
    (1 to 2).foreach { f =>
      val r = sampled.getStruct(f, 6)
      assert(r.getInt(0) == f, "composited frames keep their frame index")
      assert(r.getInt(1) == w && r.getInt(2) == h,
        s"frame $f must report canvas dims, not the ${subW}x$subH delta")
      assert(r.getLong(3) == covered(f) && r.getLong(5) == covered(f),
        s"frame $f stats must be the rendered canvas, not the stored delta")
    }
    // stride skips the EMISSION, not the compositing: frame 2's stats must
    // include frame 1's (un-emitted) delta already painted over
    val strided = ImageCodec.frameSampleRow(blob, 2)
    assert(strided.numElements() == 2)
    assert(strided.getStruct(1, 6).getLong(3) == covered(2))
  }

  test("resize + frame-sample stubs keep the schema contract") {
    val docs = spark.createDataFrame(
      Seq(Row(1L, "x" * 100)).asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val out = Multimodal.ingest(docs, "text", "image/png")
      .withColumn("resized", Multimodal.stubResize(col("decoded"), 640))
      .withColumn("sampled", Multimodal.stubFrameSample(col("decoded"), 2))
      .select("resized.width", "sampled").head()
    assert(out.getInt(0) <= 640)
    assert(out.getSeq[Float](1).length == 4) // every 2nd of 8
  }
  test("dHash: planted single-pixel clones band-collide at hamming <= 2; unrelated gradients are far") {
    import org.apache.spark.sql.DataFrame
    def hashOf(bytes: Array[Byte]): java.lang.Long = ImageCodec.dhashRow(bytes)

    // a clone with ONE pixel edited at exactly the grid-(3,3) pick flips
    // at most the two comparisons that touch that cell
    val w = 40; val h = 18
    val base = hashOf(ImageCodec.encodeImageVariant("png", w, h, 5))
    val clone = hashOf(ImageCodec.encodeImageVariant("png", w, h, 5, 3 * w / 8, 3 * h / 8))
    assert(base != null && clone != null)
    val d = java.lang.Long.bitCount(base.longValue() ^ clone.longValue())
    assert(d <= 2, s"single-pixel clone drifted to hamming $d")
    // ... so at threshold 3 with 4 bands, pigeonhole guarantees a shared band
    val bandsOf = (v: Long) => (0 until 4).map(k => ((v >> (k * 14)) & 16383L, k)).toSet
    assert(bandsOf(base.longValue()).intersect(bandsOf(clone.longValue())).nonEmpty)

    // exact re-encode (even across containers: PNG and BMP are both
    // lossless) hashes identically
    val bmp = hashOf(ImageCodec.encodeImageVariant("bmp", w, h, 5))
    assert(bmp == base)

    // different seeds are unrelated gradients: far in hamming
    val other = hashOf(ImageCodec.encodeImageVariant("png", w, h, 6))
    assert(java.lang.Long.bitCount(base.longValue() ^ other.longValue()) > 3)

    // 56-bit contract: nonnegative, so BIGINT band arithmetic is sign-safe
    assert(base >= 0L && clone >= 0L && other >= 0L)
    assert(base < (1L << 56))

    // undecodable bytes and under-grid rasters refuse loudly with null
    assert(ImageCodec.dhashRow("not an image".getBytes("UTF-8")) == null)
    assert(ImageCodec.dhashRow(ImageCodec.encodeImage("png", 6, 6)) == null)

    // the Catalyst expression matches the row kernel through codegen
    val df: DataFrame = spark.createDataFrame(Seq(
      (1L, ImageCodec.encodeImageVariant("png", w, h, 5)),
      (2L, "garbage".getBytes("UTF-8")))).toDF("id", "blob")
    val got = df.select(col("id"), Multimodal.imageDhash(col("blob")).as("h"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == base.longValue())
    assert(got(1).isNullAt(1))
  }
  test("audio fingerprint: single-sample clones land within hamming 2; exact re-encodes match") {
    val n = 33 * 20
    val base = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant(n, 5))
    val clone = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant(n, 5, editAt = n / 2))
    assert(base != null && clone != null)
    assert(java.lang.Long.bitCount(base.longValue() ^ clone.longValue()) <= 2)
    // exact re-encode is bit-identical; different seeds are far apart
    assert(AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant(n, 5)) == base)
    val other = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant(n, 6))
    assert(java.lang.Long.bitCount(base.longValue() ^ other.longValue()) > 3)
    // 32-bit contract: nonnegative, sign-safe band arithmetic
    assert(base >= 0L && base < (1L << 32))
    // refusals: garbage, 16-bit STEREO (channels, not width — 16-bit mono
    // is supported since r15), under-33 frames
    assert(AudioCodec.fingerprintRow("not audio".getBytes("UTF-8")) == null)
    assert(AudioCodec.fingerprintRow(AudioCodec.encodeAudio("wav", 8000, 2, 100)) == null)
    // 8-bit mono but PCM_SIGNED (AIFF's 8-bit convention): same bits and
    // channels, wrong ENCODING — fingerprinting its sign-wrapped bytes as
    // unsigned would make the hash container-dependent, so it must refuse
    locally {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val pcm = Array.tabulate[Byte](66)(n => ((n * 13 + 31) % 256).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm),
        new AudioFormat(8000f, 8, 1, true, true), 66L)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
      assert(AudioCodec.fingerprintRow(bos.toByteArray) == null)
    }
    assert(AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant(20, 1)) == null)
    // the Catalyst expression matches the row kernel through codegen
    val df = spark.createDataFrame(Seq(
      (1L, AudioCodec.encodeAudioVariant(n, 5)),
      (2L, "garbage".getBytes("UTF-8")))).toDF("id", "blob")
    val got = df.select(col("id"), Multimodal.audioFingerprint(col("blob")).as("h"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == base.longValue())
    assert(got(1).isNullAt(1))
  }
  test("integer nearest-neighbor upscales hash identically: dHash scale invariance is unconditional") {
    // the nested floor-division identity floor(floor(gx*s*w/8)/s) =
    // floor(gx*w/8) makes every clone grid pick divide back to exactly
    // the base's pick for ANY dimensions — the cross-resolution gate's
    // contract, checked on deliberately awkward (non-multiple-of-8) sizes
    for ((w, h) <- Seq((24, 16), (21, 13), (35, 23)); s <- 2 to 4) {
      val base = ImageCodec.dhashRow(ImageCodec.encodeImageVariant("png", w, h, 9))
      val up = ImageCodec.dhashRow(
        ImageCodec.encodeImageVariantScaled("png", w, h, 9, s))
      assert(up.longValue() == base.longValue(),
        s"x$s upscale of ${w}x$h drifted from the base hash")
    }
    // a pick-edit on the upscaled raster flips <= 2 bits, like any clone
    val base = ImageCodec.dhashRow(ImageCodec.encodeImageVariant("png", 21, 13, 9))
    val edit = ImageCodec.dhashRow(ImageCodec.encodeImageVariantScaled(
      "png", 21, 13, 9, 2, (3 * 2 * 21) / 8, (3 * 2 * 13) / 8))
    assert(java.lang.Long.bitCount(base.longValue() ^ edit.longValue()) <= 2)
    // container independence holds across scales too
    val bmp = ImageCodec.dhashRow(
      ImageCodec.encodeImageVariantScaled("bmp", 21, 13, 9, 3))
    assert(bmp.longValue() == base.longValue())
  }

  test("normalize-then-hash: resizing a base and its integer upscale to one maxWidth is pixel-identical") {
    // the ingest-pipeline composition (resize front-end -> dHash): for a
    // base and ANY integer nearest-neighbor upscale, resizing both to the
    // same maxWidth picks the SAME base pixels (the nested floor-division
    // identity applied twice — target dims agree because
    // floor(s*h*m/(s*w)) = floor(h*m/w), and each pick composes
    // floor(floor(x*s*w/m)/s) = floor(x*w/m)), so the normalized rasters
    // are bit-identical and every downstream hash agrees
    for ((w, h) <- Seq((21, 13), (35, 23)); s <- Seq(2, 3); m <- Seq(16, 20)) {
      val nb = ImageCodec.resizeRow(ImageCodec.encodeImageVariant("png", w, h, 9), m)
      val nu = ImageCodec.resizeRow(
        ImageCodec.encodeImageVariantScaled("png", w, h, 9, s), m)
      assert(nb.getInt(0) == nu.getInt(0) && nb.getInt(1) == nu.getInt(1),
        s"normalized dims drifted for ${w}x$h x$s at m=$m")
      assert((2 to 4).forall(i => nb.getLong(i) == nu.getLong(i)),
        s"normalized channel sums drifted for ${w}x$h x$s at m=$m")
      val hb = ImageCodec.dhashRow(nb.getBinary(5))
      val hu = ImageCodec.dhashRow(nu.getBinary(5))
      assert(hb != null && hb.longValue() == hu.longValue(),
        s"normalized hashes drifted for ${w}x$h x$s at m=$m")
    }
  }

  test("non-integer lattice resamples normalize to bit-identical canonical rasters") {
    // the x_image_neardup_normalized contract at the kernel level (r15
    // verdict #3): when the clone's width is a multiple of the canonical
    // width, resize∘resample picks divide back to exactly the base's
    // pixels (nested floor division), so base and ×num/den clone produce
    // the SAME canonical PNG bytes — ×1.5, ×4/3, ×2.7, ×2.5 all exact
    for ((t, num, den) <- Seq((8, 3, 2), (12, 4, 3), (40, 27, 10), (8, 5, 2))) {
      val (bw, bh) = (4 * t, 3 * t)
      val (sw, sh) = (4 * t * num / den, 3 * t * num / den)
      val nb = ImageCodec.resizeRow(ImageCodec.encodeImageVariant("png", bw, bh, 7), 16)
      val nc = ImageCodec.resizeRow(
        ImageCodec.encodeImageVariantResampled("png", bw, bh, sw, sh, 7), 16)
      assert(nb.getInt(0) == 16 && nb.getInt(1) == 12)
      assert(java.util.Arrays.equals(nb.getBinary(5), nc.getBinary(5)),
        s"x$num/$den lattice resample of ${bw}x$bh must normalize bit-identically")
    }
    // and the resampled encoder IS the scaled encoder at integer ratios
    // (one home): x2 resample == x2 upscale, byte for byte
    assert(java.util.Arrays.equals(
      ImageCodec.encodeImageVariantResampled("png", 21, 13, 42, 26, 9),
      ImageCodec.encodeImageVariantScaled("png", 21, 13, 9, 2)))
  }

  test("off-lattice resamples: normalized-hash drift swept and pinned per scale class") {
    // the r16 verdict-#3 sweep: for clone widths NOT a multiple of the
    // canonical width 16, the composed resize∘resample picks drift by ±1
    // source pixel; the adversarial max-frequency gradient turns drifted
    // picks into bit flips while small-step seeds absorb them. Pinned:
    // (a) lattice sizes stay BIT-identical at every seed, (b) the
    // x_image_neardup_offlattice must-pair combos measure ≤ 3 bits,
    // (c) its must-not combos measure > 3, and (d) the observed worst
    // case stays under 50 of 56 bits (measured max 48 — drift never
    // reaches hash-independence levels, it's pick noise, not decode
    // corruption).
    def nh(b: Array[Byte]) = ImageCodec.dhashRow(
      ImageCodec.resizeRow(b, 16).getBinary(5)).longValue
    def drift(t: Int, pct: Int, seed: Int): Int = {
      val (bw, bh) = (4 * t, 3 * t)
      val (sw, sh) = (bw * pct / 100, bh * pct / 100)
      val base = nh(ImageCodec.encodeImageVariant("png", bw, bh, seed))
      val clone = nh(ImageCodec.encodeImageVariantResampled("png", bw, bh, sw, sh, seed))
      java.lang.Long.bitCount(base ^ clone)
    }
    // (a) lattice: x2 (t=8), x1.5 on t=8 (48 = 3·16), x2.5 (t=40 ×110 = 176)
    for (seed <- 0 until 12) {
      assert(drift(8, 200, seed) == 0, s"x2 lattice drifted at seed $seed")
      assert(drift(8, 150, seed) == 0, s"x1.5 t=8 lattice drifted at seed $seed")
      assert(drift(40, 110, seed) == 0, s"x1.1 t=40 lattice drifted at seed $seed")
    }
    // (b) the gate's must-pair combos (small-step seeds off-lattice)
    assert(drift(12, 150, 3) <= 3 && drift(12, 150, 5) <= 3 &&
      drift(12, 150, 9) <= 3 && drift(40, 171, 10) <= 3,
      "gate must-pair combos drifted past the verify threshold")
    // (c) the gate's must-not combos (max-frequency seeds off-lattice)
    val mustNot = Seq((8, 110, 0), (12, 137, 1), (40, 213, 2), (12, 110, 4),
      (8, 171, 6), (40, 137, 7), (12, 130, 8), (8, 333, 11))
    mustNot.foreach { case (t, p, s) =>
      assert(drift(t, p, s) > 3, s"must-not combo (t=$t, $p%, seed $s) paired")
    }
    // (d) worst case over the swept grid stays pick-noise-sized
    val worst = (for (t <- Seq(8, 12, 40); s <- 0 until 12;
                      p <- Seq(110, 130, 137, 150, 171, 190, 213, 333))
      yield drift(t, p, s)).max
    assert(worst <= 50, s"off-lattice drift reached hash-independence: $worst bits")
  }

  test("jpeg dHash: deterministic decode, byte-identical twins at 0, pick-edits near, seeds far") {
    // the LOSSY leg of the perceptual router (r15 verdict #2): jpeg has no
    // closed-form decoded raster, so its near-dup certification lives HERE
    // (single-JDK determinism) instead of a DuckDB oracle — the router
    // gate only oracle-checks routing + byte-identical twins (hamming 0).
    // Determinism and hamming-0 twins are codec-independent theorems given
    // a deterministic ImageIO — unconditional. The EMPIRICAL <=6 / >=10
    // thresholds live in the next test, assume()-gated to the measured JDK.
    (0 until 8).foreach { i =>
      val w = 24 + i; val h = 16 + i % 5
      val a = ImageCodec.encodeImageVariant("jpeg", w, h, 80 + i)
      val b = ImageCodec.encodeImageVariant("jpeg", w, h, 80 + i)
      // deterministic encoder: same constructor args <=> same bytes (the
      // fixture discipline the router gate's exact-twin oracle rests on)
      assert(java.util.Arrays.equals(a, b), s"jpeg encoder must be deterministic (seed ${80 + i})")
      val ha = ImageCodec.dhashRow(a)
      assert(ha != null, "JDK must decode its own jpeg output")
      assert(ha.longValue() == ImageCodec.dhashRow(b).longValue())
    }
  }

  test("jpeg dHash empirical thresholds: pick-edits <=6 bits, seeds >=10 (measured JDK only)") {
    // The <=6 / >=10 bit thresholds are EMPIRICAL measurements of THIS
    // JDK's jpeg codec (r16 ADVICE): a different vendor/version can shift
    // them with product behavior unchanged, so they apply only on the
    // measured codec. assume() (r17 ADVICE): on any other JDK this test
    // reports CANCELED — a visible skip — instead of a vacuous green pass.
    assume(System.getProperty("java.specification.version") == "17",
      "jpeg drift thresholds were measured on the JDK 17 codec")
    (0 until 8).foreach { i =>
      val w = 24 + i; val h = 16 + i % 5
      val ha = ImageCodec.dhashRow(ImageCodec.encodeImageVariant("jpeg", w, h, 80 + i))
      // a planted pick-edit survives the DCT as a NEAR clone — wider than
      // the lossless <= 2 bound (block ringing bleeds into neighbor picks;
      // measured max 5 across these seeds) but far under the seed distance
      val e = ImageCodec.encodeImageVariant("jpeg", w, h, 80 + i, 3 * w / 8, 3 * h / 8)
      val editHam = java.lang.Long.bitCount(ha.longValue() ^ ImageCodec.dhashRow(e).longValue())
      assert(editHam <= 6, s"jpeg pick-edit drifted $editHam bits (seed ${80 + i})")
    }
    // unrelated seeds stay FAR through the lossy round-trip: the band
    // nomination cannot accidentally pair them (measured min 17)
    val hs = (0 until 8).map { i =>
      ImageCodec.dhashRow(
        ImageCodec.encodeImageVariant("jpeg", 24 + i, 16 + i % 5, 80 + i)).longValue
    }
    for (i <- 0 until 8; j <- i + 1 until 8)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) >= 10,
        s"jpeg seeds ${80 + i}/${80 + j} aliased within 10 bits")
  }

  test("jpeg re-quality: re-encode is deterministic; mild q stays <=6 bits, deep q drifts past banding") {
    // r17 verdict #4: the x_image_neardup_requality corpus certification.
    // Determinism (same bytes + quality <=> same output) is unconditional;
    // the drift bounds are empirical measurements of THIS JDK's codec.
    val base = ImageCodec.encodeImageVariant("jpeg", 30, 20, 85)
    assert(java.util.Arrays.equals(
      ImageCodec.reencodeJpeg(base, 0.5f), ImageCodec.reencodeJpeg(base, 0.5f)),
      "jpeg re-encode must be deterministic on one JDK")
    assume(System.getProperty("java.specification.version") == "17",
      "re-quality drift bounds were measured on the JDK 17 codec")
    val mild = Seq(0.95f, 0.9f, 0.8f)
    val deepSeeds = 1 to 5
    val hashes = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    (0 until 8).foreach { i =>
      val (w, h) = (24 + i, 16 + i % 5)
      val b = ImageCodec.encodeImageVariant("jpeg", w, h, 80 + i)
      hashes(2000L + i) = ImageCodec.dhashRow(b).longValue
      hashes(2100L + i) = ImageCodec.dhashRow(
        ImageCodec.reencodeJpeg(b, mild(i % 3))).longValue
      if (deepSeeds.contains(i))
        hashes(2200L + i) = ImageCodec.dhashRow(
          ImageCodec.reencodeJpeg(b, 0.3f)).longValue
    }
    // mild re-encodes stay within the jpeg verify threshold (measured max 5)
    (0 until 8).foreach { i =>
      val d = java.lang.Long.bitCount(hashes(2000L + i) ^ hashes(2100L + i))
      assert(d <= 6, s"mild re-encode drifted $d bits (seed ${80 + i})")
    }
    // deep re-encodes drift past the banding's admission (measured 10-21)
    deepSeeds.foreach { i =>
      val d = java.lang.Long.bitCount(hashes(2000L + i) ^ hashes(2200L + i))
      assert(d > 6, s"deep q=0.3 re-encode must NOT pair (seed ${80 + i}): $d bits")
    }
    // the gate's exact claim: over the FULL corpus the <=6 admission keeps
    // exactly the 8 (base, mild) pairs — nearest rejected measured at 9
    val ids = hashes.keys.toSeq
    val admitted = for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <= 6
    } yield (i, j)
    assert(admitted.toSet == (0 until 8).map(i => (2000L + i, 2100L + i)).toSet,
      s"admission must be exactly the planted mild pairs: $admitted")
  }

  test("wide segment fingerprints: 64-bit hashes, aligned trims shift, edits stay local, 65-grid enforced") {
    // the band-space widening (contract 18b's census fix): same window
    // formula as the 32-bit kernel at 65 windows over 325-sample segments
    val L = 325
    def segs(b: Array[Byte]) = AudioCodec.segmentFingerprintsWideRow(b, L)
    val base = segs(AudioCodec.encodeAudioVariant(5 * L, 9))
    assert(base != null && base.numElements() == 5)
    // aligned trims shift the sequence exactly like the narrow kernel
    val trim = segs(AudioCodec.encodeAudioVariant(3 * L, 9, sampleBase = 2 * L))
    assert(trim.numElements() == 3)
    (0 until 3).foreach { s =>
      assert(trim.getStruct(s, 2).getLong(1) == base.getStruct(s + 2, 2).getLong(1),
        s"trimmed wide segment $s must hash as base segment ${s + 2}")
    }
    // a single-sample edit perturbs one 5-sample window: <= 2 bits of ONE segment
    val edit = segs(AudioCodec.encodeAudioVariant(5 * L, 9, editAt = 2 * L + 100))
    (0 until 5).foreach { s =>
      val d = java.lang.Long.bitCount(
        base.getStruct(s, 2).getLong(1) ^ edit.getStruct(s, 2).getLong(1))
      assert(if (s == 2) d <= 2 && d >= 1 else d == 0,
        s"edit must stay in segment 2: segment $s drifted $d bits")
    }
    // the 64th bit is reachable (sign-safe BIGINT semantics on both
    // engines): some seed/length in this sweep must set bit 63
    val anyTop = (0 until 24).exists { sd =>
      val r = segs(AudioCodec.encodeAudioVariant(4 * L, sd))
      r != null && (0 until r.numElements).exists(s =>
        (r.getStruct(s, 2).getLong(1) >>> 63) == 1L)
    }
    assert(anyTop, "bit 63 never set across the sweep — wide pack suspect")
    // guard: segLen must be a positive multiple of 65
    assert(AudioCodec.segmentFingerprintsWideRow(
      AudioCodec.encodeAudioVariant(5 * L, 9), 330) == null)
    assert(AudioCodec.segmentFingerprintsWideRow(
      AudioCodec.encodeAudioVariant(5 * L, 9), 0) == null)
  }

  test("onset-aligned fingerprints: grid anchors at content, so off-grid lead trims are invisible") {
    // the r16 verdict-#4 front-end at the kernel level: the segment grid
    // starts at the first sample deviating from the leading value beyond
    // tol, so a trim confined to the uniform lead moves the onset by
    // exactly the trimmed length and every window sum is unchanged
    val L = 330
    def segs(b: Array[Byte]) = AudioCodec.segmentFingerprintsOnsetRow(b, L, 4)
    val base = segs(AudioCodec.encodeAudioVariantLead(257, 5 * L, 9))
    assert(base != null && base.numElements() == 5)
    // 1) arbitrary off-grid lead trims: identical sequences
    for (t <- Seq(1, 37, 100, 164, 256)) {
      val trimmed = segs(AudioCodec.encodeAudioVariantLead(257 - t, 5 * L, 9))
      assert(trimmed.numElements() == 5, s"lead trim $t changed the segment count")
      (0 until 5).foreach { s =>
        assert(trimmed.getStruct(s, 2).getLong(1) == base.getStruct(s, 2).getLong(1),
          s"lead trim $t drifted segment $s")
      }
    }
    // 2) trailing trims only drop tail segments; surviving ones unchanged
    val tail = segs(AudioCodec.encodeAudioVariantLead(257, 5 * L - 40, 9))
    assert(tail.numElements() == 4)
    (0 until 4).foreach { s =>
      assert(tail.getStruct(s, 2).getLong(1) == base.getStruct(s, 2).getLong(1))
    }
    // 3) a trim INTO the body re-anchors one sample past the cut: the
    // sequence equals the plain grid over the gradient at base 101
    val bodyCut = segs(AudioCodec.encodeAudioVariant(5 * L - 100, 9, sampleBase = 100))
    val expected = AudioCodec.segmentFingerprintsRow(
      AudioCodec.encodeAudioVariant(5 * L - 101, 9, sampleBase = 101), L)
    assert(bodyCut.numElements() == expected.numElements())
    (0 until bodyCut.numElements()).foreach { s =>
      assert(bodyCut.getStruct(s, 2).getLong(1) == expected.getStruct(s, 2).getLong(1),
        s"body-cut re-anchor drifted segment $s")
    }
    // 4) degenerate inputs: all-silence (no onset) and a too-short body
    assert(segs(AudioCodec.encodeAudioVariantLead(2 * L, 0, 9)) == null)
    assert(segs(AudioCodec.encodeAudioVariantLead(50, L - 1, 9)) == null)
  }

  test("temporal lattice is structural: no per-clip pick rule commutes with off-lattice resampling") {
    // r17 verdict #6, evaluated and PINNED as impossible rather than fixed:
    // a canonical-grid pick rule f(k, nf) that commuted with EVERY stride s
    // (f(k, s*m) == s*f(k, m), so a resampled clone lands on its base's
    // content frames) would at m=1 force f(k, s) = s*f(k, 1) = 0 for all s
    // (a 1-frame clip's only frame is 0) — the degenerate all-slots-frame-0
    // grid. So commutation can only hold on a LATTICE, and the shipped rule
    // floor(k*nf/c) owns exactly the c-divides-nf one. Exhaustively pinned
    // for the shipped c=4 and the two candidate rules (floor and the
    // round-to-nearest the verdict proposed):
    val c = 4
    def floorPick(k: Int, nf: Int): Int = k * nf / c
    def roundPick(k: Int, nf: Int): Int =
      math.min(nf - 1, (2 * k * nf + c) / (2 * c)) // round half up, clamped
    // (a) ON-lattice: floor commutes with every stride — the gate's claim
    for (m <- c to 48 by c; s <- 2 to 6; k <- 0 until c)
      assert(floorPick(k, s * m) == s * floorPick(k, m),
        s"lattice commutation broke at m=$m s=$s k=$k")
    // (b) OFF-lattice: EVERY non-multiple m violates commutation for some
    // (s, k) under BOTH rules — the residual is structural, not a rule choice
    for (m <- 2 to 48 if m % c != 0) {
      val combos = for (s <- 2 to 6; k <- 0 until c) yield (s, k)
      assert(combos.exists { case (s, k) => floorPick(k, s * m) != s * floorPick(k, m) },
        s"floor rule unexpectedly commutes off-lattice at m=$m")
      assert(combos.exists { case (s, k) => roundPick(k, s * m) != s * roundPick(k, m) },
        s"round rule unexpectedly commutes off-lattice at m=$m")
    }
    // (c) the gate's concrete 10->5 shape: both rules mispick slot 2+
    assert(floorPick(2, 10) == 5 && 2 * floorPick(2, 5) == 4)
    assert(roundPick(2, 10) != 2 * roundPick(2, 5) ||
      roundPick(3, 10) != 2 * roundPick(3, 5))
    // (d) and the mispicks are FATAL on the gate's off-lattice seeds
    // (x_video_neardup_resampled i%4=3: nf=10, stride-2 clone): canonical
    // slots 2,3 read base frames {5,7} against clone content {4,6}, and
    // the SUMMED drift across those misaligned frames exceeds the <=3
    // verify on every planted seed — the must-NOT is measured, not assumed
    Seq(3, 7, 11).foreach { i =>
      val fh = ImageCodec.frameDhashRow(
        ImageCodec.encodeAnimatedGifVariant(16 + i, 12 + i % 5, 10, i), 1)
      def h(f: Int) = fh.getStruct(f, 2).getLong(1)
      val drift = java.lang.Long.bitCount(h(5) ^ h(4)) +
        java.lang.Long.bitCount(h(7) ^ h(6))
      assert(drift > 3,
        s"mispicked slots must exceed the verify threshold (seed $i): $drift")
    }
  }

  test("canonical frame grid: lattice frame-rate resamples pick identical content frames") {
    import graft.queries.Extensions
    val df = spark.createDataFrame(Seq(
      (0L, ImageCodec.encodeAnimatedGifVariant(24, 16, 8, 9)),
      (1L, ImageCodec.encodeAnimatedGifVariant(24, 16, 4, 9, frameStride = 2)),
      (10L, ImageCodec.encodeAnimatedGifVariant(24, 16, 10, 9)),
      (11L, ImageCodec.encodeAnimatedGifVariant(24, 16, 5, 9, frameStride = 2))))
      .toDF("vid_id", "blob")
    val fh = Extensions.videoFrameHashes(df)
    val canon = Extensions.videoFramesCanonical(fh, 4)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
    // x2 of 8 frames: slots pick content frames 0,2,4,6 on both — identical
    (0 until 4).foreach { k =>
      assert(canon((0L, k)) == canon((1L, k)), s"lattice resample drifted slot $k")
    }
    // 10 frames is OFF the canonical lattice: the base picks clip frames
    // (k*10)//4 = 0,2,5,7 while its every-2nd clone (5 frames) picks
    // (k*5)//4 = 0,1,2,3 -> content 0,2,4,6 — slots 2/3 land on DIFFERENT
    // content frames. Pin the PICK RULE itself (adjacent gradient frames
    // differ by a uniform +7, which the sign hash may alias — the r15
    // lesson — so hash inequality is not the invariant; the pick is):
    // each canonical slot's hash equals the picked clip frame's raw hash
    val raw = fh.collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
    for ((vid, nf) <- Seq((10L, 10), (11L, 5)); k <- 0 until 4) {
      assert(canon((vid, k)) == raw((vid, k * nf / 4)),
        s"slot $k of clip $vid must carry clip frame ${k * nf / 4}'s hash")
    }
    assert(canon((10L, 0)) == canon((11L, 0)) && canon((10L, 1)) == canon((11L, 1)),
      "off-lattice slots 0/1 still agree (picks 0,2 compose exactly)")
  }

  test("trimmed GIF clones render frame-for-frame identical to the base's offset frames") {
    // the trimmed-clone contract videoTrimFixtureRow rests on: a clip
    // encoded with (frames - t, frameBase = t0) hashes frame f exactly as
    // the base hashes frame f + t0 — so the containment verify's aligned
    // sums read 0 at the true anchor
    val df = spark.createDataFrame(Seq(
      (0L, ImageCodec.encodeAnimatedGifVariant(24, 16, 6, 9)),
      (1L, ImageCodec.encodeAnimatedGifVariant(24, 16, 4, 9, frameBase = 2))))
      .toDF("id", "blob")
    val fh = df.select(col("id"),
        explode(Multimodal.frameDhashes(col("blob"), 1)).as("fr"))
      .select(col("id"), col("fr.frame").as("f"), col("fr.h").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 4).foreach { f =>
      assert(fh((1L, f)) == fh((0L, f + 2)),
        s"trimmed frame $f must hash as base frame ${f + 2}")
    }
  }

  test("segment fingerprints: aligned trims shift the sequence; edits stay in one segment; partial tails drop") {
    val L = 330
    def segs(b: Array[Byte]) = AudioCodec.segmentFingerprintsRow(b, L)
    val base = segs(AudioCodec.encodeAudioVariant(5 * L, 9))
    assert(base != null && base.numElements() == 5)
    // the suffix-identity contract the offset gates rest on: a clone
    // rendering samples [2L, 5L) hashes segment s exactly as the base
    // hashes segment s + 2
    val trim = segs(AudioCodec.encodeAudioVariant(3 * L, 9, sampleBase = 2 * L))
    assert(trim.numElements() == 3)
    (0 until 3).foreach { s =>
      assert(trim.getStruct(s, 2).getLong(1) == base.getStruct(s + 2, 2).getLong(1),
        s"trimmed segment $s must hash as base segment ${s + 2}")
    }
    // a single-sample edit perturbs one window of ONE segment: <= 2 bits
    // there, zero everywhere else
    val edit = segs(AudioCodec.encodeAudioVariant(5 * L, 9, editAt = 5 * L / 2))
    val dists = (0 until 5).map(s => java.lang.Long.bitCount(
      base.getStruct(s, 2).getLong(1) ^ edit.getStruct(s, 2).getLong(1)))
    assert(dists.count(_ > 0) <= 1 && dists.sum <= 2, s"edit spread: $dists")
    // a trailing partial segment drops (its windows would depend on the
    // trim remainder, breaking suffix identity)
    val tail = segs(AudioCodec.encodeAudioVariant(5 * L + 100, 9))
    assert(tail.numElements() == 5)
    (0 until 5).foreach { s =>
      assert(tail.getStruct(s, 2).getLong(1) == base.getStruct(s, 2).getLong(1))
    }
    // refusals: segLen not a multiple of 33; clip under one segment
    assert(AudioCodec.segmentFingerprintsRow(
      AudioCodec.encodeAudioVariant(5 * L, 9), 100) == null)
    assert(segs(AudioCodec.encodeAudioVariant(200, 1)) == null)
    // 16-bit clips segment too (shared decode rule with fingerprintRow)
    val wide = AudioCodec.segmentFingerprintsRow(
      AudioCodec.encodeAudioVariant16("wav", 3 * L, 9), L)
    assert(wide != null && wide.numElements() == 3)
    // the Catalyst expression matches the kernel through codegen
    val df = spark.createDataFrame(Seq(
      (1L, AudioCodec.encodeAudioVariant(5 * L, 9)),
      (2L, "garbage".getBytes("UTF-8")))).toDF("id", "blob")
    val got = df.select(col("id"),
        Multimodal.audioSegmentFingerprints(col("blob"), L).as("sh"))
      .orderBy("id").collect()
    assert(got(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) ==
      (0 until 5).map(s => base.getStruct(s, 2).getLong(1)))
    assert(got(1).isNullAt(1))
  }

  test("dual-phase segment grids: a phase grid equals the matching trim's zero-phase grid") {
    val L = 330
    val base = AudioCodec.encodeAudioVariant(6 * L, 5)
    // the sub-segment contract (r15 verdict #4): the base's phase-165
    // grid hashes segment-for-segment as its 165-sample-trimmed clone's
    // phase-0 grid — so dual-phase fingerprinting makes half-segment
    // trims a plain segment-aligned containment problem
    val p1 = AudioCodec.segmentFingerprintsRow(base, L, 165)
    val trimmed = AudioCodec.segmentFingerprintsRow(
      AudioCodec.encodeAudioVariant(6 * L - 165, 5, sampleBase = 165), L, 0)
    assert(p1 != null && trimmed != null)
    assert(p1.numElements() == 5 && trimmed.numElements() == 5)
    (0 until 5).foreach { s =>
      assert(p1.getStruct(s, 2).getLong(1) == trimmed.getStruct(s, 2).getLong(1),
        s"phase-165 segment $s must hash as the trimmed clone's phase-0 segment $s")
    }
    // phase 0 is the original surface, verbatim
    val p0a = AudioCodec.segmentFingerprintsRow(base, L, 0)
    val p0b = AudioCodec.segmentFingerprintsRow(base, L)
    assert((0 until 6).forall(s =>
      p0a.getStruct(s, 2).getLong(1) == p0b.getStruct(s, 2).getLong(1)))
    // refusals: out-of-range phases; a clip too short for one full
    // phase-shifted segment
    assert(AudioCodec.segmentFingerprintsRow(base, L, -1) == null)
    assert(AudioCodec.segmentFingerprintsRow(base, L, L) == null)
    assert(AudioCodec.segmentFingerprintsRow(
      AudioCodec.encodeAudioVariant(L + 100, 5), L, 165) == null)
    // the Catalyst expression carries the phase through codegen
    val df = spark.createDataFrame(Seq((1L, base))).toDF("id", "blob")
    val got = df.select(
      Multimodal.audioSegmentFingerprints(col("blob"), L, 165).as("sh")).collect()
    assert(got(0).getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)) ==
      (0 until 5).map(s => p1.getStruct(s, 2).getLong(1)))
  }

  test("16-bit audio fingerprint: WAV == AIFF byte-order identity; edits within 2 bits; 8<->16 never aliases") {
    val n = 33 * 20
    // cross-container identity: SAME samples stored little-endian (WAV)
    // and big-endian (AIFF) must fingerprint IDENTICALLY — the hash is a
    // function of decoded samples, never of container byte order
    val wav = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant16("wav", n, 5))
    val aiff = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant16("aiff", n, 5))
    assert(wav != null && aiff != null && wav == aiff)
    // 32-bit contract: nonnegative, sign-safe band arithmetic
    assert(wav >= 0L && wav < (1L << 32))
    // single-sample edit perturbs one window sum: <= 2 bits, cross-container too
    val edit = AudioCodec.fingerprintRow(
      AudioCodec.encodeAudioVariant16("aiff", n, 5, editAt = n / 2))
    assert(java.lang.Long.bitCount(wav.longValue() ^ edit.longValue()) <= 2)
    // different seeds are far apart; exact re-encode is bit-identical
    val other = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant16("wav", n, 6))
    assert(java.lang.Long.bitCount(wav.longValue() ^ other.longValue()) > 3)
    assert(AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant16("wav", n, 5)) == wav)
    // 8<->16 non-aliasing: the two widths are different quantizations of
    // different sample domains — same-seed clips must NOT sit within the
    // hamming-3 verify threshold
    (0 until 8).foreach { seed =>
      val wide = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant16("wav", n, seed))
      val narrow = AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant(n, seed))
      assert(java.lang.Long.bitCount(wide.longValue() ^ narrow.longValue()) > 3,
        s"8/16-bit fingerprints alias at seed $seed")
    }
    // refusal: under-33-frame wide clips
    assert(AudioCodec.fingerprintRow(AudioCodec.encodeAudioVariant16("wav", 20, 1)) == null)
    // the Catalyst expression matches the wide row kernel through codegen
    val df = spark.createDataFrame(Seq(
      (1L, AudioCodec.encodeAudioVariant16("aiff", n, 5)))).toDF("id", "blob")
    val got = df.select(Multimodal.audioFingerprint(col("blob")).as("h")).head
    assert(got.getLong(0) == wav.longValue())
  }
  test("dHash properties over random fixtures: pick-edits stay within 2 bits; hamming <= 3 always shares a band") {
    val rnd = new scala.util.Random(20260815L) // seeded: deterministic run
    (0 until 25).foreach { _ =>
      val w = 9 + rnd.nextInt(120)
      val h = 9 + rnd.nextInt(80)
      val seed = rnd.nextInt(1000)
      val gx = rnd.nextInt(8)
      val gy = rnd.nextInt(8)
      val base = ImageCodec.dhashRow(ImageCodec.encodeImageVariant("png", w, h, seed))
      // an edit at ANY grid pick flips at most the two comparisons that
      // touch that cell — the near-clone bound the gates rely on
      val clone = ImageCodec.dhashRow(
        ImageCodec.encodeImageVariant("png", w, h, seed, gx * w / 8, gy * h / 8))
      assert(base != null && clone != null)
      val d = java.lang.Long.bitCount(base.longValue() ^ clone.longValue())
      assert(d <= 2, s"pick-edit at ($gx,$gy) on ${w}x$h seed $seed drifted to hamming $d")
      // pigeonhole, checked on the real key scheme: any pair within
      // hamming 3 shares at least one of the 4 x 14-bit band keys
      val bandsOf = (v: Long) => (0 until 4).map(k => ((v >> (k * 14)) & 16383L, k)).toSet
      if (d <= 3)
        assert(bandsOf(base.longValue()).intersect(bandsOf(clone.longValue())).nonEmpty)
    }
  }

  test("frameDhash properties over random fixtures: one-frame pick-edits stay within 2 bits of that frame; frame-0 nomination is complete") {
    val rnd = new scala.util.Random(20260816L) // seeded: deterministic run
    (0 until 15).foreach { _ =>
      val w = 9 + rnd.nextInt(60)
      val h = 9 + rnd.nextInt(40)
      val nf = 2 + rnd.nextInt(6)
      val seed = rnd.nextInt(1000)
      val ef = rnd.nextInt(nf)
      val gx = rnd.nextInt(8)
      val gy = rnd.nextInt(8)
      val base = ImageCodec.frameDhashRow(
        ImageCodec.encodeAnimatedGifVariant(w, h, nf, seed), 1)
      val clone = ImageCodec.frameDhashRow(
        ImageCodec.encodeAnimatedGifVariant(w, h, nf, seed, ef, gx * w / 8, gy * h / 8), 1)
      assert(base != null && clone != null && base.numElements() == nf)
      val dists = (0 until nf).map(f => java.lang.Long.bitCount(
        base.getStruct(f, 2).getLong(1) ^ clone.getStruct(f, 2).getLong(1)))
      (0 until nf).foreach { f =>
        if (f == ef) assert(dists(f) <= 2,
          s"edited frame $f of ${w}x$h nf=$nf seed=$seed drifted to hamming ${dists(f)}")
        else assert(dists(f) == 0,
          s"untouched frame $f of ${w}x$h nf=$nf seed=$seed drifted to hamming ${dists(f)}")
      }
      // frame-0 nomination completeness on the real key scheme: a pair
      // within TOTAL aligned hamming 3 shares a frame-0 band (the
      // pigeonhole claim videoBands' two-plane state relies on)
      if (dists.sum <= 3) {
        val bandsOf = (v: Long) => (0 until 4).map(k => ((v >> (k * 14)) & 16383L, k)).toSet
        assert(bandsOf(base.getStruct(0, 2).getLong(1))
          .intersect(bandsOf(clone.getStruct(0, 2).getLong(1))).nonEmpty)
      }
    }
  }

  test("frameDhashes: per-frame hashes match the closed form; a one-pixel edit touches one frame by <= 2 bits") {
    // the exact recomputation the video gates' DuckDB oracles evaluate —
    // pinning it here in Scala keeps the cross-engine formula honest
    def expectedHash(w: Int, h: Int, f: Int, seed: Int,
                     ef: Int = -1, ex: Int = -1, ey: Int = -1): Long = {
      def v(x: Int, y: Int): Int = {
        val v0 = (x * (31 + 11 * seed) + y * (17 + 5 * seed) + f * 7) % 256
        if (f == ef && x == ex && y == ey) (v0 + 128) % 256 else v0
      }
      val gray = Array.tabulate(8, 8)((y, x) => v(x * w / 8, y * h / 8))
      var hh = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (gray(y)(x + 1) > gray(y)(x)) hh |= 1L << (y * 7 + x)
      hh
    }
    val (w, h, nf, seed) = (19, 12, 4, 5)
    val base = ImageCodec.frameDhashRow(ImageCodec.encodeAnimatedGifVariant(w, h, nf, seed), 1)
    assert(base != null && base.numElements() == nf)
    (0 until nf).foreach { f =>
      val r = base.getStruct(f, 2)
      assert(r.getInt(0) == f)
      assert(r.getLong(1) == expectedHash(w, h, f, seed),
        s"frame $f hash must match the closed form the oracle recomputes")
    }
    // an exact re-encode hashes identically, frame for frame
    val again = ImageCodec.frameDhashRow(ImageCodec.encodeAnimatedGifVariant(w, h, nf, seed), 1)
    assert((0 until nf).forall(f =>
      again.getStruct(f, 2).getLong(1) == base.getStruct(f, 2).getLong(1)))
    // a single-pixel edit at the grid-(3,3) pick of frame 2: that frame
    // drifts by <= 2 bits, every other frame is bit-identical
    val (ex, ey) = (3 * w / 8, 3 * h / 8)
    val clone = ImageCodec.frameDhashRow(
      ImageCodec.encodeAnimatedGifVariant(w, h, nf, seed, 2, ex, ey), 1)
    (0 until nf).foreach { f =>
      val d = java.lang.Long.bitCount(
        base.getStruct(f, 2).getLong(1) ^ clone.getStruct(f, 2).getLong(1))
      if (f == 2) assert(d <= 2, s"edited frame drifted to hamming $d")
      else assert(d == 0, s"untouched frame $f drifted to hamming $d")
      assert(clone.getStruct(f, 2).getLong(1) ==
        expectedHash(w, h, f, seed, 2, ex, ey))
    }
    // stride samples frames 0, 2; refusals: undecodable bytes, under-8px
    // canvas (dHash needs the grid), non-positive stride
    val strided = ImageCodec.frameDhashRow(ImageCodec.encodeAnimatedGifVariant(w, h, nf, seed), 2)
    assert(strided.numElements() == 2 &&
      strided.getStruct(1, 2).getInt(0) == 2)
    assert(ImageCodec.frameDhashRow("not a gif".getBytes, 1) == null)
    assert(ImageCodec.frameDhashRow(ImageCodec.encodeAnimatedGifVariant(7, 12, 2, 1), 1) == null)
    assert(ImageCodec.frameDhashRow(ImageCodec.encodeAnimatedGifVariant(19, 12, 2, 1), 0) == null)
    // single-frame stills agree with dhashRow (one shared grid core)
    val png = ImageCodec.encodeImageVariant("png", 24, 16, 3)
    val one = ImageCodec.frameDhashRow(png, 1)
    assert(one.numElements() == 1 &&
      one.getStruct(0, 2).getLong(1) == ImageCodec.dhashRow(png).longValue())
  }

  test("frame sampling and hashing honor GIF disposal methods on the uncovered rect") {
    // frame 1's delta carries a disposalMethod; frame 2 paints elsewhere,
    // so frame 2's rendered canvas at frame 1's now-uncovered rect IS the
    // disposal semantics: none/doNotDispose keep frame 1's pixels,
    // restoreToBackgroundColor blacks them, restoreToPrevious restores
    // frame 0's — the composite-walk branches the video hashes depend on
    val (w, h, sw, sh) = (19, 9, 4, 3)
    val (x1, y1, x2, y2) = (2, 1, 12, 5)
    def g0(x: Int, y: Int): Int = (x * 31 + y * 17) & 0xFF
    def d(f: Int)(x: Int, y: Int): Int = (x * 31 + y * 17 + f * 7) & 0xFF
    def rendered2(disposal: String): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v =
          if (x >= x2 && x < x2 + sw && y >= y2 && y < y2 + sh) d(2)(x - x2, y - y2)
          else if (x >= x1 && x < x1 + sw && y >= y1 && y < y1 + sh) disposal match {
            case "restoreToBackgroundColor" => 0
            case "restoreToPrevious"        => g0(x, y)
            case _                          => d(1)(x - x1, y - y1)
          }
          else g0(x, y)
        img.setRGB(x, y, v << 16 | v << 8 | v)
      }
      img
    }
    for (disposal <- Seq("none", "doNotDispose",
        "restoreToBackgroundColor", "restoreToPrevious")) {
      val blob = ImageCodec.encodeDisposalGif(w, h, sw, sh, x1, y1, x2, y2, disposal)
      val frames = ImageCodec.frameSampleRow(blob, 1)
      assert(frames != null && frames.numElements() == 3, s"$disposal: 3 frames")
      // frame 1 samples BEFORE its own disposal applies — identical across
      // methods: base with frame 1's rect replaced by its delta
      val exp1 = (0 until h).flatMap(y => (0 until w).map { x =>
        if (x >= x1 && x < x1 + sw && y >= y1 && y < y1 + sh)
          d(1)(x - x1, y - y1).toLong
        else g0(x, y).toLong
      }).sum
      assert(frames.getStruct(1, 6).getLong(4) == exp1,
        s"$disposal: frame-1 rendered sum")
      val exp = rendered2(disposal)
      var expSum = 0L
      for (y <- 0 until h; x <- 0 until w) expSum += (exp.getRGB(x, y) >> 8) & 0xFF
      assert(frames.getStruct(2, 6).getLong(4) == expSum,
        s"$disposal: frame-2 rendered sum must follow the disposal rule")
      // the hash path composites through the same walk: frame 2's dHash
      // equals the dHash of the manually rendered canvas
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(exp, "png", bos)
      val hashes = ImageCodec.frameDhashRow(blob, 1)
      assert(hashes.getStruct(2, 2).getLong(1) ==
        ImageCodec.dhashRow(bos.toByteArray).longValue(),
        s"$disposal: frame-2 hash must be the rendered canvas's")
    }
  }

  test("frameDhashes hashes the RENDERED frame of optimized GIFs, not the stored delta") {
    // delta-coded frames: hash must equal the dHash of the manually
    // composited canvas (frame-0 gradient with the sub-rect replaced),
    // which we pin by re-encoding that canvas losslessly and dhash-ing it
    val (w, h, subW, subH, offX, offY) = (19, 9, 4, 3, 2, 1)
    val blob = ImageCodec.encodeOptimizedGif(w, h, 3, subW, subH, offX, offY)
    val hashes = ImageCodec.frameDhashRow(blob, 1)
    assert(hashes != null && hashes.numElements() == 3)
    def rendered(f: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 31 + y * 17) & 0xFF // frame-0 base
        img.setRGB(x, y, v << 16 | v << 8 | v)
      }
      if (f > 0)
        for (y <- 0 until subH; x <- 0 until subW) {
          val v = (x * 31 + y * 17 + f * 7) & 0xFF // delta, sub-raster coords
          img.setRGB(offX + x, offY + y, v << 16 | v << 8 | v)
        }
      img
    }
    (0 until 3).foreach { f =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(rendered(f), "png", bos)
      val expected = ImageCodec.dhashRow(bos.toByteArray)
      assert(hashes.getStruct(f, 2).getLong(1) == expected.longValue(),
        s"frame $f must hash the composited canvas")
    }
  }
}
