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
      Row(7L, Array(0x89.toByte))) // too short for any magic: unknown
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", LongType), StructField("blob", BinaryType))))
    val got = df.select(col("id"), Multimodal.sniffFormat(col("blob")).as("fmt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "pdf",
      5L -> "mp3", 6L -> "unknown", 7L -> "unknown"))
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
    // ...but full pixel decode refuses before allocating the raster
    assert(ImageCodec.decodeStatsRow(bomb) == null)
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
}
