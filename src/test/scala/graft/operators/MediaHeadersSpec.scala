package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Pure-byte mp3/mp4 header parsing: the fixture encoders are closed-form,
  * so every decoded field is checked against the constructor's arguments
  * (and the public MPEG tables) — no codec on either side.
  */
class MediaHeadersSpec extends SparkSpec {

  private def mp3Df(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(rows).toDF("id", "blob")
      .withColumn("dec", Multimodal.decodeMp3(col("blob")))

  test("mp3: full sweep of version x layer x bitrate x samplerate x channel mode") {
    // every valid (versionBits, layerBits) pair, all 14 usable bitrate
    // indices, all 3 sample-rate indices, all 4 channel modes, both paddings
    val params = for {
      vb <- Seq(0, 2, 3); lb <- Seq(1, 2, 3); br <- 1 to 14
      sr <- 0 to 2; cm <- Seq(0, 3); pad <- Seq(0, 1)
    } yield (vb, lb, br, sr, cm, pad)
    val rows = params.zipWithIndex.map { case ((vb, lb, br, sr, cm, pad), i) =>
      (i.toLong, MediaHeaders.encodeMp3(vb, lb, br, sr, cm, pad, if (i % 7 == 0) 33 else -1))
    }
    val got = mp3Df(rows).select("id", "dec.*").orderBy("id").collect()
    assert(got.length == params.length)
    got.zip(params).foreach { case (r, (vb, lb, br, sr, cm, pad)) =>
      val layer = 4 - lb
      assert(r.getString(1) == (vb match {
        case 3 => "mpeg1"; case 2 => "mpeg2"; case _ => "mpeg2.5" }))
      assert(r.getInt(2) == layer)
      val kbps = (vb, layer) match {
        case (3, 1) => Seq(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)(br - 1)
        case (3, 2) => Seq(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)(br - 1)
        case (3, 3) => Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(br - 1)
        case (_, 1) => Seq(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)(br - 1)
        case _      => Seq(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(br - 1)
      }
      assert(r.getInt(3) == kbps)
      val rate = vb match {
        case 3 => Seq(44100, 48000, 32000)(sr)
        case 2 => Seq(22050, 24000, 16000)(sr)
        case _ => Seq(11025, 12000, 8000)(sr)
      }
      assert(r.getInt(4) == rate)
      assert(r.getInt(5) == (if (cm == 3) 1 else 2))
      val expectFrame = layer match {
        case 1 => (12 * kbps * 1000 / rate + pad) * 4
        case 2 => 144 * kbps * 1000 / rate + pad
        case _ => (if (vb == 3) 144 else 72) * kbps * 1000 / rate + pad
      }
      assert(r.getInt(6) == expectFrame)
      // and the fixture really is frame_bytes long (plus any ID3 prologue)
    }
  }

  test("mp3: undecodable bytes yield null, not garbage") {
    val bad = Seq[(Long, Array[Byte])](
      (0L, Array.empty[Byte]),
      (1L, "plain text".getBytes("UTF-8")),
      (2L, Array(0xFF.toByte, 0x00, 0x00, 0x00)), // sync broken in byte 2
      (3L, MediaHeaders.encodeMp3(3, 1, 0, 0, 0, 0, -1)), // free bitrate refused
      (4L, MediaHeaders.encodeMp3(3, 1, 15, 0, 0, 0, -1)), // bad bitrate refused
      (5L, Array(0xFF.toByte, 0xEA.toByte, 0x10, 0x00)), // reserved version bits
      (6L, Array(0xFF.toByte, 0xE1.toByte, 0x10, 0x00)), // reserved layer bits
      (7L, Array(0xFF.toByte, 0xFB.toByte, 0x1C, 0x00)), // reserved sample-rate idx
      (8L, "ID3".getBytes("UTF-8") ++ Array[Byte](4, 0, 0, 0x7F, 0x7F, 0x7F, 0x7F)), // ID3 overruns
      (9L, Array(0xFF.toByte, 0xFB.toByte)) // too short for a header
    )
    val got = mp3Df(bad).orderBy("id").collect()
    assert(got.forall(_.isNullAt(2)), "all malformed blobs must decode to NULL")
  }

  test("mp3: ID3v2 tag skipped via syncsafe length, including 0-byte tags") {
    Seq(0, 1, 127, 128, 300).foreach { id3 =>
      val bytes = MediaHeaders.encodeMp3(3, 1, 9, 0, 3, 0, id3)
      val row = MediaHeaders.decodeMp3Row(bytes)
      assert(row != null && row.getInt(3) == 44100 && row.getInt(4) == 1,
        s"ID3 size $id3 must be skipped exactly")
    }
  }

  test("mp4: brands, timescale/duration, first video track dims, track count") {
    val fixtures = Seq(
      ("isom", 600L, 1200L, Seq.empty[(Int, Int)]),
      ("mp42", 1000L, 90000L, Seq((1920, 1080))),
      ("avc1", 30000L, 123456789L, Seq((0, 0), (640, 360))), // audio-first: dims skip 0x0
      ("dash", 90000L, 0L, Seq((320, 240), (1280, 720))) // first sized track wins
    )
    val rows = fixtures.zipWithIndex.map { case ((b, ts, d, tr), i) =>
      (i.toLong, MediaHeaders.encodeMp4(b, ts, d, tr))
    }
    val got = spark.createDataFrame(rows).toDF("id", "blob")
      .withColumn("dec", Multimodal.decodeMp4(col("blob")))
      .select("id", "dec.*").orderBy("id").collect()
    got.zip(fixtures).foreach { case (r, (b, ts, d, tr)) =>
      assert(r.getString(1) == b && r.getLong(2) == ts && r.getLong(3) == d)
      val sized = tr.find { case (w, h) => w > 0 || h > 0 }
      sized match {
        case Some((w, h)) => assert(r.getInt(4) == w && r.getInt(5) == h)
        case None => assert(r.isNullAt(4) && r.isNullAt(5))
      }
      assert(r.getInt(6) == tr.size)
    }
  }

  test("mp4: mvhd version 1 (64-bit duration) and largesize boxes parse") {
    // Hand-assemble: ftyp + moov{mvhd v1} where moov uses size==1 largesize.
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (24 to 0 by -8).foreach(s => out.write(((v >> s) & 0xFF).toInt))
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xFFFFFFFFL) }
    def wt(t: String): Unit = t.foreach(c => out.write(c.toInt))
    w32(20); wt("ftyp"); wt("isom"); w32(0); wt("isom")
    val mvhdV1 = 8 + 4 + 8 + 8 + 4 + 8 // header + ver/flags + times + timescale + duration
    w32(1); wt("moov"); w64(16L + mvhdV1) // largesize moov
    w32(mvhdV1); wt("mvhd"); out.write(1); out.write(0); out.write(0); out.write(0)
    w64(0); w64(0) // creation/modification (64-bit in v1)
    w32(48000) // timescale
    w64(5000000000L) // duration > 2^32
    val row = MediaHeaders.decodeMp4Row(out.toByteArray)
    assert(row != null && row.getLong(1) == 48000L && row.getLong(2) == 5000000000L)
  }

  test("mp4: malformed trees yield null (overrun size, size < header, no moov)") {
    val bad = Seq(
      Array[Byte](0, 0, 0, 64) ++ "ftyp".getBytes("UTF-8"), // claims 64 bytes, has 8
      Array[Byte](0, 0, 0, 2) ++ "ftyp".getBytes("UTF-8"), // size < header
      MediaHeaders.encodeMp4("isom", 600, 1200, Nil).take(20), // ftyp only
      "not a container at all, just text bytes".getBytes("UTF-8"),
      Array.empty[Byte])
    bad.foreach(b => assert(MediaHeaders.decodeMp4Row(b) == null))
  }

  test("mp4: empty-payload tkhd never reads past its box") {
    // ADVICE r9: bytes(payload) used to read the NEXT box's first byte (or
    // throw on the last box) when a tkhd carried no payload at all.
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (24 to 0 by -8).foreach(s => out.write(((v >> s) & 0xFF).toInt))
    def wt(t: String): Unit = t.foreach(c => out.write(c.toInt))
    w32(20); wt("ftyp"); wt("isom"); w32(0); wt("isom")
    val mvhd = 8 + 4 + 8 + 4 + 4 // header + ver/flags + times + timescale + duration (v0)
    val trakLast = 8 + 8 // trak wrapping a header-only tkhd as the LAST box
    w32(8L + mvhd + trakLast); wt("moov")
    w32(mvhd); wt("mvhd"); w32(0); w32(0); w32(0); w32(600); w32(1200)
    w32(trakLast); wt("trak"); w32(8); wt("tkhd") // empty tkhd payload
    val row = MediaHeaders.decodeMp4Row(out.toByteArray)
    // the tree is otherwise valid: decode must survive, count the track,
    // and report no dimensions — not throw or read a phantom version byte
    assert(row != null && row.getLong(1) == 600L && row.getInt(5) == 1)
    assert(row.isNullAt(3) && row.isNullAt(4))
  }

  test("mp4: encodeMp4 refuses values that overflow mvhd v0's 32 bits") {
    intercept[IllegalArgumentException](
      MediaHeaders.encodeMp4("isom", 1L << 32, 100L, Nil))
    intercept[IllegalArgumentException](
      MediaHeaders.encodeMp4("isom", 600L, 1L << 32, Nil))
    intercept[IllegalArgumentException](
      MediaHeaders.encodeMp4("isom", -1L, 100L, Nil))
  }

  test("decodeMp3/decodeMp4 stay in whole-stage codegen (no UDF in the plan)") {
    val df = spark.createDataFrame(Seq(
      (1L, MediaHeaders.encodeMp3(3, 1, 9, 0, 3, 0, -1)),
      (2L, MediaHeaders.encodeMp4("isom", 600, 1200, Seq((320, 240))))))
      .toDF("id", "blob")
      .select(Multimodal.decodeMp3(col("blob")).as("a"), Multimodal.decodeMp4(col("blob")).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
    val rows = df.collect()
    assert(rows.count(r => !r.isNullAt(0)) == 1 && rows.count(r => !r.isNullAt(1)) == 1)
  }

  test("sniffFormat routes mp4 blobs by the positional ftyp magic") {
    val df = spark.createDataFrame(Seq(
      (1L, MediaHeaders.encodeMp4("isom", 600, 1200, Nil)),
      (2L, MediaHeaders.encodeMp3(3, 1, 9, 0, 3, 0, 33)),
      (3L, "neither".getBytes("UTF-8")))).toDF("id", "blob")
      .select(col("id"), Multimodal.sniffFormat(col("blob")).as("fmt"))
      .orderBy("id").collect()
    assert(df.map(_.getString(1)).toSeq == Seq("mp4", "mp3", "unknown"))
  }
}
