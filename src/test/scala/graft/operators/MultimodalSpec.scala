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
