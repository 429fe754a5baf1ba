package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL function surface: every graft_* name must produce the same
  * result AND the same plan shape as its DataFrame twin (expression-tree
  * registration — nothing becomes a UDF).
  */
class SqlFunctionsSpec extends SparkSpec {

  test("graft_* SQL functions match their DataFrame twins") {
    SqlFunctions.install(spark)
    spark.sql("SELECT * FROM VALUES (1L, 'the quick brown fox the fox'), " +
      "(2L, 'pack my box with five dozen jugs') AS t(id, text)")
      .createOrReplaceTempView("docs")

    val viaSql = spark.sql(
      """SELECT id, graft_token_count(text) AS n, graft_minhash(text, 4) AS mh,
        |  graft_simhash(text) AS sh, graft_fingerprint(text) AS fp,
        |  graft_uuid(text) AS u
        |FROM docs ORDER BY id""".stripMargin).collect()
    val viaDf = spark.table("docs").select(col("id"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.minhashSignature(col("text"), 4).as("mh"),
        TextFunctions.simhash(col("text")).as("sh"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TimeFunctions.uuidFromBytes(col("text")).as("u"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaDf.toSeq)

    // vectors + time + sniff
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0)) AS c,
        |  graft_time_to_string(graft_time_from_string('12:34:56')) AS t,
        |  graft_sniff_format(encode('%PDF-1.7', 'UTF-8')) AS f""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9 && r.getString(1) == "12:34:56" &&
      r.getString(2) == "pdf")

    // no UDF anywhere in the plan: the SQL path is the same codegen'd tree
    val plan = spark.sql("SELECT graft_minhash(text, 4) FROM docs")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("Invoke"),
      s"SQL function surface must not introduce UDFs:\n$plan")

    // non-literal k is rejected with a clear message
    val err = intercept[Exception](spark.sql("SELECT graft_minhash(text, id) FROM docs").collect())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }
  test("graft_image_dhash: SQL twin matches the DataFrame expression and the row kernel") {
    import graft.operators.{ImageCodec, Multimodal}
    val blob = ImageCodec.encodeImageVariant("png", 40, 18, 5)
    val want = ImageCodec.dhashRow(blob).longValue()
    spark.createDataFrame(Seq((1L, blob))).toDF("id", "blob")
      .createOrReplaceTempView("dhash_imgs")
    val viaSql = spark.sql("SELECT graft_image_dhash(blob) AS h FROM dhash_imgs")
      .head().getLong(0)
    val viaDf = spark.createDataFrame(Seq((1L, blob))).toDF("id", "blob")
      .select(Multimodal.imageDhash(org.apache.spark.sql.functions.col("blob")))
      .head().getLong(0)
    assert(viaSql == want && viaDf == want)
    assert(spark.sql("SELECT graft_image_dhash(encode('junk', 'UTF-8')) AS h")
      .head().isNullAt(0))
  }

  test("graft_frame_dhashes: SQL twin matches the row kernel, explodes row-locally, rejects non-literal stride") {
    import graft.operators.ImageCodec
    val blob = ImageCodec.encodeAnimatedGifVariant(19, 12, 4, 5)
    val want = ImageCodec.frameDhashRow(blob, 2)
    spark.createDataFrame(Seq((1L, blob))).toDF("id", "blob")
      .createOrReplaceTempView("fdh_vids")
    val rows = spark.sql(
      """SELECT id, f.frame, f.h
        |FROM fdh_vids LATERAL VIEW explode(graft_frame_dhashes(blob, 2)) AS f
        |ORDER BY f.frame""".stripMargin).collect()
    assert(rows.length == want.numElements())
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) == want.getStruct(i, 2).getInt(0) &&
        r.getLong(2) == want.getStruct(i, 2).getLong(1))
    }
    assert(spark.sql("SELECT graft_frame_dhashes(encode('junk', 'UTF-8'), 1) AS fh")
      .head().isNullAt(0))
    val err = intercept[Exception](
      spark.sql("SELECT graft_frame_dhashes(blob, id) FROM fdh_vids").collect())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("graft_audio_segments: SQL twin matches the row kernel, rejects non-literal segLen") {
    import graft.operators.AudioCodec
    val blob = AudioCodec.encodeAudioVariant(4 * 330, 7)
    val want = AudioCodec.segmentFingerprintsRow(blob, 330)
    spark.createDataFrame(Seq((1L, blob))).toDF("id", "blob")
      .createOrReplaceTempView("aseg_clips")
    val rows = spark.sql(
      """SELECT g.seg, g.h
        |FROM aseg_clips LATERAL VIEW explode(graft_audio_segments(blob, 330)) AS g
        |ORDER BY g.seg""".stripMargin).collect()
    assert(rows.length == want.numElements())
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == want.getStruct(i, 2).getInt(0) &&
        r.getLong(1) == want.getStruct(i, 2).getLong(1))
    }
    assert(spark.sql("SELECT graft_audio_segments(encode('junk', 'UTF-8'), 330) AS sh")
      .head().isNullAt(0))
    val err = intercept[Exception](
      spark.sql("SELECT graft_audio_segments(blob, id) FROM aseg_clips").collect())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }
}
