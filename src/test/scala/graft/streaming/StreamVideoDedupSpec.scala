package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructType}

/** Certifies the shipped streaming video-dedup crawl loop
  * ([[graft.queries.Extensions.streamIncrementalVideoDedup]], the
  * x_stream_incremental_video_dedup pipeline) on planted clips where
  * near-dup rejection crosses the micro-batch boundary, plus BOTH crash
  * windows of the three-commit (results → sequences → bands) order,
  * checkpoint idempotency, and the pruned band-plane nomination probe.
  */
class StreamVideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("vid_id", LongType).add("blob", BinaryType)

  // slice 0 admits videos 1 and 3; slice 1 brings a one-frame-edited
  // clone of video 1 (id 11 — must reject via the planes batch 0
  // appended, the cross-batch distinction) and a fresh video (id 13)
  private def fixtureRows = Seq(
    Extensions.videoFixtureRow(1L, 1, 40, 18, 3, edit = false),
    Extensions.videoFixtureRow(3L, 3, 32, 20, 4, edit = false),
    Extensions.videoFixtureRow(11L, 1, 40, 18, 3, edit = true),
    Extensions.videoFixtureRow(13L, 7, 36, 17, 5, edit = false))

  private def batchDf = fixtureRows.toDF("vid_id", "blob")

  private def newTables() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val emptyFh = Extensions.videoFrameHashes(batchDf.limit(0))
    val bands = cat.createTable("db.vid_bands_spec",
      Extensions.videoBands(emptyFh).select("vid_id", "band_key").schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val sigs = cat.createTable("db.vid_sigs_spec", emptyFh.schema,
      partitionBy = Seq("vid_id" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "vid_id"))
    val results = cat.createTable("db.vid_adm_spec",
      new StructType().add("vid_id", LongType))
    (bands, sigs, results)
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-svidspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(col("vid_id") < 10L, 0).otherwise(1), 2)
    stage
  }

  test("a one-frame-edited clone of an earlier slice's admission rejects via the durable planes") {
    val (bands, sigs, results) = newTables()
    val batches = Extensions.streamIncrementalVideoDedup(
      spark, stageSlices(), docsSchema, bands, sigs, results)
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 13L),
      s"admissions wrong: $admitted (11 is an edited clone of slice-0's 1)")
    // band plane: 4 frame-0 bands per admitted video; sequence plane: one
    // row per admitted frame (nf 3 + 4 + 5)
    assert(bands.toDF(spark).count() == 12L)
    assert(sigs.toDF(spark).count() == 12L)
    assert(results.meta.snapshots.size == 2 && sigs.meta.snapshots.size == 2 &&
      bands.meta.snapshots.size == 2,
      "one statementId-keyed commit per table per batch")
  }

  test("crash after the results commit: replay completes both planes, results no-op") {
    val (bands, sigs, results) = newTables()
    val stage = stageSlices()
    results.append(spark, Seq(1L, 3L).toDF("vid_id"),
      statementId = Some(s"$stage-vres-0"))
    val batches = Extensions.streamIncrementalVideoDedup(
      spark, stage, docsSchema, bands, sigs, results)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSeq
    assert(admitted.sorted == Seq(1L, 3L, 13L),
      s"replay must not double-admit: $admitted")
    assert(sigs.toDF(spark).count() == 12L && bands.toDF(spark).count() == 12L,
      "the replayed batch's plane appends must complete")
    assert(results.meta.snapshots.size == 2,
      "pre-applied batch-0 results + batch 1 — the replayed commit must no-op")
  }

  test("crash between the sequence and band commits: verdicts replay identically (nomination never reads sequences)") {
    val (bands, sigs, results) = newTables()
    val stage = stageSlices()
    // simulate the deeper crash: batch 0's results AND sequence commits
    // landed, the stream died before the band append — the replay's
    // nomination probes a band plane WITHOUT batch 0's bands, so the
    // batch's own sequence rows (already durable!) must not reject its
    // replay; both landed appends no-op, the band append completes
    val fh0 = Extensions.videoFrameHashes(
      fixtureRows.take(2).toDF("vid_id", "blob"))
    results.append(spark, Seq(1L, 3L).toDF("vid_id"),
      statementId = Some(s"$stage-vres-0"))
    sigs.append(spark, fh0.select("vid_id", "nf", "frame", "h"),
      statementId = Some(s"$stage-vsig-0"))
    val batches = Extensions.streamIncrementalVideoDedup(
      spark, stage, docsSchema, bands, sigs, results)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSeq
    assert(admitted.sorted == Seq(1L, 3L, 13L),
      s"replay must not double-admit or self-reject: $admitted")
    assert(bands.toDF(spark).count() == 12L,
      "the replayed batch's band append must complete")
    assert(sigs.toDF(spark).count() == 12L && sigs.meta.snapshots.size == 2,
      "the pre-applied sequence commit must no-op on replay")
  }

  test("re-running the finished crawl on the same checkpoint ingests nothing") {
    val (bands, sigs, results) = newTables()
    val stage = stageSlices()
    Extensions.streamIncrementalVideoDedup(spark, stage, docsSchema, bands, sigs, results)
    val rows = sigs.toDF(spark).count()
    val again = Extensions.streamIncrementalVideoDedup(
      spark, stage, docsSchema, bands, sigs, results)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(sigs.toDF(spark).count() == rows)
  }

  test("small batches nominate against the band plane with a pruned runtime-filtered scan") {
    // the crawl-loop probe discipline on the video band plane: a 2-video
    // batch collects <= 8 frame-0 band keys and pushes them as an In
    // probe, so the band_key bloom plane skips files that cannot hold
    // any of them (the band space is 18 bits — blooms stay selective,
    // unlike the audio plane where the bucket count is the lever)
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val emptyFh = Extensions.videoFrameHashes(batchDf.limit(0))
    val bands = cat.createTable("db.vid_bands_probe",
      Extensions.videoBands(emptyFh).select("vid_id", "band_key").schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val sigs = cat.createTable("db.vid_sigs_probe", emptyFh.schema,
      partitionBy = Seq("vid_id" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "vid_id"))
    val results = cat.createTable("db.vid_adm_probe",
      new StructType().add("vid_id", LongType))
    (0 until 3).foreach { c =>
      val vids = (0 until 40).map(i =>
        Extensions.videoFixtureRow(1000L + c * 40 + i, 100 + c * 40 + i,
          24 + i % 20, 16 + i % 5, 3 + i % 4, edit = false))
      val fh = Extensions.videoFrameHashes(vids.toDF("vid_id", "blob"))
        .localCheckpoint()
      sigs.append(spark, fh.select("vid_id", "nf", "frame", "h"))
      bands.append(spark,
        Extensions.videoBands(fh.filter(col("frame") === 0)).select("vid_id", "band_key"))
    }
    // video 1 is an edited clone of a crawled video (rejects); 2 fresh
    val batch = Seq(
      Extensions.videoFixtureRow(1L, 105, 24 + 5 % 20, 16 + 5 % 5, 3 + 5 % 4, edit = true),
      Extensions.videoFixtureRow(2L, 999, 30, 19, 4, edit = false))
      .toDF("vid_id", "blob")
    val stage = TableOps.newTempDir("graft-svidspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalVideoDedup(spark, stage, docsSchema, bands, sigs, results,
      onBandScanMetrics = scans += _)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSet
    assert(admitted == Set(2L), s"clone must reject, fresh must admit: $admitted")
    assert(scans.size == 1)
    val m = scans.head
    assert(m.filesTotal >= 10,
      s"fixture must spread the band plane over many files: ${m.filesTotal}")
    assert(m.filesScanned * 2 < m.filesTotal,
      s"the In probe must prune the nomination read: ${m.filesScanned}/${m.filesTotal}")
  }

  test("trimmed loop: cross-batch trim rejections in BOTH length directions") {
    // slice 0 admits bases 1 (4 frames) and 3 (5 frames); slice 1 brings
    // a lead-1-TRIMMED recrawl of 1 (id 11, 3 frames — batch SHORTER), a
    // one-frame-EXTENDED recrawl of 3 (id 13, 6 frames — batch LONGER),
    // and a fresh video (id 15). The equal-length loop would admit both
    // recrawls; the trimmed loop must reject them.
    val rows = Seq(
      Extensions.videoTrimFixtureRow(1L, 1, 40, 18, 4, 0, edit = false),
      Extensions.videoTrimFixtureRow(3L, 3, 32, 20, 5, 0, edit = false),
      Extensions.videoTrimFixtureRow(11L, 1, 40, 18, 3, 1, edit = false),
      Extensions.videoTrimFixtureRow(13L, 3, 32, 20, 6, 0, edit = false),
      Extensions.videoTrimFixtureRow(15L, 7, 36, 17, 4, 0, edit = false))
    val df = rows.toDF("vid_id", "blob")
    val (bands, sigs, results) = newTables()
    val stage = TableOps.newTempDir("graft-svidspec-trim")
    Extensions.stageOrderedSlices(df, stage,
      when(col("vid_id") < 10L, 0).otherwise(1), 2)
    val batches = Extensions.streamIncrementalVideoDedupTrimmed(
      spark, stage, docsSchema, bands, sigs, results)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 15L),
      s"trimmed recrawls must reject in both directions: $admitted")
    // sequence plane: one row per admitted frame; band plane: the
    // admitted videos' DISTINCT first-3-frame bands (the trimmed loop's
    // nomination-plane shape)
    assert(sigs.toDF(spark).count() == (4 + 5 + 4).toLong)
    val admFh = Extensions.videoFrameHashes(
      rows.filter(r => admitted.contains(r._1)).toDF("vid_id", "blob"))
    val expBands = Extensions.videoBands(admFh.filter(col("frame") <= 2))
      .select("vid_id", "band_key").distinct().count()
    assert(bands.toDF(spark).count() == expBands,
      "band plane must hold exactly the admitted first-3-frame distinct bands")
    assert(results.meta.snapshots.size == 2 && sigs.meta.snapshots.size == 2 &&
      bands.meta.snapshots.size == 2,
      "one statementId-keyed commit per table per batch")
  }

  test("trimmed loop: crash after the results commit replays to identical verdicts") {
    val rows = Seq(
      Extensions.videoTrimFixtureRow(1L, 1, 40, 18, 4, 0, edit = false),
      Extensions.videoTrimFixtureRow(3L, 3, 32, 20, 5, 0, edit = false),
      Extensions.videoTrimFixtureRow(11L, 1, 40, 18, 3, 1, edit = false),
      Extensions.videoTrimFixtureRow(15L, 7, 36, 17, 4, 0, edit = false))
    val df = rows.toDF("vid_id", "blob")
    val (bands, sigs, results) = newTables()
    val stage = TableOps.newTempDir("graft-svidspec-trimcrash")
    Extensions.stageOrderedSlices(df, stage,
      when(col("vid_id") < 10L, 0).otherwise(1), 2)
    // batch 0's results landed, the stream died before either plane append
    results.append(spark, Seq(1L, 3L).toDF("vid_id"),
      statementId = Some(s"$stage-tvres-0"))
    val batches = Extensions.streamIncrementalVideoDedupTrimmed(
      spark, stage, docsSchema, bands, sigs, results)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSeq
    assert(admitted.sorted == Seq(1L, 3L, 15L),
      s"replay must not double-admit: $admitted")
    assert(sigs.toDF(spark).count() == (4 + 5 + 4).toLong,
      "the replayed batch's plane appends must complete")
    assert(results.meta.snapshots.size == 2,
      "the replayed results commit must no-op on its statementId")
  }

  test("undecodable blobs are dropped: never admitted, never in either plane") {
    val (bands, sigs, results) = newTables()
    val fx = Seq(
      Extensions.videoFixtureRow(1L, 1, 40, 18, 3, edit = false),
      (2L, "not a video at all".getBytes("UTF-8"))).toDF("vid_id", "blob")
    val stage = TableOps.newTempDir("graft-svidspec-junk")
    Extensions.stageOrderedSlices(fx, stage, lit(0), 1)
    Extensions.streamIncrementalVideoDedup(spark, stage, docsSchema, bands, sigs, results)
    assert(results.toDF(spark).select("vid_id").as[Long].collect().toSet == Set(1L))
    assert(bands.toDF(spark).count() == 4L && sigs.toDF(spark).count() == 3L)
    assert(sigs.toDF(spark).filter(col("h").isNull).isEmpty)
    // a recrawl of the same junk is dropped again (no flip-flop admission)
    val stage2 = TableOps.newTempDir("graft-svidspec-junk2")
    Extensions.stageOrderedSlices(
      Seq((12L, "not a video at all".getBytes("UTF-8"))).toDF("vid_id", "blob"),
      stage2, lit(0), 1)
    Extensions.streamIncrementalVideoDedup(spark, stage2, docsSchema, bands, sigs, results)
    assert(results.toDF(spark).count() == 1L)
  }
}
