package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructType}

/** Certifies the shipped streaming audio-dedup crawl loop
  * ([[graft.queries.Extensions.streamIncrementalAudioDedup]], the
  * x_stream_incremental_audio_dedup pipeline) on planted clips where
  * near-dup rejection crosses the micro-batch boundary — an edited clone
  * of a clip ADMITTED by an earlier slice must reject via the band rows
  * that slice appended — plus the results-before-state crash window,
  * checkpoint idempotency, and the pruned runtime-filtered state probe.
  */
class StreamAudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("clip_id", LongType).add("blob", BinaryType)

  // slice 0 admits clips 1 and 3; slice 1 brings an edited clone of
  // clip 1 (id 11 — must reject via the STATE batch 0 appended, the
  // cross-batch distinction) and a fresh clip (id 13 — admits)
  private def fixtureRows = Seq(
    Extensions.audioFixtureRow(1L, 1, 33 * 12, edit = false),
    Extensions.audioFixtureRow(3L, 3, 33 * 14, edit = false),
    Extensions.audioFixtureRow(11L, 1, 33 * 12, edit = true),
    Extensions.audioFixtureRow(13L, 7, 33 * 16, edit = false))

  private def batchDf = fixtureRows.toDF("clip_id", "blob")

  private def newTables() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.audio_sigs_spec",
      Extensions.audioBands(batchDf.limit(0)).schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val results = cat.createTable("db.audio_adm_spec",
      new StructType().add("clip_id", LongType))
    (state, results)
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-saudspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(col("clip_id") < 10L, 0).otherwise(1), 2)
    stage
  }

  test("an edited clone of an earlier slice's admission rejects via the durable state") {
    val (state, results) = newTables()
    val batches = Extensions.streamIncrementalAudioDedup(
      spark, stageSlices(), docsSchema, state, results)
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val admitted = results.toDF(spark).select("clip_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 13L),
      s"admissions wrong: $admitted (11 is an edited clone of slice-0's 1)")
    // state carries exactly the admitted clips' 4 band rows each
    assert(state.toDF(spark).count() == 12L)
    assert(results.meta.snapshots.size == 2 && state.meta.snapshots.size == 2,
      "one statementId-keyed commit per table per batch")
  }

  test("crash between the results and state commits: replay completes the state, results no-op") {
    val (state, results) = newTables()
    val stage = stageSlices()
    // simulate the crash: batch 0's RESULTS commit landed (results are
    // committed first), the stream died before the state append — the
    // replay must recompute identical admissions (the state has no
    // batch-0 bands yet), no-op the results append on its ledger entry,
    // and complete the state append
    results.append(spark, Seq(1L, 3L).toDF("clip_id"),
      statementId = Some(s"$stage-aures-0"))
    val batches = Extensions.streamIncrementalAudioDedup(
      spark, stage, docsSchema, state, results)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("clip_id").as[Long].collect().toSeq
    assert(admitted.sorted == Seq(1L, 3L, 13L),
      s"replay must not double-admit: $admitted")
    assert(state.toDF(spark).count() == 12L,
      "the replayed batch's state append must complete")
    assert(results.meta.snapshots.size == 2,
      "pre-applied batch-0 results + batch 1 — the replayed commit must no-op")
  }

  test("re-running the finished crawl on the same checkpoint ingests nothing") {
    val (state, results) = newTables()
    val stage = stageSlices()
    Extensions.streamIncrementalAudioDedup(spark, stage, docsSchema, state, results)
    val rows = state.toDF(spark).count()
    val again = Extensions.streamIncrementalAudioDedup(
      spark, stage, docsSchema, state, results)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(state.toDF(spark).count() == rows)
  }

  test("small batches probe the band state with a pruned runtime-filtered scan") {
    // the crawl-loop probe discipline on the audio state — with one
    // audio-specific twist: the fingerprint's band space is 10 bits
    // (256 values x 4 bands), so at a grown corpus the per-file BLOOM
    // plane saturates (most of the 1024 keys appear in every large
    // file) and the BUCKET plane is what keeps pruning — a production
    // audio state wants more band_key buckets than the image state
    // needs. A 2-clip batch probes <= 8 band keys -> <= 8 of 32 buckets.
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.audio_sigs_probe",
      Extensions.audioBands(batchDf.limit(0)).schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(32)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val results = cat.createTable("db.audio_adm_probe",
      new StructType().add("clip_id", LongType))
    (0 until 3).foreach { c =>
      val clips = (0 until 50).map(i =>
        Extensions.audioFixtureRow(1000L + c * 50 + i, 100 + c * 50 + i,
          33 * (10 + i % 20), edit = false))
      state.append(spark, Extensions.audioBands(clips.toDF("clip_id", "blob")))
    }
    // clip 1 is an edited clone of a crawled clip (rejects); clip 2 fresh
    val batch = Seq(
      Extensions.audioFixtureRow(1L, 105, 33 * (10 + 5 % 20), edit = true),
      Extensions.audioFixtureRow(2L, 999, 33 * 13, edit = false))
      .toDF("clip_id", "blob")
    val stage = TableOps.newTempDir("graft-saudspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalAudioDedup(spark, stage, docsSchema, state, results,
      onStateScanMetrics = scans += _)
    val admitted = results.toDF(spark).select("clip_id").as[Long].collect().toSet
    assert(admitted == Set(2L), s"clone must reject, fresh must admit: $admitted")
    assert(scans.size == 1)
    val m = scans.head
    assert(m.filesTotal >= 10,
      s"fixture must spread the state over many files: ${m.filesTotal}")
    assert(m.filesScanned * 2 < m.filesTotal,
      s"the In probe must prune the state read: ${m.filesScanned}/${m.filesTotal}")
  }

  test("undecodable blobs are dropped: never admitted, never in the state") {
    val (state, results) = newTables()
    val fx = Seq(
      Extensions.audioFixtureRow(1L, 1, 33 * 12, edit = false),
      (2L, "not audio at all".getBytes("UTF-8"))).toDF("clip_id", "blob")
    val stage = TableOps.newTempDir("graft-saudspec-junk")
    Extensions.stageOrderedSlices(fx, stage, lit(0), 1)
    Extensions.streamIncrementalAudioDedup(spark, stage, docsSchema, state, results)
    // the decodable clip admits; the junk blob is quarantined (dropped),
    // NOT admitted — and the state carries no null-keyed rows for it
    assert(results.toDF(spark).select("clip_id").as[Long].collect().toSet == Set(1L))
    assert(state.toDF(spark).count() == 4L)
    assert(state.toDF(spark).filter(col("h").isNull || col("band_key").isNull).isEmpty)
    // a recrawl of the same junk is dropped again (no flip-flop admission)
    val stage2 = TableOps.newTempDir("graft-saudspec-junk2")
    Extensions.stageOrderedSlices(
      Seq((12L, "not audio at all".getBytes("UTF-8"))).toDF("clip_id", "blob"),
      stage2, lit(0), 1)
    Extensions.streamIncrementalAudioDedup(spark, stage2, docsSchema, state, results)
    assert(results.toDF(spark).count() == 1L)
  }

  test("offset loop: segment-trimmed recrawls reject in BOTH length directions across batches") {
    // slice 0 admits clips 1 (4 segments) and 3 (5 segments); slice 1
    // brings a lead-1-SEGMENT-trimmed recrawl of 1 (id 11 — batch
    // SHORTER), a one-segment-EXTENDED recrawl of 3 (id 13 — batch
    // LONGER), and a fresh clip (id 15). The global-fingerprint loop
    // would admit both recrawls (every window boundary moved); the
    // containment loop must reject them.
    val L = 330
    val rows = Seq(
      Extensions.audioOffsetFixtureRow(1L, 1, 4, L, 0, edit = false),
      Extensions.audioOffsetFixtureRow(3L, 3, 5, L, 0, edit = false),
      Extensions.audioOffsetFixtureRow(11L, 1, 3, L, 1, edit = false),
      Extensions.audioOffsetFixtureRow(13L, 3, 6, L, 0, edit = false),
      Extensions.audioOffsetFixtureRow(15L, 7, 4, L, 0, edit = false))
    val df = rows.toDF("clip_id", "blob")
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val emptyFh = Extensions.audioSegmentsOf(df.limit(0), L)
    val bands = cat.createTable("db.aud_bands_ospec",
      Extensions.audioSegBands(emptyFh).select("vid_id", "band_key").schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val sigs = cat.createTable("db.aud_sigs_ospec", emptyFh.schema,
      partitionBy = Seq("vid_id" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "vid_id"))
    val results = cat.createTable("db.aud_adm_ospec",
      new StructType().add("vid_id", LongType))
    val stage = TableOps.newTempDir("graft-saudspec-offset")
    Extensions.stageOrderedSlices(df, stage,
      when(col("clip_id") < 10L, 0).otherwise(1), 2)
    val batches = Extensions.streamIncrementalAudioDedupOffset(
      spark, stage, docsSchema, bands, sigs, results, segLen = L)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 15L),
      s"trimmed recrawls must reject in both directions: $admitted")
    // sequence plane: one row per admitted segment; band plane: the
    // admitted clips' DISTINCT first-3-segment bands
    assert(sigs.toDF(spark).count() == (4 + 5 + 4).toLong)
    val admFh = Extensions.audioSegmentsOf(
      rows.filter(r => admitted.contains(r._1)).toDF("clip_id", "blob"), L)
    val expBands = Extensions.audioSegBands(admFh.filter(col("frame") <= 2))
      .select("vid_id", "band_key").distinct().count()
    assert(bands.toDF(spark).count() == expBands,
      "band plane must hold exactly the admitted first-3-segment distinct bands")
    assert(results.meta.snapshots.size == 2 && sigs.meta.snapshots.size == 2 &&
      bands.meta.snapshots.size == 2,
      "one statementId-keyed commit per table per batch")
  }

  test("subsegment loop: clip-atomic admission — one matching phase rejects the whole clip") {
    // the idGroupDiv rollup (r16) pinned directly: synthetic dual-phase
    // sequences keyed on clip_id alone (the loop is generic over toSeq),
    // where batch clip 2's PHASE-0 duplicates history clip 1's phase-0
    // hash sequence and its PHASE-1 is far. Without the rollup the far
    // phase would admit ALONE (half a clip seeding the state); with
    // idGroupDiv = 2 the whole clip rejects.
    import org.apache.spark.sql.DataFrame
    def toSeqSyn(df: DataFrame): DataFrame = df
      .select(col("clip_id"), explode(array(lit(0), lit(1))).as("p"))
      .withColumn("frame", explode(array(lit(0), lit(1), lit(2))))
      .select((col("clip_id") * 2 + col("p")).as("vid_id"), lit(3).as("nf"),
        col("frame"),
        (when(col("p") === 0 && col("clip_id").isin(1L, 2L), lit(1000L))
          .otherwise(col("clip_id") * 1000000L + col("p") * 4096L)
          + col("frame") * 7L).as("h"))
    def run(groupDiv: Option[Int]) = {
      val cat = new graft.catalog.GraftCatalog(tempWarehouse())
      val df = Seq((1L, Array[Byte](1)), (2L, Array[Byte](2))).toDF("clip_id", "blob")
      val emptyFh = toSeqSyn(df.limit(0))
      val bands = cat.createTable("db.syn_bands",
        Extensions.audioSegBands(emptyFh).select("vid_id", "band_key").schema,
        partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)))
      val sigs = cat.createTable("db.syn_sigs", emptyFh.schema,
        partitionBy = Seq("vid_id" -> graft.format.Transform.Bucket(4)))
      val results = cat.createTable("db.syn_adm",
        new StructType().add("vid_id", LongType))
      val stage = TableOps.newTempDir("graft-saudspec-syn")
      Extensions.stageOrderedSlices(df, stage,
        when(col("clip_id") === 1L, 0).otherwise(1), 2)
      Extensions.streamIncrementalContainDedup(spark, stage, docsSchema,
        bands, sigs, results, toSeqSyn, Extensions.audioSegBands, "syn", 2, 1,
        _ => (), idGroupDiv = groupDiv)
      (results.toDF(spark).select("vid_id").as[Long].collect().toSet,
        sigs.toDF(spark).select("vid_id").as[Long].collect().toSet)
    }
    val (admGrouped, sigsGrouped) = run(Some(2))
    assert(admGrouped == Set(2L, 3L),
      s"clip 2 must reject WHOLLY when one phase matches history: $admGrouped")
    assert(sigsGrouped == Set(2L, 3L),
      s"no composite of a rejected clip may seed the state: $sigsGrouped")
    // the contrast: per-composite admission would let the far phase in
    val (admUngrouped, _) = run(None)
    assert(admUngrouped == Set(2L, 3L, 5L),
      s"without the rollup the far phase admits alone: $admUngrouped")
  }

  test("subsegment loop: crash after the results commit replays to identical verdicts") {
    val L = 330
    // slice 0: clips 1 (4 segs) and 3 (5 segs); slice 1: a 165-sample
    // (HALF-segment) trim of clip 1 (id 11 — rejectable only through the
    // dual-phase grids) and a fresh clip (id 13)
    def clip(id: Long, seed: Int, n: Int, sb: Int) =
      (id, graft.operators.AudioCodec.encodeAudioVariant(n, seed, sampleBase = sb))
    val rows = Seq(clip(1L, 1, 4 * L, 0), clip(3L, 3, 5 * L, 0),
      clip(11L, 1, 4 * L - 165, 165), clip(13L, 7, 4 * L, 0))
    val df = rows.toDF("clip_id", "blob")
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val emptyFh = Extensions.audioSegmentsDualPhase(df.limit(0), L)
    val bands = cat.createTable("db.aud_bands_sspec",
      Extensions.audioSegBands(emptyFh).select("vid_id", "band_key").schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val sigs = cat.createTable("db.aud_sigs_sspec", emptyFh.schema,
      partitionBy = Seq("vid_id" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "vid_id"))
    val results = cat.createTable("db.aud_adm_sspec",
      new StructType().add("vid_id", LongType))
    val stage = TableOps.newTempDir("graft-saudspec-sub")
    Extensions.stageOrderedSlices(df, stage,
      when(col("clip_id") < 10L, 0).otherwise(1), 2)
    // simulate the crash: batch 0's RESULTS commit landed (composites of
    // clips 1 and 3), the stream died before either state append
    results.append(spark, Seq(2L, 3L, 6L, 7L).toDF("vid_id"),
      statementId = Some(s"$stage-tsres-0"))
    val batches = Extensions.streamIncrementalAudioDedupSubsegment(
      spark, stage, docsSchema, bands, sigs, results, segLen = L)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("vid_id").as[Long].collect().toSeq
    assert(admitted.sorted == Seq(2L, 3L, 6L, 7L, 26L, 27L),
      s"replay must not double-admit and the half-segment trim must reject: $admitted")
    // both phases of every admitted clip persist — group-complete state
    assert(sigs.toDF(spark).select("vid_id").distinct().as[Long].collect().toSet ==
      Set(2L, 3L, 6L, 7L, 26L, 27L))
    assert(results.meta.snapshots.size == 2 && sigs.meta.snapshots.size == 2 &&
      bands.meta.snapshots.size == 2,
      "the replayed results append must no-op on its ledger entry " +
        "(no third snapshot — batch 0's commit is the pre-crash one)")
  }
}
