package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructType}

/** Certifies the shipped streaming image-dedup crawl loop
  * ([[graft.queries.Extensions.streamIncrementalImageDedup]], the
  * x_stream_incremental_image_dedup pipeline) on planted images where
  * near-dup rejection crosses the micro-batch boundary — an edited clone
  * of an image ADMITTED by an earlier slice must reject via the band rows
  * that slice appended — plus the results-before-state crash window,
  * checkpoint idempotency, and the pruned runtime-filtered state probe.
  */
class StreamImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("img_id", LongType).add("blob", BinaryType)

  // slice 0 admits images 1 and 3; slice 1 brings an edited clone of
  // image 1 (id 11 — must reject via the STATE batch 0 appended, the
  // cross-batch distinction) and a fresh image (id 13 — admits)
  private def fixtureRows = Seq(
    Extensions.imageFixtureRow(1L, 1, 40, 18, edit = false),
    Extensions.imageFixtureRow(3L, 3, 32, 20, edit = false),
    Extensions.imageFixtureRow(11L, 1, 40, 18, edit = true),
    Extensions.imageFixtureRow(13L, 7, 36, 17, edit = false))

  private def batchDf = fixtureRows.toDF("img_id", "blob")

  private def newTables() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.img_sigs_spec",
      Extensions.imageBands(batchDf.limit(0)).schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val results = cat.createTable("db.img_adm_spec",
      new StructType().add("img_id", LongType))
    (state, results)
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-simgspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(col("img_id") < 10L, 0).otherwise(1), 2)
    stage
  }

  test("an edited clone of an earlier slice's admission rejects via the durable state") {
    val (state, results) = newTables()
    val batches = Extensions.streamIncrementalImageDedup(
      spark, stageSlices(), docsSchema, state, results)
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val admitted = results.toDF(spark).select("img_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 13L),
      s"admissions wrong: $admitted (11 is an edited clone of slice-0's 1)")
    // state carries exactly the admitted images' 4 band rows each
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
    results.append(spark, Seq(1L, 3L).toDF("img_id"),
      statementId = Some(s"$stage-imres-0"))
    val batches = Extensions.streamIncrementalImageDedup(
      spark, stage, docsSchema, state, results)
    assert(batches == 2)
    val admitted = results.toDF(spark).select("img_id").as[Long].collect().toSeq
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
    Extensions.streamIncrementalImageDedup(spark, stage, docsSchema, state, results)
    val rows = state.toDF(spark).count()
    val again = Extensions.streamIncrementalImageDedup(
      spark, stage, docsSchema, state, results)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(state.toDF(spark).count() == rows)
  }

  test("small batches probe the band state with a pruned runtime-filtered scan") {
    // the crawl-loop probe discipline on the image state: the batch's 8
    // band keys are a bounded driver collect pushed as an In probe, so
    // the band_key bloom plane skips state files that cannot hold any of
    // them. A grown many-file state + a 2-image batch must scan a
    // fraction.
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.img_sigs_probe",
      Extensions.imageBands(batchDf.limit(0)).schema,
      partitionBy = Seq("band_key" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "band_key"))
    val results = cat.createTable("db.img_adm_probe",
      new StructType().add("img_id", LongType))
    (0 until 3).foreach { c =>
      val imgs = (0 until 50).map(i =>
        Extensions.imageFixtureRow(1000L + c * 50 + i, 100 + c * 50 + i,
          24 + i % 20, 16 + i % 5, edit = false))
      state.append(spark, Extensions.imageBands(imgs.toDF("img_id", "blob")))
    }
    // img 1 is an edited clone of a crawled image (rejects); img 2 fresh
    val batch = Seq(
      Extensions.imageFixtureRow(1L, 105, 24 + 5 % 20, 16 + 5 % 5, edit = true),
      Extensions.imageFixtureRow(2L, 999, 30, 19, edit = false))
      .toDF("img_id", "blob")
    val stage = TableOps.newTempDir("graft-simgspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalImageDedup(spark, stage, docsSchema, state, results,
      onStateScanMetrics = scans += _)
    val admitted = results.toDF(spark).select("img_id").as[Long].collect().toSet
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
      Extensions.imageFixtureRow(1L, 1, 40, 18, edit = false),
      (2L, "not an image at all".getBytes("UTF-8"))).toDF("img_id", "blob")
    val stage = TableOps.newTempDir("graft-simgspec-junk")
    Extensions.stageOrderedSlices(fx, stage, lit(0), 1)
    Extensions.streamIncrementalImageDedup(spark, stage, docsSchema, state, results)
    // the decodable image admits; the junk blob is quarantined (dropped),
    // NOT admitted — and the state carries no null-keyed rows for it
    assert(results.toDF(spark).select("img_id").as[Long].collect().toSet == Set(1L))
    assert(state.toDF(spark).count() == 4L)
    assert(state.toDF(spark).filter(col("h").isNull || col("band_key").isNull).isEmpty)
    // a recrawl of the same junk is dropped again (no flip-flop admission)
    val stage2 = TableOps.newTempDir("graft-simgspec-junk2")
    Extensions.stageOrderedSlices(
      Seq((12L, "not an image at all".getBytes("UTF-8"))).toDF("img_id", "blob"),
      stage2, lit(0), 1)
    Extensions.streamIncrementalImageDedup(spark, stage2, docsSchema, state, results)
    assert(results.toDF(spark).count() == 1L)
  }
}
