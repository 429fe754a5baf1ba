package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Certifies the shipped streaming chunk-level crawl loop
  * ([[graft.queries.Extensions.streamIncrementalChunkDedup]], the
  * x_stream_incremental_chunk_dedup pipeline) on a hand-planted corpus
  * where chunk suppression crosses micro-batch boundaries — a chunk
  * first kept by an EARLIER slice must reject its duplicate in a later
  * slice via the durable keep-first ledger — plus the single-commit
  * replay story: a batch whose commit landed but whose stream offset did
  * not must no-op on replay.
  */
class StreamChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4 // 4-token chunks keep the planted texts readable
  private val docsSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("text", StringType)

  // 8 tokens = exactly two 4-token chunks per doc. hist doc 100 plants
  // chunks H1 ("h1a h1b h1c h1d") and H2. slice 0 (ids < 10): doc 1 is
  // fresh (chunks A1, A2 — both kept); doc 3 starts with H1 (reject via
  // HISTORY) and ends fresh (B1 kept). slice 1 (ids >= 10): doc 11
  // starts with A1 — first kept by SLICE 0's doc 1, so it must reject
  // via the ledger rows batch 0 appended (the cross-batch distinction) —
  // and ends fresh (C1 kept); doc 13 repeats A2 then H2 (both reject,
  // one per rejection class).
  private val histText = "h1a h1b h1c h1d h2a h2b h2c h2d"
  private def histDf = Seq((100L, "en", histText)).toDF("doc_id", "lang", "text")
  private def batchDf = Seq(
    (1L, "en", "a1a a1b a1c a1d a2a a2b a2c a2d"),
    (3L, "en", "h1a h1b h1c h1d b1a b1b b1c b1d"),
    (11L, "en", "a1a a1b a1c a1d c1a c1b c1c c1d"),
    (13L, "en", "a2a a2b a2c a2d h2a h2b h2c h2d")
  ).toDF("doc_id", "lang", "text")

  private def newLedger() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val ledger = Extensions.chunkKeepFirstLedger(Extensions.chunksOf(histDf, W))
    val t = cat.createTable("db.chunk_ledger_spec", ledger.schema,
      partitionBy = Seq("h" -> graft.format.Transform.Bucket(4)))
    t.append(spark, ledger)
    t
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-scdspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(col("doc_id") < 10L, 0).otherwise(1), 2)
    stage
  }

  test("later-slice duplicate chunks reject via the ledger; fresh chunks still keep") {
    val t = newLedger()
    val batches = Extensions.streamIncrementalChunkDedup(
      spark, stageSlices(), docsSchema, t, W)
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    // crawl keeps: doc 1's two chunks + doc 3's tail + doc 11's tail +
    // nothing from doc 13 — (f_doc, f_ci) pairs pin WHERE each was kept
    val keeps = t.toDF(spark).filter(col("f_doc") =!= 100L)
      .select("f_doc", "f_ci").as[(Long, Long)].collect().toSet
    assert(keeps == Set((1L, 0L), (1L, 1L), (3L, 1L), (11L, 1L)),
      s"keep set wrong: $keeps (doc 11's head chunk must reject via the " +
        "LEDGER row batch 0 appended for doc 1; doc 3/13 via history)")
    assert(t.meta.snapshots.size == 3, "hist append + one commit per batch")
  }

  test("a batch whose commit landed but whose offset did not replays as a no-op") {
    val t = newLedger()
    val stage = stageSlices()
    // simulate the crash: batch 0's single ledger commit landed, the
    // stream died before its own commit log advanced — pre-apply the
    // batch-0 commit under the statementId the loop will replay with
    val batch0 = batchDf.filter(col("doc_id") < 10L)
    t.append(spark,
      Extensions.chunkKeepFirstLedger(
        Extensions.chunksOf(batch0, W)
          .join(t.toDF(spark).select(col("h")), Seq("h"), "left_anti")),
      statementId = Some(s"$stage-chunks-0"))
    val rowsAfterCrash = t.toDF(spark).count()
    val batches = Extensions.streamIncrementalChunkDedup(
      spark, stage, docsSchema, t, W)
    assert(batches == 2)
    val keeps = t.toDF(spark).filter(col("f_doc") =!= 100L)
      .select("f_doc", "f_ci").as[(Long, Long)].collect().toSet
    assert(keeps == Set((1L, 0L), (1L, 1L), (3L, 1L), (11L, 1L)),
      s"replay changed the keep set: $keeps")
    assert(t.meta.snapshots.size == 3,
      "pre-applied batch 0 + batch 1 — the replayed batch-0 commit must no-op")
    assert(t.toDF(spark).count() == rowsAfterCrash + 1,
      "batch 1 must add exactly doc 11's tail chunk")
  }

  test("re-running the finished crawl on the same checkpoint ingests nothing") {
    val t = newLedger()
    val stage = stageSlices()
    Extensions.streamIncrementalChunkDedup(spark, stage, docsSchema, t, W)
    val rows = t.toDF(spark).count()
    val again = Extensions.streamIncrementalChunkDedup(spark, stage, docsSchema, t, W)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(t.toDF(spark).count() == rows)
  }

  test("small batches probe the ledger with a pruned runtime-filtered scan") {
    // the exact loop's discipline applied to the chunk ledger: the
    // batch's chunk-hash set is a bounded driver collect pushed as an In
    // probe, so the h-bloom plane skips ledger files that cannot hold any
    // batch hash (md5-uniform min/max never prunes this state). A grown
    // many-file ledger + a 2-doc batch must scan a small fraction.
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.chunk_ledger_probe",
      Extensions.chunkKeepFirstLedger(Extensions.chunksOf(histDf, W)).schema,
      partitionBy = Seq("h" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "h"))
    (0 until 3).foreach { c =>
      val hist = (0 until 200).map(i =>
          (1000L + c * 200 + i, "en", s"h${c}a$i h${c}b$i h${c}c$i h${c}d$i"))
        .toDF("doc_id", "lang", "text")
      t.append(spark, Extensions.chunkKeepFirstLedger(Extensions.chunksOf(hist, W)))
    }
    // doc 1 repeats a crawl-0 chunk (rejects via the ledger); doc 2 fresh
    val batch = Seq((1L, "en", "h0a5 h0b5 h0c5 h0d5"), (2L, "en", "f1 f2 f3 f4"))
      .toDF("doc_id", "lang", "text")
    val stage = TableOps.newTempDir("graft-scdspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalChunkDedup(spark, stage, docsSchema, t, W,
      onStateScanMetrics = scans += _)
    val keeps = t.toDF(spark).filter(col("f_doc") < 100L)
      .select("f_doc").as[Long].collect().toSet
    assert(keeps == Set(2L), s"dup chunk must reject, fresh keep: $keeps")
    assert(scans.size == 1)
    val m = scans.head
    assert(m.filesTotal >= 10,
      s"fixture must spread the ledger over many files: ${m.filesTotal}")
    assert(m.filesScanned * 2 < m.filesTotal,
      s"small-batch ledger probe must prune: ${m.filesScanned}/${m.filesTotal}")
  }
}
