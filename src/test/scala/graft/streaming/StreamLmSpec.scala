package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Certifies the shipped streaming LM-scoring loop
  * ([[graft.queries.Extensions.streamIncrementalLm]], the
  * x_stream_incremental_lm pipeline) on a hand-computed corpus where the
  * MODEL evolves across the batch boundary: a bigram first introduced by
  * slice 0's delta append must score NONZERO for slice 1 — the
  * cross-batch distinction only the durable count log provides — with
  * every fixed point checked against pencil-and-paper arithmetic, plus
  * the orphaned-results crash window and checkpoint idempotency.
  */
class StreamLmSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("text", StringType)

  // hist doc 100 "a b a b": c2 = {ab:2, ba:1}, c1 = {a:2, b:1} ->
  // q(ab) = 2e6 div 2 = 1_000_000, q(ba) = 1_000_000.
  // slice 0 = doc 1 (1 % 4 == 1) "a b c d": bigrams ab, bc, cd ->
  //   score = (1_000_000 + 0 + 0) div 3 = 333_333, modeled = 1;
  //   deltas ab+1, bc+1, cd+1 append to the log.
  // slice 1 = doc 11 (11 % 4 == 3) "b c d e": bigrams bc, cd, de.
  //   Model NOW: c2 = {ab:3, ba:1, bc:1, cd:1}, c1 = {a:3, b:2, c:1} ->
  //   q(bc) = 1e6 div 2 = 500_000, q(cd) = 1e6 div 1 = 1_000_000, de
  //   unmodeled -> score = 1_500_000 div 3 = 500_000, modeled = 2.
  //   WITHOUT the cross-batch delta, bc and cd would be unmodeled and
  //   doc 11 would score 0 — the distinction this spec pins.
  private def histDf = Seq((100L, "en", "a b a b")).toDF("doc_id", "lang", "text")
  private def batchDf = Seq(
    (1L, "en", "a b c d"),
    (11L, "en", "b c d e")
  ).toDF("doc_id", "lang", "text")

  private def newTables() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val histCounts = histDf
      .select(explode(graft.functions.TextFunctions.shingles(col("text"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val state = cat.createTable("db.lm_log_spec", new StructType()
      .add("bg", StringType).add("cnt", LongType),
      partitionBy = Seq("bg" -> graft.format.Transform.Bucket(4)))
    state.append(spark, histCounts)
    val model = cat.createTable("db.lm_model_spec", new StructType()
      .add("bg", StringType).add("c2", LongType).add("w1", StringType),
      partitionBy = Seq("w1" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "w1"))
    model.append(spark, histCounts.select(col("bg"), col("cnt").as("c2"),
      substring_index(col("bg"), " ", 1).as("w1")))
    val results = cat.createTable("db.lm_res_spec", new StructType()
      .add("doc_id", LongType).add("lang", StringType)
      .add("score", LongType).add("modeled", LongType))
    (state, model, results)
  }

  /** The helper's REQUIREd invariant: the merged-in-place model table
    * equals the delta log's sum, row for row. */
  private def modelMatchesLog(state: graft.table.GraftTable,
      model: graft.table.GraftTable): Boolean = {
    val logSum = state.toDF(spark).groupBy("bg").agg(sum(col("cnt")).as("c2"))
    val m = model.toDF(spark).select("bg", "c2")
    m.except(logSum).isEmpty && logSum.except(m).isEmpty
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-slmspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(pmod(col("doc_id"), lit(4L)) === 1L, 0).otherwise(1), 2)
    stage
  }

  test("later-slice docs score under the model the earlier slice's deltas grew") {
    val (state, model, results) = newTables()
    val batches = Extensions.streamIncrementalLm(
      spark, stageSlices(), docsSchema, state, model, results)
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val got = results.toDF(spark)
      .select("doc_id", "score", "modeled").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 333333L, 1L), (11L, 500000L, 2L)),
      s"scores wrong: $got (doc 11 must score via bc/cd, which only exist " +
        "in the model because batch 0's deltas committed)")
    // count conservation: 3 hist + 3 + 3 batch bigrams
    assert(state.toDF(spark).agg(sum(col("cnt"))).head.getLong(0) == 9L)
    assert(state.meta.snapshots.size == 3, "hist append + one delta commit per batch")
    assert(results.meta.snapshots.size == 2, "one results commit per batch")
    assert(model.meta.snapshots.size == 3, "hist append + one MERGE per batch")
    assert(modelMatchesLog(state, model),
      "model table must equal the delta-log sum after the crawl")
  }

  test("crash between results and delta commits: replay rescoring is identical") {
    val (state, model, results) = newTables()
    val stage = stageSlices()
    // batch 0's RESULTS landed, the process died before the delta commit —
    // the replayed batch must score under the delta-free model, recompute
    // the identical scores, no-op the results append, complete the deltas
    // and the model merge
    results.append(spark, Seq((1L, "en", 333333L, 1L))
      .toDF("doc_id", "lang", "score", "modeled"),
      statementId = Some(s"$stage-res-0"))
    val batches = Extensions.streamIncrementalLm(
      spark, stage, docsSchema, state, model, results)
    assert(batches == 2)
    val got = results.toDF(spark)
      .select("doc_id", "score", "modeled").as[(Long, Long, Long)].collect().toList
    assert(got.sorted == List((1L, 333333L, 1L), (11L, 500000L, 2L)),
      s"orphaned results commit duplicated or diverged on replay: $got")
    assert(results.meta.snapshots.size == 2,
      "pre-committed batch 0 + batch 1 — the replayed batch-0 append must no-op")
    assert(state.toDF(spark).agg(sum(col("cnt"))).head.getLong(0) == 9L)
    assert(modelMatchesLog(state, model))
  }

  test("crash between delta and model-merge commits: replay completes the merge") {
    val (state, model, results) = newTables()
    val stage = stageSlices()
    // batch 0's results AND deltas landed, the process died before the
    // model MERGE — the replayed batch scores under the model WITHOUT
    // the batch's counts (identical scores: the merge is LAST), no-ops
    // results and deltas on their statementIds, and completes the merge
    results.append(spark, Seq((1L, "en", 333333L, 1L))
      .toDF("doc_id", "lang", "score", "modeled"),
      statementId = Some(s"$stage-res-0"))
    state.append(spark, Seq(("a b", 1L), ("b c", 1L), ("c d", 1L))
      .toDF("bg", "cnt"),
      statementId = Some(s"$stage-lm-0"))
    val batches = Extensions.streamIncrementalLm(
      spark, stage, docsSchema, state, model, results)
    assert(batches == 2)
    val got = results.toDF(spark)
      .select("doc_id", "score", "modeled").as[(Long, Long, Long)].collect().toList
    assert(got.sorted == List((1L, 333333L, 1L), (11L, 500000L, 2L)),
      s"replay after the delta commit diverged: $got")
    assert(state.meta.snapshots.size == 3,
      "pre-committed deltas + batch 1 — the replayed delta append must no-op")
    assert(state.toDF(spark).agg(sum(col("cnt"))).head.getLong(0) == 9L)
    assert(modelMatchesLog(state, model),
      "the replayed batch must complete the orphaned model merge")
  }

  test("re-running the finished crawl on the same checkpoint ingests nothing") {
    val (state, model, results) = newTables()
    val stage = stageSlices()
    Extensions.streamIncrementalLm(spark, stage, docsSchema, state, model, results)
    val again = Extensions.streamIncrementalLm(
      spark, stage, docsSchema, state, model, results)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(results.toDF(spark).count() == 2 &&
      state.toDF(spark).agg(sum(col("cnt"))).head.getLong(0) == 9L)
    assert(modelMatchesLog(state, model))
  }

  test("the model read is head-word pruned and bit-equal to full-model scores") {
    // the fixed point q = (c2·1e6) div c1 needs c1(w1) over ALL of a
    // head's bigrams, so the model read prunes by the batch's HEAD-WORD
    // set, never by bigram: every probed head's rows all survive pruning
    // (bloom/min-max never drop a matching file), making the pruned-read
    // scores bit-equal to the full read. A grown many-file model + a
    // 1-doc batch must also scan a small fraction of the model's files.
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.lm_log_probe", new StructType()
      .add("bg", StringType).add("cnt", LongType),
      partitionBy = Seq("bg" -> graft.format.Transform.Bucket(4)))
    val model = cat.createTable("db.lm_model_probe", new StructType()
      .add("bg", StringType).add("c2", LongType).add("w1", StringType),
      partitionBy = Seq("w1" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "w1"))
    (0 until 3).foreach { c =>
      // 50 heads per crawl, 4 tail bigrams each, c2 = 1..4 within a head
      val counts = (0 until 200).map(i => (s"h${c}d${i / 4} tl$i", (i % 4 + 1).toLong))
        .toDF("bg", "cnt")
      state.append(spark, counts)
      model.append(spark, counts.select(col("bg"), col("cnt").as("c2"),
        substring_index(col("bg"), " ", 1).as("w1")))
    }
    val results = cat.createTable("db.lm_res_probe", new StructType()
      .add("doc_id", LongType).add("lang", StringType)
      .add("score", LongType).add("modeled", LongType))
    val batch = Seq((1L, "en", "h0d5 tl20")).toDF("doc_id", "lang", "text")
    // expected under the FULL pre-crawl model, via the shipped fixed point
    val fullScore = Extensions.lmProbs(model.toDF(spark).select(col("bg"), col("c2")))
      .filter(col("bg") === "h0d5 tl20").select("q").as[Long].head()
    assert(fullScore == 100000L, // c2=1, c1(h0d5)=1+2+3+4 — pencil check
      s"fixture arithmetic drifted: $fullScore")
    val stage = TableOps.newTempDir("graft-slmspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalLm(spark, stage, docsSchema, state, model, results,
      onModelScanMetrics = scans += _)
    val got = results.toDF(spark)
      .select("doc_id", "score", "modeled").as[(Long, Long, Long)].collect().toList
    assert(got == List((1L, fullScore, 1L)),
      s"pruned-model scoring diverged from the full model: $got vs $fullScore")
    assert(scans.size == 1)
    val m = scans.head
    assert(m.filesTotal >= 10,
      s"fixture must spread the model over many files: ${m.filesTotal}")
    assert(m.filesScanned * 2 < m.filesTotal,
      s"small-batch model probe must prune: ${m.filesScanned}/${m.filesTotal}")
  }
  test("a bigram-less batch commits nothing: the empty-delta short circuit") {
    val (state, model, results) = newTables()
    // slice 0 is a single 1-token doc (no bigrams): nothing to score, log,
    // or fold — the loop must skip all three commits for it, not pay three
    // no-op commit rounds. Slice 1 is a normal doc and commits as usual.
    val fx = Seq((1L, "en", "solo"), (11L, "en", "a b c d"))
      .toDF("doc_id", "lang", "text")
    val stage = TableOps.newTempDir("graft-slmspec-empty")
    Extensions.stageOrderedSlices(fx, stage,
      when(pmod(col("doc_id"), lit(4L)) === 1L, 0).otherwise(1), 2)
    val preState = state.meta.snapshots.size
    val preModel = model.meta.snapshots.size
    val preRes = results.meta.snapshots.size
    val batches = Extensions.streamIncrementalLm(
      spark, stage, docsSchema, state, model, results)
    assert(batches == 2) // both micro-batches ran ...
    // ... but only the bigram-bearing one committed, on all three tables
    assert(state.meta.snapshots.size == preState + 1)
    assert(model.meta.snapshots.size == preModel + 1)
    assert(results.meta.snapshots.size == preRes + 1)
    assert(results.toDF(spark).count() == 1)
    assert(results.toDF(spark).filter(col("doc_id") === 1L).isEmpty)
    assert(modelMatchesLog(state, model))
  }
}
