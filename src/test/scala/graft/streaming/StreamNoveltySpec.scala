package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Certifies the shipped streaming novelty loop
  * ([[graft.queries.Extensions.streamIncrementalNovelty]], the
  * x_stream_incremental_novelty pipeline) on a hand-planted corpus where
  * a gram CLAIMED by an earlier slice must read as non-novel for a later
  * slice via the durable first-seen state — the cross-batch distinction —
  * plus the orphaned-results crash window and checkpoint idempotency.
  */
class StreamNoveltySpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("text", StringType)

  // hist doc 100 "x y z w": grams {x y z, y z w}.
  // slice 0 (ids < 10): doc 1 "a b c d" -> {a b c, b c d} both novel;
  //   doc 3 "x y z q" -> {x y z} hist-seen, {y z q} novel.
  // slice 1 (ids >= 10): doc 11 "a b c e" -> {a b c} was CLAIMED by
  //   slice 0's doc 1, so it must read non-novel via the state rows batch
  //   0 appended; {b c e} novel. doc 13 "x y z w" -> both hist, novel 0.
  private def histDf = Seq((100L, "en", "x y z w")).toDF("doc_id", "lang", "text")
  private def batchDf = Seq(
    (1L, "en", "a b c d"),
    (3L, "en", "x y z q"),
    (11L, "en", "a b c e"),
    (13L, "en", "x y z w")
  ).toDF("doc_id", "lang", "text")

  private def newTables() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val fs = histDf.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3))).as("g"))
      .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    val state = cat.createTable("db.fs_spec", fs.schema,
      partitionBy = Seq("g" -> graft.format.Transform.Bucket(4)))
    state.append(spark, fs)
    val results = cat.createTable("db.nov_spec", new StructType()
      .add("doc_id", LongType).add("lang", StringType)
      .add("n_grams", LongType).add("novel", LongType))
    (state, results)
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-snovspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(col("doc_id") < 10L, 0).otherwise(1), 2)
    stage
  }

  private val want = Set((1L, 2L, 2L), (3L, 2L, 1L), (11L, 2L, 1L), (13L, 2L, 0L))

  test("grams claimed by an earlier slice read non-novel via state") {
    val (state, results) = newTables()
    val batches = Extensions.streamIncrementalNovelty(
      spark, stageSlices(), docsSchema, state, results)
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val got = results.toDF(spark)
      .select("doc_id", "n_grams", "novel").as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"novelty wrong: $got (doc 11's 'a b c' must read non-novel via the " +
        "first-seen row batch 0 appended for doc 1)")
    // state = 2 hist grams + 4 batch claims, one row per distinct gram
    assert(state.toDF(spark).count() == 6)
    assert(state.meta.snapshots.size == 3 && results.meta.snapshots.size == 2)
  }

  test("crash between results and state commits: replay recomputes identical novelty") {
    val (state, results) = newTables()
    val stage = stageSlices()
    // batch 0's results landed; the process died before the first-seen
    // commit — the replay must score against the claim-free state
    // (identical novelty), no-op the results append, complete the claims
    results.append(spark, Seq((1L, "en", 2L, 2L), (3L, "en", 2L, 1L))
      .toDF("doc_id", "lang", "n_grams", "novel"),
      statementId = Some(s"$stage-res-0"))
    val batches = Extensions.streamIncrementalNovelty(
      spark, stage, docsSchema, state, results)
    assert(batches == 2)
    val got = results.toDF(spark)
      .select("doc_id", "n_grams", "novel").as[(Long, Long, Long)].collect().toList
    assert(got.toSet == want && got.size == 4,
      s"orphaned results commit duplicated or diverged on replay: $got")
    assert(results.meta.snapshots.size == 2 && state.meta.snapshots.size == 3)
  }

  test("re-running the finished crawl on the same checkpoint ingests nothing") {
    val (state, results) = newTables()
    val stage = stageSlices()
    Extensions.streamIncrementalNovelty(spark, stage, docsSchema, state, results)
    val again = Extensions.streamIncrementalNovelty(
      spark, stage, docsSchema, state, results)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(results.toDF(spark).count() == 4 && state.toDF(spark).count() == 6)
  }

  test("small batches probe the first-seen state with a pruned runtime-filtered scan") {
    // the exact loop's discipline applied to the first-seen table: the
    // batch's distinct-gram set is a bounded driver collect pushed as an
    // In probe, so the g-bloom (and, for natural-language grams, min/max)
    // planes skip state files that cannot hold any batch gram. A grown
    // many-file state + a 2-doc batch must scan a small fraction.
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.fs_spec_probe",
      new StructType().add("g", StringType).add("first_doc", LongType),
      partitionBy = Seq("g" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "g"))
    (0 until 3).foreach { c =>
      state.append(spark, (0 until 200).map(i =>
          (s"h${c}a$i h${c}b$i h${c}c$i", 1000L + c * 200 + i))
        .toDF("g", "first_doc"))
    }
    val results = cat.createTable("db.nov_spec_probe", new StructType()
      .add("doc_id", LongType).add("lang", StringType)
      .add("n_grams", LongType).add("novel", LongType))
    // doc 1's gram was claimed by crawl 0 (non-novel via state); doc 2 fresh
    val batch = Seq((1L, "en", "h0a5 h0b5 h0c5"), (2L, "en", "f1 f2 f3"))
      .toDF("doc_id", "lang", "text")
    val stage = TableOps.newTempDir("graft-snovspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalNovelty(spark, stage, docsSchema, state, results,
      onStateScanMetrics = scans += _)
    val novel = results.toDF(spark).select("doc_id", "novel")
      .as[(Long, Long)].collect().toMap
    assert(novel == Map(1L -> 0L, 2L -> 1L),
      s"state-claimed gram must read non-novel, fresh gram novel: $novel")
    assert(scans.size == 1)
    val m = scans.head
    assert(m.filesTotal >= 10,
      s"fixture must spread the state over many files: ${m.filesTotal}")
    assert(m.filesScanned * 2 < m.filesTotal,
      s"small-batch state probe must prune: ${m.filesScanned}/${m.filesTotal}")
  }
}
