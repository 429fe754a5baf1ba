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
}
