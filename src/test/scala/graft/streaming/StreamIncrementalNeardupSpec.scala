package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Certifies the shipped streaming fuzzy crawl loop
  * ([[graft.queries.Extensions.streamIncrementalNeardup]], the
  * x_stream_incremental_neardup pipeline) on a hand-planted corpus where
  * the rejection classes cross micro-batch boundaries — the distinction
  * only the persisted band-signature STATE provides: a near-dup arriving
  * in a LATER slice of a doc ADMITTED in an earlier slice must reject via
  * the signatures that earlier batch appended. Also replays the
  * crash-window the helper's results-before-state ordering is designed
  * for: a results commit orphaned by a crash before the state commit must
  * no-op on replay, never double-admit.
  */
class StreamIncrementalNeardupSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def histDf = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  // slice 0 (ids < 10): 1 and 5 are new (admit); 3 is a lightly-edited
  // recrawl of history 100 (reject via HIST sigs — nomination asserted as
  // a precondition below, not assumed). slice 1 (ids >= 10): 11 is an
  // exact copy of slice-0-ADMITTED doc 1 (must reject via the STATE rows
  // batch 0 appended — the cross-batch distinction); 13 is new (admit);
  // 15 is an exact copy of history (reject via hist).
  private def batchDf = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "the quick brown fox jumps over the lazy dog extra tail"),
    (5L, "one two three four five six seven eight nine ten"),
    (11L, "alpha beta gamma delta epsilon zeta eta theta"),
    (13L, "completely different words nothing shared here at all"),
    (15L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private def newTables() = {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val histSigs = Extensions.bandSigsOf(histDf)
    val state = cat.createTable("db.nd_sigs_spec", histSigs.schema,
      partitionBy = Seq("sig" -> graft.format.Transform.Bucket(4)))
    state.append(spark, histSigs)
    val results = cat.createTable("db.nd_adm_spec", docsSchema)
    (state, results)
  }

  private def stageSlices(): String = {
    val stage = TableOps.newTempDir("graft-sndspec")
    Extensions.stageOrderedSlices(batchDf, stage,
      when(col("doc_id") < 10L, 0).otherwise(1), 2)
    stage
  }

  test("later-slice near-dups of earlier ADMISSIONS reject via state") {
    // precondition, not assumption: the edited recrawl (3) actually
    // NOMINATES against its history source under the shipped banded
    // minhash (an added shingle can displace a band minimum) and its
    // exact bigram Jaccard clears 0.5 — so its rejection below exercises
    // the verify path, not luck
    val nom = Extensions.bandSigsOf(batchDf.filter(col("doc_id") === 3L))
      .join(Extensions.bandSigsOf(histDf), Seq("band", "sig"))
      .count()
    assert(nom > 0, "fixture broke: edited recrawl no longer shares a band signature")

    val (state, results) = newTables()
    val batches = Extensions.streamIncrementalNeardup(
      spark, stageSlices(), docsSchema, state, histDf, results)

    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    val admitted = results.toDF(spark).select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 5L, 13L),
      s"admissions wrong: $admitted (11 must reject via the STATE carrying " +
        "batch 0's admission of doc 1; 3/15 via history)")
    // state grew append-only: 2 hist sig rows + 2 per admitted doc
    assert(state.toDF(spark).count() == 2 + 3 * 2)
    assert(state.meta.snapshots.size == 3, "hist append + one per batch")
    assert(results.meta.snapshots.size == 2, "one results commit per batch")
  }

  test("crash between results and state commits: replay no-ops the results, completes the state") {
    val (state, results) = newTables()
    val stage = stageSlices()
    // simulate the crash window: batch 0's RESULTS commit landed (the
    // helper commits results first) but the process died before the state
    // commit and before the stream's own commit log recorded the batch —
    // on restart the file source redelivers batch 0 in full
    results.append(spark, Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (5L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text"),
      statementId = Some(s"$stage-res-0"))
    val batches = Extensions.streamIncrementalNeardup(
      spark, stage, docsSchema, state, histDf, results)
    assert(batches == 2)
    // no double-admission: the replayed batch-0 results append no-ops on
    // its statementId, and the recomputed admitted set was identical
    // because the state did NOT yet hold batch 0's signatures
    val rows = results.toDF(spark).select("doc_id").as[Long].collect().toList
    assert(rows.sorted == List(1L, 5L, 13L),
      s"orphaned results commit double-admitted on replay: $rows")
    assert(results.meta.snapshots.size == 2,
      "pre-committed batch 0 + batch 1 — the replayed batch-0 append must no-op")
    assert(state.meta.snapshots.size == 3, "state completes normally on replay")
  }

  test("re-running the finished crawl on the same checkpoint ingests nothing") {
    val (state, results) = newTables()
    val stage = stageSlices()
    Extensions.streamIncrementalNeardup(spark, stage, docsSchema, state, histDf, results)
    val (rows, stateRows) = (results.toDF(spark).count(), state.toDF(spark).count())
    val again = Extensions.streamIncrementalNeardup(
      spark, stage, docsSchema, state, histDf, results)
    assert(again == 0, s"finished checkpoint must deliver no batches, got $again")
    assert(results.toDF(spark).count() == rows && state.toDF(spark).count() == stateRows)
  }
}
