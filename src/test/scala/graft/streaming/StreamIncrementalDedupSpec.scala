package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Certifies the shipped streaming crawl-dedup loop
  * ([[graft.queries.Extensions.streamIncrementalDedup]], the
  * x_stream_incremental_dedup pipeline) on a hand-planted corpus where
  * every rejection class is exercised ACROSS micro-batch boundaries —
  * the distinction the gate's stateless oracle cannot see (it computes
  * the same answer whether state or global grouping did the work):
  * a duplicate arriving in a LATER slice must be rejected by the
  * fingerprint STATE holding the earlier slice's admission.
  */
class StreamIncrementalDedupSpec extends SparkSpec {

  test("later-slice duplicates reject via state; new fps still admit") {
    import graft.format.Transform
    import spark.implicits._
    val docsSchema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    // slice 0: docs 1..3 (all new). slice 1: doc 11 duplicates doc 1's
    // text (cross-batch dup -> state reject), doc 12 is new. slice 2:
    // doc 21 duplicates doc 12 (cross-batch), doc 22 duplicates doc 22's
    // own slice-mate doc 23 (within-batch -> min-doc keeps 22), doc 24
    // duplicates HISTORY.
    val batch = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (11L, "alpha"), (12L, "delta"),
      (21L, "delta"), (22L, "epsilon"), (23L, "epsilon"), (24L, "hist-doc")
    ).toDF("doc_id", "text")
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.fp_spec",
      new StructType().add("fp", StringType),
      partitionBy = Seq("fp" -> Transform.Bucket(4)))
    state.append(spark, Seq("hist-doc").toDF("text")
      .select(md5(col("text")).as("fp")))
    val results = cat.createTable("db.adm_spec",
      new StructType().add("doc_id", LongType))
    val stage = TableOps.newTempDir("graft-sidspec")
    Extensions.stageOrderedSlices(batch, stage,
      when(col("doc_id") < 10L, 0).when(col("doc_id") < 20L, 1).otherwise(2), 3)

    val batches = Extensions.streamIncrementalDedup(
      spark, stage, docsSchema, state, results)

    assert(batches == 3, s"expected 3 micro-batches, got $batches")
    val admitted = results.toDF(spark).as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 3L, 12L, 22L),
      s"admissions wrong: $admitted (11/21 must reject via STATE, " +
        "23 via within-batch min-doc, 24 via history)")
    // state grew append-only: history fp + one fp per admitted doc
    assert(state.toDF(spark).count() == 1 + 5)
    assert(state.meta.snapshots.size == 4, "hist append + one per batch")
    assert(results.meta.snapshots.size == 3, "one results commit per batch")
  }

  test("filesPerTrigger sizes the batch: state scans track BATCH count, not corpus size") {
    // the honest-cost knob (r11 verdict #6): each micro-batch anti-joins
    // the FULL fingerprint state once, so the per-corpus state-scan count
    // equals the batch count. Same corpus, same 3 staged slices; at
    // filesPerTrigger=3 the crawl collapses to ONE batch — one state
    // scan, one state commit, one results commit — and the admissions are
    // IDENTICAL (the within-batch min-doc rule and the state anti-join
    // pick the same winners on this corpus whichever side of a batch
    // boundary a duplicate lands on, because originals carry lower ids).
    import graft.format.Transform
    import spark.implicits._
    val docsSchema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val batch = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (11L, "alpha"), (12L, "delta"),
      (21L, "delta"), (22L, "epsilon"), (23L, "epsilon"), (24L, "hist-doc")
    ).toDF("doc_id", "text")
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.fp_spec_big",
      new StructType().add("fp", StringType),
      partitionBy = Seq("fp" -> Transform.Bucket(4)))
    state.append(spark, Seq("hist-doc").toDF("text")
      .select(md5(col("text")).as("fp")))
    val results = cat.createTable("db.adm_spec_big",
      new StructType().add("doc_id", LongType))
    val stage = TableOps.newTempDir("graft-sidspec-big")
    Extensions.stageOrderedSlices(batch, stage,
      when(col("doc_id") < 10L, 0).when(col("doc_id") < 20L, 1).otherwise(2), 3)

    val batches = Extensions.streamIncrementalDedup(
      spark, stage, docsSchema, state, results, filesPerTrigger = 3)

    assert(batches == 1, s"filesPerTrigger=3 over 3 slices must run ONE batch, got $batches")
    assert(results.toDF(spark).as[Long].collect().toSet == Set(1L, 2L, 3L, 12L, 22L),
      "one-batch admissions must equal the 3-batch run's")
    assert(state.meta.snapshots.size == 2, "hist append + ONE state scan/commit")
    assert(results.meta.snapshots.size == 1, "ONE results commit")
  }

  test("small batches probe the state with a pruned runtime-filtered scan") {
    // r12 verdict #5: the batch's fp set is a bounded driver collect —
    // pushed as an In probe, the state's fp-bloom (and bucket) planes
    // skip files that cannot hold any batch fp. md5-uniform min/max
    // bounds can never prune this state; the bloom plane can, and this
    // measures it: a grown many-file state, a 2-doc batch, and the
    // anti-join scan reads a small fraction of the state's files.
    import graft.format.Transform
    import spark.implicits._
    val docsSchema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.fp_spec_probe",
      new StructType().add("fp", StringType),
      partitionBy = Seq("fp" -> Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
    // three crawls' worth of accumulated history fingerprints
    (0 until 3).foreach(c => state.append(spark,
      (0 until 200).map(i => s"hist-$c-$i").toDF("text")
        .select(md5(col("text")).as("fp"))))
    val results = cat.createTable("db.adm_spec_probe",
      new StructType().add("doc_id", LongType))
    val batch = Seq((1L, "hist-1-5"), (2L, "brand new text")).toDF("doc_id", "text")
    val stage = TableOps.newTempDir("graft-sidspec-probe")
    Extensions.stageOrderedSlices(batch, stage, lit(0), 1)
    val scans = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
    Extensions.streamIncrementalDedup(spark, stage, docsSchema, state, results,
      onStateScanMetrics = scans += _)
    assert(results.toDF(spark).as[Long].collect().toSet == Set(2L),
      "dup of history must reject, new doc admit")
    assert(scans.size == 1)
    val m = scans.head
    assert(m.filesTotal >= 10,
      s"fixture must spread the state over many files: ${m.filesTotal}")
    assert(m.filesScanned * 2 < m.filesTotal,
      s"small-batch state probe must prune: ${m.filesScanned}/${m.filesTotal}")
  }
}
