package graft.streaming

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}
import graft.queries.{Extensions, TableOps, Tables}
import org.apache.spark.sql.functions._

/** Certifies the shipped streaming IVF-ingest path
  * ([[graft.queries.Extensions.annStreamIngest]], the x_stream_ann_ingest
  * pipeline): micro-batched appends against frozen centroids must build
  * EXACTLY the index a one-shot batch build produces — same (vec_id,
  * cell) set, no row lost or double-ingested across batch boundaries —
  * with one atomic commit per non-empty micro-batch so probes always
  * read a consistent snapshot.
  */
class AnnStreamIngestSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def corpus() =
    Extensions.clusteredEmbeddings(Tables.embeddings(spark, d))

  private def newIndex(name: String) = {
    import graft.format.Transform
    import org.apache.spark.sql.types.LongType
    new graft.catalog.GraftCatalog(tempWarehouse()).createTable(name,
      corpus().schema.add("cell", LongType),
      partitionBy = Seq("cell" -> Transform.Identity))
  }

  /** Exact (vec_id, cell) parity with the one-shot batch build: multiset
    * equality via row count + an anti-join in each direction.
    */
  private def assertBatchParity(t: graft.table.GraftTable): Unit = {
    val batchBuilt = corpus()
      .withColumn("cell", VF.ivfCellExact(col("v"), Extensions.shiftCentroids))
      .select("vec_id", "cell")
    val streamed = t.toDF(spark).select("vec_id", "cell")
    assert(streamed.count() == batchBuilt.count(),
      "streamed index row count differs from the batch build")
    assert(streamed.join(batchBuilt, Seq("vec_id", "cell"), "left_anti").isEmpty,
      "streamed index holds rows the batch build would not")
    assert(batchBuilt.join(streamed, Seq("vec_id", "cell"), "left_anti").isEmpty,
      "streamed index lost rows the batch build produces")
  }

  test("streamed index == one-shot batch assignment; one commit per batch") {
    val clustered = corpus()
    val stage = TableOps.newTempDir("graft-annspec")
    clustered.repartition(6).write.mode("overwrite").parquet(stage)
    val t = newIndex("db.ann_spec")

    val batches = Extensions.annStreamIngest(
      spark, stage, clustered.schema, t, Extensions.shiftCentroids,
      filesPerTrigger = 2)

    // 6 staged files at 2 per trigger -> 3 micro-batches, 3 commits
    assert(batches == 3, s"expected 3 micro-batches, got $batches")
    assert(t.meta.snapshots.size == 3,
      s"expected one commit per batch, got ${t.meta.snapshots.size}")
    assertBatchParity(t)
  }

  test("resume from the checkpoint ingests only NEW files — no double-ingest") {
    // the restart claim the gate's comment makes, certified
    // deterministically: a second AvailableNow run over the SAME
    // checkpoint (annStreamIngest derives it from the stage path) must
    // skip every file the first run processed and pick up only files
    // staged afterwards — the crashed-and-restarted ingest shape.
    val clustered = corpus()
    val stage = TableOps.newTempDir("graft-annresume")
    clustered.filter(col("vec_id") % 3 === 0)
      .repartition(2).write.mode("overwrite").parquet(stage)
    val t = newIndex("db.ann_resume")

    val b1 = Extensions.annStreamIngest(
      spark, stage, clustered.schema, t, Extensions.shiftCentroids,
      filesPerTrigger = 2)
    assert(b1 == 1, s"first run: expected 1 micro-batch of 2 files, got $b1")
    val rows1 = t.toDF(spark).count()
    assert(rows1 == clustered.filter(col("vec_id") % 3 === 0).count())

    // stage the remaining corpus as 4 NEW files, then "restart"
    clustered.filter(col("vec_id") % 3 =!= 0)
      .repartition(4).write.mode("append").parquet(stage)
    val b2 = Extensions.annStreamIngest(
      spark, stage, clustered.schema, t, Extensions.shiftCentroids,
      filesPerTrigger = 2)
    assert(b2 == 2, s"resume: expected 2 micro-batches of the 4 new files, got $b2")
    assert(t.meta.snapshots.size == 3, "one commit per batch across both runs")
    assertBatchParity(t) // every row ingested exactly once, none re-read
  }
}
