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

  test("streamed index == one-shot batch assignment; one commit per batch") {
    import graft.format.Transform
    import org.apache.spark.sql.types.LongType
    val d = "/root/testdata/sf0.001"
    val clustered = Extensions.clusteredEmbeddings(Tables.embeddings(spark, d))
    val cents = Extensions.shiftCentroids
    val stage = TableOps.newTempDir("graft-annspec")
    clustered.repartition(6).write.mode("overwrite").parquet(stage)
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ann_spec",
      clustered.schema.add("cell", LongType),
      partitionBy = Seq("cell" -> Transform.Identity))

    val batches = Extensions.annStreamIngest(
      spark, stage, clustered.schema, t, cents, filesPerTrigger = 2)

    // 6 staged files at 2 per trigger -> 3 micro-batches, 3 commits
    assert(batches == 3, s"expected 3 micro-batches, got $batches")
    assert(t.meta.snapshots.size == 3,
      s"expected one commit per batch, got ${t.meta.snapshots.size}")

    // content parity with the one-shot batch build: exact (vec_id, cell)
    // multiset equality in both directions via an anti-join each way
    val batchBuilt = clustered
      .withColumn("cell", VF.ivfCellExact(col("v"), cents))
      .select("vec_id", "cell")
    val streamed = t.toDF(spark).select("vec_id", "cell")
    assert(streamed.count() == batchBuilt.count(),
      "streamed index row count differs from the batch build")
    assert(streamed.join(batchBuilt, Seq("vec_id", "cell"), "left_anti").isEmpty,
      "streamed index holds rows the batch build would not")
    assert(batchBuilt.join(streamed, Seq("vec_id", "cell"), "left_anti").isEmpty,
      "streamed index lost rows the batch build produces")
  }
}
