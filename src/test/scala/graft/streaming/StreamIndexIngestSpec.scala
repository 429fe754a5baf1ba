package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps, Tables}
import org.apache.spark.sql.functions._

/** Certifies the shipped streaming postings-ingest path
  * ([[graft.queries.Extensions.keywordStreamIngest]], the
  * x_stream_keyword_ingest pipeline): micro-batched postings extraction
  * must build EXACTLY the index the one-shot [[Extensions.postingsOf]]
  * build produces — the correctness hinges on a document never spanning
  * micro-batches, so every (token, doc_id) tf completes within its
  * batch. The rig's restart/no-double-ingest semantics are certified in
  * AnnStreamIngestSpec against the same shared streamIngestTransformed.
  */
class StreamIndexIngestSpec extends SparkSpec {

  test("streamed postings == one-shot postingsOf build; one commit per batch") {
    import graft.format.Transform
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val stage = TableOps.newTempDir("graft-kwspec")
    docs.repartition(6).write.mode("overwrite").parquet(stage)
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.inverted_spec",
      Extensions.postingsOf(docs.limit(0)).schema,
      partitionBy = Seq("bucket" -> Transform.Identity))

    val batches = Extensions.keywordStreamIngest(
      spark, stage, docs.schema, t, filesPerTrigger = 2)

    assert(batches == 3, s"expected 3 micro-batches, got $batches")
    assert(t.meta.snapshots.size == 3,
      s"expected one commit per batch, got ${t.meta.snapshots.size}")

    // exact postings parity with the one-shot build: per-(token, doc)
    // tf must agree row for row in both anti-join directions — a doc
    // split across batches would surface as two partial-tf rows here
    val oneShot = Extensions.postingsOf(docs)
      .select("token", "doc_id", "tf", "bucket")
    val streamed = t.toDF(spark).select("token", "doc_id", "tf", "bucket")
    assert(streamed.count() == oneShot.count(),
      "streamed postings row count differs from the one-shot build")
    val on = Seq("token", "doc_id", "tf", "bucket")
    assert(streamed.join(oneShot, on, "left_anti").isEmpty,
      "streamed index holds postings the one-shot build would not")
    assert(oneShot.join(streamed, on, "left_anti").isEmpty,
      "streamed index lost or split postings the one-shot build produces")
  }
}
