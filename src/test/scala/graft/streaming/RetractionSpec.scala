package graft.streaming

import graft.SparkSpec
import graft.queries.{Extensions, TableOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Retraction composed with the LIVE crawl: a doc admitted by an earlier
  * micro-batch is retracted from the durable fingerprint state, and a
  * later crawl must ADMIT its exact copy again — the state genuinely
  * forgot — while un-retracted state keeps rejecting. The x_dedup_retract
  * gate proves the one-shot semantics; this pins the between-batches
  * composition no gate covers (retract while a crawl's checkpoint is
  * live, then continue crawling).
  */
class RetractionSpec extends SparkSpec {
  import spark.implicits._

  private val docsSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def crawl(state: graft.table.GraftTable,
                    results: graft.table.GraftTable,
                    docs: org.apache.spark.sql.DataFrame, tag: String): Int = {
    val stage = TableOps.newTempDir(s"graft-retrspec-$tag")
    Extensions.stageOrderedSlices(docs, stage, lit(0), 1)
    Extensions.streamIncrementalDedup(spark, stage, docsSchema, state, results)
  }

  private def admitted(results: graft.table.GraftTable): Set[Long] =
    results.toDF(spark).select("doc_id").as[Long].collect().toSet

  test("retraction between crawls readmits the retracted doc; survivors still reject") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.fp_retr_spec",
      new StructType().add("fp", StringType),
      partitionBy = Seq("fp" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
    val results = cat.createTable("db.adm_retr_spec",
      new StructType().add("doc_id", LongType))
    // crawl 1 admits both docs
    crawl(state, results, Seq((1L, "alpha text"), (3L, "beta text"))
      .toDF("doc_id", "text"), "c1")
    assert(admitted(results) == Set(1L, 3L))
    // retraction request: doc 1 — delete ITS fingerprint from the state
    val fp1 = Seq("alpha text").toDF("text")
      .select(md5(col("text"))).head.getString(0)
    state.delete(spark, Seq(graft.format.Predicate.In("fp", Seq(fp1))))
    assert(state.toDF(spark).count() == 1, "exactly the retracted fp must die")
    // crawl 2: doc 11 copies RETRACTED doc 1 (admit again — the state
    // forgot), doc 13 copies SURVIVING doc 3 (still reject), doc 15 fresh
    crawl(state, results, Seq(
        (11L, "alpha text"), (13L, "beta text"), (15L, "fresh text"))
      .toDF("doc_id", "text"), "c2")
    assert(admitted(results) == Set(1L, 3L, 11L, 15L),
      "retracted fp must readmit its copy; surviving fp must keep rejecting")
  }

  test("control: without retraction the copy stays rejected") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val state = cat.createTable("db.fp_retr_ctl",
      new StructType().add("fp", StringType),
      partitionBy = Seq("fp" -> graft.format.Transform.Bucket(4)),
      properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
    val results = cat.createTable("db.adm_retr_ctl",
      new StructType().add("doc_id", LongType))
    crawl(state, results, Seq((1L, "alpha text"), (3L, "beta text"))
      .toDF("doc_id", "text"), "k1")
    crawl(state, results, Seq(
        (11L, "alpha text"), (13L, "beta text"), (15L, "fresh text"))
      .toDF("doc_id", "text"), "k2")
    assert(admitted(results) == Set(1L, 3L, 15L),
      "without retraction both copies must reject")
  }
}
