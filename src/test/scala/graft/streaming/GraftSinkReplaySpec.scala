package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once under crash-replay — the claim GraftSink.appendTo makes
  * ("a micro-batch replayed by checkpoint recovery is a no-op") driven
  * through a REAL injected failure: the sink crashes after batch 1's table
  * commit but before the checkpoint advances, which is precisely the
  * window Structured Streaming re-delivers. On restart the replayed batch
  * must hit the statement-log guard and return the prior snapshot instead
  * of double-appending.
  */
class GraftSinkReplaySpec extends SparkSpec {

  test("sink replays a crashed micro-batch as a no-op: contents and commit count exact") {
    import spark.implicits._
    val stage = tempWarehouse()
    val df = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(4).write.mode("overwrite").parquet(s"$stage/in")

    val cat = new graft.catalog.GraftCatalog(s"$stage/wh")
    val t = cat.createTable("db.sink", df.schema)
    def src(): DataFrame = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$stage/in")

    // run 1: crash AFTER batch 1's append commits (checkpoint not yet
    // advanced for it) — same statementId scheme GraftSink.appendTo uses
    var injected = false
    val q1 = src().writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      t.append(spark, b, statementId = Some(s"sink-batch-$id"))
      if (id == 1 && !injected) {
        injected = true
        throw new RuntimeException("injected crash after commit")
      }
      ()
    }.option("checkpointLocation", s"$stage/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    val failed = intercept[Exception](q1.awaitTermination())
    assert(failed.getMessage.contains("injected crash") ||
      Option(failed.getCause).exists(_.getMessage.contains("injected crash")),
      s"expected the injected crash, got: $failed")
    val committedBeforeRestart = t.meta.snapshots.size
    assert(committedBeforeRestart >= 2, "batches 0 and 1 must have committed before the crash")

    // run 2: same checkpoint, same sinkId — batch 1 is re-delivered and
    // must be absorbed by the statement log, then the rest drains
    val q2 = GraftSink.appendTo(t, spark, src(), sinkId = "sink")
      .option("checkpointLocation", s"$stage/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000), "restarted stream did not finish")

    val got = t.toDF(spark).as[(Long, String)].collect().toSet
    val want = (1L to 400L).map(i => (i, s"v$i")).toSet
    assert(got == want, s"replay duplicated or dropped rows: got ${got.size} rows")
    // one commit per DISTINCT micro-batch (4 input files -> 4 batches);
    // the replayed batch added no snapshot
    assert(t.meta.snapshots.size == 4,
      s"expected 4 append commits, got ${t.meta.snapshots.size}")
    assert(t.meta.statementLog.map(_._1).distinct.size == t.meta.statementLog.size,
      "statement log must not record a statement twice")
  }
}
