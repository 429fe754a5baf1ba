package graft.table

import graft.SparkSpec
import graft.format.TableProperties
import org.apache.spark.sql.functions._

/** Statement-log retention is DECOUPLED from snapshot retention: the log is
  * the replay-idempotency ledger for statementId-keyed commits (streaming
  * micro-batches), so an entry must outlive its snapshot. The failure this
  * pins down: a stream crashes, stays down past the data-retention window,
  * maintenance expires the micro-batch's snapshot, the stream resumes and
  * replays the micro-batch — with the entry pruned alongside its snapshot
  * that replay would re-apply and SILENTLY double-ingest. With the entry
  * retained, the replay is a no-op returning the current snapshot.
  */
class StatementReplaySpec extends SparkSpec {
  import spark.implicits._

  test("replay of a statement whose snapshot expired is a no-op, not a re-apply") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val a = Seq(1L, 2L, 3L).toDF("id")
    val b = Seq(10L, 11L).toDF("id")
    val t = cat.createTable("db.replay", a.schema)
    t.append(spark, a, statementId = Some("crawl-batch-0"))
    t.append(spark, b, statementId = Some("crawl-batch-1"))
    // expire everything but the newest snapshot: batch-0's snapshot goes
    val (removed, _) = t.expireSnapshots(System.currentTimeMillis() + 60000L, retainLast = 1)
    assert(removed == 1, s"expected exactly batch-0's snapshot expired, got $removed")
    // the ledger entry OUTLIVES its snapshot
    assert(t.meta.statementLog.exists(_._1 == "crawl-batch-0"),
      "statement-log entry must survive its snapshot's expiry")
    val snapsBefore = t.meta.snapshots.size
    val rowsBefore = t.toDF(spark).count()
    // the crashed stream resumes and replays batch 0 — must be a no-op
    val replayed = t.append(spark, a, statementId = Some("crawl-batch-0"))
    assert(t.toDF(spark).count() == rowsBefore, "replay after expiry double-ingested")
    assert(t.meta.snapshots.size == snapsBefore, "replay after expiry committed a new snapshot")
    assert(replayed.snapshotId == t.meta.currentSnapshotId.get,
      "no-op replay must return the current snapshot")
    // a retained-snapshot replay still returns its ORIGINAL snapshot
    val again = t.append(spark, b, statementId = Some("crawl-batch-1"))
    assert(again.summary("statement-id") == "crawl-batch-1")
    assert(t.toDF(spark).count() == rowsBefore)
    // and neither replay WROTE anything: append short-circuits on the
    // ledger before the file write, so a crash-looping stream's replays
    // don't grind disk with orphaned batch files
    assert(t.removeOrphanFiles(System.currentTimeMillis() + 60000L).isEmpty,
      "replays must not leave orphaned data files")
  }

  test("retained-snapshot entries cannot crowd expired entries out of the retain-last tail") {
    // retain-last counts EXPIRED entries only: with retain-last=1 and many
    // retained-snapshot commits newer than the expired one, a whole-log
    // tail would contain only retained entries and prune the expired entry
    // immediately — reopening the double-ingest window. The survivor tail
    // must be computed over expired entries alone.
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val a = Seq(1L).toDF("id")
    val t = cat.createTable("db.replaycrowd", a.schema,
      properties = Map(TableProperties.StatementLogRetainLast -> "1"))
    t.append(spark, a, statementId = Some("old-0"))
    (1 to 5).foreach(i => t.append(spark, Seq(i.toLong).toDF("id"),
      statementId = Some(s"new-$i")))
    // expire only old-0's snapshot; the 5 newer snapshots stay retained
    t.expireSnapshots(System.currentTimeMillis() + 60000L, retainLast = 5)
    assert(t.meta.statementLog.exists(_._1 == "old-0"),
      "expired entry must survive within the expired-only retain-last tail")
    val rows = t.toDF(spark).count()
    t.append(spark, a, statementId = Some("old-0"))
    assert(t.toDF(spark).count() == rows, "replay after expiry double-ingested")
  }

  test("the retain-last knob bounds the expired-entry tail (0 = old pruning behavior)") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val a = Seq(1L).toDF("id")
    val t = cat.createTable("db.replay0", a.schema,
      properties = Map(TableProperties.StatementLogRetainLast -> "0"))
    t.append(spark, a, statementId = Some("s-0"))
    t.append(spark, Seq(2L).toDF("id"), statementId = Some("s-1"))
    t.expireSnapshots(System.currentTimeMillis() + 60000L, retainLast = 1)
    // with the horizon at 0, only entries for RETAINED snapshots survive
    assert(!t.meta.statementLog.exists(_._1 == "s-0"),
      "retain-last=0 must restore snapshot-coupled pruning")
    assert(t.meta.statementLog.exists(_._1 == "s-1"))
  }

  test("replayed MERGE and DELETE short-circuit before writing, like append") {
    // the streaming LM loop replays its model MERGE under the checkpoint
    // machinery exactly like its appends; commitSnapshot would no-op the
    // replay anyway, but only AFTER the candidate scan + full rewrite
    // wrote (and then orphaned) every output file — crash-looping
    // replays must not grind disk on any statementId-keyed DML path
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val base = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    val t = cat.createTable("db.replay_dml", base.schema)
    t.append(spark, base)
    t.merge(spark, Seq(("a", 10L)).toDF("k", "n"), Seq("k" -> "k"),
      whenMatchedUpdate = Map("n" -> col("t.n").plus(col("s.n"))),
      insertWhenNotMatched = false, statementId = Some("m-0"))
    t.delete(spark, Seq(graft.format.Predicate.Eq("k", "b")),
      statementId = Some("d-0"))
    val rows = t.toDF(spark).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("a", 11L)))
    val snaps = t.meta.snapshots.size
    // replays: no new snapshots, no row changes, and NO orphaned files
    t.merge(spark, Seq(("a", 10L)).toDF("k", "n"), Seq("k" -> "k"),
      whenMatchedUpdate = Map("n" -> col("t.n").plus(col("s.n"))),
      insertWhenNotMatched = false, statementId = Some("m-0"))
    t.delete(spark, Seq(graft.format.Predicate.Eq("k", "b")),
      statementId = Some("d-0"))
    assert(t.meta.snapshots.size == snaps, "replayed DML committed a new snapshot")
    assert(t.toDF(spark).collect().map(r => (r.getString(0), r.getLong(1))).toSet == rows,
      "replayed DML changed table contents")
    assert(t.removeOrphanFiles(System.currentTimeMillis() + 60000L).isEmpty,
      "replayed DML must not leave orphaned rewrite files")
  }
}
