package graft.table

import graft.SparkSpec
import graft.format.Transform
import org.apache.spark.sql.functions._

/** The ANN index REBUILD's atomicity contract (the x_ann_index_rebuild
  * gate): [[GraftTable.replaceWith]] installs the re-clustered index in
  * ONE CAS, so a probe can never observe a half-built index — every
  * snapshot in the table's history is a COMPLETE index, a scan pinned
  * before the swap reads the complete old index even when materialized
  * after it, and a rebuild that CRASHES mid-write leaves the table on the
  * old index with no new snapshot (whatever the crashed write staged is
  * orphaned, removable by the safety-window GC with nothing visible
  * changing).
  */
class AnnRebuildSpec extends SparkSpec {
  import spark.implicits._

  private def vec(g: Int) = Array.tabulate(8)(i => if (i == g) 1.0 else 0.0)
  private def idx(mod: Long) =
    (0L until 16L).map(id => (id, vec((id % mod).toInt), id % mod))
  private def idxDf(mod: Long) = idx(mod).toDF("vec_id", "v", "cell")
  private def cells(mod: Long) = (0L until 16L).map(id => (id, id % mod)).toSet

  private def readCells(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("vec_id", "cell").as[(Long, Long)].collect().toSet

  test("every snapshot is a complete index; pre-swap scans survive the swap") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ann_rb", idxDf(2).schema,
      partitionBy = Seq("cell" -> Transform.Identity))
    t.append(spark, idxDf(2))
    val pinned = t.scan() // opened BEFORE the swap
    t.replaceWith(idxDf(4).schema, Seq("cell" -> Transform.Identity),
      spark = Some(spark), data = Some(idxDf(4)))
    // the pinned scan, materialized AFTER the swap, reads the complete
    // OLD index (snapshot isolation is structural: the scan holds one
    // immutable snapshot)
    assert(readCells(pinned.toDF(spark)) == cells(2),
      "pre-swap scan must read the complete old index")
    assert(readCells(t.toDF(spark)) == cells(4),
      "post-swap scan must read the complete new index")
    // EVERY snapshot in history is one of the two complete indexes —
    // no probe at any point in time can see a partial rebuild
    val complete = Set(cells(2), cells(4))
    t.meta.snapshots.foreach { sn =>
      val rows = readCells(t.atSnapshot(sn.snapshotId).toDF(spark))
      assert(complete.contains(rows),
        s"snapshot ${sn.snapshotId} exposes a partial index: ${rows.size} rows")
    }
  }

  test("a rebuild that crashes mid-write leaves the old index intact") {
    val cat = new graft.catalog.GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ann_rb2", idxDf(2).schema,
      partitionBy = Seq("cell" -> Transform.Identity))
    t.append(spark, idxDf(2))
    val snapsBefore = t.meta.snapshots.size
    val poisoned = idxDf(4).withColumn("cell",
      when(col("vec_id") === 13L,
        expr("raise_error('simulated mid-rebuild crash')").cast("long"))
        .otherwise(col("cell")))
    intercept[Exception] {
      t.replaceWith(poisoned.schema, Seq("cell" -> Transform.Identity),
        spark = Some(spark), data = Some(poisoned))
    }
    // the CAS never happened: no new snapshot, probes read the OLD index
    assert(t.meta.snapshots.size == snapsBefore,
      "crashed rebuild must not commit a snapshot")
    assert(readCells(t.toDF(spark)) == cells(2),
      "crashed rebuild must leave the old index intact")
    // anything the crashed write staged is unreferenced — the safety-
    // window GC may remove it and nothing visible changes
    t.removeOrphanFiles(System.currentTimeMillis() + 60000L)
    assert(readCells(t.toDF(spark)) == cells(2))
  }
}
