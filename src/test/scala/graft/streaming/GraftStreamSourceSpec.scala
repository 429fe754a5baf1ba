package graft.streaming

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class GraftStreamSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def mk(rows: Seq[(Long, String)]) =
    spark.createDataFrame(rows.map { case (a, b) => Row(a, b) }.asJava, schema)

  test("changesSince: snapshot-diff changelog delivers exactly the appended rows") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.chg", schema)
    t.append(spark, mk(Seq((1L, "a"), (2L, "b"))))
    val s1 = t.meta.currentSnapshotId.get
    t.append(spark, mk(Seq((3L, "c"))))
    val s2 = t.meta.currentSnapshotId.get
    t.append(spark, mk(Seq((4L, "d"), (5L, "e"))))

    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSet
    assert(ids(GraftStreamSource.changesSince(spark, t, None, Some(s1))) == Set(1L, 2L))
    assert(ids(GraftStreamSource.changesSince(spark, t, Some(s1), Some(s2))) == Set(3L))
    assert(ids(GraftStreamSource.changesSince(spark, t, Some(s1))) == Set(3L, 4L, 5L))
    assert(ids(GraftStreamSource.changesSince(spark, t, Some(t.meta.currentSnapshotId.get))) == Set())
  }

  test("changelog: exact CDF under append / delete / update / compact") {
    import graft.format.Predicate
    import org.apache.spark.sql.functions.col
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.cdf", schema,
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, mk(Seq((1L, "a"), (2L, "b"), (3L, "c"))))
    val s1 = t.meta.currentSnapshotId.get

    t.append(spark, mk(Seq((4L, "d"))))                       // insert
    t.delete(spark, Seq(Predicate.Eq("id", 2L)))              // MOR delete
    t.update(spark, Map("v" -> org.apache.spark.sql.functions.lit("A")),
      Seq(Predicate.Eq("id", 1L)))                            // update = del+ins

    def changes(from: Long) = GraftStreamSource.changelog(spark, t, Some(from))
      .collect().map(r => (r.getString(2), r.getLong(0), r.getString(1))).toSet
    assert(changes(s1) == Set(
      ("insert", 4L, "d"), ("delete", 2L, "b"),
      ("delete", 1L, "a"), ("insert", 1L, "A")), s"got ${changes(s1)}")

    // compaction is a pure rewrite: the changelog across it must be EMPTY
    val s2 = t.meta.currentSnapshotId.get
    t.compact(spark)
    assert(GraftStreamSource.changelog(spark, t, Some(s2)).isEmpty,
      "compaction must not appear in the change feed")
    // and the full from-beginning feed is the final table state as inserts
    val full = GraftStreamSource.changelog(spark, t, None)
    assert(full.filter(col("_change_type") === "delete").isEmpty)
    assert(full.count() == t.toDF(spark).count())
  }

  test("changelog supports map-typed columns (exceptAll needs canonicalization)") {
    import org.apache.spark.sql.functions.col
    val mapSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("attrs", MapType(StringType, LongType))))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.cdf_map", mapSchema)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1L, Map("a" -> 1L, "b" -> 2L)), Row(2L, null)).asJava, mapSchema))
    val s1 = t.meta.currentSnapshotId.get
    t.append(spark, spark.createDataFrame(
      Seq(Row(3L, Map("c" -> 3L))).asJava, mapSchema))

    val chg = GraftStreamSource.changelog(spark, t, Some(s1)).collect()
    assert(chg.length == 1 && chg(0).getLong(0) == 3L &&
      chg(0).getString(2) == "insert" &&
      chg(0).getMap[String, Long](1) == Map("c" -> 3L))
    // from-genesis feed keeps map values intact
    val full = GraftStreamSource.changelog(spark, t, None)
      .filter(col("id") === 1).head()
    assert(full.getMap[String, Long](1) == Map("a" -> 1L, "b" -> 2L))
  }

  test("changelog survives schema evolution between the snapshots (to-side schema)") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.cdf_evo", schema)
    t.append(spark, mk(Seq(1L -> "a", 2L -> "b")))
    val s1 = t.meta.currentSnapshotId.get
    t.addColumn("note", StringType)
    t.renameColumn("v", "w")
    t.append(spark, spark.createDataFrame(
      Seq(Row(3L, "c", "n3")).asJava,
      StructType(Seq(StructField("id", LongType), StructField("w", StringType),
        StructField("note", StringType)))))
    // both sides must project under the TO schema: old rows resolve w by
    // field id (the rename) and note as NULL — no column-count crash
    val chg = GraftStreamSource.changelog(spark, t, Some(s1))
    assert(chg.columns.toSeq == Seq("id", "w", "note", "_change_type"))
    val rows = chg.collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 3L && rows(0).getString(1) == "c")
  }

  test("changelog across CREATE OR REPLACE refuses — never all-NULL delete rows") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.cdf_rep", schema)
    t.append(spark, mk(Seq(1L -> "a")))
    val s1 = t.meta.currentSnapshotId.get
    t.replaceWith(StructType(Seq(StructField("k", LongType))))
    val e = intercept[IllegalArgumentException](
      GraftStreamSource.changelog(spark, t, Some(s1)))
    assert(e.getMessage.contains("CREATE OR REPLACE"), e.getMessage)
    // from-genesis is still fine: the full current table as inserts
    t.append(spark, spark.createDataFrame(Seq(Row(7L)).asJava,
      StructType(Seq(StructField("k", LongType)))))
    val full = GraftStreamSource.changelog(spark, t, None).collect()
    assert(full.length == 1 && full(0).getLong(0) == 7L)
  }

  test("changelog canonicalizes maps NESTED in structs, not just top level") {
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("attrs", StructType(Seq(
        StructField("tags", MapType(StringType, LongType)),
        StructField("n", LongType))))))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.cdf_nested", nested)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1L, Row(Map("a" -> 1L), 7L)), Row(2L, null)).asJava, nested))
    val s1 = t.meta.currentSnapshotId.get
    t.append(spark, spark.createDataFrame(
      Seq(Row(3L, Row(Map("c" -> 3L, "d" -> 4L), 9L))).asJava, nested))
    val chg = GraftStreamSource.changelog(spark, t, Some(s1)).collect()
    assert(chg.length == 1 && chg(0).getLong(0) == 3L)
    val attrs = chg(0).getStruct(1)
    assert(attrs.getMap[String, Long](0) == Map("c" -> 3L, "d" -> 4L) &&
      attrs.getLong(1) == 9L, "nested map decodes back to its original shape")
    // NULL struct stays NULL through encode/decode (not struct-of-nulls)
    val full = GraftStreamSource.changelog(spark, t, None).collect()
    assert(full.find(_.getLong(0) == 2L).exists(_.isNullAt(1)))
  }

  test("changelog drives exact table replication (CDC mirror via MERGE)") {
    import graft.format.Predicate
    import org.apache.spark.sql.functions.{col, lit}
    val cat = new GraftCatalog(tempWarehouse())
    val src = cat.createTable("db.cdc_src", schema)
    val dst = cat.createTable("db.cdc_dst", schema)
    src.append(spark, mk(Seq((1L, "a"), (2L, "b"), (3L, "c"))))

    var cursor: Option[Long] = None
    def sync(): Unit = {
      val to = src.meta.currentSnapshotId
      val changes = GraftStreamSource.changelog(spark, src, cursor, to)
      // the canonical CDF consumer: deletes drop mirror rows, inserts upsert
      val dels = changes.filter(col("_change_type") === "delete").select("id")
        .collect().map(_.getLong(0))
      if (dels.nonEmpty) dst.delete(spark, Seq(Predicate.In("id", dels.map(Long.box).toSeq)))
      val ins = changes.filter(col("_change_type") === "insert").drop("_change_type")
      dst.merge(spark, ins, Seq("id" -> "id"),
        whenMatchedUpdate = Map("v" -> col("s.v")))
      cursor = to
    }
    def state(t: graft.table.GraftTable) =
      t.toDF(spark).collect().map(r => (r.getLong(0), r.getString(1))).toSet

    sync()
    assert(state(dst) == state(src))
    src.append(spark, mk(Seq((4L, "d"))))
    src.delete(spark, Seq(Predicate.Eq("id", 2L)))
    src.update(spark, Map("v" -> lit("A")), Seq(Predicate.Eq("id", 1L)))
    sync()
    assert(state(dst) == state(src), "mirror must converge after DML")
    sync() // idempotent when nothing changed
    assert(state(dst) == state(src))
  }

  test("changelog property: every adjacent snapshot transition is exactly its change feed") {
    import graft.format.Predicate
    import org.apache.spark.sql.functions.{col, lit}
    import scala.util.Random
    val rnd = new Random(20260812)
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.cdf_prop", schema,
      properties = Map("enable-iceberg-merge-on-read" -> rnd.nextBoolean().toString))
    var nextId = 0L
    val groups = Vector("a", "b", "c")
    for (_ <- 1 to 10) rnd.nextInt(5) match {
      case 0 | 1 =>
        val rows = (0 until rnd.nextInt(6) + 1).map { _ =>
          nextId += 1; (nextId, groups(rnd.nextInt(3)))
        }
        t.append(spark, mk(rows))
      case 2 => t.delete(spark, Seq(Predicate.Eq("v", groups(rnd.nextInt(3)))))
      case 3 => t.update(spark, Map("v" -> lit("z")),
        Seq(Predicate.Lt("id", rnd.nextInt(nextId.toInt + 1).toLong)))
      case 4 => t.compact(spark)
    }

    def counts(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Int] =
      df.collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length).toMap

    val snaps = t.meta.snapshots.sortBy(_.sequenceNumber).map(_.snapshotId)
    var state = Map.empty[(Long, String), Int] // before the first snapshot
    (None +: snaps.map(Option(_))).zip(snaps.map(Option(_))).foreach { case (from, to) =>
      val chg = GraftStreamSource.changelog(spark, t, from, to)
      val ins = counts(chg.filter(col("_change_type") === "insert").drop("_change_type"))
      val del = counts(chg.filter(col("_change_type") === "delete").drop("_change_type"))
      // no row may be both inserted and deleted in one transition (net feed)
      assert(ins.keySet.intersect(del.keySet).forall(k => ins(k) != del(k)))
      state = (state.keySet ++ ins.keySet).flatMap { k =>
        val n = state.getOrElse(k, 0) + ins.getOrElse(k, 0) - del.getOrElse(k, 0)
        assert(n >= 0, s"negative count for $k in $from->$to")
        if (n > 0) Some(k -> n) else None
      }.toMap
      val actual = counts(t.atSnapshot(to.get).toDF(spark))
      assert(state == actual, s"replaying the feed diverged at $from->$to")
    }
  }

  test("appendsStream: committed appends flow through a streaming reader") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.str", schema)
    t.append(spark, mk(Seq((1L, "a"), (2L, "b"))))
    t.append(spark, mk(Seq((3L, "c"))))

    val ckpt = tempWarehouse()
    val q = GraftStreamSource.appendsStream(spark, t).writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("graft_appends").outputMode("append")
      .option("checkpointLocation", s"$ckpt/ck")
      .start()
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM graft_appends").head.getLong(0) == 3)
  }
}
