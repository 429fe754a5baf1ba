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
