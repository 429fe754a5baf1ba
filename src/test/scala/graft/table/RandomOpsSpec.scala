package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Predicate
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Model-based randomized DML (SURVEY §5.3): a seeded random sequence of
  * append / COW-delete / MOR-delete / update / compact ops runs against both
  * the Graft table and an in-memory model. Invariants after every op:
  *   1. table contents == model contents;
  *   2. every earlier snapshot still re-reads its exact historical rows
  *      (immutability, docs/05 + docs/08:30-49).
  */
class RandomOpsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", LongType)))

  private def df(rows: Seq[(Long, String, Long)]) =
    spark.createDataFrame(rows.map { case (a, b, c) => Row(a, b, c) }.asJava, schema)

  private def read(t: GraftTable): Set[(Long, String, Long)] =
    t.toDF(spark).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  for (partitioned <- Seq(false, true))
  test(s"random op sequences (partitioned=$partitioned): table == model, history immutable") {
    val rnd = new Random(if (partitioned) 77 else 4242)
    val cat = new GraftCatalog(tempWarehouse())
    val mor = rnd.nextBoolean()
    val t = cat.createTable(s"db.rand_$partitioned", schema,
      partitionBy = if (partitioned) Seq("grp" -> graft.format.Transform.Identity) else Nil,
      properties = Map("enable-iceberg-merge-on-read" -> mor.toString))
    var model = Set.empty[(Long, String, Long)]
    var nextId = 0L
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String, Long)])]
    val groups = Vector("a", "b", "c")

    for (step <- 1 to 12) {
      rnd.nextInt(5) match {
        case 0 | 1 => // append 1-20 rows
          val rows = (0 until rnd.nextInt(20) + 1).map { _ =>
            nextId += 1; (nextId, groups(rnd.nextInt(3)), rnd.nextInt(100).toLong)
          }
          t.append(spark, df(rows)); model ++= rows
        case 2 => // delete a group
          val g = groups(rnd.nextInt(3))
          t.delete(spark, Seq(Predicate.Eq("grp", g)))
          model = model.filterNot(_._2 == g)
        case 3 => // update: v += 1000 where v < cut
          val cut = rnd.nextInt(100).toLong
          t.update(spark, Map("v" -> (col("v") + 1000)), Seq(Predicate.Lt("v", cut)))
          model = model.map { case r @ (i, g, v) => if (v < cut) (i, g, v + 1000) else r }
        case 4 =>
          t.compact(spark) // content-neutral
      }
      assert(read(t) == model, s"divergence at step $step (mor=$mor)")
      history += ((t.meta.currentSnapshotId.get, model))
      // all earlier snapshots must still read their exact historical state
      history.foreach { case (sid, expected) =>
        val got = t.atSnapshot(sid).toDF(spark).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(got == expected, s"snapshot $sid mutated at step $step")
      }
    }
  }
}
