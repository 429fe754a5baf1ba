package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Model-based randomized WAP property: random interleavings of main
  * appends, branch staging, publishes and aggressive expiry must always
  * agree with an in-memory model of (main rows, per-branch rows), and
  * publish must succeed exactly when the model says the branch still
  * descends from main's head.
  */
class RandomWapSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("tag", StringType)))

  private def df(ids: Seq[Long]) = spark.createDataFrame(
    ids.map(i => Row(i, s"t$i")).asJava, schema)

  test("random interleavings of append/stage/publish/expire match the model") {
    for (seed <- 1 to 2) {
      val rng = new Random(seed)
      val cat = new GraftCatalog(tempWarehouse())
      val t = cat.createTable(s"db.rw$seed", schema)
      var nextId = 0L
      def fresh(n: Int): Seq[Long] = { val r = (nextId until nextId + n); nextId += n; r }

      var main = Set.empty[Long]
      val branch = scala.collection.mutable.Map.empty[String, Set[Long]]
      val publishable = scala.collection.mutable.Map.empty[String, Boolean]
      val names = Seq("audit", "qa")

      for (step <- 1 to 12) {
        rng.nextInt(5) match {
          case 0 => // main append: every existing branch stops descending
            val ids = fresh(1 + rng.nextInt(3))
            t.append(spark, df(ids))
            main ++= ids
            branch.keys.foreach(b => publishable(b) = false)
          case 1 | 2 => // stage on a branch (forks from main head when new)
            val b = names(rng.nextInt(names.size))
            val ids = fresh(1 + rng.nextInt(3))
            t.appendToBranch(spark, df(ids), b)
            if (!branch.contains(b)) { branch(b) = main ++ ids; publishable(b) = true }
            else branch(b) = branch(b) ++ ids
          case 3 => // publish: allowed iff the branch still descends from head;
            // on success the ref is DROPPED (its commits are main history),
            // so the name is free to re-fork from the new head later
            val b = names(rng.nextInt(names.size))
            if (branch.contains(b)) {
              if (publishable(b)) {
                t.publish(b)
                main = branch(b)
                branch.remove(b); publishable.remove(b)
                branch.keys.foreach(o => publishable(o) = false)
              } else {
                intercept[IllegalArgumentException](t.publish(b))
              }
            }
          case 4 => // aggressive expiry must never lose main or staged state
            t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
        }
        assert(t.toDF(spark).collect().map(_.getLong(0)).toSet == main,
          s"seed=$seed step=$step: main diverged from model")
        branch.foreach { case (b, rows) =>
          assert(t.atRef(b).toDF(spark).collect().map(_.getLong(0)).toSet == rows,
            s"seed=$seed step=$step: branch $b diverged from model")
        }
      }
    }
  }
}
