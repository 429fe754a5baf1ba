package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.GraftSchema
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Model-based randomized NESTED evolution: a seeded random sequence of
  * append / add-subfield / rename-subfield / widen-subfield / drop-subfield
  * runs against both the Graft table and an in-memory model keyed by stable
  * field ID. Invariant after every op: projecting the current schema's
  * subfield paths over the table equals the model's by-ID projection —
  * i.e. renames follow IDs, drops retire IDs, re-added names get fresh IDs,
  * widened values read back identically, and files written under every
  * historical nested shape resolve correctly.
  */
class RandomNestedEvolutionSpec extends SparkSpec {

  private case class Leaf(id: Int, name: String, dt: DataType)

  for (seed <- Seq(11, 907))
  test(s"random nested-evolution sequences stay model-consistent (seed=$seed)") {
    val rnd = new Random(seed)
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable(s"db.nested_rand_$seed", StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("f1", IntegerType), StructField("f2", StringType)))))))

    def leaves: Seq[Leaf] = {
      val nested = t.meta.currentSchema("meta").dataType.asInstanceOf[StructType]
      nested.fields.toSeq.map(f => Leaf(GraftSchema.fieldId(f), f.name, f.dataType))
    }

    // model: id -> (leafId -> value-as-string)
    var model = Map.empty[Long, Map[Int, String]]
    var nextId = 0L
    var nextField = 2

    def appendRows(): Unit = {
      val ls = leaves
      val rows = (0 until rnd.nextInt(5) + 1).map { _ =>
        nextId += 1
        val vals = ls.map { l =>
          l.dt match {
            case IntegerType => l.id -> rnd.nextInt(1000).toString
            case LongType => l.id -> rnd.nextInt(1000).toString
            case StringType => l.id -> s"s${rnd.nextInt(1000)}"
            case other => sys.error(s"unexpected $other")
          }
        }.toMap
        (nextId, vals)
      }
      val data = rows.map { case (id, vals) =>
        Row(id, Row(ls.map { l =>
          val v = vals(l.id)
          l.dt match {
            case IntegerType => Int.box(v.toInt)
            case LongType => Long.box(v.toLong)
            case _ => v
          }
        }: _*))
      }
      t.append(spark, spark.createDataFrame(data.asJava, t.meta.currentSchema))
      model ++= rows
    }

    def check(): Unit = {
      val ls = leaves
      val cols = col("id") +: ls.map(l => col(s"meta.${l.name}"))
      val got = t.toDF(spark).select(cols: _*).collect().map { r =>
        r.getLong(0) -> ls.indices.map(i =>
          if (r.isNullAt(i + 1)) null else r.get(i + 1).toString).toVector
      }.toMap
      val want = model.map { case (id, vals) =>
        id -> ls.map(l => vals.get(l.id).orNull).toVector
      }
      assert(got == want, s"mismatch at leaves=$ls")
    }

    appendRows()
    for (_ <- 1 to 14) {
      rnd.nextInt(6) match {
        case 0 | 1 => appendRows()
        case 2 => // add a subfield (int or string)
          nextField += 1
          val dt = if (rnd.nextBoolean()) IntegerType else StringType
          t.addColumn(s"meta.f$nextField", dt)
        case 3 => // rename a random subfield (ID stays)
          val l = leaves(rnd.nextInt(leaves.size))
          nextField += 1
          t.renameColumn(s"meta.${l.name}", s"f$nextField")
        case 4 => // widen an int subfield if any
          leaves.find(_.dt == IntegerType).foreach(l =>
            t.widenColumn(s"meta.${l.name}", LongType))
        case 5 => // drop a random subfield (keep at least one)
          if (leaves.size > 1) {
            val l = leaves(rnd.nextInt(leaves.size))
            t.dropColumn(s"meta.${l.name}")
          }
      }
      check()
    }
    assert(t.meta.schemas.size > 1, "sequence should have evolved the schema")
  }
}
