package graft.table

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** MERGE at adversarial source cardinality: beyond the exact key-set cap
  * (MergeKeySetLimit = 1000 distinct keys) candidate pruning degrades to
  * per-column source BOUNDS — still sound, still prunes files outside the
  * source's key range, and the driver never materializes more than
  * cap+1 key rows.
  */
class MergeScaleSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def df(ids: Range, v: Long => Long) =
    spark.createDataFrame(ids.map(i => Row(i.toLong, v(i.toLong))).asJava, schema)

  test("source beyond the key-set cap: bounds pruning, exact result, out-of-range files untouched") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.fact", schema)
    // file A: ids 0..999; file B: ids 5000..5999 (disjoint from the source)
    t.append(spark, df(0 until 1000, identity).coalesce(1))
    t.append(spark, df(5000 until 6000, identity).coalesce(1))
    val fileB = t.scan(graft.format.Predicate.Eq("id", 5000L)).dataFiles.map(_.path)
    assert(fileB.size == 1)

    // 1501 distinct keys: over MergeKeySetLimit -> per-column bounds path
    val source = df(500 to 2000, _ + 100)
    t.merge(spark, source, Seq("id" -> "id"),
      whenMatchedUpdate = Map("v" -> (col("s.v") + 1000000L)))

    val out = t.toDF(spark)
    assert(out.count() == 1000 + 1000 + 1001) // A + B + inserted 1000..2000
    // matched rows (500..999) updated from the source value
    assert(out.filter(col("id") === 750L).head.getLong(1) == 750L + 100 + 1000000L)
    // unmatched target rows untouched
    assert(out.filter(col("id") === 100L).head.getLong(1) == 100L)
    assert(out.filter(col("id") === 5500L).head.getLong(1) == 5500L)
    // inserted rows carry source values
    assert(out.filter(col("id") === 1500L).head.getLong(1) == 1600L)
    // file B lies outside the source bounds [500, 2000]: the MERGE must not
    // have rewritten it (bounds pruning excluded it from the candidates)
    val after = t.scan().dataFiles.map(_.path).toSet
    assert(fileB.forall(after.contains),
      "out-of-bounds file must survive the merge untouched")
  }
}
