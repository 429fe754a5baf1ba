package graft.interop

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Predicate
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The GLUE catalog integration (docs/04:60-78) end-to-end over a real HTTP
  * loopback speaking the AWS JSON 1.1 contract: signed GetDatabases /
  * GetTables / GetTable, then the Iceberg metadata fetched from SHARED
  * STORAGE at the returned `Parameters.metadata_location` pointer — the
  * Glue split the REST protocol does not have.
  */
class GlueCatalogSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType)))

  test("signed GetTable + pointer-fetched metadata read (MOR deletes applied)") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.glue_t", schema,
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, spark.createDataFrame(
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "b")).asJava, schema))
    t.delete(spark, Seq(Predicate.Eq("id", 2L))) // MOR position delete

    val server = new GlueCatalog.Server(cat, spark, "123456789", "AKIDTEST", "glue-secret").start()
    try {
      val client = new GlueCatalog.Client(server.uri, "123456789", "AKIDTEST", "glue-secret")
      assert(client.databases() == Seq("db"))
      assert(client.tables("db") == Seq("glue_t"))
      // a snapshot-less table must not 500 the namespace listing: it lists
      // WITHOUT a metadata pointer (real Glue returns the entity either way)
      cat.createTable("db.glue_empty", schema)
      assert(client.tables("db").toSet == Set("glue_t", "glue_empty"))
      val e0 = intercept[Exception](client.metadataLocation("db", "glue_empty"))
      assert(e0.getMessage.contains("no metadata_location"), e0.getMessage)
      // the pointer split: the client plans from a shared-storage path
      val loc = client.metadataLocation("db", "glue_t")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(loc)))
      val got = client.readTable(spark, "db", "glue_t")
        .select("id", "cat").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (3L, "b")),
        "Glue-planned read must apply position deletes")

      // a bad signature (wrong secret) is AccessDenied
      val badSig = new GlueCatalog.Client(server.uri, "123456789", "AKIDTEST", "wrong")
      val e1 = intercept[Exception](badSig.databases())
      assert(e1.getMessage.contains("403"), e1.getMessage)

      // a wrong catalog id is EntityNotFound
      val badCat = new GlueCatalog.Client(server.uri, "999", "AKIDTEST", "glue-secret")
      val e2 = intercept[Exception](badCat.databases())
      assert(e2.getMessage.contains("EntityNotFoundException"), e2.getMessage)

      // a missing table is the Glue-shaped error document
      val e3 = intercept[Exception](client.metadataLocation("db", "nope"))
      assert(e3.getMessage.contains("EntityNotFoundException"), e3.getMessage)

      // an unknown DATABASE is EntityNotFound too (real Glue semantics) —
      // not an empty TableList, which would hide a misspelled namespace
      val e4 = intercept[Exception](client.tables("no_such_db"))
      assert(e4.getMessage.contains("EntityNotFoundException"), e4.getMessage)
    } finally server.stop()
  }
}
