package graft.interop

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.Predicate
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The Iceberg-REST catalog integration end-to-end over a real HTTP
  * loopback: oauth client-credentials → discovery → LoadTableResult →
  * plan + read from the returned metadata (position deletes applied).
  */
class RestCatalogSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType)))

  test("oauth + discovery + load + read over the REST protocol") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.rest_t", schema,
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, spark.createDataFrame(
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "b")).asJava, schema))
    t.delete(spark, Seq(Predicate.Eq("id", 2L))) // MOR position delete

    val server = new RestCatalog.Server(cat, spark, "svc", "s3cret").start()
    try {
      val client = new RestCatalog.Client(server.uri, "svc", "s3cret")
      assert(client.namespaces() == Seq("db"))
      assert(client.tables("db") == Seq("rest_t"))
      val got = client.readTable(spark, "db", "rest_t")
        .select("id", "cat").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (3L, "b")),
        "REST-planned read must apply position deletes")

      // wrong credentials are rejected at the token endpoint
      val bad = new RestCatalog.Client(server.uri, "svc", "wrong")
      val err = intercept[Exception](bad.namespaces())
      assert(err.getMessage.contains("oauth failed"), err.getMessage)

      // requests without a bearer token are 401
      val resp = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${server.uri}/v1/namespaces")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 401)

      // a handler failure is a JSON 500, not a dropped connection
      cat.createTable("db.rest_empty", schema) // no snapshot -> export fails
      val err500 = intercept[Exception](client.loadTableMetadata("db", "rest_empty"))
      assert(err500.getMessage.contains("500"), err500.getMessage)
    } finally server.stop()
  }
}
