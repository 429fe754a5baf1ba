package graft.interop

import graft.catalog.GraftCatalog
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Iceberg-REST-protocol catalog integration (reference
  * docs/04-catalog-systems.md:80-93: `CATALOG_SOURCE = ICEBERG_REST` with a
  * CATALOG_URI + OAuth credentials; docs/11:53-87: multi-engine access goes
  * through an open catalog API).
  *
  * This is the real wire protocol, not a directory alias: the server
  * (JDK HttpServer, loopback) exposes the REST catalog endpoints —
  * `POST /v1/oauth/tokens` (client-credentials flow), `GET /v1/config`,
  * `GET /v1/namespaces`, `GET /v1/namespaces/{ns}/tables`, and
  * `GET /v1/namespaces/{ns}/tables/{t}` returning a LoadTableResult whose
  * metadata is the Iceberg v2 export of the Graft table. The client drives
  * the same flow any external engine would: token → discovery → load →
  * plan the read purely from the returned metadata (manifests + data files
  * live on shared storage, exactly Iceberg-REST's split of catalog plane
  * vs data plane). Catalog traffic is metadata-scale; the data plane never
  * crosses the catalog.
  */
object RestCatalog {

  /** Serves a GraftCatalog over the Iceberg REST protocol on loopback. */
  final class Server(cat: GraftCatalog, spark: org.apache.spark.sql.SparkSession,
                     clientId: String, clientSecret: String) {
    private val issued = ConcurrentHashMap.newKeySet[String]()
    private val exportCache = new ConcurrentHashMap[String, (Long, String)]()
    private val http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile private var nextToken = 0L

    def port: Int = http.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def authorized(ex: HttpExchange): Boolean = {
      val h = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      h.startsWith("Bearer ") && issued.contains(h.stripPrefix("Bearer "))
    }

    private def q(s: String): String = Json.q(s)

    http.createContext("/v1/oauth/tokens", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val params = form.split('&').map(_.split("=", 2)).collect {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, UTF_8)
      }.toMap
      if (params.get("grant_type").contains("client_credentials") &&
          params.get("client_id").contains(clientId) &&
          params.get("client_secret").contains(clientSecret)) {
        nextToken += 1
        val tok = s"graft-tok-$nextToken"
        issued.add(tok)
        respond(ex, 200,
          s"""{"access_token":${q(tok)},"token_type":"bearer","expires_in":3600}""")
      } else respond(ex, 401, """{"error":"invalid_client"}""")
    })

    http.createContext("/v1/", (ex: HttpExchange) => try {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/").stripSuffix("/")
      if (!authorized(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
      else path.split('/') match {
        case Array("config") =>
          respond(ex, 200, s"""{"defaults":{},"overrides":{"warehouse":${q(cat.warehouse)}}}""")
        case Array("namespaces") =>
          val ns = cat.listNamespaces().map(n => s"[${q(n)}]").mkString(",")
          respond(ex, 200, s"""{"namespaces":[$ns]}""")
        case Array("namespaces", ns, "tables") =>
          val ids = cat.listTables(ns).map { full =>
            s"""{"namespace":[${q(ns)}],"name":${q(full.split('.').last)}}"""
          }.mkString(",")
          respond(ex, 200, s"""{"identifiers":[$ids]}""")
        case Array("namespaces", ns, "tables", t) =>
          val full = s"$ns.$t"
          if (!cat.tableExists(full)) respond(ex, 404, """{"error":"no such table"}""")
          else {
            // LoadTableResult: metadata-location + inline Iceberg v2
            // metadata. The export walks the full snapshot history, so it
            // runs once per (table, current snapshot) — repeated loads of
            // an unchanged table serve the cached document (catalog-plane
            // latency stays metadata-scale).
            val tbl = cat.loadTable(full)
            val snapId = tbl.meta.currentSnapshotId.getOrElse(
              sys.error(s"$full has no snapshot to export"))
            val metaPath = IcebergExport.cachedExport(exportCache, full, tbl, spark, snapId)
            val metaJson = Files.readString(Paths.get(metaPath))
            respond(ex, 200, s"""{"metadata-location":${q(metaPath)},"metadata":$metaJson}""")
          }
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      // a handler exception must surface as a JSON 500, not a dropped
      // connection (e.g. loading a table with no snapshot yet); message may
      // be null, and responding can itself fail if headers already went out
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        try respond(ex, 500, s"""{"error":${q(msg)}}""")
        catch { case _: Exception => ex.close() }
    })

    def start(): Server = { http.setExecutor(null); http.start(); this }
    def stop(): Unit = http.stop(0)
  }

  /** The external-engine side: drives oauth → discovery → load → read
    * purely over the REST API + shared-storage file reads.
    */
  final class Client(uri: String, clientId: String, clientSecret: String) {
    private val http = HttpClient.newHttpClient()
    private lazy val token: String = {
      val form = s"grant_type=client_credentials&client_id=$clientId&client_secret=$clientSecret"
      val resp = http.send(HttpRequest.newBuilder(URI.create(s"$uri/v1/oauth/tokens"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"oauth failed: ${resp.statusCode()} ${resp.body()}")
      """"access_token":"([^"]+)"""".r.findFirstMatchIn(resp.body())
        .map(_.group(1)).getOrElse(sys.error("no access_token in response"))
    }

    private def get(path: String): String = {
      val resp = http.send(HttpRequest.newBuilder(URI.create(s"$uri$path"))
        .header("Authorization", s"Bearer $token").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"GET $path: ${resp.statusCode()} ${resp.body()}")
      resp.body()
    }

    def namespaces(): Seq[String] = {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(get("/v1/namespaces")) \ "namespaces" match {
        case JArray(xs) => xs.collect { case JArray(List(JString(n))) => n }
        case _ => Nil
      }
    }

    def tables(ns: String): Seq[String] = {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(get(s"/v1/namespaces/$ns/tables")) \ "identifiers" match {
        case JArray(xs) => xs.collect { case o: JObject =>
          (o \ "name") match { case JString(n) => n; case _ => "" } }.filter(_.nonEmpty)
        case _ => Nil
      }
    }

    /** Fetch the table's Iceberg metadata over REST and stage it locally —
      * the client plans from the RESPONSE BODY, not from catalog-side paths.
      */
    def loadTableMetadata(ns: String, table: String): String = {
      import org.json4s._
      val body = get(s"/v1/namespaces/$ns/tables/$table")
      val meta = org.json4s.jackson.JsonMethods.parse(body) \ "metadata"
      val staged = Files.createTempFile("rest-catalog-meta", ".json")
      Files.writeString(staged,
        org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(meta)))
      staged.toString
    }

    /** Full external read: REST-load the metadata, then plan the scan from
      * it ([[IcebergExport.readAsDataFrame]] — Avro manifests + parquet on
      * shared storage; position deletes applied).
      */
    def readTable(spark: org.apache.spark.sql.SparkSession, ns: String,
                  table: String): org.apache.spark.sql.DataFrame =
      IcebergExport.readAsDataFrame(spark, loadTableMetadata(ns, table))
  }
}
