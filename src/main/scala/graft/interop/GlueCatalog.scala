package graft.interop

import graft.catalog.GraftCatalog
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

/** AWS-Glue-contract catalog integration (reference docs/04:60-78:
  * `CATALOG_SOURCE = GLUE` with CATALOG_NAMESPACE / GLUE_CATALOG_ID /
  * GLUE_AWS_ROLE_ARN, then `CREATE ICEBERG TABLE ... CATALOG =
  * 'glue_catalog' CATALOG_TABLE_NAME = 'source_table'`).
  *
  * Same discipline as [[RestCatalog]] — a real wire contract on loopback,
  * not a directory alias — but the GLUE shape, which differs from
  * Iceberg-REST in two load-bearing ways this emulation preserves:
  *
  *   - Transport is the AWS JSON 1.1 RPC protocol: `POST /` with an
  *     `X-Amz-Target: AWSGlue.<Op>` header (GetDatabases / GetTables /
  *     GetTable), JSON request bodies, `__type`-keyed error documents, and
  *     signed requests (an HMAC-SHA256 over the target + payload standing
  *     in for full SigV4 canonicalization — same secret-key handshake
  *     shape, minus the date-scoped key derivation ceremony).
  *   - The catalog returns a METADATA POINTER, not metadata: a Glue Table
  *     entity carries `Parameters.metadata_location` (+ table_type=ICEBERG)
  *     and the client fetches the Iceberg metadata from shared storage
  *     itself — unlike REST's inline LoadTableResult. Catalog traffic stays
  *     metadata-pointer-scale; the data plane never crosses the catalog.
  */
object GlueCatalog {

  private def q(s: String): String = Json.q(s)

  private def sign(secret: String, target: String, body: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(s"$target\n$body".getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  /** Serves a GraftCatalog over the Glue contract on loopback. */
  final class Server(cat: GraftCatalog, spark: org.apache.spark.sql.SparkSession,
                     catalogId: String, accessKeyId: String, secretKey: String) {
    private val exportCache = new ConcurrentHashMap[String, (Long, String)]()
    private val http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    def port: Int = http.getAddress.getPort
    def uri: String = s"http://127.0.0.1:$port"

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def err(ex: HttpExchange, code: Int, tpe: String, msg: String): Unit =
      respond(ex, code, s"""{"__type":${q(tpe)},"Message":${q(msg)}}""")

    /** Authorization: AWS4-HMAC-SHA256 Credential=<akid>/..., Signature=<hmac>. */
    private def authorized(ex: HttpExchange, target: String, body: String): Boolean = {
      val h = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      h.startsWith("AWS4-HMAC-SHA256 ") &&
        h.contains(s"Credential=$accessKeyId/") && // plain substring: a key
        // with regex metacharacters must not break (or bypass) the match
        h.contains(s"Signature=${sign(secretKey, target, body)}")
    }

    private def str(v: org.json4s.JValue): String = v match {
      case org.json4s.JString(s) => s; case _ => ""
    }

    /** The Glue Table entity for one Graft table: pointer, not metadata.
      * A table with no snapshot yet (created, never appended) is listed
      * WITHOUT the metadata_location parameter — real Glue returns the
      * entity either way, and erroring here would 500 an entire GetTables
      * listing because of one empty table.
      */
    private def tableEntity(ns: String, t: String): String = {
      val full = s"$ns.$t"
      val tbl = cat.loadTable(full)
      val params = tbl.meta.currentSnapshotId match {
        case Some(snapId) =>
          val metaPath = IcebergExport.cachedExport(exportCache, full, tbl, spark, snapId)
          s""""Parameters":{"table_type":"ICEBERG","metadata_location":${q(metaPath)}},"""
        case None =>
          s""""Parameters":{"table_type":"ICEBERG"},"""
      }
      s"""{"Name":${q(t)},"DatabaseName":${q(ns)},"TableType":"EXTERNAL_TABLE",
         |$params
         |"StorageDescriptor":{"Location":${q(tbl.location)}}}""".stripMargin.replace("\n", "")
    }

    http.createContext("/", (ex: HttpExchange) => try {
      val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val req = org.json4s.jackson.JsonMethods.parse(if (body.isEmpty) "{}" else body)
      val reqCatalog = str(req \ "CatalogId")
      if (!authorized(ex, target, body))
        err(ex, 403, "AccessDeniedException", "signature mismatch or unknown access key")
      else if (reqCatalog.nonEmpty && reqCatalog != catalogId)
        err(ex, 400, "EntityNotFoundException", s"catalog $reqCatalog not found")
      else target match {
        case "AWSGlue.GetDatabases" =>
          val dbs = cat.listNamespaces().map(n => s"""{"Name":${q(n)}}""").mkString(",")
          respond(ex, 200, s"""{"DatabaseList":[$dbs]}""")
        case "AWSGlue.GetTables" =>
          val ns = str(req \ "DatabaseName")
          // real Glue raises EntityNotFoundException for an unknown
          // database — an empty TableList would make "no tables yet" and
          // "misspelled database" indistinguishable to the engine side.
          // namespaceExists handles dotted schema paths too (a dotted
          // namespace that exists but is EMPTY must serve [], not 404),
          // and the single listTables call serves both the guard and the
          // response.
          val tables = cat.listTables(ns)
          if (tables.isEmpty && !cat.namespaceExists(ns))
            err(ex, 400, "EntityNotFoundException", s"Database $ns not found")
          else {
            val ts = tables
              .map(full => tableEntity(ns, full.split('.').last)).mkString(",")
            respond(ex, 200, s"""{"TableList":[$ts]}""")
          }
        case "AWSGlue.GetTable" =>
          val ns = str(req \ "DatabaseName")
          val t = str(req \ "Name")
          if (!cat.tableExists(s"$ns.$t"))
            err(ex, 400, "EntityNotFoundException", s"Table $ns.$t not found")
          else respond(ex, 200, s"""{"Table":${tableEntity(ns, t)}}""")
        case other => err(ex, 400, "InvalidInputException", s"unknown target $other")
      }
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        try err(ex, 500, "InternalServiceException", msg)
        catch { case _: Exception => ex.close() }
    })

    def start(): Server = { http.setExecutor(null); http.start(); this }
    def stop(): Unit = http.stop(0)
  }

  /** The engine side of `CATALOG_SOURCE = GLUE`: signed JSON-RPC calls,
    * then metadata fetched from SHARED STORAGE at the returned pointer.
    */
  final class Client(uri: String, catalogId: String,
                     accessKeyId: String, secretKey: String) {
    private val http = HttpClient.newHttpClient()

    private def call(target: String, body: String): String = {
      val auth = s"AWS4-HMAC-SHA256 Credential=$accessKeyId/00000000/local/glue/aws4_request, " +
        s"SignedHeaders=host;x-amz-target, Signature=${sign(secretKey, target, body)}"
      val resp = http.send(HttpRequest.newBuilder(URI.create(uri + "/"))
        .header("Content-Type", "application/x-amz-json-1.1")
        .header("X-Amz-Target", target)
        .header("Authorization", auth)
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"$target: ${resp.statusCode()} ${resp.body()}")
      resp.body()
    }

    def databases(): Seq[String] = {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(
        call("AWSGlue.GetDatabases", s"""{"CatalogId":${q(catalogId)}}""")) \ "DatabaseList" match {
        case JArray(xs) => xs.collect { case o: JObject =>
          (o \ "Name") match { case JString(n) => n; case _ => "" } }.filter(_.nonEmpty)
        case _ => Nil
      }
    }

    def tables(ns: String): Seq[String] = {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(
        call("AWSGlue.GetTables",
          s"""{"CatalogId":${q(catalogId)},"DatabaseName":${q(ns)}}""")) \ "TableList" match {
        case JArray(xs) => xs.collect { case o: JObject =>
          (o \ "Name") match { case JString(n) => n; case _ => "" } }.filter(_.nonEmpty)
        case _ => Nil
      }
    }

    /** GetTable → Parameters.metadata_location (the Glue pointer split). */
    def metadataLocation(ns: String, table: String): String = {
      import org.json4s._
      val body = call("AWSGlue.GetTable",
        s"""{"CatalogId":${q(catalogId)},"DatabaseName":${q(ns)},"Name":${q(table)}}""")
      org.json4s.jackson.JsonMethods.parse(body) \ "Table" \ "Parameters" \ "metadata_location" match {
        case JString(p) if p.nonEmpty => p
        case _ => sys.error(s"$ns.$table: no metadata_location in Glue table parameters")
      }
    }

    /** Full external read: pointer from Glue, Iceberg metadata + manifests +
      * parquet from shared storage ([[IcebergExport.readAsDataFrame]]).
      */
    def readTable(spark: org.apache.spark.sql.SparkSession, ns: String,
                  table: String): org.apache.spark.sql.DataFrame = {
      val loc = metadataLocation(ns, table)
      require(Files.exists(java.nio.file.Paths.get(loc)), s"metadata not on shared storage: $loc")
      IcebergExport.readAsDataFrame(spark, loc)
    }
  }
}
