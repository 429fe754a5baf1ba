package graft.sources

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.jdk.CollectionConverters._

/** SQL-addressable metadata tables (reference docs/03-metadata-management.md:
  * 163-180): `SELECT * FROM g.db.t.snapshots|manifests|files` — the
  * INFORMATION_SCHEMA.ICEBERG_TABLE_* family resolved as a table-name suffix,
  * the way Spark users expect from Iceberg. Metadata is driver-side KBs, so
  * the scan is a [[org.apache.spark.sql.connector.read.LocalScan]]: no jobs,
  * no executors touched.
  */
class GraftMetaSparkTable(val graftTable: GraftTable, val kind: String)
    extends Table with SupportsRead {

  // lazy: schema resolution and scan build both need it, and filesDF reads
  // every manifest driver-side — once per query is enough
  private lazy val df = kind match {
    case "snapshots" => graftTable.snapshotsDF(SparkSession.active)
    case "manifests" => graftTable.manifestsDF(SparkSession.active)
    case "files" => graftTable.filesDF(SparkSession.active)
    case "partitions" => graftTable.partitionsDF(SparkSession.active)
    case "refs" => graftTable.refsDF(SparkSession.active)
    case other => sys.error(s"unknown metadata table $other")
  }

  override def name(): String = s"${graftTable.name}.$kind"
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val d = df
        GraftProcedures.resultScan(d.schema, d.collect().toSeq)
      }
    }
}

object GraftMetaSparkTable {
  val suffixes: Set[String] = Set("snapshots", "manifests", "files", "partitions", "refs")
}
