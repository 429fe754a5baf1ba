package graft.catalog

import graft.format._
import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Commit outcome used by the optimistic-concurrency retry loop. */
final class CommitConflictException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** The catalog: resolves table names to metadata locations and performs the
  * atomic pointer swap that gives every write ACID semantics (reference:
  * docs/04-catalog-systems.md:5-23, docs/08-acid-transactions.md:16-28,
  * docs/01-table-format-architecture.md:52-57).
  *
  * Layout: `<warehouse>/<namespace>/<table>/metadata/vN.metadata.json` with a
  * `version-hint.text` pointer holding N. Commit protocol:
  *
  *   1. data + manifest files are already written (immutable, uniquely named)
  *   2. serialize vN+1.metadata.json with create-exclusive semantics —
  *      if another writer got there first the create fails = CAS failure
  *   3. advance version-hint.text (atomic rename)
  *
  * A JVM-level lock per table serializes in-process committers; the
  * create-exclusive metadata write is the cross-process guard. On CAS failure
  * callers re-read the new base and retry (docs/08:53-69). Dropped tables are
  * tombstoned (renamed pointer), enabling UNDROP (docs/01:80).
  *
  * On a real deployment the warehouse path is an object-store prefix and this
  * class is backed by a catalog service's CAS; the protocol is unchanged.
  */
class GraftCatalog(val warehouse: String) {
  private val locks = new ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)

  /** External volumes: named storage roots (docs/01:174-180). */
  private val volumes = new ConcurrentHashMap[String, String]()
  def createExternalVolume(name: String, basePath: String): Unit =
    volumes.put(name, basePath)
  def volume(name: String): Option[String] = Option(volumes.get(name))

  /** Per-catalog task registry backing the SQL task surface
    * (CALL system.create_task / alter_task / advance_tasks / task_history).
    */
  lazy val taskRegistry = new TaskRegistry()

  def tableDir(name: String): String = {
    val parts = name.split('.')
    Paths.get(warehouse, parts: _*).toString
  }
  private def metaDir(name: String) = Paths.get(tableDir(name), "metadata")
  private def hintPath(name: String) = metaDir(name).resolve("version-hint.text")

  def tableExists(name: String): Boolean = Files.exists(hintPath(name))

  /** Top-level namespaces (databases) in this warehouse. */
  def listNamespaces(): Seq[String] = {
    val root = Paths.get(warehouse)
    if (!Files.exists(root)) return Nil
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toVector.sorted
    } finally s.close()
  }

  /** Whether a namespace (database or dotted schema path) exists — i.e.
    * its directory is present, tables or not. listNamespaces() is
    * TOP-LEVEL only, so callers distinguishing "empty database" from
    * "missing database" for a dotted name must use this, not membership
    * in the top-level list.
    */
  def namespaceExists(namespace: String): Boolean = {
    val parts = namespace.split('.')
    parts.nonEmpty && parts.forall(_.nonEmpty) &&
      Files.isDirectory(Paths.get(warehouse, parts: _*))
  }

  def listTables(namespace: String): Seq[String] = {
    val ns = Paths.get(warehouse, namespace.split('.'): _*)
    if (!Files.exists(ns)) return Nil
    val s = Files.list(ns)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => Files.exists(p.resolve("metadata").resolve("version-hint.text")))
        .map(p => s"$namespace.${p.getFileName}")
        .toVector.sorted
    } finally s.close()
  }

  def createTable(
      name: String,
      schema: StructType,
      partitionBy: Seq[(String, Transform)] = Nil,
      properties: Map[String, String] = Map.empty,
      externalVolume: Option[String] = None,
      baseLocation: Option[String] = None): GraftTable = lockFor(name).synchronized {
    require(!tableExists(name), s"table $name already exists")
    val root = (externalVolume.flatMap(volume), baseLocation) match {
      case (Some(vol), Some(base)) => Paths.get(vol, base).toString
      case (Some(vol), None) => Paths.get(vol, name.replace('.', '/')).toString
      case _ => tableDir(name)
    }
    // CREATE over the remains of a DROPPED (or half-created) generation:
    // the old metadata dir must move aside, not linger — a leftover
    // v1.metadata.json fails the exclusive first write forever, and a
    // leftover location.text from a volume-backed incarnation would point
    // the NEW table at the OLD volume root (reads silently resurrect the
    // dropped table's data). Archiving trades UNDROP-ability of the old
    // generation for the recreate — Snowflake's UNDROP likewise refuses
    // once an active table holds the name. The live-table case cannot get
    // here (tableExists was required false, and commits hold lockFor).
    def archive(dir: Path): Unit = if (Files.exists(dir))
      Files.move(dir, dir.resolveSibling(
        s"metadata.dropped-${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}"))
    archive(metaDir(name))
    if (root != tableDir(name)) archive(Paths.get(root, "metadata"))
    val (schemaWithIds, lastCol) = GraftSchema.assignIds(
      GraftSchema.deepNullable(schema).asInstanceOf[StructType], 0)
    val spec = PartitionSpec(0, PartitionSpec.fieldsFor(schemaWithIds, partitionBy))
    val meta = TableMetadata(
      formatVersion = 1,
      tableUuid = java.util.UUID.randomUUID().toString,
      location = root,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = lastCol,
      schemas = Map(0 -> schemaWithIds),
      currentSchemaId = 0,
      specs = Map(0 -> spec),
      defaultSpecId = 0,
      lastSequenceNumber = 0L,
      snapshots = Nil,
      currentSnapshotId = None,
      refs = Map.empty,
      properties = properties,
      statementLog = Nil)
    GraftUtil.writeStringExclusive(
      Paths.get(root, "metadata", "v1.metadata.json"), MetaJson.metadataToJson(meta))
    GraftUtil.writeStringAtomic(Paths.get(root, "metadata", "version-hint.text"), "1")
    if (root != tableDir(name)) {
      // catalog-linked entry pointing at an external volume location
      GraftUtil.writeStringAtomic(hintPath(name).getParent.resolve("location.text"), root)
      GraftUtil.writeStringAtomic(hintPath(name), "1")
    }
    new GraftTable(this, name)
  }

  /** CREATE TABLE AS SELECT (W2, docs/04:147): create + initial append in
    * one call; the data lands as the table's first snapshot.
    */
  def createTableAs(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      df: org.apache.spark.sql.DataFrame,
      partitionBy: Seq[(String, Transform)] = Nil,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val t = createTable(name, df.schema, partitionBy, properties)
    t.append(spark, df, statementId = Some(s"ctas-$name"))
    t
  }

  /** CREATE OR REPLACE ICEBERG TABLE (docs/01:182): plain create when the
    * table is absent; otherwise ONE CAS commit swaps in the new schema,
    * partition spec and (empty or `data`) content — table identity (uuid,
    * location) and snapshot history are preserved, so the pre-replace state
    * stays time-travelable until snapshot retention expires it.
    */
  def replaceTable(
      name: String,
      schema: StructType,
      partitionBy: Seq[(String, Transform)] = Nil,
      properties: Map[String, String] = Map.empty,
      spark: Option[org.apache.spark.sql.SparkSession] = None,
      data: Option[org.apache.spark.sql.DataFrame] = None): GraftTable =
    if (!tableExists(name)) {
      val t = createTable(name, schema, partitionBy, properties)
      data.foreach(df =>
        t.append(spark.getOrElse(df.sparkSession), df, statementId = Some(s"rtas-$name")))
      t
    } else {
      val t = loadTable(name)
      t.replaceWith(schema, partitionBy, properties, spark, data)
      t
    }

  /** Resolve the table root (may live on an external volume). */
  def resolveRoot(name: String): String = {
    val loc = metaDir(name).resolve("location.text")
    if (Files.exists(loc)) GraftUtil.readString(loc).trim else tableDir(name)
  }

  def currentVersion(name: String): Int = {
    val root = resolveRoot(name)
    var v = GraftUtil.readString(Paths.get(root, "metadata", "version-hint.text")).trim.toInt
    // The hint is a CACHE of the head, not the truth — the exclusively-
    // created version FILE is the CAS. Probe forward so a stale hint (its
    // writer crashed mid-advance, or a cross-process lost-CAS adoption
    // raced another committer's hint write) can never regress readers to
    // an older snapshot; one extra existence probe is the steady-state
    // cost.
    while (Files.exists(Paths.get(root, "metadata", s"v${v + 1}.metadata.json"))) v += 1
    v
  }

  def loadMetadata(name: String): (Int, TableMetadata) = {
    val root = resolveRoot(name)
    val v = currentVersion(name)
    val json = GraftUtil.readString(Paths.get(root, "metadata", s"v$v.metadata.json"))
    (v, MetaJson.metadataFromJson(json))
  }

  def loadTable(name: String): GraftTable = {
    require(tableExists(name), s"table $name does not exist")
    new GraftTable(this, name)
  }

  /** Atomic CAS commit. Throws [[CommitConflictException]] when the table
    * advanced past `expectedVersion` (caller retries per docs/08:53-69).
    */
  def commit(name: String, expectedVersion: Int, newMeta: TableMetadata): Int =
    lockFor(name).synchronized {
      val root = resolveRoot(name)
      val cur = currentVersion(name)
      if (cur != expectedVersion)
        throw new CommitConflictException(
          s"$name: expected v$expectedVersion but table is at v$cur")
      val next = expectedVersion + 1
      val target = Paths.get(root, "metadata", s"v$next.metadata.json")
      try GraftUtil.writeStringExclusive(target,
        MetaJson.metadataToJson(newMeta.copy(lastUpdatedMs = System.currentTimeMillis())))
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // vN+1 exists but the hint still says N: a committer crashed between
          // the exclusive metadata write and the hint advance. The exclusive
          // write publishes via atomic rename, so the existing file is a
          // complete, valid metadata — the CAS winner for vN+1. Adopt it by
          // completing its hint advance (idempotent if its writer is merely
          // slow), then conflict so the caller re-reads the new base. Without
          // this, every later committer would fail the same create forever.
          // Only ever advance the hint: another process may have already
          // adopted v(next) and committed past it, and writing `next`
          // unconditionally would regress readers to a stale snapshot.
          // An unreadable hint must NOT default to 0: if the hint is gone
          // because a concurrent DROP moved it to version-hint.dropped,
          // rewriting version-hint.text here would resurrect the table.
          val hinted = try currentVersion(name) catch {
            case e: Exception =>
              if (Files.exists(metaDir(name).resolve("version-hint.dropped")) ||
                  !Files.exists(hintPath(name)))
                throw new CommitConflictException(
                  s"$name: table dropped concurrently during lost-CAS adoption", e)
              0
          }
          if (next > hinted)
            GraftUtil.writeStringAtomic(
              Paths.get(root, "metadata", "version-hint.text"), next.toString)
          throw new CommitConflictException(
            s"$name: v$next already exists (lost CAS race); hint advanced to v$next")
      }
      GraftUtil.writeStringAtomic(Paths.get(root, "metadata", "version-hint.text"), next.toString)
      next
    }

  /** DROP with tombstone so UNDROP can recover (docs/01:80). */
  def dropTable(name: String): Unit = lockFor(name).synchronized {
    require(tableExists(name), s"table $name does not exist")
    Files.move(hintPath(name), metaDir(name).resolve("version-hint.dropped"))
  }

  def undropTable(name: String): GraftTable = lockFor(name).synchronized {
    val tomb = metaDir(name).resolve("version-hint.dropped")
    require(Files.exists(tomb), s"table $name has no dropped tombstone")
    Files.move(tomb, hintPath(name))
    new GraftTable(this, name)
  }

  /** Re-read the pointer (ALTER ... REFRESH, docs/11:174-183). A no-op for a
    * filesystem catalog — provided for API parity with external catalogs.
    */
  def refresh(name: String): Int = currentVersion(name)

  /** Register every table of a namespace as a Spark temp view (snapshot
    * taken at registration), enabling plain `spark.sql` over Graft tables.
    * NOTE: the SQL path reads the registered snapshot's full file list —
    * parquet row-group pruning still applies via pushed filters, but the
    * driver-side manifest pruning phases are only exercised through
    * `GraftTable.scan(predicates)`. Re-register to pick up new commits.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession, namespace: String): Seq[String] = {
    val names = listTables(namespace)
    names.foreach { n =>
      loadTable(n).toDF(spark).createOrReplaceTempView(n.split('.').last)
    }
    names
  }
}
